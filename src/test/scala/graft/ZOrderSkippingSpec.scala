package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.zorder64

/** Multi-column data skipping via Z-order clustering, proven at runtime:
  * the SAME custkey predicate over the SAME rows reads a fraction of a
  * z-clustered parquet copy but the whole of a date-sorted copy — a
  * linear sort only prunes its leading column, while the Morton
  * interleave keeps every file's bounding box small in BOTH dimensions.
  * This is `src_zorder_skipping`'s scale claim measured, not asserted
  * from plan text.
  */
class ZOrderSkippingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.FileSourceScanExec
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
    case qs: QueryStageExec => scansOf(qs.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scansOf)
  }

  private def rowsReadByScan(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    scansOf(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("z-order layout skips on the non-leading column; linear sort cannot") {
    // Both clustering dimensions scaled to comparable bit-widths (16-day
    // buckets ≈ the custkey range) — see src_zorder_skipping's Scaladoc
    // for why raw interleave of mismatched widths degenerates.
    val orders = Tables.orders(spark, SparkTestBase.sf)
      .withColumn("o_date", to_date(col("o_orderdate")))
      .withColumn("day_bucket",
        (datediff(col("o_date"), lit("1992-01-01").cast("date")) / 16).cast("long"))
    val total = orders.count()
    val maxCust = orders.agg(max("o_custkey")).head().getLong(0)
    // Custkey-only predicate on the low quarter of the key domain: the
    // sharpest split between the two layouts, because custkey is the
    // NON-leading column of the linear sort.
    val pred = s"o_custkey <= ${maxCust / 4}"
    val matching = orders.where(expr(pred)).count()
    assert(matching > 0 && matching < total / 2,
      s"predicate must be selective for the demonstration: $matching of $total")

    val zkey = zorder64(col("day_bucket"), col("o_custkey").cast("long"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    graft.core.Fs.deleteOnExit(zDir)
    orders.repartitionByRange(2, zkey)
      .sortWithinPartitions(zkey)
      .drop("day_bucket")
      .write.mode("overwrite").option("maxRecordsPerFile", 50).parquet(zDir)

    // Linear layout: date-sorted (custkey second) — the srcSorted shape.
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    graft.core.Fs.deleteOnExit(linDir)
    orders.repartitionByRange(2, col("o_date"), col("o_custkey"))
      .sortWithinPartitions("o_date", "o_custkey")
      .drop("day_bucket")
      .write.mode("overwrite").option("maxRecordsPerFile", 50).parquet(linDir)

    val zRead = rowsReadByScan(spark.read.parquet(zDir).where(expr(pred)))
    val linRead = rowsReadByScan(spark.read.parquet(linDir).where(expr(pred)))

    // Every date-sorted file spans ~the full custkey domain → no skipping.
    assert(linRead >= (total * 9) / 10,
      s"date-sorted layout unexpectedly skipped: read $linRead of $total")
    // The z-clustered files partition the custkey domain too → the scan
    // skips the files whose custkey box misses the predicate.
    assert(zRead <= total / 2,
      s"z-order layout failed to skip: read $zRead of $total ($matching matching)")
    assert(zRead < linRead,
      s"z-order ($zRead) should read strictly less than linear ($linRead)")

    // Same values either way — and same as the direct table scan.
    val a = spark.read.parquet(zDir).where(expr(pred))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    val b = orders.where(expr(pred))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    assert(a == b)
  }

  test("zorder64: bit contract, sign safety, SQL registration") {
    // Interleave: a's bits to odd positions, b's to even.
    assert(graft.functions.ExprUtil.zorder(0L, 0L) == 0L)
    assert(graft.functions.ExprUtil.zorder(1L, 0L) == 2L)
    assert(graft.functions.ExprUtil.zorder(0L, 1L) == 1L)
    assert(graft.functions.ExprUtil.zorder(3L, 3L) == 15L)
    // 31-bit mask: the 32nd bit must not flip the sign.
    assert(graft.functions.ExprUtil.zorder(0xFFFFFFFFL, 0xFFFFFFFFL) > 0L)
    assert(graft.functions.ExprUtil.zorder(Long.MaxValue, Long.MaxValue) > 0L)
    // Locality: nearby (a, b) boxes map to nearby z ranges — the top-left
    // quadrant of an 8×8 grid occupies exactly the first 16 z values.
    val quad = for (a <- 0 until 4; b <- 0 until 4)
      yield graft.functions.ExprUtil.zorder(a.toLong, b.toLong)
    assert(quad.sorted == (0L until 16L))

    // Column API and SQL text agree (codegen path vs registry).
    import spark.implicits._
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    val df = Seq((5L, 9L), (0L, 0L), (123L, 456L)).toDF("a", "b")
    val viaCol = df.select(zorder64(col("a"), col("b"))).as[Long].collect().toSeq
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql("SELECT zorder64(a, b) FROM zt").as[Long].collect().toSeq
    assert(viaCol == viaSql)
    assert(viaCol.head == graft.functions.ExprUtil.zorder(5L, 9L))
  }
}

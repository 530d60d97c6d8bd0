package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data skipping via sort-clustered layout, proven at runtime: the same
  * date-range predicate over the same rows reads a small slice of a
  * range-sorted parquet copy but the whole of a date-shuffled copy —
  * parquet row-group/file min–max stats only skip when the layout
  * clusters the predicate column. This is `src_sorted_skipping`'s scale
  * claim measured, not asserted from plan text.
  */
class SortedSkippingSpec extends AnyFunSuite {
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

  test("range-sorted layout skips row groups; shuffled layout reads everything") {
    // DATE clustering column: parquet stats pruning does not fire for
    // this corpus's timestamp physical types (measured; see SCALE.md),
    // so the time-keyed layout clusters on the derived day.
    val orders = Tables.orders(spark, SparkTestBase.sf)
      .withColumn("o_date", org.apache.spark.sql.functions.to_date(col("o_orderdate")))
    val total = orders.count()
    val pred = "o_date >= '1995-03-01' AND o_date < '1995-06-01'"
    val matching = orders.where(expr(pred)).count()
    assert(matching > 0 && matching < total / 4,
      s"predicate must be selective for the demonstration: $matching of $total")

    // Clustered copy: global range sort, many small files → tight,
    // disjoint per-file min–max date spans.
    val sortedDir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    graft.core.Fs.deleteOnExit(sortedDir)
    orders.repartitionByRange(2, col("o_date"))
      .sortWithinPartitions("o_date")
      .write.mode("overwrite").option("maxRecordsPerFile", 100).parquet(sortedDir)

    // Anti-clustered copy: same rows hash-shuffled on the key, same file
    // sizing — every file's date span covers ~the whole domain.
    val shuffledDir = java.nio.file.Files.createTempDirectory("graft_shuffled").toString
    graft.core.Fs.deleteOnExit(shuffledDir)
    orders.repartition(2, col("o_orderkey"))
      .write.mode("overwrite").option("maxRecordsPerFile", 100).parquet(shuffledDir)

    val sortedRead = rowsReadByScan(spark.read.parquet(sortedDir).where(expr(pred)))
    val shuffledRead = rowsReadByScan(spark.read.parquet(shuffledDir).where(expr(pred)))

    // The pushed predicate skips whole files/row groups on the clustered
    // copy: reads bounded by the match count plus boundary-file slack.
    assert(sortedRead <= matching + 2 * 100,
      s"clustered layout read $sortedRead rows for $matching matches")
    // The shuffled copy cannot skip: every file intersects the range.
    assert(shuffledRead >= (total * 9) / 10,
      s"shuffled layout unexpectedly skipped: read $shuffledRead of $total")

    // Same values either way — and same as the direct table scan.
    val a = spark.read.parquet(sortedDir).where(expr(pred))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    val b = orders.where(expr(pred))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    assert(a == b)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join correctness + distribution: same rows as the plain join,
  * and the hot key's probe rows actually spread across salt buckets.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("salted join == plain join on a skewed key distribution") {
    // 90% of probe rows hit one hot key.
    val probe = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(0L).as("k"),
        col("id").as("payload"))
    val build = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "name")

    val plain = probe.join(build, Seq("k"))
      .select("k", "payload", "name")
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8,
      probeUniqueCols = Seq("payload"))
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // Deterministic salt actually spreads the hot key across buckets when
    // the probe carries a unique column.
    val saltCounts = probe.filter(col("k") === 0L)
      .withColumn("__salt", pmod(xxhash64(col("payload")), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "hot key must occupy every salt bucket")
  }

  test("AQE splits the skewed sort-merge-join partition at runtime (skew=true)") {
    // The other half of the skew story: salting is the manual lever,
    // AQE's OptimizeSkewedJoin is the runtime one SCALE.md leans on.
    // Thresholds lowered so local data trips the same code path a 100 TB
    // hot key would.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      val probe = spark.range(300000)
        .select(when(col("id") % 100 === 0, col("id") % 7 + 1)
          .otherwise(lit(0L)).as("k"), col("id").as("p"))
      val build = spark.range(8).select(col("id").as("k"), (col("id") * 10).as("q"))
      val j = probe.join(build, Seq("k"))
      // Materialize through THIS Dataset's QueryExecution (count() plans a
      // separate aggregate and would leave this plan isFinalPlan=false).
      val n = j.collect().length
      assert(n == 300000, s"inner join must keep every probe row, got $n")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in plan:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("hot key spreads across salt buckets even for byte-identical rows") {
    // Identical probe rows — the degenerate case a row-hash salt cannot
    // spread; needs the explicit positional opt-in (deterministic-scan
    // probe only, per the Scaladoc contract).
    val probe = spark.range(8000).select(lit(0L).as("k"), lit(1L).as("payload"))
    val build = Seq((0L, "hot")).toDF("k", "name")
    val joined = Skew.saltedJoin(probe, build, "k", salts = 8,
      spreadIdenticalRows = true)
    assert(joined.count() == 8000)
    val saltCounts = probe
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "hot key must occupy every salt bucket")
    assert(saltCounts.max < 8000 * 0.25, s"skewed salt distribution: ${saltCounts.toSeq}")
  }
}

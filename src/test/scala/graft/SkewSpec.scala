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
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key spreads across salt buckets even for byte-identical rows") {
    // Identical probe rows — the degenerate case a row-hash salt gets wrong.
    val probe = spark.range(8000).select(lit(0L).as("k"), lit(1L).as("payload"))
    val build = Seq((0L, "hot")).toDF("k", "name")
    val joined = Skew.saltedJoin(probe, build, "k", salts = 8)
    assert(joined.count() == 8000)
    val saltCounts = probe
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length == 8, "hot key must occupy every salt bucket")
    assert(saltCounts.max < 8000 * 0.25, s"skewed salt distribution: ${saltCounts.toSeq}")
  }
}

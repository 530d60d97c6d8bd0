package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL distinct-count sketches (q_hll_distinct's machinery).
  *
  * The oracle row pins the EXACT regime (sparse-mode sketches at ≤~1.5k
  * distinct); these tests pin the two properties the oracle cannot see:
  * mergeability (shard-then-union ≡ single pass) and the estimate-error
  * contract in the dense regime a 100 TB corpus actually exercises.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("sharded sketches union to the single-pass estimate (mergeability)") {
    val n = 300000L
    val ids = spark.range(n).select(col("id"), pmod(col("id"), lit(8)).as("shard"))
    val direct = ids.agg(expr("hll_sketch_estimate(hll_sketch_agg(id, 14))").as("est"))
      .head.getLong(0)
    val merged = ids.groupBy(col("shard")).agg(expr("hll_sketch_agg(id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head.getLong(0)
    // Sketch union is lossless for HLL: the merged registers are the
    // registers the single pass would build, so the estimates are EQUAL,
    // not merely close. This is what lets shard sketches be persisted and
    // any union answered later without re-scanning data.
    assert(merged == direct, s"union est $merged != single-pass est $direct")
    // Dense-regime error contract: well under the ~1.6%/sqrt-ish bound
    // for lgK=14 at this cardinality.
    assert(math.abs(direct - n).toDouble / n < 0.02,
      s"estimate $direct vs exact $n out of tolerance")
  }

  test("sparse mode is exact at oracle cardinality (q_hll_distinct regression pin)") {
    val sf = SparkTestBase.sf
    val o = Tables.orders(spark, sf)
    val rows = o.groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 14))").as("est"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: est ${r.getLong(1)} != exact ${r.getLong(2)} — " +
          "the q_hll_distinct oracle depends on sparse-mode exactness at lgK=14")
    }
  }
}

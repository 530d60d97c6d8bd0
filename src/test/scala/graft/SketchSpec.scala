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

  test("q_hll_distinct: every row's estimate property holds, ALL row present") {
    // The oracle contract after the sf0.1 lesson: q_hll_distinct gates
    // the EXACT count plus the |est − exact| ≤ 3% property (sparse-mode
    // exactness at lgK=14 only holds below ~12k distincts, which sf0.1
    // exceeds — an exact-estimate oracle was SF-dependent).
    val rows = SparkEntry.queries("q_hll_distinct")(spark, SparkTestBase.sf)
      .collect()
    assert(rows.nonEmpty && rows.exists(_.getString(0) == "ALL"))
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: estimate strayed past 3% of exact ${r.getLong(1)}")
    }
  }
}

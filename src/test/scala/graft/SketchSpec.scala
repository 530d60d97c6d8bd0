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

  test("KLL quantile sketches: merged shard sketches hold the rank bound, " +
       "count every item, and survive serialization") {
    import graft.functions.KllSketch._
    import graft.functions.KllQuantiles
    val n = 100000L
    val data = spark.range(n).select(col("id").cast("double").as("v"),
      pmod(col("id"), lit(16)).as("shard"))
    // Shard → sketch → merge (the persist-then-union path), probe three
    // ranks. KLL compaction is randomized, so the contract is the rank
    // bound, not a value: for uniform 0..n-1 the true inclusive rank of
    // value v is (v+1)/n, so |est/n − p| ≤ ε must hold. k=200 publishes
    // ε≈1.33% at 99% confidence; assert 3% so no run can flake.
    val merged = data.groupBy(col("shard"))
      .agg(kll_sketch_agg(col("v")).as("sk"))
      .agg(kll_merge_agg(col("sk")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5, 0.95, 0.99)).as("q"))
      .head.getSeq[Double](0)
    for ((p, est) <- Seq(0.5, 0.95, 0.99).zip(merged)) {
      val rank = (est + 1.0) / n
      assert(math.abs(rank - p) <= 0.03,
        s"p=$p: estimate $est has rank $rank, outside the 3% bound")
    }
    // The sketch counts every item exactly (n is not estimated), and a
    // serialize → heapify round-trip preserves the full state.
    val bytes = data.agg(kll_sketch_agg(col("v")).as("sk"))
      .head.getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))
    assert(sk.getN == n, s"getN ${sk.getN} != $n")
    val rt = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(sk.toByteArray))
    assert(rt.getN == sk.getN &&
      rt.getQuantile(0.5, org.apache.datasketches.quantilescommon
        .QuantileSearchCriteria.INCLUSIVE) ==
      sk.getQuantile(0.5, org.apache.datasketches.quantilescommon
        .QuantileSearchCriteria.INCLUSIVE),
      "serialization round-trip must preserve the sketch")
    // Empty-sketch probe contract: null, not an exception.
    val emptyBytes = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(kll_sketch_agg(col("v")).as("sk")).head.getAs[Array[Byte]](0)
    assert(KllQuantiles.probe(emptyBytes, Array(0.5)) == null)
  }

  test("q_kll_quantiles: exact percentiles match q_percentiles' p50 and " +
       "every rank-property boolean is true") {
    val rows = SparkEntry.queries("q_kll_quantiles")(spark, SparkTestBase.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"rank property violated for group ${r.getString(0)}: $r")
    }
    // p50 agrees with the independent q_percentiles computation (same
    // cents base, same quantization).
    val p50Kll = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val p50Exact = SparkEntry.queries("q_percentiles")(spark, SparkTestBase.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p50Kll == p50Exact, s"$p50Kll vs $p50Exact")
  }
}

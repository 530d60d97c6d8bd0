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

  test("KMV set-op sketches: unsaturated == exact, saturated estimator " +
       "matches a local model, insert/merge bounded at K") {
    import graft.functions.KmvSketch
    val rnd = new scala.util.Random(42)
    val k = 64
    // Two overlapping synthetic key sets, hashed like the engine does.
    def h(x: Long): Long = graft.functions.ExprUtil
      .md5Long(org.apache.spark.unsafe.types.UTF8String.fromString(x.toString))
    val aKeys = (0L until 500L).map(_ => rnd.nextLong().abs % 100000).distinct
    val bKeys = (0L until 500L).map(_ => rnd.nextLong().abs % 100000).distinct
    def sketchOf(keys: Seq[Long]): Array[Long] = {
      // Build through two buffers + merge so the partial/final path runs.
      val (b1, b2) = (KmvSketch.newBuffer(), KmvSketch.newBuffer())
      keys.zipWithIndex.foreach { case (x, i) =>
        KmvSketch.insert(if (i % 2 == 0) b1 else b2, h(x), k)
      }
      val it = b2.iterator()
      while (it.hasNext) KmvSketch.insert(b1, it.next(), k)
      assert(b1.size <= k, "buffer must stay bounded at K")
      val arr = new Array[Long](b1.size)
      var i = 0
      val jt = b1.iterator()
      while (jt.hasNext) { arr(i) = jt.next(); i += 1 }
      arr
    }
    val (sa, sb) = (sketchOf(aKeys), sketchOf(bKeys))
    // Saturated: the estimate must land within the published ~3/sqrt(K-2)
    // relative band of the truth (deterministic — this is a fixed fact
    // about these keys, not a flaky draw; seed pinned).
    val estA = KmvSketch.estMilli(sa, k) / 1000.0
    assert(math.abs(estA - aKeys.size) <= 3.0 * aKeys.size / math.sqrt(k - 2.0),
      s"estimate $estA vs truth ${aKeys.size}")
    val exactU = (aKeys.toSet ++ bKeys.toSet).size
    val exactI = (aKeys.toSet & bKeys.toSet).size
    val estU = KmvSketch.unionMilli(sa, sb, k) / 1000.0
    val estI = KmvSketch.interMilli(sa, sb, k) / 1000.0
    assert(math.abs(estU - exactU) <= 3.0 * exactU / math.sqrt(k - 2.0),
      s"union estimate $estU vs truth $exactU")
    // Intersection error is relative to the UNION size (theta comes from
    // the union-scale thetas), the standard theta-sketch bound.
    assert(math.abs(estI - exactI) <= 3.0 * exactU / math.sqrt(k - 2.0),
      s"intersection estimate $estI vs truth $exactI")
    // Unsaturated sketches are EXACT for every operation — including the
    // union, as long as the COMBINED live set stays under K (30+20 < 64).
    val (ua, ub) = (aKeys.take(30), bKeys.take(20))
    val (su, sv) = (sketchOf(ua), sketchOf(ub))
    assert(KmvSketch.estMilli(su, k) == ua.size * 1000L)
    assert(KmvSketch.unionMilli(su, sv, k) == (ua.toSet ++ ub.toSet).size * 1000L)
    assert(KmvSketch.interMilli(su, sv, k) == (ua.toSet & ub.toSet).size * 1000L)
  }

  test("KMV persist-then-merge: shard sketches merged cell-wise equal the " +
       "direct single-pass sketch bit-for-bit") {
    import graft.functions.KmvSketch._
    val h = Tables.orders(spark, SparkTestBase.sf)
      .select(col("o_orderpriority").as("p"), col("o_custkey"),
        graft.functions.GraftFunctions.md5_64(
          col("o_custkey").cast("string")).as("h"))
    val direct = h.groupBy(col("p")).agg(kmv_sketch_agg(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val merged = h.withColumn("shard", pmod(col("o_custkey"), lit(8)))
      .groupBy(col("p"), col("shard")).agg(kmv_sketch_agg(col("h")).as("sk"))
      .groupBy(col("p")).agg(kmv_merge_agg(col("sk")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // KMV merge is LOSSLESS vs the direct build (K smallest of a union
    // of K-smallest subsets == K smallest of the union) — bit equality,
    // not an error band.
    assert(merged == direct)
    assert(direct.nonEmpty && direct.values.forall(_.nonEmpty))
  }

  test("q_kmv_set_ops: unsaturated regime at this SF — set-op estimates " +
       "equal the exact columns") {
    val rows = SparkEntry.queries("q_kmv_set_ops")(spark, SparkTestBase.sf)
      .collect()
    assert(rows.length == 10, "5 priorities -> 10 pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_union_milli") ==
        r.getAs[Long]("exact_union") * 1000L, r.toString)
      assert(r.getAs[Long]("est_inter_milli") ==
        r.getAs[Long]("exact_inter") * 1000L, r.toString)
    }
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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupOps

/** Value-level coverage for the hash-based dedup operators whose oracle is
  * rows-only (custom hashing has no DuckDB equivalent).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("minhash signature: identical docs → identical signatures") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "completely different content with other words entirely here now")
    val sigs = DedupOps.minhashSignatures(d)
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == DedupOps.NumPerms)
  }

  test("minhash estimates jaccard: near-dup docs share most signature slots") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " changed words"
    val d = docs(1L -> base, 2L -> nearDup)
    val sigs = DedupOps.minhashSignatures(d)
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agree = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    // true 3-gram jaccard ≈ 0.85+ → expect most of 32 slots to agree
    assert(agree >= DedupOps.NumPerms / 2, s"only $agree/32 slots agree")
  }

  test("simhash: identical docs → distance 0; distinct docs → large distance") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine ten")
    val sh = DedupOps.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 10)
  }

  test("simhash of one changed token moves few bits") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val tweaked = base.replace("word30", "different")
    val d = docs(1L -> base, 2L -> tweaked)
    val sh = DedupOps.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 16)
  }

  test("d5 tile-blocked all-pairs is lossless: multi-tile == single-tile result") {
    val d = "/root/testdata/sf0.001"
    def run(tile: String) = {
      spark.conf.set("spark.graft.neardup.tile", tile)
      try DedupOps.queries("d5_embedding_neardup")(spark, d)
        .collect().map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong,
          r.get(2).toString)).toSeq
      finally spark.conf.unset("spark.graft.neardup.tile")
    }
    val single = run("1000000") // G = 1: plain per-label self-join
    val tiled = run("8")        // ~50 rows/label → G = 7, 28 tile-pairs/label
    assert(tiled.size == tiled.distinct.size, "tile join produced duplicate pairs")
    assert(tiled.toSet == single.toSet)
    assert(single.nonEmpty)
    assert(single.forall { case (a, b, _) => a < b })
  }

  test("connected components: local union-find finish == fully distributed path") {
    val d = "/root/testdata/sf0.001"
    def run(bound: String) = {
      spark.conf.set("spark.graft.cc.localFinishEdges", bound)
      try DedupOps.queries("d6_neardup_components")(spark, d)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      finally spark.conf.unset("spark.graft.cc.localFinishEdges")
    }
    val hybrid = run("4000000") // edge set under the bound → union-find finish
    val distributed = run("0")  // star contraction to convergence
    assert(hybrid == distributed)
    assert(hybrid.nonEmpty)
  }

  test("d6 components: pair endpoints share a rep; reps are cluster minima") {
    val d = "/root/testdata/sf0.001"
    val pairs = DedupOps.embeddingPairs(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rep = DedupOps.queries("d6_neardup_components")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep.nonEmpty && pairs.nonEmpty)
    // Every near-dup pair landed in the same cluster.
    pairs.foreach { case (a, b) => assert(rep(a) == rep(b), s"$a/$b split across clusters") }
    // Reps are minima and are members of their own cluster.
    rep.foreach { case (id, r) => assert(r <= id && rep(r) == r) }
    // Transitivity sanity: the number of clusters equals nodes minus the
    // spanning edges of the pair graph (union-find ground truth).
    val uf = scala.collection.mutable.Map(rep.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = { if (uf(x) != x) uf(x) = find(uf(x)); uf(x) }
    pairs.foreach { case (a, b) => uf(find(a)) = find(b) }
    val expected = rep.keys.groupBy(find).keys.size
    assert(rep.values.toSet.size == expected)
  }

  test("LSH candidate generation finds planted near-duplicates end-to-end") {
    // Plant an exact dup pair + a near-dup pair among noise docs.
    val noise = (10 to 40).map(i =>
      (i.toLong, (1 to 30).map(j => s"n${i}_$j").mkString(" ")))
    val planted = Seq(
      (1L, "shared tokens one two three four five six seven eight nine ten eleven twelve"),
      (2L, "shared tokens one two three four five six seven eight nine ten eleven twelve"),
      (3L, "shared tokens one two three four five six seven eight nine ten eleven changed"))
    val d = (planted ++ noise).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lsh").toString
    d.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = graft.queries.DedupOps.queries("d2_minhash_lsh")(spark, tmp)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a >= 10L && b >= 10L }) // no noise pairs
    // d8: components over the same graph collapse the planted trio to
    // keeper 1; noise docs stay singletons.
    val reps = graft.queries.DedupOps.queries("d8_minhash_components")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps(2L) == 1L && reps(3L) == 1L)
    assert(reps(20L) == 20L)
  }

  test("d10 keep-best: longest doc of a cluster wins; ties fall to min doc_id; singletons keep themselves") {
    // Trio cluster where doc 3 is the LONGEST (padded near-dup) — the
    // quality keeper must be 3 even though the d8 min-id rep is 1; plus a
    // same-length exact-dup pair (7,8) where the tie-break elects 7.
    val base = "shared tokens one two three four five six seven eight nine ten eleven"
    val planted = Seq(
      (1L, s"$base twelve"),
      (2L, s"$base twelve"),
      (3L, s"$base twelve plus extra trailing padding words"),
      (7L, "unrelated corpus alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (8L, "unrelated corpus alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val noise = (20 to 45).map(i =>
      (i.toLong, (1 to 30).map(j => s"n${i}_$j").mkString(" ")))
    val d = (planted ++ noise).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_d10").toString
    d.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.DedupOps.queries("d10_keep_best")(spark, tmp)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (3L, false) && out(2L) == (3L, false) && out(3L) == (3L, true))
    assert(out(7L) == (7L, true) && out(8L) == (7L, false))
    assert(out(30L) == (30L, true)) // singleton keeps itself
    assert(out.count(_._2._2) == out.values.map(_._1).toSet.size) // one keeper per cluster
  }

  test("LSH embedding prefilter: precision 1 (subset of exact), high recall at a sparse threshold") {
    import spark.implicits._
    // The real corpus has no pairs above cos 0.45 (dense-at-0.3 design),
    // so plant a sparse-threshold workload: 30 clusters of 3 near-copies
    // (cos ≈ 0.99) + 200 independent noise vectors, deterministic.
    def unit(seed: Long): Array[Float] = {
      var s = seed
      def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 11).toDouble / (1L << 53).toDouble - 0.5 }
      Array.fill(32)(next().toFloat)
    }
    def jitter(base: Array[Float], seed: Long): Array[Float] = {
      val j = unit(seed)
      base.zip(j).map { case (x, e) => x + 0.02f * e }
    }
    val rows = (0 until 30).flatMap { c =>
      val base = unit(1000 + c)
      (0 until 3).map(k => (c * 3L + k, c % 4, jitter(base, 9000 + c * 7 + k)))
    } ++ (0 until 200).map(i => (1000L + i, i % 4, unit(5000 + i)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshnd").toString
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val t = 0.7 // sparse: hyperplane collision 0.747 at cos 0.7 vs 0.5 bulk
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(DedupOps.embeddingPairsExact(spark, tmp, t))
    val lsh = pairs(DedupOps.embeddingPairsLsh(spark, tmp, t))
    assert(exact.size >= 30, s"planted clusters missing from exact set: ${exact.size}")
    // Verification is the same exact cosine, so no false positives ever.
    assert(lsh.subsetOf(exact), s"LSH emitted non-qualifying pairs: ${lsh -- exact}")
    // Banding (16 bands × 4 bits) keeps recall high at this separation.
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("d9 dup spans: planted cross-doc window flagged; unique text clean; short docs absent") {
    import graft.queries.DedupOps
    val shared = (1 to DedupOps.SpanWindow).map(i => s"dup$i").mkString(" ")
    val d = docs(
      1L -> s"unique one alpha $shared beta gamma unique tail here",
      2L -> s"other words entirely then $shared and more distinct text",
      3L -> (1 to 20).map(i => s"solo$i").mkString(" "),
      4L -> "too short")
    val out = DedupOps.dupSpansOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Docs 1 and 2 share exactly one W-token window; the windows that
    // OVERLAP the shared run differ (different surrounding tokens).
    assert(out(1L)._2 == 1 && out(2L)._2 == 1,
      s"expected exactly one duplicated window per planted doc: $out")
    assert(out(3L)._2 == 0)
    assert(!out.contains(4L), "docs shorter than the window emit no rows")
    // Window counts: n_tokens - W + 1.
    assert(out(3L)._1 == 20 - DedupOps.SpanWindow + 1)
  }

  test("d17 span scrub: planted shared window excised from BOTH docs, " +
       "surrounding tokens intact; unique and short docs unchanged") {
    import graft.queries.DedupOps
    val W = DedupOps.SpanWindow
    val shared = (1 to W).map(i => s"dup$i").mkString(" ")
    val d = docs(
      1L -> s"unique one alpha $shared beta gamma unique tail here",
      2L -> s"other words entirely then $shared and more distinct text",
      3L -> (1 to 20).map(i => s"solo$i").mkString(" "),
      4L -> "too short")
    val out = DedupOps.spanScrubOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // The duplicated window's W tokens vanish from both carriers — and
    // ONLY those (the overlapping windows differ, so coverage is exactly
    // the shared run).
    assert(out(1L)._2 == W && out(2L)._2 == W, s"exactly the shared run: $out")
    assert(out(1L)._3 == "unique one alpha beta gamma unique tail here")
    assert(out(2L)._3 == "other words entirely then and more distinct text")
    // No duplicated window → byte-identical round-trip.
    assert(out(3L)._2 == 0 && out(3L)._3 == (1 to 20).map(i => s"solo$i").mkString(" "))
    assert(out(4L)._2 == 0 && out(4L)._3 == "too short",
      "sub-window docs have no windows and must pass through verbatim")
    // Repair agrees with d9's detection: a doc loses tokens iff d9
    // counted a duplicated window in it.
    val det = DedupOps.dupSpansOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach { case (id, (_, removed, _)) =>
      assert((removed > 0) == (det.getOrElse(id, 0L) > 0), s"doc $id drifts from d9")
    }
  }

  test("d20 audio neardup: banded pairs equal the closed-form brute force, " +
       "and every variant matches its group's base recording") {
    import graft.queries.MultimodalOps.AudioFpCodec._
    // Local model: energies straight from the closed form (no codec),
    // brute-force all pairs at hamming <= 3 — the banded join through
    // the REAL WAVE round-trip must reproduce it exactly.
    val ids = Tables.documents(spark, SparkTestBase.sf)
      .select("doc_id").collect().map(_.getLong(0))
    def fpModel(id: Long): Long = {
      val en = Array.tabulate(Frames)(f =>
        (0 until Win).map(o => sample(id, f * Win + o).toLong).sum)
      (0 until Frames - 1).foldLeft(0L)((h, b) =>
        if (en(b + 1) > en(b)) h | (1L << b) else h)
    }
    val fps = ids.map(id => id -> fpModel(id)).toMap
    val model = (for {
      i <- ids; j <- ids if i < j
      hm = java.lang.Long.bitCount(fps(i) ^ fps(j)) if hm <= 3
    } yield (i, j, hm)).toSet
    val got = SparkEntry.queries("d20_audio_neardup")(spark, SparkTestBase.sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(got == model, s"banded pairs diverge from brute force " +
      s"(got ${got.size}, model ${model.size})")
    // The planted near-dups: a variant's one boosted frame flips <= 2
    // envelope bits, so every (base, variant) pair within a full group
    // must match.
    ids.groupBy(groupOf).filter(_._2.length == 4).foreach { case (g, ms) =>
      val base = ms.min
      ms.filter(_ != base).foreach { v =>
        assert(got.exists(p => p._1 == base && p._2 == v),
          s"group $g: variant $v must match its base recording")
      }
    }
  }

  test("d18 cluster stats: histogram conserves the corpus and matches the " +
       "component assignment") {
    val hist = SparkEntry.queries("d18_cluster_stats")(spark, SparkTestBase.sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // Conservation: every corpus doc sits in exactly one cluster.
    val corpusN = graft.Tables.documents(spark, SparkTestBase.sf).count()
    assert(hist.values.map(_._2).sum == corpusN)
    hist.foreach { case (size, (nc, nd, nr)) =>
      assert(nd == size * nc && nr == (size - 1) * nc, s"size $size arithmetic")
    }
    // Cross-check against the assignment directly.
    val direct = SparkEntry.queries("d8_minhash_components")(spark, SparkTestBase.sf)
      .collect().groupBy(_.getAs[Long]("cluster_rep")).values
      .groupBy(_.size).map { case (sz, cs) => sz.toLong -> cs.size.toLong }
    assert(direct == hist.map { case (sz, (nc, _, _)) => sz -> nc })
    // The corpus genuinely has near-dup clusters — the report is not a
    // vacuous all-singletons table.
    assert(hist.keySet.exists(_ >= 2), s"expected a multi-doc cluster: $hist")
  }

  test("d19 lsh recall eval: caught never exceeds exact, tallies match the " +
       "pair queries, and high-jaccard recall is near 1") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("d19_lsh_recall_eval")(spark, SparkTestBase.sf)
      .collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_caught"),
          r.getAs[Long]("recall_micro"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (b, (ne, nc, rm)) =>
      assert(b >= 5 && b <= 9, s"jaccard >= 0.5 buckets only, got $b")
      assert(nc <= ne, s"bucket $b: caught must be a subset of exact")
      assert(rm == nc * 1000000L / ne)
    }
    // Total caught equals the d2 pair graph restricted to same-lang pairs.
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val d2SameLang = SparkEntry.queries("d2_minhash_lsh")(spark, SparkTestBase.sf)
      .collect()
      .count(r => docs(r.getAs[Long]("doc_a")) == docs(r.getAs[Long]("doc_b")))
    assert(rows.values.map(_._2).sum == d2SameLang.toLong)
    // The banding S-curve: at jaccard >= 0.9 the catch probability is
    // ~0.9998 for these band parameters — demand near-total recall there.
    rows.get(9).foreach { case (ne, _, rm) =>
      if (ne >= 3) assert(rm >= 900000L, s"top-bucket recall $rm implausible")
    }
  }

  test("d11 chunk dedup: planted shared passage dedups at chunk level; unique docs clean") {
    // A long shared passage (boilerplate) embedded in two otherwise
    // different documents: CDC boundaries inside the passage align, so
    // the later doc's interior passage chunks must be flagged dup.
    // Non-self-repeating (numbered tokens): within-doc chunks must not
    // collide, so any dup flag comes from the CROSS-doc share.
    val passage = (1 to 60).map(i => s"boilerplate$i").mkString(" ")
    val d = docs(
      1L -> s"doc one opening words. $passage doc one closing remark.",
      2L -> s"totally different preamble here instead. $passage and a different ending too.",
      3L -> "entirely unique content with no repeated passage at all, just its own words.")
    val out = DedupOps.chunkDedupOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // The test divisor (32) occasionally cuts 1-byte chunks, which
    // collide trivially — tolerate a few dup BYTES on the first doc, but
    // the substantive passage bytes must dedup only in doc 2.
    assert(out(1L)._3 <= 4, s"first occurrence owns every substantive chunk: $out")
    assert(out(2L)._2 >= 5, s"doc 2's interior passage chunks must dedup against doc 1: $out")
    assert(out(2L)._3 > 100, s"dup bytes accumulate from the flagged passage chunks: $out")
    assert(out(3L)._3 <= 4, s"unique doc must not lose substantive bytes: $out")
    assert(out.keySet == Set(1L, 2L, 3L))
  }

  test("incremental dedup: corpus match wins, intra-batch dups attributed to batch min") {
    import spark.implicits._
    import graft.queries.DedupOps
    val d = Seq(
      (1L, "already in the lake", "srcA"),
      (10L, "already in the lake", DedupOps.IncomingSource),   // corpus dup
      (11L, "fresh delivery text", DedupOps.IncomingSource),   // first of an intra pair
      (12L, "fresh delivery text", DedupOps.IncomingSource),   // intra-batch dup of 11
      (13L, "unique new content here", DedupOps.IncomingSource))
      .toDF("doc_id", "text", "source")
    val out = DedupOps.incrementalDedupOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.get(r.fieldIndex("dup_of"))).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("is_dup"))).toMap
    assert(out(10L) == (Some(1L), true), "corpus duplicate must attribute to the lake doc")
    assert(out(11L) == (None, false), "first copy in the batch is the keeper")
    assert(out(12L) == (Some(11L), true), "second copy must attribute to the batch min")
    assert(out(13L) == (None, false))
    assert(!out.contains(1L), "corpus docs are not re-emitted")
  }

  test("d13 phash near-dup: codec-path result equals the closed-form brute " +
       "force; planted variants found; banded plan never goes all-pairs") {
    import graft.queries.MultimodalOps.PhashCodec
    val sf = SparkTestBase.sf
    // INDEPENDENT local model: the dHash computed straight from the
    // pattern math, no codec anywhere — the engine derives the same bits
    // from a REAL PNG encode→decode, so set equality proves the codec
    // round trip is faithful AND that the banding lost no pair.
    def localHash(id: Long): Long = {
      val g = PhashCodec.groupOf(id)
      val (w, h) = (PhashCodec.widthOf(g), PhashCodec.heightOf(g))
      val s = Array.tabulate(8, 8)((cy, cx) =>
        PhashCodec.pixel(id, cx * w / 8, cy * h / 8))
      var hash = 0L
      for (cy <- 0 until 8; cx <- 0 until 7)
        if (s(cy)(cx + 1) > s(cy)(cx)) hash |= 1L << (cy * 7 + cx)
      hash
    }
    val ids = Tables.documents(spark, sf).select("doc_id").as[Long].collect()
    val hs = ids.map(id => id -> localHash(id)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    val df = DedupOps.queries("d13_phash_neardup")(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    // The planted near-dups: every full group's three (base, variant)
    // pairs qualify (≤ 2 flipped bits each) and must be present.
    val fullGroups = ids.groupBy(_ / 4).filter(_._2.length == 4).keys
    assert(fullGroups.nonEmpty)
    for (g <- fullGroups; v <- 1 to 3) {
      val (a, b) = (g * 4, g * 4 + v)
      assert(got.exists(p => p._1 == a && p._2 == b),
        s"planted pair ($a, $b) missing")
    }
    // Banded candidate generation, never all-pairs: the pair join is an
    // equality join on (chunk_idx, chunk).
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "d13 must generate candidates from band equality, not all pairs")
  }

  test("d16 keyframe near-dup: codec-path result equals the closed-form " +
       "brute force; planted cross-video frames found; plan never all-pairs") {
    import graft.queries.MultimodalOps.KeyframeCodec
    val sf = SparkTestBase.sf
    // INDEPENDENT local model: per-frame dHash straight from the pattern
    // math — the engine derives the same bits from a REAL animated-GIF
    // sequence encode→decode, so set equality proves the multi-frame
    // round trip (frame count, order, palette) AND the banding.
    def localHash(id: Long, f: Int): Long = {
      val g = KeyframeCodec.groupOf(id)
      val (w, h) = (KeyframeCodec.widthOf(g), KeyframeCodec.heightOf(g))
      val s = Array.tabulate(8, 8)((cy, cx) =>
        KeyframeCodec.pixel(id, f, cx * w / 8, cy * h / 8))
      var hash = 0L
      for (cy <- 0 until 8; cx <- 0 until 7)
        if (s(cy)(cx + 1) > s(cy)(cx)) hash |= 1L << (cy * 7 + cx)
      hash
    }
    val ids = Tables.documents(spark, sf).select("doc_id").as[Long].collect()
    val hs = (for {
      id <- ids
      f <- 0 until KeyframeCodec.framesOf(KeyframeCodec.groupOf(id))
    } yield (id, f) -> localHash(id, f)).toMap
    val keys = hs.keys.toArray
    val expected = (for {
      a <- keys; b <- keys if a._1 < b._1
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b)) if hd <= 3
    } yield (a._1, a._2, b._1, b._2, hd)).toSet
    val df = DedupOps.queries("d16_keyframe_neardup")(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    // Planted cross-video dups: for every full group, frame f of the
    // base video and of each variant differ in ≤ 2 bits and must pair.
    val fullGroups = ids.groupBy(_ / 4).filter(_._2.length == 4).keys
    assert(fullGroups.nonEmpty)
    for (g <- fullGroups; v <- 1 to 3; f <- 0 until KeyframeCodec.framesOf(g)) {
      val (a, b) = (g * 4, g * 4 + v)
      assert(got.exists(p => p._1 == a && p._2 == f && p._3 == b && p._4 == f),
        s"planted frame pair (($a, $f), ($b, $f)) missing")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "d16 must generate candidates from band equality, not all pairs")
  }

  test("d14 incremental minhash: equals d2 restricted to batch-endpoint " +
       "pairs; corpus index consumed in its bucket layout, no corpus-side " +
       "exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val sf = SparkTestBase.sf
    val batchIds = Tables.documents(spark, sf)
      .where(col("source") === DedupOps.IncomingSource)
      .select("doc_id").as[Long].collect().toSet
    // The incremental result must be EXACTLY the full d2 recompute
    // restricted to pairs touching the arriving batch — merging a batch
    // into the persisted index may not find different pairs than
    // rebuilding from scratch (same bands, same verification).
    val full = DedupOps.queries("d2_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => batchIds(p._1) || batchIds(p._2)).toSet
    // Force the merge path (the scale shape): test-scale sizes would
    // broadcast everything and hide a corpus-side exchange.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = DedupOps.queries("d14_incremental_minhash")(spark, sf)
      val got = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == full,
        s"incremental found ${got.size} pairs, full recompute ${full.size}")
      assert(got.nonEmpty, "differential is vacuous with no batch near-dups")
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case q: QueryStageExec => expand(q.plan)
        case o => o +: o.children.flatMap(expand)
      }
      val nodes = expand(df.queryExecution.executedPlan)
      // THE pin: wherever a join side is one of the persisted bucketed
      // artifacts (a leaf side holding a bucketed scan and no further
      // join), that side reaches the join with NO exchange — only
      // batch/candidate-sized data may move.
      val smjs = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected forced sort-merge joins")
      val pinnedSides = for {
        j <- smjs
        side <- j.children.map(expand)
        if side.exists {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        }
        if !side.exists(_.isInstanceOf[SortMergeJoinExec])
      } yield side
      assert(pinnedSides.nonEmpty, "expected bucketed corpus-side scans")
      pinnedSides.foreach { side =>
        assert(!side.exists(_.isInstanceOf[ShuffleExchangeExec]),
          "corpus side of an index join must be exchange-free:\n" +
            side.map(_.nodeName).mkString("\n"))
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("d3 two-level pigeonhole banding is lossless: identical pairs to single-level") {
    val sf = SparkTestBase.sf
    val q = DedupOps.queries("d3_simhash")
    def pairs() = q(spark, sf).orderBy("doc_a", "doc_b").collect().toSeq
    val single = pairs()
    spark.conf.set(DedupOps.SimhashTwoLevelConf, "true")
    try {
      val two = pairs()
      assert(two == single,
        s"two-level banding changed the result: ${two.size} vs ${single.size} pairs")
      assert(single.nonEmpty, "differential is vacuous on an empty pair set")
    } finally spark.conf.unset(DedupOps.SimhashTwoLevelConf)
  }

  // ---- d21 variable-length suffix dedup ----

  private def suffixDup(d: org.apache.spark.sql.DataFrame) =
    graft.queries.SuffixOps.suffixDupOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("d21 catches what d9's fixed windows provably miss: a planted " +
       "1.5W shared span reports its TRUE length; a sub-W span is seen " +
       "at all") {
    val W = DedupOps.SpanWindow // 8
    // Disjoint vocabularies so nothing matches except the plants.
    val span12 = (1 to (3 * W / 2)).map(i => s"dup$i").mkString(" ") // 12 toks
    val span6 = (1 to (3 * W / 4)).map(i => s"low$i").mkString(" ")  // 6 toks
    def filler(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val d = docs(
      1L -> s"${filler("a", 5)} $span12 ${filler("b", 5)}",
      2L -> s"${filler("c", 5)} $span12 ${filler("e", 5)}",
      3L -> s"${filler("f", 5)} $span6 ${filler("g", 5)}",
      4L -> s"${filler("h", 5)} $span6 ${filler("k", 5)}")
    val d21 = suffixDup(d)
    // The 1.5W span: exact length 12, not "some windows duplicated".
    assert(d21(1L)._1 == 12 && d21(2L)._1 == 12, s"true length: $d21")
    // Its ge8 position count: starts 0..4 of the 12-token span → 5 —
    // definitionally d9's n_dup_windows.
    assert(d21(1L)._2 == 5, s"ge8 positions: ${d21(1L)}")
    // The 6-token span: d9 reports ZERO dup windows (< W is invisible to
    // fixed 8-windows); d21 reports the true length 6.
    assert(d21(3L)._1 == 6 && d21(4L)._1 == 6, s"sub-W span: $d21")
    assert(d21(3L)._2 == 0)
    val d9 = DedupOps.dupSpansOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(d9(3L) == 0 && d9(4L) == 0,
      s"d9 must be blind to the sub-W span for the differential to bite: $d9")
    assert(d9(1L) == 5 && d21(1L)._2 == d9(1L))
  }

  test("d21 offsets come from the range-partitioned two-phase prefix sum: " +
       "exact against the sequential model, across many partitions, with " +
       "no window in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(2111L)
    // Unsorted input, more rows than shuffle partitions, skewed lengths —
    // the shape that exercises partition boundaries and empty partitions.
    val lens = rnd.shuffle((1L to 257L).toVector)
      .map(id => (id, rnd.nextInt(50).toLong))
    val df = graft.queries.SuffixOps.prefixOffsets(
      lens.toDF("doc_id", "n"))
    assert(df.rdd.getNumPartitions > 1, "prefix sum must stay distributed")
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "the two-phase prefix sum must not plan a window")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var acc = 0L
    lens.sortBy(_._1).foreach { case (id, n) =>
      assert(got(id) == acc, s"doc $id: off=${got(id)}, want $acc")
      acc += n + 1L
    }
  }

  test("d19 broadcast guard sizes shingles in OCTETS: a multi-byte corpus " +
       "measures its UTF-8 bytes, not its character count") {
    import spark.implicits._
    // 3-byte CJK chars: 4 shingles x 10 chars = 40 chars but 120 octets.
    val multi = Seq(Seq.fill(4)("世" * 10)).toDF("shingles")
    val ascii = Seq(Seq.fill(4)("a" * 10)).toDF("shingles")
    val multiBytes = DedupOps.shinglePayloadBytes(multi)
    val asciiBytes = DedupOps.shinglePayloadBytes(ascii)
    assert(asciiBytes == 4L * (10 + 24), s"ascii payload: $asciiBytes")
    assert(multiBytes == 4L * (30 + 24),
      s"multi-byte payload must count octets: $multiBytes")
    assert(multiBytes == asciiBytes + 4L * 20,
      "the guard boundary moves by exactly the extra UTF-8 bytes")
  }

  test("d21 n_dup_pos_ge8 equals d9 n_dup_windows on the corpus (the new " +
       "operator embeds the old one)") {
    val sf = SparkTestBase.sf
    val d21 = graft.queries.SuffixOps.queries("d21_suffix_dup")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val d9 = DedupOps.queries("d9_dup_spans")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // d9 emits rows only for docs with >= W tokens; d21 for all docs.
    d9.foreach { case (id, nw) =>
      assert(d21(id) == nw, s"doc $id: d21 ge8=${d21(id)} vs d9 windows=$nw")
    }
    assert(d9.nonEmpty && d21.values.exists(_ > 0),
      "cross-check is vacuous without duplicated windows")
  }

  test("d21 brute-force differential: random corpora match a local " +
       "longest-repeat model exactly") {
    val rnd = new scala.util.Random(2109L)
    for (trial <- 1 to 3) {
      val vocab = (1 to 12).map(i => s"w$i")
      val corpus = (1L to 8L).map { id =>
        id -> (1 to (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = suffixDup(docs(corpus: _*))
      // Local model: dupLen(p) = longest l such that the l-gram at p occurs
      // at least twice corpus-wide; per doc max + ge8 count.
      val toks = corpus.toMap.view.mapValues(_.split("\\s+").toSeq).toMap
      val occ = scala.collection.mutable.Map.empty[Seq[String], Int]
      for ((_, ts) <- toks; i <- ts.indices; l <- 1 to (ts.size - i))
        occ.updateWith(ts.slice(i, i + l)) { c => Some(c.getOrElse(0) + 1) }
      val want = toks.map { case (id, ts) =>
        val dls = ts.indices.map { i =>
          (0 +: (1 to (ts.size - i)).filter(l => occ(ts.slice(i, i + l)) >= 2)).max
        }
        id -> (dls.max.toLong, dls.count(_ >= 8).toLong)
      }
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("d21 edge shapes: blank twins, lone token, prefix-contained docs, " +
       "self-repeat within one doc") {
    val out = suffixDup(docs(
      1L -> "", // blank: the single empty token
      2L -> "", // blank twin → the 1-token span is shared
      3L -> "solo",
      4L -> "a b c d e f",
      5L -> "a b c d e f g h", // fully contains doc 4
      6L -> "x x x x")) // overlapping self-repeat: x-x-x at starts 0 and 1
    assert(out(1L) == (1L, 0L) && out(2L) == (1L, 0L), s"blank twins: $out")
    assert(out(3L) == (0L, 0L), s"lone unique token: $out")
    assert(out(4L) == (6L, 0L) && out(5L) == (6L, 0L),
      s"prefix containment must report the 6-token span: $out")
    assert(out(6L) == (3L, 0L), s"self-overlap longest repeat is 3: $out")
  }

  test("d21 saturation and degenerate shapes: identical docs report full " +
       "length; a unique-vocabulary doc reports zero") {
    val twin = (1 to 30).map(i => s"t$i").mkString(" ")
    val d = docs(1L -> twin, 2L -> twin, 3L -> (1 to 9).map(i => s"u$i").mkString(" "))
    val out = suffixDup(d)
    assert(out(1L) == (30L, 23L), s"identical 30-token docs: $out") // starts 0..22 ge8
    assert(out(2L) == (30L, 23L))
    assert(out(3L) == (0L, 0L), s"unique doc must report zero: $out")
  }
}

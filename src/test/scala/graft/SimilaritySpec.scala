package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN: IVF scale-path results vs the brute-force baseline. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("ivf top-k: deterministic, k results, subset quality vs brute force") {
    val brute = SparkEntry.queries("ann_brute_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0)).toSet
    val ivf1 = SparkEntry.queries("ann_ivf_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0)).toSeq
    val ivf2 = SparkEntry.queries("ann_ivf_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf1 == ivf2, "IVF result must be deterministic")
    assert(ivf1.size == 10)
    // probing 3/10 cells: recall against exact top-10 should be non-trivial
    val recall = ivf1.toSet.intersect(brute).size / 10.0
    assert(recall >= 0.2, s"IVF recall $recall too low")
  }

  test("mmr rerank: selection comes from the pool, leads with pure " +
       "relevance, and winning scores never increase") {
    import graft.queries.SimilarityOps.{MmrK, MmrPoolK}
    val brute = SparkEntry.queries("ann_brute_topk")(spark, SparkTestBase.sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(brute.length == MmrPoolK)
    val mmr = SparkEntry.queries("ann_mmr_rerank")(spark, SparkTestBase.sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("score_micro")))
      .sortBy(_._2)
    assert(mmr.length == MmrK)
    assert(mmr.map(_._2).toSeq == (1 to MmrK))
    // Selection ⊆ pool; no repeats.
    val pool = brute.map(_._1).toSet
    assert(mmr.forall(m => pool.contains(m._1)))
    assert(mmr.map(_._1).distinct.length == MmrK)
    // Pick 1 = the relevance argmax (empty selected set ⇒ pure relevance),
    // scored 0.7·rel.
    assert(mmr.head._1 == brute.head._1)
    assert(mmr.head._3 == math.round(0.7 * brute.head._2 * 1e6))
    // Greedy argmax over a shrinking candidate set with a growing
    // penalty: the winning marginal score is non-increasing in rank.
    mmr.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"MMR scores must not increase: $a -> $b")
    }
    // Determinism.
    val again = SparkEntry.queries("ann_mmr_rerank")(spark, SparkTestBase.sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("score_micro"))).sortBy(_._2)
    assert(again.sameElements(mmr))
  }

  test("brute-force top-k is ordered by cosine desc") {
    val rows = SparkEntry.queries("ann_brute_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getDouble(1))
    assert(rows.sameElements(rows.sortBy(-_)))
  }

  test("kmeans: total assignment, bounded cluster ids, deterministic") {
    val n = graft.Tables.embeddings(spark, SparkTestBase.sf).count()
    val a1 = SparkEntry.queries("vq_kmeans")(spark, SparkTestBase.sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = SparkEntry.queries("vq_kmeans")(spark, SparkTestBase.sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1.size.toLong == n, "every vector assigned exactly once")
    assert(a1.values.forall(c => c >= 0 && c < graft.queries.SimilarityOps.KmeansK))
    assert(a1 == a2, "assignment must be deterministic")
    // The refined clustering should use more than one cluster on real data.
    assert(a1.values.toSet.size > 1)
  }

  test("kmeans: WCSS is monotone non-increasing in Lloyd rounds") {
    import org.apache.spark.sql.functions._
    def wcss(rounds: Int): Double = {
      spark.conf.set("spark.graft.kmeans.rounds", rounds.toString)
      try SparkEntry.queries("vq_kmeans")(spark, SparkTestBase.sf)
        .agg(sum(col("dist_sq"))).head.getDouble(0)
      finally spark.conf.unset("spark.graft.kmeans.rounds")
    }
    // Lloyd's algorithm: each assignment and each mean update can only
    // lower the within-cluster sum of squares. The cents rounding in the
    // exact-mean trick perturbs each coordinate by ≤ 5e-8, so allow a
    // proportional epsilon rather than exact monotonicity.
    val w = (1 to 3).map(wcss)
    w.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-6) + 1e-6, s"WCSS increased across rounds: $w")
    }
  }

  test("semdedup: identical planted vectors are flagged, keeper is min id") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 64 dims: random-direction cosines concentrate near 0 (σ ≈ 1/8), so
    // noise stays safely under the 0.3 threshold; at 8 dims (σ ≈ 0.35)
    // noise itself would trip it.
    val dim = 64
    // 40 spread-out noise vectors + an identical pair (100, 101).
    val noise = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        math.sin(i * 37 + j * 13).toFloat), i % 4)
    }
    val v = Array.tabulate(dim)(j => (0.5f + j * 0.01f))
    val rows = noise ++ Seq((100L, v, 0), (101L, v.clone(), 0))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = SparkEntry.queries("pipe_semdedup")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(101L), "the higher id of an identical pair is a semantic dup")
    assert(!out(100L), "the keeper (min id) is not flagged")
  }

  test("vq_pq_topk: re-ranked distances are TRUE distances, recall beats coarse ADC") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestBase.sf
    val got = SparkEntry.queries("vq_pq_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    // Stage-2 contract: dist_sq is the EXACT distance (same fold as the
    // brute-force path), not a quantized reconstruction.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.queries.SimilarityOps.vDouble(col("embedding")).as("v"))
    val qv = e.where(col("vec_id") === 0).head.getSeq[Double](1).toArray
    import spark.implicits._
    val truth = e.where(col("vec_id") =!= 0)
      .withColumn("d", graft.queries.SimilarityOps.distSq(col("v"),
        typedLit(qv.toSeq)))
      .select(col("vec_id"), col("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, d) =>
      assert(d == truth(id), s"vec $id: re-rank dist $d != true ${truth(id)}")
    }
    // Recall floor vs the exact top-10: the oversampled shortlist + exact
    // re-rank recovers well above the bare-ADC ordering (measured 0.1
    // without re-rank, 0.4 with, on this corpus — floor at 0.3).
    val exactTop = truth.toSeq.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recall = got.map(_._1).count(exactTop.contains) / 10.0
    assert(recall >= 0.3, s"recall@10 $recall below floor")
  }

  test("filtered ANN: exact under a highly selective predicate (where a " +
       "post-filtered fixed-probe shortlist would under-fill k)") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestBase.sf
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        graft.queries.SimilarityOps.vDouble(col("embedding")).as("v"))
    val q = e.where(col("vec_id") === 0).select(col("v").as("qv"))
    // ~1% of vectors qualify: the scattered survivors span many cells, so
    // a fixed nprobe=3 post-filter would return fewer than the matches;
    // the adaptive exact rule must return EVERY qualifying vector here
    // (matches < k), in brute-force order.
    val pred = col("vec_id") =!= 0 && pmod(col("vec_id"), lit(101)) === 1
    val filtered = e.where(pred)
    val nMatch = filtered.count()
    val cent = graft.queries.SimilarityOps.centroids(e)
    val got = graft.queries.SimilarityOps
      .ivfAdaptiveTopK(filtered, q, cent, 10)._2.collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    if (nMatch <= 10)
      assert(got.length == nMatch,
        s"selective filter: expected ALL $nMatch matches, got ${got.length}")
    val truth = filtered.crossJoin(broadcast(q))
      .withColumn("d", graft.queries.SimilarityOps.distSq(col("v"), col("qv")))
      .select(col("vec_id"), col("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = truth.toSeq.sortBy { case (id, d) => (d, id) }
      .take(10).map { case (id, d) => (id, d) }
    assert(got.toSeq == exact, s"filtered top-k != filtered brute force")
  }

  test("ann_filtered_topk: every result satisfies the predicate") {
    val rows = SparkEntry.queries("ann_filtered_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0))
    assert(rows.nonEmpty && rows.forall(id => id % 3 == 1 && id != 0))
  }

  test("ann_ivf_append: appended-index serve equals the full-corpus " +
       "adaptive top-k; delta rows flagged and re-assigned") {
    import graft.queries.SimilarityOps
    // Same vector universe (base ∪ delta == everything but the query),
    // so the appended index must return the IDENTICAL (vec_id, dist)
    // top-k the retrained full index returns — appending without
    // retraining may not change the answer, only the cell bookkeeping.
    val ap = SparkEntry.queries("ann_ivf_append")(spark, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getBoolean(3)))
    val ad = SparkEntry.queries("ann_ivf_adaptive")(spark, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ap.map(r => (r._1, r._3)).toSet == ad.toSet,
      "appended-index top-k diverges from the full adaptive top-k")
    ap.foreach { case (id, _, _, isNew) =>
      assert(isNew == (id % SimilarityOps.AnnDeltaMod == 7),
        s"vec $id: is_new flag must mark exactly the arriving delta")
    }
    assert(ap.nonEmpty)
  }

  test("margin mining: shape, flag contract, and bit-exact local model") {
    import graft.queries.SimilarityOps._
    val rows = SparkEntry.queries("ann_margin_mining")(spark, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.length == BatchQueries * MarginTopK)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to MarginTopK), s"query $q ranks")
    }
    rows.foreach { case (_, _, _, _, m, acc) =>
      assert(acc == (m >= MarginAcceptMicro), "accepted flag contract")
    }
    assert(rows.exists(_._6) && rows.exists(!_._6),
      "the corpus-calibrated threshold must split the mined pairs")

    // Local model with the query's exact fold orders — bit-exact.
    val emb = Tables.embeddings(spark, SparkTestBase.sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0d)((s, i) => s + a(i) * b(i))
      val na = math.sqrt(a.indices.foldLeft(0.0d)((s, i) => s + a(i) * a(i)))
      val nb = math.sqrt(b.indices.foldLeft(0.0d)((s, i) => s + b(i) * b(i)))
      dot / (na * nb)
    }
    val qs = emb.filter(_._1 < BatchQueries)
    val cp = emb.filter(_._1 >= BatchQueries)
    val c = cp.map { case (y, v) =>
      (y, qs.map { case (q, qv) => (q, cos(v, qv)) }) }.toMap
    // peny: largest k under ascending (cos, qid); fold ascending.
    val peny = c.map { case (y, qc) =>
      y -> qc.map { case (q, cv) => (cv, q) }.sorted.takeRight(MarginK)
        .foldLeft(0.0d)(_ + _._1) / MarginK.toDouble }
    // penx: top-k by (cos DESC, vec_id ASC); fold ascending (cos, id).
    val penx = qs.map { case (q, _) =>
      q -> cp.map { case (y, _) => (c(y).find(_._1 == q).get._2, y) }
        .sortBy { case (cv, y) => (-cv, y) }.take(MarginK)
        .sorted.foldLeft(0.0d)(_ + _._1) / MarginK.toDouble }.toMap
    val model = qs.flatMap { case (q, _) =>
      cp.map { case (y, _) =>
        val cv = c(y).find(_._1 == q).get._2
        (q, y, math.round(cv * 1e6),
          math.round(cv / ((penx(q) + peny(y)) * 0.5d) * 1e6))
      }.sortBy { case (_, y, _, m) => (-m, y) }.take(MarginTopK)
        .zipWithIndex.map { case ((qq, y, cm, m), i) =>
          (qq, y, i + 1, cm, m, m >= MarginAcceptMicro) }
    }.toSet
    assert(rows.toSet == model, "query diverges from the local margin model")
  }

  test("ivf delete: serves exactly the post-CDC brute-force top-k, " +
       "changes the pre-CDC answer, and never returns a tombstone") {
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityOps
    val sf = SparkTestBase.sf
    val out = SparkEntry.queries("ann_ivf_delete")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(out.length == 10)
    // No tombstoned or stale-upsert id can surface.
    out.foreach { case (id, _, isUp) =>
      assert(id % SimilarityOps.AnnDeleteMod != 3, s"tombstone served: $id")
      assert(isUp == (id % SimilarityOps.AnnDeleteMod == 5))
    }
    // Ground truth: brute force over kept ∪ reversed-upserts.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), SimilarityOps.vDouble(col("embedding")).as("v"))
      .where(col("vec_id") =!= 0)
    val post = e.where(col("vec_id") % SimilarityOps.AnnDeleteMod =!= 3 &&
        col("vec_id") % SimilarityOps.AnnDeleteMod =!= 5)
      .unionByName(e.where(col("vec_id") % SimilarityOps.AnnDeleteMod === 5)
        .select(col("vec_id"), reverse(col("v")).as("v")))
    val q = Tables.embeddings(spark, sf).where(col("vec_id") === 0)
      .select(SimilarityOps.vDouble(col("embedding")).as("qv"))
    val brute = post.crossJoin(broadcast(q))
      .select(col("vec_id"), SimilarityOps.distSq(col("v"), col("qv")).as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(t => (t._1, t._2)).sortBy(_._1).toSeq ==
      brute.sortBy(_._1).toSeq,
      "delete-serve must equal post-CDC brute force")
    // Non-vacuity: the CDC must actually change the served answer.
    val pre = SparkEntry.queries("ann_ivf_adaptive")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet != pre, "CDC left the top-k unchanged")
  }

  test("ivf compact: serve over the compacted layout equals the delete " +
       "path bit-for-bit, the card conserves the post-CDC corpus, and " +
       "compacted reads are exchange-free bucketed scans") {
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityOps
    val sf = SparkTestBase.sf
    val card = SparkEntry.queries("ann_ivf_compact")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (n_vectors, n_upserts)
    val compacted = SimilarityOps.compactedIndex(spark, sf)
    // Conservation: the card counts the compacted table exactly.
    assert(card.map(_._1).sum == compacted.count())
    assert(card.map(_._2).sum ==
      compacted.where(col("is_upsert")).count())
    // Serve equality: brute force over the compacted layout == the
    // delete path's served top-k (same vectors, same fold — bit-equal).
    val q = Tables.embeddings(spark, sf).where(col("vec_id") === 0)
      .select(SimilarityOps.vDouble(col("embedding")).as("qv"))
    val served = compacted.crossJoin(broadcast(q))
      .select(col("vec_id"), SimilarityOps.distSq(col("v"), col("qv")).as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val deletePath = SparkEntry.queries("ann_ivf_delete")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(served == deletePath,
      "compacted serve must equal the tombstone-path serve")
    // No tombstone machinery survives compaction: a cell-filtered read
    // of the compacted table plans without anti joins or exchanges
    // below the scan (the d14 bucket-layout discipline).
    val someCell = compacted.select("label").head().get(0)
    val plan = compacted.where(col("label") === lit(someCell))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"compacted read must be join-free:\n${plan.take(800)}")
  }

  test("ann_index_drift: populations reconcile with the compaction card, " +
       "the flag is the exact cross-multiplication, and both outcomes " +
       "occur") {
    import graft.queries.SimilarityOps
    val sf = SparkTestBase.sf
    val drift = SparkEntry.queries("ann_index_drift")(spark, sf).collect()
      .map(r => r.get(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    // n_now must BE the compaction card's per-cell population — two
    // faces of one post-CDC index definition.
    val card = SparkEntry.queries("ann_ivf_compact")(spark, sf).collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    card.foreach { case (cell, n) =>
      assert(drift(cell)._2 == n, s"cell $cell: drift n_now vs card $n")
    }
    drift.foreach { case (cell, (nb, nn, mean, flag)) =>
      assert(flag == (math.abs(nn - nb) * SimilarityOps.DriftFlagDenom >= nb),
        s"cell $cell flag rule")
      assert(nb > 0 && nn > 0 && mean > 0)
    }
    val flags = drift.values.map(_._4).toSet
    assert(flags == Set(true, false),
      s"monitor must discriminate at this corpus: $flags")
  }

  test("ivf delete plan: base membership changes ride ONE broadcast anti " +
       "join; the tombstone residue is never pushed into the base scan") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val plan = SparkEntry.queries("ann_ivf_delete")(spark, SparkTestBase.sf)
      .queryExecution.executedPlan
    val anti = helper.collectWithSubqueries(plan) {
      case j: BroadcastHashJoinExec
        if j.joinType.toString.contains("Anti") => j
    }
    assert(anti.nonEmpty, "kept side must anti-join broadcast tombstones:\n" +
      plan.toString.take(1500))
    // The opaque-id-table contract: no scan may carry the % residue as a
    // pushed filter (production tombstones are id lists, not formulas).
    val scans = plan.toString
    assert(!scans.contains("% 10) = 3"),
      "tombstone residue leaked into a pushed scan filter")
  }
}

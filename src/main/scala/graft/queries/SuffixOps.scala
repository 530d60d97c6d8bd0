package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.core.Lineage.LineageOps

/** Variable-length EXACT substring dedup (d21) — the one dedup shape the
  * fixed-window fingerprints (d9/d17, [[DedupOps.SpanWindow]] = 8) provably
  * cannot express: the TRUE longest repeated token span per document, plus
  * the count of positions opening a duplicated span of ≥ 8 tokens. Fixed
  * stride-1 windows answer "is the 8-gram at p duplicated?" but can neither
  * see a duplicated 5-token quote (< W) nor report that a repeat is exactly
  * 12 tokens long rather than 8 — Lee et al. 2022 ("Deduplicating Training
  * Data Makes Language Models Better") use suffix arrays for precisely this
  * reason.
  *
  * Engine shape — a DISTRIBUTED SUFFIX ARRAY over the corpus token stream:
  *
  *   1. The corpus is laid out as one global position axis (per-doc offsets
  *      from a cumulative length sum; one sentinel position per doc whose
  *      level-0 rank −doc_id−1 is globally unique, so no repeated span can
  *      ever cross a document boundary — any window containing a sentinel
  *      is a singleton group by construction).
  *   2. Prefix doubling, [[Levels]] rounds: rank_j(p) is the DENSE
  *      lexicographic rank of the 2^j-token window at p, built per round by
  *      range-sorting the distinct (rank_{j-1}(p), rank_{j-1}(p+2^{j-1}))
  *      pairs and assigning global sorted indices (zipWithIndex — the
  *      per-partition counts it needs are bounded driver metadata). Windows
  *      running past the sequence end coalesce to a per-position unique
  *      below-everything fallback, which keeps every rank level INJECTIVE
  *      on window content and ORDER-CONSISTENT with token-lexicographic
  *      suffix order. Each round is O(n) rows through ~4 hash/range
  *      exchanges, lineage-cut (the q_pagerank discipline) — log₂(Cap)
  *      rounds total, never an all-pairs product, never O(n²) bytes.
  *   3. Suffix-array adjacency: positions ordered by (rank_Levels, pos);
  *      for each adjacent pair the common-prefix length is computed by the
  *      classic descending-level walk (acc += 2^j when
  *      rank_j(p+acc) = rank_j(q+acc)), one rank-table join per side per
  *      level. dupLen(p) = max(LCP with SA-prev, LCP with SA-next) — exact,
  *      because every equal-prefix group is contiguous in SA order.
  *   4. Per-doc aggregate: max dupLen (reported as min(·, [[Cap]])) and the
  *      ≥ 8 position count.
  *
  * The ≥ 8 count is definitionally identical to d9's n_dup_windows
  * (dupLen(p) ≥ 8 ⟺ the 8-gram at p occurs twice corpus-wide), which the
  * spec asserts — the new operator embeds the old one as a cross-check.
  *
  * At 100 TB: suffix-array construction is inherently log(n) global sort
  * rounds over the token stream (what Lee et al. shard per corpus slice);
  * every round here shuffles only (pos, rank) longs — no token text after
  * step 1, no quadratic arm anywhere. [[Cap]] = 128 bounds the LCP walk;
  * spans longer than the cap report the cap (the corpus fixtures max out
  * at ~100 tokens/doc, so the oracle's uncapped suffix compare agrees at
  * every test SF).
  *
  * Perf adjudication (round 9, sf0.1 ≈ 17 s — the library's most
  * expensive bench line, and the honest price of its only sort-rounds
  * operator): three structural remedies were measured and all LOST —
  * AQE off (2× slower; AQE's partition coalescing carries these 276k-row
  * stages), dropping the per-step LCP cuts (neutral), and RADIX-4
  * quadrupling (4 sort rounds instead of 7, base-4 greedy walk — 40%
  * slower: the 3 shift joins + 4-tuple distinct per round cost more than
  * the rounds saved). A lossless singleton-groups early stop can't fire
  * on this corpus (exact duplicate docs keep groups alive to level ~7).
  */
object SuffixOps {
  type Q = (SparkSession, String) => DataFrame

  /** Reported dup lengths saturate here; also fixes the rank-level count. */
  val Cap = 128
  /** Rank levels 0..Levels; 2^Levels = Cap-token windows. */
  val Levels = 7
  /** Threshold for the n_dup_pos_ge8 output — d9's window, deliberately. */
  val PosThreshold: Int = DedupOps.SpanWindow

  /** Exclusive prefix sum of (n + 1) in doc_id order — per-doc global
    * offsets via the RANGE-PARTITIONED TWO-PHASE PREFIX SUM: phase 1
    * totals one (n+1) sum per range partition (bounded driver metadata,
    * one long per partition — the zipWithIndex count class), phase 2
    * streams each partition once, seeding its running sum with the
    * exclusive scan of the phase-1 totals. Every partition works in
    * parallel; no single-task cumulative window anywhere — the shape
    * that holds when the length frame is 10^10 rows, where a global
    * `Window.orderBy` would drag the whole corpus through one task.
    * Consistency between the phases: both jobs run over the SAME RDD
    * instance, so they share one shuffle dependency and the range
    * shuffle's map outputs are computed once and reused (skipped
    * stages) — the counts describe exactly the partitions phase 2
    * streams. This same-RDD reuse is load-bearing: two separate
    * DataFrame actions would each re-run the range shuffle, and
    * re-evaluation can sample DIFFERENT boundaries (upstream
    * intra-partition row order is not stable), desyncing the phases —
    * measured and caught in the round-11 sortedIndex adjudication.
    */
  private[graft] def prefixOffsets(lens: DataFrame): DataFrame = {
    val spark = lens.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = lens.select(col("doc_id"), col("n"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator.single(i -> it.foldLeft(0L)((a, r) => a + r.getLong(1) + 1L))
    }.collect().toMap
    val bases = new Array[Long](rdd.getNumPartitions)
    var acc = 0L
    for (i <- bases.indices) { bases(i) = acc; acc += totals.getOrElse(i, 0L) }
    val schema = sorted.schema.add("off", LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bases(i)
      it.map { r =>
        val o = run; run += r.getLong(1) + 1L
        Row(r.getLong(0), r.getLong(1), o)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Global sorted-index assignment: range-sort `df` by `keys`, then label
    * rows with their global sort position (dense rank when the input is
    * distinct). zipWithIndex's extra job collects one count per partition —
    * bounded driver metadata, never row data. This is the only imperative
    * seam in the operator; everything else is declarative.
    *
    * Round-11 adjudication — a "pure-codegen" replacement (per-partition
    * counts + monotonically_increasing_id's low-33-bit ordinal, the
    * prefixOffsets shape) was measured and LOST TWICE OVER. Without a
    * lineage cut it is WRONG: the counts aggregate and the ordinal
    * projection are separate actions, each re-running the range shuffle,
    * and re-evaluation can sample different boundaries (upstream
    * intra-partition row order is not stable across evaluations) —
    * caught by the d21≡d9 corpus cross-check. With the cut it is
    * correct but 3–4× SLOWER at sf0.1 (~98 s vs ~21–31 s): eagerly
    * materializing every doubling round's pair table costs far more
    * than zipWithIndex's Row round-trip, because zipWithIndex's count
    * job and compute job share one RDD lineage and therefore ONE
    * range-shuffle execution (map outputs reused across jobs) — the
    * same-RDD shuffle reuse is load-bearing and a two-action DataFrame
    * rewrite forfeits it.
    */
  private def sortedIndex(df: DataFrame, keys: Seq[String], out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** (doc_id, max_dup_tokens, n_dup_pos_ge8) per document. */
  def suffixDupOf(docs0: DataFrame): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val docs = docs0.select(col("doc_id"), toks.as("toks"))

    // Per-doc global offsets: off(d) = Σ_{d'<d} (n_{d'} + 1) — the +1 is the
    // sentinel slot. Computed by [[prefixOffsets]]'s range-partitioned
    // two-phase prefix sum (every partition in parallel; no global-order
    // window), cut once — offs feeds both the position axis and the
    // sentinel frame.
    val lens0 = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val offs = graft.core.Lineage.cut(prefixOffsets(lens0))
    val lens = offs.select(col("doc_id"), col("n"))

    // Position axis: real token positions (maxl = tokens remaining in doc,
    // capped) + one sentinel per doc with a unique negative level-0 rank.
    val real = docs.join(offs, Seq("doc_id"))
      .select(col("doc_id"), col("off"), col("n"), posexplode(col("toks")))
      .select(col("doc_id"), (col("off") + col("pos")).as("pos"),
        least(col("n") - col("pos"), lit(Cap.toLong)).as("maxl"),
        col("col").as("tok"))
    // Level-0 ranks: dense sorted index over the distinct token vocabulary
    // (Zipf-bounded, the BPE/bm25 budget class) — order-consistent with
    // token order, which the SA adjacency proof needs.
    val vocab = sortedIndex(real.select(col("tok")).distinct(), Seq("tok"), "r0")
      .withColumn("r0", col("r0") + 1L) // keep 0 free of semantic meaning
    val realR = real.join(vocab, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("maxl"), col("r0").as("rk"))
    val sent = offs.select(col("doc_id"), (col("off") + col("n")).as("pos"),
      lit(0L).as("maxl"), (-col("doc_id") - 1L).as("rk"))

    var r = realR.unionByName(sent)
      .select(col("doc_id"), col("pos"), col("maxl"),
        array(col("rk")).as("rs"), col("rk"))
      .cutLineage

    // Prefix doubling: Levels rounds, each a shift join + distinct-pair
    // sorted-index + join back. Fallback for past-end windows is a unique
    // below-everything value per position (Long.MinValue + pos), keeping
    // rank levels injective and order-consistent.
    for (j <- 1 to Levels) {
      val d = 1L << (j - 1)
      val shifted = r.select((col("pos") - d).as("pos"), col("rk").as("rk2"))
      val paired = r.join(shifted, Seq("pos"), "left")
        .withColumn("rk2f", coalesce(col("rk2"), lit(Long.MinValue) + col("pos")))
      val ranked = sortedIndex(
        paired.select(col("rk"), col("rk2f")).distinct(), Seq("rk", "rk2f"), "nrk")
      r = paired.join(ranked, Seq("rk", "rk2f"))
        .select(col("doc_id"), col("pos"), col("maxl"),
          concat(col("rs"), array(col("nrk"))).as("rs"), col("nrk").as("rk"))
        .cutLineage
    }

    // SA order over REAL positions (sentinels are lookup-only); pos breaks
    // ties between suffixes equal through the full Cap window.
    val sa = sortedIndex(r.where(col("maxl") > 0), Seq("rk", "pos"), "sa")
      .cutLineage
    val lookup = r.select(col("pos"), col("rs"))

    // Adjacent pairs in SA order, then the descending-level LCP walk.
    val a = sa.select(col("sa"), col("doc_id").as("doc_a"), col("pos").as("p"))
    val b = sa.select((col("sa") - 1L).as("sa"), col("doc_id").as("doc_b"),
      col("pos").as("q"))
    var adj = a.join(b, Seq("sa"))
      .select(col("doc_a"), col("p"), col("doc_b"), col("q"), lit(0L).as("acc"))
      .cutLineage
    for (j <- Levels to 0 by -1) {
      val step = 1L << j
      val ra = lookup.select(col("pos").as("pa"), col("rs").as("rsa"))
      val rb = lookup.select(col("pos").as("pb"), col("rs").as("rsb"))
      adj = adj
        .join(ra, col("pa") === col("p") + col("acc"), "left")
        .join(rb, col("pb") === col("q") + col("acc"), "left")
        .withColumn("acc",
          when(element_at(col("rsa"), j + 1) === element_at(col("rsb"), j + 1),
            col("acc") + step).otherwise(col("acc")))
        .select(col("doc_a"), col("p"), col("doc_b"), col("q"), col("acc"))
        .cutLineage
    }

    // dupLen(p) = max LCP with either SA neighbor; per-doc rollup (docs with
    // no SA pair at all — a one-position corpus — coalesce to zero).
    val perPos = adj.select(col("doc_a").as("doc_id"), col("p").as("pos"), col("acc"))
      .unionByName(adj.select(col("doc_b").as("doc_id"), col("q").as("pos"), col("acc")))
      .groupBy(col("doc_id"), col("pos"))
      .agg(max(col("acc")).as("dl"))
    val perDoc = perPos.groupBy("doc_id")
      .agg(least(max(col("dl")), lit(Cap.toLong)).as("max_dup_tokens"),
        sum(when(col("dl") >= PosThreshold, 1L).otherwise(0L)).as("n_dup_pos_ge8"))
    lens.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_dup_tokens"), lit(0L)).as("max_dup_tokens"),
        coalesce(col("n_dup_pos_ge8"), lit(0L)).as("n_dup_pos_ge8"))
  }

  private val suffixDup: Q = (s, d) => suffixDupOf(Tables.documentsSpread(s, d))

  val queries: Map[String, Q] = Map(
    "d21_suffix_dup" -> suffixDup,
  )

  /** The oracle computes the SAME per-position dupLen by the direct route
    * the engine cannot afford at scale: materialize every suffix as a token
    * list (O(n²) list cells — fine at oracle SF, the d4/d5 eval-arm class),
    * sort suffixes (token lists joined on chr(1), which sorts below every
    * token character, so joined-string order == token-lexicographic order),
    * and take each suffix's max common prefix with its two sort neighbors —
    * the identical max-adjacent-LCP argument the engine's SA adjacency
    * uses.
    */
  private val lcpWith: String => String = other =>
    // list_position returns 0 (not NULL) for an absent element → nullif
    // routes the all-match case to the min-length fallback.
    s"""CASE WHEN $other IS NULL THEN 0 ELSE coalesce(
       |  nullif(list_position(list_transform(
       |    generate_series(1, least(len(suf), len($other))),
       |    k -> suf[CAST(k AS INT)] = $other[CAST(k AS INT)]), false), 0) - 1,
       |  least(len(suf), len($other))) END""".stripMargin

  val oracle: Map[String, String] = Map(
    "d21_suffix_dup" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
         |p AS (SELECT doc_id, CAST(i AS INT) AS i,
         |        list_slice(toks, CAST(i AS INT), len(toks)) AS suf
         |      FROM t, unnest(generate_series(1, len(toks))) AS g(i)),
         |o AS (SELECT doc_id, suf,
         |        lag(suf)  OVER (ORDER BY array_to_string(suf, chr(1)), doc_id, i) AS pv,
         |        lead(suf) OVER (ORDER BY array_to_string(suf, chr(1)), doc_id, i) AS nx
         |      FROM p),
         |l AS (SELECT doc_id,
         |        least(greatest(${lcpWith("pv")}, ${lcpWith("nx")}), $Cap) AS dl
         |      FROM o)
         |SELECT doc_id,
         |  CAST(coalesce(max(dl), 0) AS BIGINT) AS max_dup_tokens,
         |  CAST(count(CASE WHEN dl >= $PosThreshold THEN 1 END) AS BIGINT) AS n_dup_pos_ge8
         |FROM l GROUP BY doc_id""".stripMargin,
  )
}

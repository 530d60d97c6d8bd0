package graft.queries

import org.apache.spark.{Partitioner, RangePartitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

import graft.Tables

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
  *      is a singleton group by construction). The axis is DENSE: every
  *      integer in [0, N) is exactly one real token or one sentinel. That
  *      density is the round-12 optimization lever — "the rank d positions
  *      ahead" is a co-partitioned neighbour, not a join.
  *   2. Prefix doubling, [[Levels]] rounds: rank_j(p) is an injective,
  *      ORDER-NESTED rank of the 2^j-token window at p: rows range-sorted
  *      by (rank_{j-1}(p), rank_{j-1}(p+2^{j-1})) take the GLOBAL INDEX OF
  *      THEIR EQUAL-KEY RUN'S FIRST ROW as the new rank. Run-start indices
  *      are injective on window content and increase with the sort order,
  *      which is all the adjacency proof needs (density of the rank values
  *      is NOT required — only that each level's order is lexicographic in
  *      the previous level's pair). Windows running past the sequence end
  *      coalesce to a per-position unique below-everything fallback
  *      (Long.MinValue + pos), keeping every rank level injective. Each
  *      round is exactly TWO n-row exchanges — the rank range-sort and the
  *      re-partition back to position order — plus three bounded-metadata
  *      jobs (partition heads for the dense shift, the RangePartitioner
  *      sample, per-partition run metadata); never an all-pairs product,
  *      never O(n²) bytes. Round-12 rework: the previous DataFrame shape
  *      paid ~6 exchanges/round (shift hash-join both sides, pair distinct,
  *      range-sort of the distinct pairs, 2-exchange join-back) plus a full
  *      AQE/codegen replan per round; at sf0.1 the doubling phase measured
  *      ~21-38 s of d21's 35.6 s. The RDD form shuffles the same rows
  *      through 2 exchanges with no per-round plan compilation.
  *   3. Suffix-array adjacency: positions ordered by (rank_Levels, pos) —
  *      which is exactly the final round's sort order, so the SA is read
  *      off the round-7 output directly (consecutive real rows per
  *      partition + one boundary pair per partition seam, bounded driver
  *      metadata); no extra sort, no self-join. For each adjacent pair the
  *      common-prefix length is computed by the classic descending-level
  *      walk (acc += 2^j when rank_j(p+acc) = rank_j(q+acc)). The level-7
  *      comparison is the pair's own same-run flag (equal rank_7 ⟹ LCP ≥
  *      2^7 = Cap, frozen at Cap — identical after the output cap); levels
  *      6..0 probe the position-partitioned round-6 state by sorted
  *      co-partitioned merge (probes range-partitioned by target position
  *      and sorted, then zipped against the position-sorted rank state —
  *      O(1) memory per task, no hash join, no plan). dupLen(p) = max(LCP
  *      with SA-prev, LCP with SA-next) — exact, because every equal-prefix
  *      group is contiguous in SA order.
  *   4. Per-doc aggregate: max dupLen (reported as min(·, [[Cap]])) and the
  *      ≥ 8 position count.
  *
  * The ≥ 8 count is definitionally identical to d9's n_dup_windows
  * (dupLen(p) ≥ 8 ⟺ the 8-gram at p occurs twice corpus-wide), which the
  * spec asserts — the new operator embeds the old one as a cross-check.
  *
  * At 100 TB: suffix-array construction is inherently log(n) global sort
  * rounds over the token stream (what Lee et al. shard per corpus slice);
  * every round here shuffles only (pos, rank-history) longs — no token
  * text after step 1, no quadratic arm anywhere. All driver-side state is
  * bounded metadata: ≤ 64 (pos, rank) heads per partition for the dense
  * shift, one (count, first/last key, last-run offset) tuple per partition
  * for rank assignment, one first/last row per partition for SA seams.
  * [[Cap]] = 128 bounds the LCP walk; spans longer than the cap report the
  * cap (the corpus fixtures max out at ~100 tokens/doc, so the oracle's
  * uncapped suffix compare agrees at every test SF).
  *
  * Perf adjudication (round 9, kept for the record): AQE off (2× slower on
  * the old DataFrame shape), dropping per-step LCP cuts (neutral), RADIX-4
  * quadrupling (40% slower: 3 shift joins + 4-tuple distinct per round cost
  * more than the rounds saved). Round 11: replacing zipWithIndex with a
  * two-action DataFrame rank rewrite was wrong uncut / 3-4× slower cut —
  * the round-12 RDD form keeps every two-job phase on ONE RDD instance so
  * the two jobs share a single shuffle execution (the same-RDD reuse that
  * adjudication proved load-bearing).
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
  private[graft] def prefixOffsets(lens: DataFrame): DataFrame =
    prefixOffsetsTotal(lens)._1

  /** [[prefixOffsets]] plus the grand total Σ(n+1) — the position-axis
    * length N, already summed on the driver by phase 1; callers that need
    * N (the dense-axis partitioner) read it here instead of paying an
    * extra aggregate job. */
  private[graft] def prefixOffsetsTotal(lens: DataFrame): (DataFrame, Long) = {
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
    (spark.createDataFrame(out, schema), acc)
  }

  /** Contiguous-range partitioner over the dense position axis [0, n):
    * partition i owns positions [i·n/parts, (i+1)·n/parts). Needs no
    * sampling job (density makes the split exact and balanced), and probe
    * keys ≥ n clamp into the last partition, where the sorted merge simply
    * finds no match. */
  private final class PosPartitioner(parts: Int, n: Long) extends Partitioner {
    require(parts > 0 && n > 0)
    override def numPartitions: Int = parts
    override def getPartition(key: Any): Int = {
      val p = key.asInstanceOf[Long]
      if (p < 0L) 0
      else math.min(parts - 1, (p / math.max(1L, (n + parts - 1) / parts)).toInt)
    }
  }

  /** Per-position state flowing through the doubling rounds:
    * (doc id, real-token flag payload maxl, rank history rs[0..j]). */
  private type PosState = (Long, Long, Array[Long])
  /** One SA-adjacent suffix pair mid-walk: (doc_a, p, doc_b, q, acc). */
  private type Pair = (Long, Long, Long, Long, Long)

  /** Range-sort `keyed` by (key, pos) and tag every row with the GLOBAL
    * INDEX of its equal-key run's first row — an injective, order-nested
    * rank over the key space in ONE n-row exchange (no distinct, no
    * join-back). The per-partition run metadata (count, first/last key,
    * local offset of the last run's start) is one tuple per partition —
    * bounded driver metadata — and run chains across partition seams are
    * resolved on the driver. The metadata job and the assignment run on
    * the SAME sorted RDD instance, so they share one shuffle execution
    * (the same-RDD reuse the round-11 sortedIndex adjudication proved
    * load-bearing). */
  private def runStartRanks[K, V](keyed: RDD[((K, Long), V)], parts: Int)(
      implicit ordK: Ordering[K],
      ctK: scala.reflect.ClassTag[(K, Long)],
      ctV: scala.reflect.ClassTag[V]): RDD[((K, Long), (V, Long))] = {
    val sc = keyed.context
    val rp = new RangePartitioner(parts, keyed)
    val sorted = keyed.repartitionAndSortWithinPartitions(rp)
    val meta = sorted.mapPartitionsWithIndex { (i, it) =>
      var cnt = 0L
      var firstK: Option[K] = None
      var lastK: Option[K] = None
      var lastRunStart = 0L
      it.foreach { case ((k, _), _) =>
        if (cnt == 0L) firstK = Some(k)
        else if (lastK.get != k) lastRunStart = cnt
        lastK = Some(k)
        cnt += 1L
      }
      Iterator.single((i, cnt, firstK, lastK, lastRunStart))
    }.collect().sortBy(_._1)
    val nParts = sorted.getNumPartitions
    val bases = new Array[Long](nParts)
    val carried = Array.fill[Long](nParts)(-1L) // -1: leading run starts here
    var acc = 0L
    var prevLast: Option[K] = None // last key of the nearest non-empty part
    var prevG = -1L                // global start of its run
    meta.foreach { case (i, cnt, firstK, lastK, lastRunStart) =>
      bases(i) = acc
      if (cnt > 0L) {
        val continued = prevLast.isDefined && firstK == prevLast
        if (continued) carried(i) = prevG
        prevG =
          if (lastRunStart > 0L || !continued) bases(i) + lastRunStart
          else prevG // whole partition is one run continuing from before
        prevLast = lastK
        acc += cnt
      }
    }
    val basesB = sc.broadcast(bases)
    val carriedB = sc.broadcast(carried)
    sorted.mapPartitionsWithIndex({ (i, it) =>
      val base = basesB.value(i)
      val carry = carriedB.value(i)
      var idx = 0L
      var prevK: Option[K] = None
      var runVal = 0L
      it.map { case ((k, pos), v) =>
        if (idx == 0L) runVal = if (carry >= 0L) carry else base
        else if (prevK.get != k) runVal = base + idx
        prevK = Some(k)
        idx += 1L
        ((k, pos), (v, runVal))
      }
    }, preservesPartitioning = true)
  }

  /** (doc_id, max_dup_tokens, n_dup_pos_ge8) per document. */
  def suffixDupOf(docs0: DataFrame): DataFrame = {
    val spark = docs0.sparkSession
    val sc = spark.sparkContext
    val toks = split(trim(col("text")), "\\s+")
    val docs = docs0.select(col("doc_id"), toks.as("toks"))

    // Per-doc global offsets: off(d) = Σ_{d'<d} (n_{d'} + 1) — the +1 is the
    // sentinel slot. Computed by [[prefixOffsets]]'s range-partitioned
    // two-phase prefix sum (every partition in parallel; no global-order
    // window); N (the dense-axis length) falls out of phase 1 for free.
    val lens0 = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val (offs0, totalN) = prefixOffsetsTotal(lens0)
    val offs = graft.core.Lineage.cut(offs0)
    val lens = offs.select(col("doc_id"), col("n"))
    val zero: DataFrame = lens.select(col("doc_id"),
      lit(0L).as("max_dup_tokens"), lit(0L).as("n_dup_pos_ge8"))
    if (totalN <= 0L) return zero

    // Position axis: real token positions (maxl = tokens remaining in doc,
    // capped — used as the real/sentinel discriminator downstream) + one
    // sentinel per doc with a unique negative level-0 rank.
    val real = docs.join(offs, Seq("doc_id"))
      .select(col("doc_id"), col("off"), col("n"), posexplode(col("toks")))
      .select(col("doc_id"), (col("off") + col("pos")).as("pos"),
        least(col("n") - col("pos"), lit(Cap.toLong)).as("maxl"),
        col("col").as("tok"))
    val parts = math.max(1, math.min(
      spark.sessionState.conf.numShufflePartitions,
      math.max(1L, totalN / 16L).min(Int.MaxValue.toLong).toInt))
    val posPart = new PosPartitioner(parts, totalN)

    // Level-0 ranks: run-start index over the token-sorted real positions —
    // injective on token content (Zipf-bounded vocabulary never needs a
    // distinct pass or a join-back; any injective token order satisfies
    // the adjacency proof, and the run-start index is the deterministic
    // lexicographic one). Sentinels join the axis with their unique
    // negative ranks.
    val ranked0 = runStartRanks(
      real.rdd.map(r => ((r.getString(3), r.getLong(1)), (r.getLong(0), r.getLong(2)))),
      parts)
    val sentRdd: RDD[(Long, PosState)] = offs.select(col("doc_id"),
        (col("off") + col("n")).as("pos")).rdd
      .map(r => (r.getLong(1), (r.getLong(0), 0L, Array(-r.getLong(0) - 1L))))

    // State: pos → (doc, maxl, rs[0..j]), range-partitioned and sorted by
    // the dense position axis.
    var st: RDD[(Long, PosState)] = ranked0
      .map { case ((_, pos), ((doc, maxl), rk0)) => (pos, (doc, maxl, Array(rk0))) }
      .union(sentRdd)
      .repartitionAndSortWithinPartitions(posPart)
    // The walk's rank lookup is the round-6 state (levels 0..6); level 7 is
    // the pair's own same-run flag.
    var lookup: RDD[(Long, PosState)] = null
    // Round-7 output in final (rank_7, pos) order — the suffix array.
    var saOrdered: RDD[(((Long, Long), Long), (PosState, Long))] = null

    for (j <- 1 to Levels) {
      if (j == Levels) {
        lookup = st
        lookup.persist(StorageLevel.MEMORY_AND_DISK)
      }
      val d = (1L << (j - 1)).toInt
      // Dense shift: the rank at pos+d is the row d ahead in position
      // order — same partition via a length-d lookahead buffer, next
      // partitions via the collected heads (≤ d rows per partition,
      // bounded driver metadata; this job also executes the position
      // shuffle the later jobs of this round reuse).
      val heads: Array[(Long, Long)] = st.mapPartitions(
        it => it.take(d).map { case (p, (_, _, rs)) => (p, rs.last) },
        preservesPartitioning = true).collect()
      val headsB = sc.broadcast(heads)
      val n = totalN
      val keyed: RDD[(((Long, Long), Long), PosState)] = st.mapPartitions { it =>
        val hs = headsB.value
        def headRank(t: Long): Long = {
          var lo = 0; var hi = hs.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val hp = hs(mid)._1
            if (hp == t) return hs(mid)._2
            else if (hp < t) lo = mid + 1 else hi = mid - 1
          }
          throw new IllegalStateException(s"dense shift: position $t not in heads")
        }
        val q = new java.util.ArrayDeque[(Long, PosState)](d + 1)
        def emit(h: (Long, PosState), rk2: Long): (((Long, Long), Long), PosState) =
          (((h._2._3.last, rk2), h._1), h._2)
        val main = it.flatMap { row =>
          q.addLast(row)
          if (q.size > d) {
            val h = q.pollFirst()
            Iterator.single(emit(h, row._2._3.last))
          } else Iterator.empty
        }
        def drain(): Iterator[(((Long, Long), Long), PosState)] = {
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(((Long, Long), Long), PosState)]
          while (!q.isEmpty) {
            val h = q.pollFirst()
            val t = h._1 + d
            // Past the global end: unique below-everything fallback —
            // keeps the level injective without a real partner.
            val rk2 = if (t < n) headRank(t) else Long.MinValue + h._1
            buf += emit(h, rk2)
          }
          buf.iterator
        }
        main ++ drain()
      }
      // New rank = global index of the (rank_{j-1}(p), rank_{j-1}(p+d))
      // run's first row in range order — one n-row exchange per level.
      val withRanks = runStartRanks(keyed, parts)
      if (j == Levels) {
        // Final round: the sort order (rank_6 pair, pos) IS (rank_7, pos) —
        // the suffix array. Keep it; no further position pass is needed.
        saOrdered = withRanks
      } else {
        st = withRanks
          .map { case ((_, pos), ((doc, maxl, rs), nrk)) =>
            (pos, (doc, maxl, rs :+ nrk)) }
          .repartitionAndSortWithinPartitions(posPart)
      }
    }

    // SA adjacency straight off the final order: consecutive REAL rows per
    // partition + one boundary pair per partition seam (first/last real row
    // per partition — bounded driver metadata). Equal rank_7 ⟹ the suffixes
    // agree through the full Cap window ⟹ LCP ≥ Cap: freeze the pair at Cap
    // (identical to walking it, after the output cap).
    val seams = saOrdered.mapPartitionsWithIndex { (i, it) =>
      val reals = it.filter(_._2._1._2 > 0L)
      var first: (Long, Long, Long) = null // (doc, pos, rk7)
      var last: (Long, Long, Long) = null
      reals.foreach { case ((_, pos), ((doc, _, _), rk7)) =>
        val t = (doc, pos, rk7)
        if (first == null) first = t
        last = t
      }
      Iterator.single((i, Option(first), Option(last)))
    }.collect().sortBy(_._1)
    val boundaryPairs = scala.collection.mutable.ArrayBuffer.empty[Pair]
    var prevReal: (Long, Long, Long) = null
    seams.foreach { case (_, firstO, lastO) =>
      firstO.foreach { f =>
        if (prevReal != null)
          boundaryPairs += ((prevReal._1, prevReal._2, f._1, f._2,
            if (prevReal._3 == f._3) Cap.toLong else 0L))
      }
      lastO.foreach(l => prevReal = l)
    }
    val localPairs: RDD[Pair] = saOrdered.mapPartitions { it =>
      val reals = it.filter(_._2._1._2 > 0L)
      var prev: (Long, Long, Long) = null
      reals.flatMap { case ((_, pos), ((doc, _, _), rk7)) =>
        val cur = (doc, pos, rk7)
        val out =
          if (prev != null)
            Iterator.single((prev._1, prev._2, cur._1, cur._2,
              if (prev._3 == cur._3) Cap.toLong else 0L): Pair)
          else Iterator.empty
        prev = cur
        out
      }
    }
    val allPairs = localPairs.union(sc.parallelize(boundaryPairs.toSeq,
      math.max(1, math.min(parts, boundaryPairs.size))))
    val frozen = allPairs.filter(_._5 > 0L)

    // Descending-level LCP walk over the unfrozen pairs: per level, probe
    // rank_j at p+acc and q+acc by sorted co-partitioned merge against the
    // position-ordered round-6 state — probes range-partitioned by target
    // position and sorted in the same shuffle, then streamed against the
    // lookup iterator (O(1) memory, no hash join). Absent targets (past the
    // corpus end) never match, mirroring the old left-join + null compare.
    val Absent = Long.MinValue
    val lookupRdd = lookup
    // One probe pass: carry each pair (plus an in-flight long) keyed by its
    // target position, sorted-merge against the lookup, emit the rank_level
    // at the target (Absent when the target is past the corpus end — it
    // then never compares equal, mirroring the old left-join null compare).
    def probeRank(rdd: RDD[(Pair, Long)], target: Pair => Long, level: Int)
        : RDD[(Pair, Long, Long)] = {
      val keyed = rdd.map { case (pr, carried) => ((target(pr), pr, carried), ()) }
      implicit val ord: Ordering[(Long, Pair, Long)] = Ordering.by(_._1)
      val sortedProbes = keyed.repartitionAndSortWithinPartitions(
        new Partitioner {
          override def numPartitions: Int = parts
          override def getPartition(key: Any): Int =
            posPart.getPartition(key.asInstanceOf[(Long, Pair, Long)]._1)
        })
      sortedProbes.zipPartitions(lookupRdd) { (itP, itL) =>
        var cur: (Long, PosState) = null
        var curValid = false
        itP.map { case ((t, pr, carried), _) =>
          while ((!curValid || cur._1 < t) && itL.hasNext) {
            cur = itL.next(); curValid = true
          }
          val r = if (curValid && cur._1 == t) cur._2._3(level) else Absent
          (pr, carried, r)
        }
      }
    }
    var walk: RDD[Pair] = allPairs.filter(_._5 == 0L)
    for (j <- (Levels - 1) to 0 by -1) {
      val step = 1L << j
      val withA = probeRank(walk.map(pr => (pr, Absent)), pr => pr._2 + pr._5, j)
        .map { case (pr, _, ra) => (pr, ra) }
      walk = probeRank(withA, pr => pr._4 + pr._5, j)
        .map { case (pr, ra, rb) =>
          if (ra != Absent && ra == rb) (pr._1, pr._2, pr._3, pr._4, pr._5 + step)
          else pr
        }
    }

    // dupLen(p) = max LCP with either SA neighbor; per-doc rollup (docs with
    // no SA pair at all — a one-position corpus — coalesce to zero).
    val perPosRdd = walk.union(frozen).flatMap { case (da, p, db, q, acc) =>
      Iterator((da, p, acc), (db, q, acc))
    }
    val perPos = spark.createDataFrame(perPosRdd)
      .toDF("doc_id", "pos", "dl")
      .groupBy(col("doc_id"), col("pos"))
      .agg(max(col("dl")).as("dl"))
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

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.{bpe_encode, bpe_merge_pair, code_points}

/** Distributed BPE (byte-pair-encoding) tokenizer training + encoding.
  *
  * Training is the standard greedy corpus-level algorithm (Sennrich et al.
  * 2016, via the public HuggingFace/SentencePiece formulations): count
  * adjacent symbol pairs weighted by word frequency, fuse the most
  * frequent pair, repeat. The Spark shape exploits the Zipf compression
  * step every practical trainer uses: the iteration state is the DISTINCT
  * word table with frequencies — millions of rows for a 100 TB corpus,
  * not the corpus itself — so each merge round is one small
  * aggregate-and-argmax over that table (pair explode → groupBy sum →
  * 1-row collect) plus a codegen'd per-row merge map
  * ([[graft.functions.BpeMergePair]]). Lineage is cut every round, so
  * round k's plan does not replay rounds 1..k-1.
  *
  * Encoding ([[graft.functions.BpeEncode]]) is a single codegen'd map over
  * documents with the merge table as a reference object — no shuffle, no
  * join, no interpreted higher-order functions on the 100 TB side.
  *
  * Determinism contract (shared with the DuckDB oracle, which replays the
  * SAME algorithm as K unrolled SQL stages over a double-spaced token
  * encoding — see [[oracleSql]]):
  *   - pair argmax ties break by (count DESC, left ASC, right ASC) in
  *     binary string order;
  *   - a merge applies left-to-right non-overlapping (a run [a,a,a] with
  *     merge (a,a) becomes [aa,a]);
  *   - encoding applies merges in RANK-SEQUENTIAL order, each
  *     exhaustively, rather than HF's rank-priority loop. The two differ
  *     only when a later merge's fused symbol recreates an earlier
  *     merge's pair string via a different split — a documented,
  *     deterministic divergence, not an accident (BpeSpec pins both the
  *     agreement on real corpora and the contract itself).
  */
object BpeOps {
  type Q = (SparkSession, String) => DataFrame

  /** Merge-table row: rank step (1-based), pair, corpus pair count. */
  final case class Merge(step: Int, l: String, r: String, cnt: Long)

  /** Registered-query merge count: enough rounds to fuse multi-char
    * subwords at oracle scale while keeping the unrolled oracle SQL
    * readable. The library API takes any k. */
  val DefaultMerges = 12

  /** Whitespace pre-tokenization class — MUST stay in lockstep with the
    * oracle's string_split_regex and [[graft.functions.ExprUtil.bpeEncode]]'s
    * split loop. */
  private val WordSplit = "[ \n\t]+"

  /** The word-frequency table: the Zipf-compressed training state. */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), WordSplit)).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Train `k` merges. ONE Spark job per round: the argmax action over
    * the lazily-cut merged word table also materializes that table's
    * blocks (Lineage.cutLazy — the cutCounted mechanism with the argmax
    * as the fused action; TakeOrdered computes every partition, so the
    * checkpoint is complete). The previous shape paid two jobs per round
    * (eager cut, then argmax) plus one wasted merge pass after the final
    * selection. Greedy BPE is inherently sequential in k — the per-round
    * job is the floor. */
  def train(docs: DataFrame, k: Int): Seq[Merge] = {
    // Adjacent pairs: transform-with-index over the first n-1 tokens.
    // greatest(...) guards the 1-token word (Spark's sequence/slice
    // would otherwise step BACKWARDS for size-1 arrays).
    def argmax(words: DataFrame): Array[org.apache.spark.sql.Row] =
      words.select(col("freq"), explode(expr(
          "transform(slice(tk, 1, greatest(size(tk)-1, 0)), " +
            "(x, j) -> struct(x AS l, element_at(tk, j+2) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
    // code_points, not split(w, ""): the regex split shears astral-plane
    // chars into surrogate halves the encoder and oracle never produce.
    var words = graft.core.Lineage.cutLazy(
      wordFreq(docs).select(code_points(col("w")).as("tk"), col("freq")))
    var best = argmax(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(step, l, r, cnt)
        step += 1
        if (step <= k) {
          val prev = words
          words = graft.core.Lineage.cutLazy(
            prev.select(bpe_merge_pair(col("tk"), l, r).as("tk"), col("freq")))
          best = argmax(words) // one job: materializes `words` + the argmax
          graft.core.Lineage.release(prev)
        }
      }
    }
    graft.core.Lineage.release(words)
    merges.toSeq
  }

  /** Deterministic per-(session, dir, k) merge cache: train and apply on
    * the same corpus share one training run within a session. The
    * [[graft.core.LazySlot]] indirection keeps the multi-job training
    * OUTSIDE computeIfAbsent's bin lock. */
  private val trained = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, graft.core.LazySlot[Seq[Merge]]]]())

  def trainedMerges(s: SparkSession, d: String, k: Int): Seq[Merge] = {
    val perKey = trained.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, graft.core.LazySlot[Seq[Merge]]]())
    perKey.computeIfAbsent(s"$d:$k",
      _ => new graft.core.LazySlot(() => train(Tables.documents(s, d), k))).value
  }

  /** The learned merge table itself (rank, pair, pair count). */
  private val bpeTrain: Q = (s, d) => {
    import s.implicits._
    trainedMerges(s, d, DefaultMerges).toDF("step", "l", "r", "cnt")
  }

  /** Documents encoded with the learned merges: token count + an md5 over
    * the space-joined token stream — the full tokenization pinned in one
    * comparable value. Empty documents (no words) are excluded on both
    * sides. */
  private val bpeApply: Q = (s, d) => {
    val merges = trainedMerges(s, d, DefaultMerges).map(m => (m.l, m.r))
    Tables.documents(s, d)
      .select(col("doc_id"), bpe_encode(col("text"), merges).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("toks"))).as("tok_md5"))
  }

  /** Tokenizer-quality report — the eval every tokenizer build ends with:
    * per language, how well the learned merges COMPRESS the corpus.
    * Reports docs, total code points entering the tokenizer, total
    * tokens out, tokens that are genuine merges (>1 code point — base
    * symbols are single code points by construction), and the headline
    * code-points-per-token ratio (d9's floor-micro form). A language the
    * merges never fire on shows cp_per_token ≈ 1 — the signal that the
    * vocab was trained on the wrong mix (the tx_temperature_mix use
    * case). Scale shape: encode is the same one codegen expression as
    * tx_bpe_apply, the stats are per-row HOF folds, and ONE
    * map-side-combinable groupBy collapses the corpus to |langs| rows.
    */
  private val bpeCoverage: Q = (s, d) => {
    val merges = trainedMerges(s, d, DefaultMerges).map(m => (m.l, m.r))
    Tables.documents(s, d)
      .select(col("lang"), bpe_encode(col("text"), merges).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("lang"),
        size(col("toks")).cast("long").as("nt"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("ncp"),
        size(filter(col("toks"), t => length(t) > 1)).cast("long").as("nm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ncp")).as("total_cp"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nm")).as("merged_tokens"))
      .withColumn("cp_per_token_micro",
        floor(col("total_cp") * lit(1000000L) / col("total_tokens")).cast("long"))
  }

  /** The shippable vocabulary: base code-point symbols (ids 0..B-1 in
    * binary lexicographic order) followed by the K merge outputs (ids
    * B+rank-1 in rank order) — exactly the two-part layout BPE vocab
    * files use, derived deterministically from the corpus + merges. */
  private val bpeVocab: Q = (s, d) => {
    val merges = trainedMerges(s, d, DefaultMerges)
    // ONE corpus pass: the distinct base symbols are alphabet-bounded
    // (a few thousand even for full-Unicode corpora), so collecting them
    // once and assigning ids on the driver beats a second scan — the
    // count()-then-rebuild form would re-run the whole
    // documents→wordFreq→explode→distinct pipeline as a second action.
    val baseTokens = wordFreq(Tables.documents(s, d))
      .select(explode(code_points(col("w"))).as("token"))
      .distinct()
      .collect().map(_.getString(0)).sorted(BinaryStringOrder)
    import s.implicits._
    val rows =
      baseTokens.zipWithIndex.map { case (t, i) => (i, t, "base") } ++
        merges.map(m => (baseTokens.length + m.step - 1, m.l + m.r, "merge"))
    rows.toSeq.toDF("token_id", "token", "kind")
  }

  /** UTF-8 byte order — what Spark's string ordering and DuckDB's binary
    * collation both use; JVM String.compareTo orders by UTF-16 unit and
    * would disagree on supplementary characters. */
  private val BinaryStringOrder: Ordering[String] = Ordering.comparatorToOrdering(
    java.util.Comparator.comparing((s: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)))

  val queries: Map[String, Q] = Map(
    "tx_bpe_train" -> bpeTrain,
    "tx_bpe_apply" -> bpeApply,
    "tx_bpe_vocab" -> bpeVocab,
    "tx_bpe_coverage" -> bpeCoverage,
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle: the SAME K greedy rounds, unrolled as SQL stages over a
  // double-spaced token encoding (' a  b  c '). A literal `replace` of
  // ' l  r ' with ' lr ' is left-to-right non-overlapping — exactly the
  // merge semantics — and token boundaries are unforgeable because tokens
  // contain no spaces. CTEs are MATERIALIZED: each stage references its
  // predecessor twice, and DuckDB would otherwise inline the chain into
  // 2^K scans.
  // ---------------------------------------------------------------------

  private def trainStages(k: Int): String =
    (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest([[tk[j], tk[j+1]] FOR j IN generate_series(1, list_count(tk)-1)]) AS pr
         |    FROM (SELECT freq, string_split(trim(s, ' '), '  ') AS tk FROM w${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT replace(s, ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
         |                    ' ' || (SELECT l || r FROM b$i) || ' ') AS s, freq
         |  FROM w${i - 1})""".stripMargin
    }.mkString(",\n")

  private val w0 =
    """w0 AS MATERIALIZED (
      |  SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS s,
      |         CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split_regex(text, '[ \n\t]+')) AS w FROM documents)
      |  WHERE w != '' GROUP BY 1)""".stripMargin

  private def trainOracle(k: Int): String =
    s"WITH $w0,\n${trainStages(k)}\n" +
      "SELECT * FROM (\n" +
      (1 to k).map(i => s"SELECT $i AS step, l, r, cnt FROM b$i").mkString("\nUNION ALL\n") +
      ")"

  private def applyOracle(k: Int): String = {
    val docStages = (1 to k).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT doc_id, replace(s, ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
         |                            ' ' || (SELECT l || r FROM b$i) || ' ') AS s
         |  FROM d${i - 1})""".stripMargin
    }.mkString(",\n")
    // Word boundaries inside a document ride as a chr(1) pseudo-token so
    // no merge can cross them; it is dropped at final token extraction.
    s"""WITH $w0,
       |${trainStages(k)},
       |d0 AS MATERIALIZED (
       |  SELECT doc_id, ' ' || array_to_string([array_to_string(string_split(w, ''), '  ') FOR w IN words], ' ' || chr(1) || ' ') || ' ' AS s
       |  FROM (SELECT doc_id, [w FOR w IN string_split_regex(text, '[ \n\t]+') IF w != ''] AS words FROM documents)
       |  WHERE list_count(words) > 0),
       |$docStages
       |SELECT doc_id,
       |  CAST(list_count(toks) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(toks, ' ')) AS tok_md5
       |FROM (SELECT doc_id, [t FOR t IN string_split_regex(trim(s, ' '), ' +') IF t != '' AND t != chr(1)] AS toks
       |      FROM d$k)""".stripMargin
  }

  private def vocabOracle(k: Int): String =
    s"""WITH $w0,
       |${trainStages(k)},
       |base AS MATERIALIZED (
       |  SELECT DISTINCT t AS token
       |  FROM (SELECT unnest(string_split(trim(s, ' '), '  ')) AS t FROM w0)
       |  WHERE t != ''),
       |basev AS (SELECT CAST(row_number() OVER (ORDER BY token) - 1 AS INT) AS token_id,
       |                 token, 'base' AS kind FROM base),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)
       |SELECT * FROM basev
       |UNION ALL
       |${(1 to k).map(i =>
          s"SELECT CAST((SELECT n FROM nb) + $i - 1 AS INT), (SELECT l || r FROM b$i), 'merge' FROM b$i")
          .mkString("\nUNION ALL\n")}""".stripMargin

  /** The apply chain with lang carried through, aggregated per lang —
    * the same w0/train stages and the same chr(1) word-boundary
    * discipline as [[applyOracle]]. */
  private def coverageOracle(k: Int): String = {
    val docStages = (1 to k).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT doc_id, lang, replace(s, ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' ',
         |                                  ' ' || (SELECT l || r FROM b$i) || ' ') AS s
         |  FROM d${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH $w0,
       |${trainStages(k)},
       |d0 AS MATERIALIZED (
       |  SELECT doc_id, lang, ' ' || array_to_string([array_to_string(string_split(w, ''), '  ') FOR w IN words], ' ' || chr(1) || ' ') || ' ' AS s
       |  FROM (SELECT doc_id, lang, [w FOR w IN string_split_regex(text, '[ \n\t]+') IF w != ''] AS words FROM documents)
       |  WHERE list_count(words) > 0),
       |$docStages,
       |enc AS (SELECT lang,
       |          [t FOR t IN string_split_regex(trim(s, ' '), ' +') IF t != '' AND t != chr(1)] AS toks
       |        FROM d$k),
       |st AS (SELECT lang, CAST(list_count(toks) AS BIGINT) AS nt,
       |         CAST(list_reduce(list_transform(toks, t -> len(t)), (a, b) -> a + b) AS BIGINT) AS ncp,
       |         CAST(len(list_filter(toks, t -> len(t) > 1)) AS BIGINT) AS nm
       |       FROM enc)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(ncp) AS BIGINT) AS total_cp,
       |  CAST(sum(nt) AS BIGINT) AS total_tokens,
       |  CAST(sum(nm) AS BIGINT) AS merged_tokens,
       |  CAST(floor(sum(ncp) * 1000000 / sum(nt)) AS BIGINT) AS cp_per_token_micro
       |FROM st GROUP BY lang""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "tx_bpe_train" -> trainOracle(DefaultMerges),
    "tx_bpe_apply" -> applyOracle(DefaultMerges),
    "tx_bpe_vocab" -> vocabOracle(DefaultMerges),
    "tx_bpe_coverage" -> coverageOracle(DefaultMerges),
  )
}

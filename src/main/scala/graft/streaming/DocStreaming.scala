package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.PipelineOps

/** Streaming-ingest surface of the document pipeline: documents arrive as
  * a file stream and are scored against STATIC reference data with a
  * stream–static join — the Spark-native shape for "enrich a firehose
  * against curated side data". The static side is broadcast into every
  * micro-batch, so the stream side never shuffles for the join; the only
  * stateful operator is the per-doc aggregation. Batch/stream parity is
  * asserted in DocStreamingSpec.
  */
object DocStreaming {

  /** Parquet file-stream over a directory of document files. */
  def docStream(spark: SparkSession, docsDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(docsDir)

  /** Streaming JSONL landing reader — the TRUE entry point of a scraped
    * corpus (deliveries arrive as JSON-lines files; [[ingestGateStream]]
    * runs behind it): Spark's file stream over the landing dir with the
    * PERMISSIVE parser, so a malformed line quarantines into the
    * `_corrupt` column as a row instead of killing the stream — the
    * src_jsonl_ingest tolerance contract, unchanged in streaming (the
    * parser is the same codegen'd scanner per micro-batch, stateless, no
    * watermark, no state store). Downstream screens filter
    * `_corrupt IS NULL`; the quarantine rows flow to the reject sink
    * with the raw line preserved for replay.
    */
  def jsonlDocStream(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream
      .schema("doc_id LONG, lang STRING, n_chars LONG, text STRING, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(landingDir)

  /** Streaming contamination scoring: each arriving document's distinct
    * word-8-grams are LEFT-joined against the static benchmark gram set
    * (stream–static broadcast join: map-side, no stream shuffle), then a
    * single streaming aggregation folds the hit indicators back to one
    * row per doc. A stream–stream join-back would be unsupported after
    * aggregation, so per-doc totals ride along the exploded rows instead
    * (n_grams is a group key, constant per doc). Mirrors batch
    * tx_contamination exactly for non-benchmark docs.
    */
  def contaminationScores(stream: DataFrame, benchGrams: DataFrame): DataFrame = {
    val withG = stream
      .where(col("source") =!= PipelineOps.BenchmarkSource)
      .select(col("doc_id"), col("source"),
        array_distinct(PipelineOps.wordGrams(col("text"),
          PipelineOps.ContamGramWidth)).as("grams"))
    withG
      .select(col("doc_id"), col("source"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gr"))
      .join(broadcast(benchGrams.withColumn("hit", lit(1))), Seq("gr"), "left")
      .groupBy(col("doc_id"), col("source"), col("n_grams"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_grams").cast("double"))
  }

  /** The static benchmark gram set for [[contaminationScores]], built
    * from the batch documents table by the SAME derivation the batch
    * query uses (PipelineOps.benchGramsOf — shared so parity can't
    * drift). */
  def benchmarkGrams(spark: SparkSession, sfDir: String): DataFrame =
    PipelineOps.benchGramsOf(graft.Tables.documents(spark, sfDir))

  /** Streaming content-defined chunking — the ingest twin of batch
    * tx_cdc_chunk, and the SAME code: cdcChunkSpansOf is a per-row
    * codegen'd explode with no aggregation, so it runs unmodified on an
    * unbounded stream (stateless — no watermark, no state store). This
    * is the landing-zone shape: chunk + fingerprint documents as they
    * arrive, then hand the (id, idx, len, hash) rows to a downstream
    * dedup — batch d11, or [[chunkDedupStream]] for the fully streaming
    * within-watermark form — without the text ever being shuffled.
    */
  def cdcChunkStream(stream: DataFrame): DataFrame =
    graft.queries.TextOps.cdcChunkSpansOf(stream)

  /** Streaming HTML extraction — strip markup from documents AS THEY
    * LAND (the very first hop of a web-scrape ingest). Reuses
    * TextOps.htmlStripOf verbatim: the whole operator is per-row
    * regexp/replace codegen, so the streaming plan is the batch plan run
    * per micro-batch — stateless, no watermark, no state store (asserted
    * in DocStreamingSpec). Raw markup never shuffles; only the extracted
    * feature row flows downstream.
    */
  def htmlStripStream(stream: DataFrame): DataFrame =
    graft.queries.TextOps.htmlStripOf(stream)

  /** Streaming delivery-drift histogram — the ingest twin of batch
    * pipe_drift_psi's `cur` side: the arriving stream folds into a
    * running (lang, bin) token-length histogram via the SHARED
    * [[PipelineOps.driftBin]] definition (one binning, batch and stream
    * cannot drift apart). State is the histogram itself — at most
    * |langs| × DriftNBins rows, CONSTANT in stream length: the canonical
    * monitoring shape where an unbounded firehose reduces to a bounded
    * sufficient statistic. Each trigger the sink (or
    * [[PipelineOps.driftPsiOfCounts]] over the emitted counts against a
    * static reference histogram) re-scores the PSI — parity with the
    * batch monitor is asserted in DocStreamingSpec.
    */
  def driftHistStream(stream: DataFrame): DataFrame =
    stream.select(col("lang"),
        graft.queries.PipelineOps.driftBin(col("text")).as("bin"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("cnt"))

  /** Online VECTOR SERVING — top-k cosine search for a STREAM of query
    * embeddings against a frozen index snapshot: the retrieval-serving
    * shape (a query firehose against last night's index build). The
    * snapshot is collected ONCE into an array-of-structs literal riding
    * into every task — the asofStreamStatic broadcast-index discipline,
    * with the SAME fail-fast size gate before the collect (an index that
    * doesn't fit the broadcast bound would OOM the driver; past the
    * bound the serve path is IVF cell routing, not this operator). Each
    * arriving vector scores the pool with the shared ordered-fold
    * [[graft.functions.GraftFunctions.cosine]], self-matches and
    * zero-norm nulls filtered, a comparator array_sort (cosine desc, id
    * asc — the batchScoredTopK tie-break) takes the top k. Everything is
    * per-row HOF codegen: NO window, NO state store, NO stream shuffle —
    * parity with batch ann_batch_topk is exact (DocStreamingSpec).
    */
  def annServeStream(spark: SparkSession, stream: DataFrame,
      corpus: DataFrame, k: Int = 10): DataFrame = {
    import spark.implicits._
    import graft.queries.SimilarityOps.vDouble
    val pruned = corpus.select(col("vec_id"), vDouble(col("embedding")).as("v"))
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    val bound = if (threshold > 0) threshold else 10L * 1024 * 1024
    val estBytes = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
    require(estBytes <= bound,
      s"annServeStream builds a literal index from the static corpus, but " +
        s"its estimated size ($estBytes bytes) exceeds $bound bytes " +
        s"(spark.sql.autoBroadcastJoinThreshold, or the 10 MB default when " +
        s"disabled). Shrink the snapshot or route through an IVF index.")
    val pool = typedLit(pruned.as[(Long, Seq[Double])].collect().toSeq)
    val q = vDouble(col("embedding"))
    val scored = filter(
      transform(pool, p =>
        struct(graft.functions.GraftFunctions.cosine(p.getField("_2"), q).as("c"),
          p.getField("_1").as("id"))),
      s0 => s0.getField("c").isNotNull && s0.getField("id") =!= col("vec_id"))
    val sorted = array_sort(scored, (l, r) =>
      when(l.getField("c") > r.getField("c"), -1)
        .when(l.getField("c") < r.getField("c"), 1)
        .when(l.getField("id") < r.getField("id"), -1)
        .when(l.getField("id") > r.getField("id"), 1)
        .otherwise(0))
    stream
      .select(col("vec_id").as("query_id"),
        posexplode(slice(sorted, 1, k)))
      .select(col("query_id"), col("col").getField("id").as("vec_id"),
        col("col").getField("c").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Streaming quality-filter SERVE — the ingest-time twin of batch
    * pipe_quality_filter: score arriving documents with FROZEN trained
    * weights (training happened offline — [[graft.queries.PipelineOps
    * .qcTrainedWeights]]; a stream cannot retrain) through the SAME
    * serving body ([[graft.queries.PipelineOps.qcServeOf]] — features →
    * exact integer margin → keep flag), so stream and batch keep
    * decisions are bit-identical by construction. Stateless per-row
    * codegen: no watermark, no state store (spec-asserted) — the
    * landing-zone quality gate in front of ingest.
    */
  def qualityFilterStream(stream: DataFrame, w0: Long, w1: Long, w2: Long): DataFrame =
    graft.queries.PipelineOps.qcServeOf(stream, w0, w1, w2)

  /** Streaming curriculum phase assignment — the serve twin of the
    * tx_curriculum_kll scale path: weights AND cut points are FROZEN
    * (trained/sketched once on the corpus, passed as literals —
    * [[graft.queries.PipelineOps.curriculumCuts]]), so assigning an
    * arriving document to its training phase is a stateless per-row
    * margin score + threshold chain. The plan is the batch plan run per
    * micro-batch: no watermark, no state store (asserted in
    * DocStreamingSpec), and the scoring body (qcServeOf) and the
    * assignment rule ([[graft.queries.PipelineOps.phaseOf]]) are the
    * SAME definitions the batch query executes, so the faces cannot
    * drift bit-wise.
    */
  def curriculumAssignStream(stream: DataFrame, w0: Long, w1: Long, w2: Long,
      t25: Double, t50: Double, t75: Double): DataFrame =
    graft.queries.PipelineOps.qcServeOf(stream, w0, w1, w2)
      .select(col("doc_id"), col("z"),
        graft.queries.PipelineOps.phaseOf(col("z").cast("double"),
          lit(t25), lit(t50), lit(t75)).as("phase"))

  /** Streaming winnowing — fingerprint-select documents AS THEY LAND
    * (the index-build side of a continuously ingested near-dup screen).
    * Reuses TextOps.winnowOf verbatim: the whole operator is per-row HOF
    * work, so the streaming plan is the batch plan run per micro-batch —
    * stateless, no watermark, no state store (asserted in
    * DocStreamingSpec).
    */
  def winnowStream(stream: DataFrame): DataFrame =
    graft.queries.TextOps.winnowOf(stream)

  /** Streaming multimodal decode — the ingest-side twin of batch
    * mm_decode_png with the SAME real codec: per-row payload synthesis +
    * `javax.imageio` encode→decode via typed mapPartitions, fully
    * stateless (no watermark, no state store), so the streaming plan is
    * the batch plan run per micro-batch. This is the shape for decoding
    * media as it lands: the codec call rides the partition iterator,
    * decoded features flow on, raw payloads are never shuffled.
    */
  def decodePngStream(stream: DataFrame): DataFrame = {
    import stream.sparkSession.implicits._
    import graft.queries.MultimodalOps.PngCodec
    stream
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val (w, h, gray) = PngCodec.synthDims(id, nChars)
        PngCodec.decode(id, PngCodec.encode(w, h, gray))
      })
      .toDF()
  }

  /** Streaming BPE tokenization — the ingest twin of batch tx_bpe_apply:
    * the merge table is TRAINED OFFLINE on the batch corpus (BpeOps.train)
    * and rides into every micro-batch as a codegen reference object, so
    * encoding is a stateless per-row map — no stream shuffle, no state
    * store, unbounded throughput. This split (train batch / apply stream)
    * is the deployment shape for tokenizing a document firehose with a
    * frozen vocabulary.
    */
  def bpeEncodeStream(stream: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    stream.select(col("doc_id"),
        graft.functions.GraftFunctions.bpe_encode(col("text"), merges).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("toks"))).as("tok_md5"))

  /** Streaming dup-span gate — the ingest-side twin of batch
    * d9_dup_spans: each arriving document's W-token window fingerprints
    * LEFT-join the STATIC corpus window-count table (stream–static
    * broadcast: map-side, no stream shuffle), and one streaming
    * aggregation folds them to the per-doc duplicated-span signal. A
    * window is duplicated when the corpus holds it more than once — so
    * replaying the corpus against its own counts reproduces batch d9
    * row-for-row (own occurrence + ≥1 other), which is the parity spec;
    * in production the count table is the previous corpus snapshot and
    * the gate answers "is this delivery regurgitating known text".
    */
  def dupSpanScores(stream: DataFrame, corpusCounts: DataFrame): DataFrame = {
    import graft.queries.DedupOps
    stream
      .select(col("doc_id"), explode(DedupOps.spanFingerprints(col("text"))).as("h"))
      .join(broadcast(corpusCounts), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(coalesce(col("cnt"), lit(0L)) > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac_e6",
        floor(col("n_dup_windows") * lit(1000000L) / col("n_windows")).cast("long"))
  }

  /** The static corpus window-count table for [[dupSpanScores]], derived
    * by the SAME windowing as batch d9 (shared constants, so parity
    * cannot drift). */
  def corpusWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.queries.DedupOps
    graft.Tables.documents(spark, sfDir)
      .select(explode(DedupOps.spanFingerprints(col("text"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("cnt"))
  }

  /** Streaming exact dedup with BOUNDED state — the ingest-side twin of
    * batch d1_exact_dedup. A plain `dropDuplicates` on a stream keeps
    * every content hash in state forever (state grows with the corpus —
    * fatal for an unbounded 100 TB firehose);
    * `dropDuplicatesWithinWatermark` instead evicts a hash's state once
    * the event-time watermark passes its expiry (first-seen ts + the
    * delay), bounding state to the late-data horizon. The contract
    * weakens from "dedup forever" to "dedup within the horizon" — the
    * periodic batch d1 pass collapses longer-range duplicates, which is
    * exactly how production ingest pipelines split the work. Expects an
    * `ingest_ts` timestamp column on the stream; emits the surviving
    * row per hash in Append mode as soon as it arrives.
    */
  def dedupStream(stream: DataFrame, delay: String): DataFrame =
    stream
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("content_hash"), col("ingest_ts"))

  /** Streaming CHUNK dedup with bounded state — the ingest-side twin of
    * batch d11_chunk_dedup, completing the landing-zone pair with
    * [[dedupStream]]: documents are content-defined-chunked per row (the
    * same codegen'd `cdc_chunks` kernel and constants as batch, so the
    * chunk definition cannot drift), and the chunk fingerprints pass
    * through `dropDuplicatesWithinWatermark` — first arrival of each
    * chunk hash within the late-data horizon survives, later copies are
    * dropped, and a hash's state row is EVICTED once the watermark
    * passes its expiry. Only (doc_id, idx, span, hash) rows ever reach
    * the stateful operator — chunk text never shuffles (the d11 scale
    * discipline) — and state is bounded by distinct chunk hashes within
    * the horizon, not the corpus (asserted in DocStreamingSpec).
    */
  def chunkDedupStream(stream: DataFrame, delay: String): DataFrame = {
    import graft.queries.TextOps
    import graft.functions.GraftFunctions
    stream.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("ingest_ts"),
        posexplode(GraftFunctions.cdc_chunks(col("text"),
          TextOps.CdcWindow, TextOps.CdcDiv)))
      .select(col("doc_id"), col("ingest_ts"), col("pos").as("chunk_idx"),
        col("col.start").as("chunk_start"), col("col.len").as("chunk_len"),
        col("col.hash").as("chunk_hash"))
      .withWatermark("ingest_ts", delay)
      .dropDuplicatesWithinWatermark("chunk_hash")
  }

  /** Streaming per-source ingest quota — the ingest-side twin of batch
    * tx_domain_quota: admit at most `quota` documents per source, then
    * drop the rest of that source's stream. State is ONE counter per
    * source (flatMapGroupsWithState), so total state is bounded by the
    * number of distinct sources regardless of stream length — the shape
    * that survives an unbounded firehose. Within a micro-batch each
    * group's rows are folded in doc_id order, so replaying a finite
    * corpus reproduces the batch query's first-N-by-doc_id semantics
    * exactly (DocStreamingSpec parity); across batches admission is
    * arrival-ordered, which is the real ingest contract.
    */
  def quotaStream(spark: SparkSession, stream: DataFrame, quota: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.streaming.GroupState
    val typed = stream.select(col("doc_id").cast("long"), col("source"))
      .as[(Long, String)]
    typed.groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[(Long, String, Int)]
          rows.toSeq.sortBy(_._1).foreach { case (id, _) =>
            if (n < quota) { n += 1; out += ((id, source, n.toInt)) }
          }
          state.update(n)
          out.result().iterator
      }.toDF("doc_id", "source", "rn")
  }

  /** Streaming cluster assignment — apply a TRAINED clustering model
    * (the (cluster, centroid) table from batch
    * [[graft.queries.SimilarityOps.kmeansModel]], or any model registry)
    * to an embedding firehose. The model is bounded metadata (k×dim
    * doubles), so it ships as a LITERAL array into a per-row projection:
    * each arriving vector scores all k centroids inside one expression
    * and `array_min` over (dist, cluster) structs picks the cluster —
    * same arithmetic and tie-breaking as the batch `min(struct)` argmin,
    * so stream and batch agree bit-for-bit (DocStreamingSpec). Fully
    * STATELESS: no state store, no watermark, no shuffle, Append mode —
    * the correct shape for an unbounded stream (a stream-side groupBy
    * argmin would grow keyed state forever).
    */
  /** Streaming near-dup screen against the PERSISTED corpus MinHash
    * index — the ingest twin of batch d14: each arriving document's band
    * buckets ([[graft.queries.DedupOps.bandBuckets]], the SAME definition
    * as d2/d14, over the same signature fold) join the static corpus
    * band table; candidates verify by exact Jaccard
    * ([[graft.queries.DedupOps.verifyJaccard]], shared) against the
    * static corpus signature table; one streaming aggregation folds the
    * verdict to a row per arriving doc: how many corpus near-dups it
    * has and its best match. The stream side is STATELESS up to that
    * final per-doc aggregate (signature fold and banding are per-row
    * projections; both joins are stream–static); corpus-side state
    * never enters the state store — at 100 TB the static sides are the
    * same bucketed artifacts batch d14 maintains, refreshed per
    * delivery. min(struct(-jaccard, corpus_id)) makes the best-match
    * pick deterministic under ties (smallest corpus id wins).
    */
  def neardupScreenStream(stream: DataFrame, corpusBands: DataFrame,
      corpusSigs: DataFrame): DataFrame = {
    import graft.queries.DedupOps
    // Shingles ride along the exploded band rows (the contaminationScores
    // ride-along discipline — a join-back against the stream's own
    // signatures would be a stream–stream self-join).
    val banded = DedupOps.minhashSignatures(stream)
      .select(col("doc_id").as("in_doc"), col("shingles").as("sh_a"),
        explode(DedupOps.bandBucketArray).as("bucket"))
    val verified = DedupOps.verifyJaccard(banded
        .join(corpusBands.select(col("bucket"), col("doc_id").as("corpus_id")),
          Seq("bucket"))
        .join(corpusSigs.select(col("doc_id").as("corpus_id"),
          col("shingles").as("sh_b")), Seq("corpus_id")))
    // A pair matching on several bands yields several verified rows;
    // both aggregates are DUPLICATE-INSENSITIVE (collect_set dedups,
    // min(struct) ignores repeats) — a streaming dropDuplicates here
    // would grow (in_doc, corpus_id) state without bound.
    verified
      .groupBy(col("in_doc").as("doc_id"))
      .agg(collect_set(col("corpus_id")).as("cs"),
        min(struct((-col("jaccard")).as("nj"), col("corpus_id"))).as("best"))
      .select(col("doc_id"),
        size(col("cs")).cast("long").as("n_corpus_neardups"),
        col("best.corpus_id").as("best_match"),
        (-col("best.nj")).as("best_jaccard"))
  }

  /** STREAMING INGEST GATE — the landing-zone screen run per DELIVERY:
    * every arriving document through all four registered screens in
    * batch [[graft.queries.PipelineOps]] pipe_ingest_gate's precedence
    * (blocked terms → exact duplicate → near-duplicate → quality), one
    * verdict row with the duplicate's keeper appended to `outDir` per
    * micro-batch.
    *
    * Architecture: `foreachBatch`, deliberately. The gate is four arms
    * with THREE different state keys (content hash for exact-dup, band
    * bucket for near-dup, none for the stateless arms) whose per-doc
    * verdicts must recombine with immediate emission — as one streaming
    * DataFrame that is a chain of stateful operators after
    * flatMapGroupsWithState (unsupported) or append-mode per-doc
    * aggregations (which would hold every verdict until the watermark
    * closes). A real lake runs deliveries exactly this way: each
    * micro-batch is screened against the PERSISTED index and the index
    * is advanced by the delivery's own fingerprints — the d14
    * incremental posture, composed from the registered definitions
    * verbatim ([[graft.queries.TextOps.blocklistHits]], the
    * incrementalDedupOf hash/keeper rule, [[graft.queries.DedupOps]]
    * minhashSignatures/bandBuckets/verifyJaccard, qcServeOf with the
    * frozen trained weights).
    *
    * State across deliveries (driver-held handles, executor-held
    * blocks, lineage-cut per batch): the content-hash keeper table and
    * the delivery band/signature tables in the d14 index layout —
    * fingerprints and shingles only, NEVER document text; batch text
    * stays inside the local micro-batch frame (zero text shuffle, the
    * d11 discipline). Replaying a corpus delivery in doc_id order —
    * in one micro-batch or many — reproduces the batch gate's verdicts
    * exactly (the quotaStream arrival-order contract; asserted in
    * DocStreamingSpec both ways).
    *
    * RESTART CONTRACT: the cross-delivery index is durable, not
    * driver-memory-only. Each committed delivery persists its
    * fingerprints (hash keepers, minhash shingle sets, band buckets —
    * never text) under `outDir/_index/{hash,sigs,bands}` partitioned by
    * `_batch_id` with dynamic overwrite, so a replayed batch rewrites
    * its own index partition exactly like the verdict sink. On start
    * with a checkpoint that already has committed batches (pass
    * `checkpointDir` to restart), the seen-state is rebuilt from the
    * committed `_batch_id` partitions before the first new micro-batch
    * — a delivery that duplicates a pre-restart delivery is still
    * caught. The committed set is derived as [0, max(commit log)], not
    * the raw commits listing: micro-batches commit sequentially and
    * Spark purges log entries older than
    * spark.sql.streaming.minBatchesToRetain, so a gate that has run
    * thousands of deliveries still restarts (and the index coverage
    * check runs against the hash sub, which every non-empty verdict
    * batch must populate). Growth posture: the on-disk index gains one
    * partition per delivery; the restart rebuild folds them into a
    * single lineage-cut block, and the long-run compaction lever is the
    * one a lake already has — periodically promote the landing corpus
    * into the documents table, re-materialize the d14 corpus index
    * (corpusIndexSigs/corpusIndexBands), and restart the gate against a
    * fresh outDir with the promoted docs on the corpus side. Mirrors
    * the reference's resume discipline
    * (/root/reference/amaxa/loader/state.py:22-32): progress and the
    * state it implies commit together or not at all. A fresh checkpoint
    * pointed at an outDir holding verdict partitions from some other
    * run fails fast instead of mixing lineages.
    */
  def ingestGateStream(spark: SparkSession, stream: DataFrame, sfDir: String,
      outDir: String, checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.queries.{DedupOps, PipelineOps, TextOps}
    import graft.core.Lineage
    val (w0, w1, w2) = PipelineOps.qcTrainedWeights(spark, sfDir)
    // Corpus-side artifacts: the SAME session-materialized index batch
    // d14 serves from, plus the hash keeper table the d7 rule needs.
    val corpusSigs = DedupOps.corpusIndexSigs(spark, sfDir)
    val corpusBands = DedupOps.corpusIndexBands(spark, sfDir)
    val corpusHash = graft.core.Materialize.once(spark, s"gate_corpus_hash:$sfDir") {
      graft.Tables.documents(spark, sfDir)
        .where(col("source") =!= DedupOps.IncomingSource)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("corpus_dup"))
    }
    // Cross-delivery state: earlier deliveries' fingerprints. Held as
    // driver handles for the fast path, rebuilt from the durable
    // `outDir/_index` partitions on restart (see the contract above).
    var seenHash: Option[DataFrame] = None   // (h, seen_min)
    var seenSigs: Option[DataFrame] = None   // (doc_id, shingles)
    var seenBands: Option[DataFrame] = None  // (bucket, doc_id)
    val checkpoint = checkpointDir.getOrElse {
      val t = java.nio.file.Files
        .createTempDirectory("graft_gate_ckpt").toString
      graft.core.Fs.deleteOnExit(t)
      t
    }
    val indexDir = s"$outDir/_index"
    val committed = loggedBatchIds(spark, checkpoint, "commits")
    val offsetsLogged = loggedBatchIds(spark, checkpoint, "offsets")
    val existing = batchIdPartitions(spark, outDir)
    // Micro-batches run sequentially (batch k+1 starts only after k's
    // commit), and Spark PURGES checkpoint log entries older than
    // spark.sql.streaming.minBatchesToRetain (default 100) — so the
    // commits listing alone under-counts a long-running gate's history.
    // The sound committed set is therefore [0, max(commits)]: everything
    // at or below the newest commit is committed by sequentiality,
    // purged or not.
    val maxCommitted: Option[Long] = committed.reduceOption(_ max _)
    val isCommitted: Long => Boolean = id => maxCommitted.exists(id <= _)
    // Lineage guard: a checkpoint accounts for its committed range plus
    // the at-most-one in-flight offsets-logged batch foreachBatch will
    // replay and overwrite. A fresh checkpoint accounts for nothing.
    // Anything else is another run's output — refuse to interleave
    // verdicts from two lineages.
    val orphans = existing.filterNot(id => isCommitted(id) || offsetsLogged(id))
    if (orphans.nonEmpty) throw new IllegalStateException(
      s"ingest gate outDir $outDir holds verdict partitions " +
        s"${orphans.toSeq.sorted.mkString("_batch_id=", ", _batch_id=", "")} " +
        s"not in checkpoint $checkpoint's lineage (committed through: " +
        s"${maxCommitted.getOrElse(-1L)}); point the gate at a fresh " +
        "outDir or the checkpoint that produced this one")
    maxCommitted.foreach { maxC =>
      // Restart-with-history: rebuild the seen-fingerprint state from
      // the committed deliveries' durable index partitions. A history
      // whose index does not cover every committed verdict batch (e.g.
      // output of a pre-index binary against the same checkpoint)
      // cannot be resumed soundly — fail instead of silently missing
      // cross-delivery dups. Coverage is checked against the hash sub:
      // every doc carries an md5, so any batch with a verdict partition
      // must have a hash partition (sigs/bands can be legitimately
      // empty for sub-shingle-length docs).
      val hashIds = batchIdPartitions(spark, s"$indexDir/hash")
      // A committed history with NO verdict partitions and NO fingerprint
      // partitions means the outDir was wiped or relocated: every guard
      // below would pass vacuously and cross-delivery dups against the
      // pre-wipe deliveries would be silently admitted — the exact
      // failure class the lineage guard catches in the other direction.
      // Only a history of exclusively empty deliveries legitimately looks
      // like this, which is distinguishable solely by operator
      // attestation — so default to refusing (ADVICE r11).
      if (existing.isEmpty && hashIds.isEmpty) throw new IllegalStateException(
        s"checkpoint $checkpoint commits through batch $maxC but outDir " +
          s"$outDir holds no verdict partitions and $indexDir/hash no " +
          "fingerprint partitions — the committed history's output was " +
          "wiped or relocated and the cross-delivery dedup state cannot " +
          "be rebuilt; restore the outDir this checkpoint produced, or " +
          "start a fresh checkpoint")
      val uncovered = existing.filter(isCommitted) -- hashIds
      if (uncovered.nonEmpty) throw new IllegalStateException(
        s"checkpoint $checkpoint commits through batch $maxC but " +
          s"$indexDir/hash has no partitions for committed batches " +
          s"${uncovered.toSeq.sorted.mkString("[", ",", "]")} — the " +
          "cross-delivery dedup index cannot be rebuilt; restart is unsound")
      // Every read is conditional on committed partitions actually
      // existing for that sub: a history of only-empty deliveries has
      // nothing to rebuild (and no dirs to read — an unconditional read
      // would crash on the missing path), and sigs/bands can be
      // legitimately empty when every doc was below shingle length.
      val inCommitted = col("_batch_id") <= maxC
      def readIfAny(sub: String, cols: Seq[String]): Option[DataFrame] =
        if (batchIdPartitions(spark, s"$indexDir/$sub").exists(isCommitted))
          Some(Lineage.cut(spark.read.parquet(s"$indexDir/$sub")
            .where(inCommitted).select(cols.map(col): _*)))
        else None
      seenHash =
        if (hashIds.exists(isCommitted))
          Some(Lineage.cut(spark.read.parquet(s"$indexDir/hash")
            .where(inCommitted)
            .groupBy("h").agg(min(col("seen_min")).as("seen_min"))))
        else None
      seenSigs = readIfAny("sigs", Seq("doc_id", "shingles"))
      seenBands = readIfAny("bands", Seq("bucket", "doc_id"))
    }
    // Explicit function value: foreachBatch has an ambiguous Scala/Java
    // overload pair for Unit-returning lambdas.
    val perDelivery: (DataFrame, Long) => Unit = (delivery, batchId) => {
        val batch = delivery.localCheckpoint(true)
        // Exact-dup arm: corpus keeper wins attribution, else the
        // earliest same-hash doc across deliveries and within this one
        // (incrementalDedupOf's coalesce, with seen state folded in).
        val intraMin = min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("h"))
        val hashed = batch.select(col("doc_id"), md5(col("text")).as("h"))
          .withColumn("intra_min", intraMin)
        val withSeen = seenHash.fold(hashed.withColumn("seen_min",
          lit(null).cast("long")))(sh => hashed.join(sh, Seq("h"), "left"))
        val exact = withSeen.join(corpusHash, Seq("h"), "left")
          .withColumn("all_min",
            least(coalesce(col("seen_min"), col("intra_min")), col("intra_min")))
          .select(col("doc_id"),
            coalesce(col("corpus_dup"),
              when(col("all_min") < col("doc_id"), col("all_min")))
              .as("exact_dup_of"))
          .withColumn("is_dup", col("exact_dup_of").isNotNull)
        // Near-dup arm: candidates from the persisted index (corpus ∪
        // earlier deliveries — any partner counts) plus smaller-id
        // intra-batch pairs; min partner, the batch gate's pick.
        val batchSigs = Lineage.cut(DedupOps.minhashSignatures(batch))
        val batchBands = DedupOps.bandBuckets(batchSigs)
        val cBands = corpusBands.select("bucket", "doc_id")
        val cSigs = corpusSigs.select("doc_id", "shingles")
        val idxBands = seenBands.fold(cBands)(s => cBands.unionByName(s))
        val idxSigs = seenSigs.fold(cSigs)(s => cSigs.unionByName(s))
        val bc = batchBands.select(col("bucket"), col("doc_id").as("bid"))
          .join(idxBands.select(col("bucket"), col("doc_id").as("partner")),
            Seq("bucket"))
          .select("bid", "partner").dropDuplicates("bid", "partner")
        val bcv = DedupOps.verifyJaccard(bc
            .join(batchSigs.select(col("doc_id").as("bid"),
              col("shingles").as("sh_a")), Seq("bid"))
            .join(idxSigs.select(col("doc_id").as("partner"),
              col("shingles").as("sh_b")), Seq("partner")))
          .select(col("bid").as("doc_id"), col("partner"))
        val bb = batchBands.select(col("bucket"), col("doc_id").as("bid"))
          .join(batchBands.select(col("bucket"), col("doc_id").as("partner")),
            Seq("bucket"))
          .where(col("partner") < col("bid"))
          .select("bid", "partner").dropDuplicates("bid", "partner")
        val bbv = DedupOps.verifyJaccard(bb
            .join(batchSigs.select(col("doc_id").as("bid"),
              col("shingles").as("sh_a")), Seq("bid"))
            .join(batchSigs.select(col("doc_id").as("partner"),
              col("shingles").as("sh_b")), Seq("partner")))
          .select(col("bid").as("doc_id"), col("partner"))
        val nd = bcv.unionByName(bbv)
          .groupBy("doc_id").agg(min(col("partner")).as("near_dup_of"))
        // Stateless arms + the batch gate's verdict fold — the SHARED
        // definition (PipelineOps.gateVerdictOf), so stream and batch
        // precedence cannot drift.
        val base = batch.select(col("doc_id"),
          (TextOps.blocklistHits(col("text")) > 0).as("blocked"))
        val qc = PipelineOps.qcServeOf(batch, w0, w1, w2)
          .select(col("doc_id"), col("keep"))
        val exactA = exact.select(col("doc_id"), col("is_dup"),
          col("exact_dup_of"))
        val out = PipelineOps.gateVerdictOf(base, exactA, nd, qc)
        // Idempotent per-delivery sink (the asofRefreshing discipline): a
        // replayed batch rewrites ITS OWN _batch_id partition instead of
        // appending duplicate verdicts — foreachBatch's at-least-once
        // delivery demands the batchId key the sink here uses.
        out.withColumn("_batch_id", lit(batchId))
          .write.option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id").mode("overwrite").parquet(outDir)
        // Advance the index by this delivery's fingerprints (ALL docs —
        // the one-shot gate lets every smaller-id doc partner, whatever
        // its own verdict).
        val batchHash = batch.select(md5(col("text")).as("h"), col("doc_id"))
          .groupBy("h").agg(min(col("doc_id")).as("seen_min"))
        // Durable twin of the in-memory advance: the same idempotent
        // partition-per-batch sink as the verdicts, so the commit file
        // the checkpoint writes after this function returns vouches for
        // BOTH the verdict partition and the index partition.
        // REPLAY CONTRACT (ADVICE r11): dynamic partition overwrite only
        // rewrites partitions present in the NEW data, so a commit-lost
        // batch replayed with DIFFERENT rows (possible only for a
        // non-replayable source) could leave a stale index partition for
        // a sub that previously had rows. ingestGateStream therefore
        // requires a REPLAYABLE source (the standard Structured
        // Streaming exactly-once precondition — the file source used
        // here satisfies it); the lost-commit-replay spec pins the
        // replayable case.
        def persistIndex(df: DataFrame, sub: String): Unit =
          df.withColumn("_batch_id", lit(batchId))
            .write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id").mode("overwrite")
            .parquet(s"$indexDir/$sub")
        persistIndex(batchHash, "hash")
        persistIndex(batchSigs.select("doc_id", "shingles"), "sigs")
        persistIndex(batchBands.select("bucket", "doc_id"), "bands")
        seenHash = Some(Lineage.cut(seenHash.fold(batchHash)(
          _.unionByName(batchHash).groupBy("h")
            .agg(min(col("seen_min")).as("seen_min")))))
        seenSigs = Some(Lineage.cut(seenSigs.fold(
          batchSigs.select("doc_id", "shingles"))(
          _.unionByName(batchSigs.select("doc_id", "shingles")))))
        seenBands = Some(Lineage.cut(seenBands.fold(
          batchBands.select("bucket", "doc_id"))(
          _.unionByName(batchBands.select("bucket", "doc_id")))))
        ()
      }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(perDelivery)
      .start()
  }

  /** Batch ids with a commit file in the checkpoint — the batches a
    * restarted query will SKIP, so exactly the ones whose fingerprints
    * must be rebuilt from the durable index.
    */
  /** Digit-named entries of one checkpoint metadata log (`commits`,
    * `offsets`) — the batch ids that log vouches for. Hadoop FS, not
    * java.io: checkpoints live on the cluster store in production.
    */
  private def loggedBatchIds(spark: SparkSession, checkpoint: String,
      log: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, log)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .map(_.getPath.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).toSet
  }

  /** `_batch_id=N` partition directories already present under a gate
    * output dir (metadata listing only — nothing is read).
    */
  private def batchIdPartitions(spark: SparkSession, outDir: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator.filter(_.isDirectory)
      .map(_.getPath.getName).collect {
        case n if n.startsWith("_batch_id=") && n.drop(10).forall(_.isDigit) =>
          n.drop(10).toLong
      }.toSet
  }

  def assignClusters(stream: DataFrame, model: DataFrame): DataFrame = {
    import graft.queries.SimilarityOps
    val cent = model.select(col("cluster").cast("int"), col("c")).collect()
      .sortBy(_.getInt(0))
      .map { r =>
        struct(lit(r.getInt(0)).as("k"),
          array(r.getSeq[Double](1).map(lit(_)): _*).as("cv"))
      }
    // Distance and cast come from SimilarityOps (distSq / vDouble) — the
    // bit-for-bit parity contract with the batch argmin is one shared
    // definition, not two synced copies.
    val scored = transform(array(cent.toIndexedSeq: _*), c =>
      struct(SimilarityOps.distSq(col("v"), c.getField("cv")).as("dist_sq"),
        c.getField("k").as("cluster")))
    stream
      .select(col("vec_id"), SimilarityOps.vDouble(col("embedding")).as("v"))
      .withColumn("best", array_min(scored))
      .select(col("vec_id"), col("best.cluster").as("cluster"),
        col("best.dist_sq").as("dist_sq"))
  }
}

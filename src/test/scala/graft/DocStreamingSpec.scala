package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocStreaming, EventStreaming}

/** Stream–static join parity: streaming contamination scoring over a
  * document file-stream must reproduce the batch tx_contamination rows
  * exactly (Complete mode, finite replay).
  */
class DocStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("streaming contamination == batch tx_contamination") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val bench = DocStreaming.benchmarkGrams(spark, SparkTestBase.sf)
    val q = EventStreaming.runToMemory(
      DocStreaming.contaminationScores(stream, bench), "contam_out")
    try {
      val streamed = spark.table("contam_out")
        .select("doc_id", "source", "n_grams", "n_hit", "contamination")
      val batch = SparkEntry.queries("tx_contamination")(spark, SparkTestBase.sf)
        .select("doc_id", "source", "n_grams", "n_hit", "contamination")
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch contamination mismatch")
    } finally q.stop()
  }

  test("streaming dup-span gate == batch d9_dup_spans (corpus replayed against own counts)") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_span_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val counts = DocStreaming.corpusWindowCounts(spark, SparkTestBase.sf)
    val q = EventStreaming.runToMemory(
      DocStreaming.dupSpanScores(stream, counts), "span_out")
    try {
      val streamed = spark.table("span_out")
        .select("doc_id", "n_windows", "n_dup_windows", "dup_frac_e6")
      val batch = SparkEntry.queries("d9_dup_spans")(spark, SparkTestBase.sf)
        .select("doc_id", "n_windows", "n_dup_windows", "dup_frac_e6")
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch dup-span mismatch")
    } finally q.stop()
  }

  test("streaming near-dup screen == batch d14's batch×corpus pairs " +
       "aggregated per arriving doc") {
    import graft.queries.DedupOps
    val sf = SparkTestBase.sf
    val docs = Tables.documents(spark, sf)
    val batchIds = docs.where(col("source") === DedupOps.IncomingSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.where(col("source") === DedupOps.IncomingSource)
      .write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val q = EventStreaming.runToMemory(
      DocStreaming.neardupScreenStream(stream,
        DedupOps.corpusIndexBands(spark, sf),
        DedupOps.corpusIndexSigs(spark, sf)), "neardup_out")
    try {
      val streamed = spark.table("neardup_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      // Batch model: d14's pairs with exactly one batch endpoint,
      // re-oriented (batch doc, corpus partner), aggregated with the
      // same duplicate-insensitive count and (-jaccard, corpus_id)
      // tie-broken best pick.
      val bc = SparkEntry.queries("d14_incremental_minhash")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .flatMap { case (a, b, j) =>
          if (batchIds(a) && !batchIds(b)) Some((a, b, j))
          else if (batchIds(b) && !batchIds(a)) Some((b, a, j))
          else None
        }
      val expected = bc.groupBy(_._1).map { case (d, ps) =>
        val best = ps.minBy(p => (-p._3, p._2))
        d -> (ps.map(_._2).distinct.length.toLong, best._2, best._3)
      }
      assert(streamed == expected,
        s"stream $streamed vs batch model $expected")
      assert(expected.nonEmpty, "vacuous without batch×corpus near-dups")
    } finally q.stop()
  }

  test("streaming PNG decode == batch mm_decode_png, stateless real-codec plan") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_png_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val decoded = DocStreaming.decodePngStream(stream)
    val q = EventStreaming.runToMemory(decoded, "png_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      // Stateless contract on the RUNNING query's progress: zero state
      // operators catches any stateful op (agg, dedup, stream-stream
      // join, *GroupsWithState), where a plan-text substring test would
      // not — and the memory-sink table's plan is a LocalRelation where
      // state could never appear at all.
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "decode stream must not be stateful")
      val streamed = spark.table("png_out")
        .select("doc_id", "width", "height", "px_sum")
      val batch = SparkEntry.queries("mm_decode_png")(spark, SparkTestBase.sf)
        .select("doc_id", "width", "height", "px_sum")
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch PNG decode mismatch")
    } finally q.stop()
  }

  test("streaming winnowing == batch tx_winnow, stateless per-row plan") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_winnow_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val q = EventStreaming.runToMemory(DocStreaming.winnowStream(stream),
      "winnow_out", org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "winnow stream must not be stateful")
      val streamed = spark.table("winnow_out")
      val batch = SparkEntry.queries("tx_winnow")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch winnow mismatch")
    } finally q.stop()
  }

  test("streaming HTML strip == batch tx_html_strip, stateless per-row plan") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_html_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val q = EventStreaming.runToMemory(DocStreaming.htmlStripStream(stream),
      "html_out", org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "html strip stream must not be stateful")
      val streamed = spark.table("html_out")
      val batch = SparkEntry.queries("tx_html_strip")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch html strip mismatch")
    } finally q.stop()
  }

  test("streaming ANN serve == batch ann_batch_topk for the batch " +
       "queries, stateless literal-index plan; oversized index fails fast") {
    import graft.queries.SimilarityOps.BatchQueries
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    emb.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(emb.schema).parquet(dir)
    val q = EventStreaming.runToMemory(
      DocStreaming.annServeStream(spark, stream, emb),
      "ann_serve_out", org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "ANN serve stream must not be stateful")
      val streamed = spark.table("ann_serve_out")
        .where(col("query_id") < BatchQueries)
      val batch = SparkEntry.queries("ann_batch_topk")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch ANN serve mismatch")
    } finally q.stop()
    // The fail-fast gate: an index estimated past the broadcast bound
    // must refuse BEFORE collecting.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val e = intercept[IllegalArgumentException] {
        DocStreaming.annServeStream(spark, stream, emb)
      }
      assert(e.getMessage.contains("exceeds"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("streaming quality-filter serve == batch pipe_quality_filter, " +
       "stateless frozen-weights plan") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_qc_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    // Weights frozen from the SAME materialized training the batch serve
    // reads — stream and batch must agree to the bit.
    val (w0, w1, w2) =
      graft.queries.PipelineOps.qcTrainedWeights(spark, SparkTestBase.sf)
    val q = EventStreaming.runToMemory(
      DocStreaming.qualityFilterStream(stream, w0, w1, w2),
      "qc_out", org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "quality-filter stream must not be stateful")
      val streamed = spark.table("qc_out")
      val batch = SparkEntry.queries("pipe_quality_filter")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch quality-filter mismatch")
    } finally q.stop()
  }

  test("streaming curriculum assignment == batch phase rule under the " +
       "same frozen cuts, stateless, non-degenerate phases") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.queries.PipelineOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_curr_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val (w0, w1, w2) = PipelineOps.qcTrainedWeights(spark, SparkTestBase.sf)
    val (t25, t50, t75) = PipelineOps.curriculumCuts(spark, SparkTestBase.sf)
    assert(t25 <= t50 && t50 <= t75, "sketch cuts must be monotone")
    val q = EventStreaming.runToMemory(
      DocStreaming.curriculumAssignStream(stream, w0, w1, w2, t25, t50, t75),
      "curr_out", org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "curriculum serve must not be stateful")
      val streamed = spark.table("curr_out")
      // Batch expectation THROUGH THE STREAM-INDEPENDENT path: the same
      // shared definitions executed as a batch plan on the same rows.
      val batch = PipelineOps.qcServeOf(docs, w0, w1, w2)
        .select(col("doc_id"), col("z"),
          PipelineOps.phaseOf(col("z").cast("double"),
            lit(t25), lit(t50), lit(t75)).as("phase"))
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch curriculum assignment mismatch")
      // Non-vacuity: the corpus spreads across more than one phase and
      // every phase label is in range.
      val phases = streamed.select("phase").distinct().collect()
        .map(_.getInt(0)).toSet
      assert(phases.subsetOf(Set(1, 2, 3, 4)) && phases.size >= 2,
        s"degenerate phase spread: $phases")
    } finally q.stop()
  }

  test("streaming CDC chunking == batch tx_cdc_chunk, stateless explode plan") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val chunks = DocStreaming.cdcChunkStream(stream)
    val q = EventStreaming.runToMemory(chunks, "cdc_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "chunk stream must not be stateful")
      val streamed = spark.table("cdc_out")
      val batch = SparkEntry.queries("tx_cdc_chunk")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch CDC chunks mismatch")
    } finally q.stop()
  }

  test("streaming BPE encode == batch tx_bpe_apply, stateless frozen-vocab plan") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    // Train offline on the batch corpus; the stream applies the frozen
    // merge table.
    val merges = graft.queries.BpeOps
      .trainedMerges(spark, SparkTestBase.sf, graft.queries.BpeOps.DefaultMerges)
      .map(m => (m.l, m.r))
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val encoded = DocStreaming.bpeEncodeStream(stream, merges)
    val q = EventStreaming.runToMemory(encoded, "bpe_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      // Stateless contract on the RUNNING query's progress (see the PNG
      // test for why plan-text checks are the wrong instrument).
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "frozen-vocab encode must not be stateful")
      val streamed = spark.table("bpe_out").select("doc_id", "n_tokens", "tok_md5")
      val batch = SparkEntry.queries("tx_bpe_apply")(spark, SparkTestBase.sf)
        .select("doc_id", "n_tokens", "tok_md5")
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch BPE mismatch")
    } finally q.stop()
  }

  test("streaming cluster assignment == batch kmeans assignment, stateless plan") {
    val emb = Tables.embeddings(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    emb.write.mode("overwrite").parquet(dir)
    val model = graft.queries.SimilarityOps.kmeansModel(spark, SparkTestBase.sf)
    val stream = DocStreaming.docStream(spark, dir, emb.schema)
    val assigned = DocStreaming.assignClusters(stream, model)
    val q = EventStreaming.runToMemory(assigned, "kmeans_stream_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("kmeans_stream_out")
      val batch = SparkEntry.queries("vq_kmeans")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch cluster assignment mismatch")
    } finally q.stop()
    // Append mode succeeded without watermark → no stateful aggregation
    // was present (Spark rejects unwatermarked streaming aggregations in
    // Append); plus an explicit plan check:
    assert(!assigned.queryExecution.analyzed.toString.toLowerCase.contains("aggregate"),
      "assignment must be a stateless per-row projection")
  }

  test("streaming per-source quota == batch tx_domain_quota, one counter per source") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_quota_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val admitted = DocStreaming.quotaStream(spark, stream,
      graft.queries.TextOps.DomainQuotaN)
    val q = EventStreaming.runToMemory(admitted, "quota_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("quota_out").select("doc_id", "source", "rn")
      val batch = SparkEntry.queries("tx_domain_quota")(spark, SparkTestBase.sf)
        .select("doc_id", "source", "rn")
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch quota admission mismatch")
    } finally q.stop()
  }

  test("streaming drift histogram == batch cur side; PSI over it equals " +
       "batch pipe_drift_psi; state bounded by langs x bins") {
    import graft.queries.{DedupOps, PipelineOps}
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val cur = docs.where(col("source") === DedupOps.IncomingSource)
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    cur.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val q = EventStreaming.runToMemory(
      DocStreaming.driftHistStream(stream), "drift_hist")
    try {
      val streamedCur = spark.table("drift_hist").select("lang", "bin", "cnt")
      // The unbounded stream reduced to a bounded sufficient statistic.
      val nLangs = docs.select("lang").distinct().count()
      assert(streamedCur.count() <= nLangs * PipelineOps.DriftNBins,
        "histogram state must be bounded by langs x bins")
      // Finishing the streamed histogram against the static reference
      // reproduces the batch monitor EXACTLY (same integer counts ->
      // same doubles -> same micros).
      val ref = docs.where(col("source") =!= DedupOps.IncomingSource)
        .select(col("lang"), PipelineOps.driftBin(col("text")).as("bin"))
        .groupBy("lang", "bin").agg(count(lit(1)).as("cnt"))
      val streamedPsi = PipelineOps.driftPsiOfCounts(ref, streamedCur)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val batchPsi = SparkEntry.queries("pipe_drift_psi")(spark, SparkTestBase.sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamedPsi == batchPsi, "stream/batch drift PSI mismatch")
    } finally q.stop()
  }

  test("streaming dedup emits exactly the batch-distinct hash set") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .withColumn("ingest_ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    // One file → one micro-batch: every duplicate is inside the horizon.
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val q = EventStreaming.runToMemory(
      DocStreaming.dedupStream(stream, "10 minutes"), "dedup_stream_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("dedup_stream_out")
      val perHash = streamed.groupBy("content_hash").count().collect()
      assert(perHash.nonEmpty && perHash.forall(_.getLong(1) == 1L),
        "each hash must be emitted exactly once")
      val batchHashes = SparkEntry.queries("d1_exact_dedup")(spark, SparkTestBase.sf)
        .select("content_hash")
      assert(streamed.select("content_hash").exceptAll(batchHashes).isEmpty &&
        batchHashes.exceptAll(streamed.select("content_hash")).isEmpty,
        "streamed hash set must equal the batch-distinct set")
    } finally q.stop()
  }

  test("streaming dedup state is bounded: expired hashes re-emit, in-horizon dupes do not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_ttl").toString
    graft.core.Fs.deleteOnExit(dir)
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    def write(rows: (Long, String, java.sql.Timestamp)*): Unit =
      rows.toDF("doc_id", "text", "ingest_ts")
        .coalesce(1).write.mode("append").parquet(dir)
    write((1L, "dup text", t(0)), (3L, "filler", t(0)))
    val schema = spark.read.parquet(dir).schema
    val stream = DocStreaming.docStream(spark, dir, schema)
    val q = EventStreaming.runToMemory(
      DocStreaming.dedupStream(stream, "10 minutes"), "dedup_ttl_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      q.processAllAvailable()
      // In-horizon duplicate: suppressed by existing state.
      write((4L, "dup text", t(2)))
      q.processAllAvailable()
      // Clock jump far past the hash's expiry (t0+10min) evicts its state
      // in the batch that advances the watermark (the operator exists
      // since Spark 3.5; eviction uses the CURRENT batch's watermark)...
      write((5L, "clock advance", t(60)))
      q.processAllAvailable()
      // ...so the same text arriving after the horizon is NEW again.
      write((6L, "dup text", t(61)))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val dupRows = spark.table("dedup_ttl_out")
        .where(col("doc_id").isin(1L, 4L, 6L)).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(dupRows == Set(1L, 6L),
        s"got $dupRows: in-horizon dup must be suppressed, post-horizon dup must re-emit")
      // State ∝ keys within the watermark horizon, NOT the corpus: four
      // distinct texts streamed, but after the clock jump only the hashes
      // whose expiry is still ahead of the watermark may hold state rows.
      val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(stateRows < 4 && stateRows >= 1,
        s"state rows = $stateRows: expired hashes must be evicted " +
          "(4 distinct texts were streamed)")
    } finally q.stop()
  }

  test("streaming chunk dedup (d11 twin): surviving chunk-hash set equals " +
       "the batch distinct set; chunk text never reaches the state store") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .withColumn("ingest_ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk_dedup_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    // One file → one micro-batch: every duplicate is inside the horizon.
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val deduped = DocStreaming.chunkDedupStream(stream, "10 minutes")
    // The d11 discipline survives streaming: only fingerprint tuples flow
    // into the stateful operator — no text column downstream of chunking.
    assert(!deduped.schema.fieldNames.contains("text"),
      deduped.schema.fieldNames.mkString(","))
    val q = EventStreaming.runToMemory(deduped, "chunk_dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("chunk_dedup_out")
      val perHash = streamed.groupBy("chunk_hash").count().collect()
      assert(perHash.nonEmpty && perHash.forall(_.getLong(1) == 1L),
        "each chunk hash must survive exactly once")
      // Batch twin: the distinct chunk-hash set of the same corpus slice,
      // by the SAME shared chunk definition (cdcChunkSpansOf).
      val batchHashes = graft.queries.TextOps
        .cdcChunkSpansOf(Tables.documents(spark, SparkTestBase.sf))
        .select("chunk_hash").distinct()
      assert(streamed.select("chunk_hash").exceptAll(batchHashes).isEmpty &&
        batchHashes.exceptAll(streamed.select("chunk_hash")).isEmpty,
        "streamed surviving set must equal the batch distinct chunk set")
      // State is keyed by chunk hash within the horizon: row count equals
      // the distinct-hash count, not the (larger) streamed chunk count.
      val stateRows = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(stateRows == batchHashes.count(),
        s"state rows = $stateRows, expected = distinct chunk hashes")
    } finally q.stop()
  }

  test("stream side of the contamination join does not shuffle for the join") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val bench = DocStreaming.benchmarkGrams(spark, SparkTestBase.sf)
    // Same plan shape in batch: the join itself must be broadcast (the
    // only Exchange is the final per-doc aggregation's).
    val plan = DocStreaming.contaminationScores(docs, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "stream-static join must broadcast")
  }

  test("streaming JSONL landing reader == batch PERMISSIVE parse: same " +
       "parsed rows, same quarantined lines, zero state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    val docs = Tables.documents(spark, SparkTestBase.sf).limit(50)
    val good = docs.select(to_json(struct(col("doc_id"), col("lang"),
      col("n_chars"), col("text"))).as("value"))
    val bad = Seq("{\"doc_id\": 1, \"lang\": \"tru", "not json at all")
      .toDF("value")
    good.unionByName(bad).coalesce(1).write.mode("overwrite").text(dir)
    val q = EventStreaming.runToMemory(
      DocStreaming.jsonlDocStream(spark, dir), "jsonl_stream_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("jsonl_stream_out")
      val batch = spark.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, text STRING, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt").json(dir)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch JSONL parse mismatch")
      assert(streamed.where(col("_corrupt").isNotNull).count() == 2,
        "both planted lines must quarantine as rows")
      assert(streamed.where(col("_corrupt").isNull).count() == 50)
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty,
        "the landing reader must be stateless")
    } finally q.stop()
  }

  // ---- composed streaming ingest gate ----

  private def gateVerdicts(outDir: String): Map[Long, (String, Option[Long])] =
    spark.read.parquet(outDir).collect().map { r =>
      r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap

  private def batchGateVerdicts(): Map[Long, (String, Option[Long])] =
    SparkEntry.queries("pipe_ingest_gate")(spark, SparkTestBase.sf)
      .collect().map { r =>
        r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toMap

  test("streaming ingest gate == batch pipe_ingest_gate: one delivery") {
    import graft.queries.DedupOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val incoming = docs.where(col("source") === DedupOps.IncomingSource)
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_gate_out").toString + "/v"
    graft.core.Fs.deleteOnExit(dir)
    incoming.coalesce(1).write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val q = DocStreaming.ingestGateStream(spark, stream, SparkTestBase.sf, out)
    try {
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val streamed = gateVerdicts(out)
      val batch = batchGateVerdicts()
      assert(streamed == batch,
        s"stream/batch gate mismatch: ${streamed.toSeq.diff(batch.toSeq).take(5)}")
      // Non-vacuity: the corpus batch must exercise several arms (at
      // this SF it hits blocked/near_dup/low_quality/admitted; exact
      // dups are planted in the split-delivery test below).
      val kinds = batch.values.map(_._1).toSet
      assert(Set("admitted", "near_dup", "blocked").subsetOf(kinds),
        s"arms hit: $kinds")
    } finally q.stop()
  }

  test("END-TO-END landing path: JSONL delivery (with corrupt lines) → " +
       "streaming parse → quarantine filter → ingest gate == batch gate") {
    import spark.implicits._
    import graft.queries.DedupOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val incoming = docs.where(col("source") === DedupOps.IncomingSource)
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e_landing").toString
    val out = java.nio.file.Files.createTempDirectory("graft_e2e_out").toString + "/v"
    graft.core.Fs.deleteOnExit(dir)
    // The delivery as it actually arrives: JSON lines + torn uploads.
    val good = incoming.select(to_json(struct(col("doc_id"), col("lang"),
      col("n_chars"), col("text"), col("source"))).as("value"))
    val bad = Seq("{\"doc_id\": 99", "garbage line").toDF("value")
    good.unionByName(bad).coalesce(1).write.mode("overwrite").text(dir)
    val landed = spark.readStream
      .schema("doc_id LONG, lang STRING, n_chars LONG, text STRING, " +
        "source STRING, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
    val clean = landed.where(col("_corrupt").isNull).drop("_corrupt")
    val q = DocStreaming.ingestGateStream(spark, clean, SparkTestBase.sf, out)
    try {
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val streamed = gateVerdicts(out)
      val batch = batchGateVerdicts()
      assert(streamed == batch,
        s"landing-path mismatch: ${streamed.toSeq.diff(batch.toSeq).take(5)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming ingest gate: split deliveries == one-shot delivery on a " +
       "planted batch (cross-delivery exact + near dup state)") {
    import spark.implicits._
    import graft.queries.{DedupOps, TextOps}
    val docs = Tables.documents(spark, SparkTestBase.sf)
    // A clean corpus doc to copy (blocked would pre-empt exact_dup).
    val corpusRow = docs.where(col("source") =!= DedupOps.IncomingSource)
      .where(TextOps.blocklistHits(col("text")) === 0)
      .orderBy("doc_id").limit(1).collect()(0)
    val (corpusId, corpusText) = (corpusRow.getLong(0), corpusRow.getString(1))
    val nearA = (1 to 60).map(i => s"zqplant$i").mkString(" ")
    val nearB = ((1 to 59).map(i => s"zqplant$i") :+ "zqchanged").mkString(" ")
    val dupText = (1 to 25).map(i => s"zqfresh$i").mkString(" ")
    val unique = (1 to 25).map(i => s"zqlone$i").mkString(" ")
    def row(id: Long, text: String) =
      (id, text, "en", DedupOps.IncomingSource, text.length.toLong)
    // Delivery 1: ids < 10004; delivery 2: the rest — id-ordered replay.
    val delivery1 = Seq(row(10001L, corpusText), row(10002L, dupText),
      row(10003L, nearA))
    val delivery2 = Seq(row(10005L, dupText), row(10006L, nearB),
      row(10007L, unique))
    def runGate(splits: Seq[Seq[(Long, String, String, String, Long)]])
        : Map[Long, (String, Option[Long])] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_gate_pl").toString
      val out = java.nio.file.Files.createTempDirectory("graft_gate_plo").toString + "/v"
      graft.core.Fs.deleteOnExit(dir)
      splits.head.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(dir)
      val stream = DocStreaming.docStream(spark, dir, docs.schema)
      val q = DocStreaming.ingestGateStream(spark, stream, SparkTestBase.sf, out)
      try {
        q.processAllAvailable()
        splits.tail.foreach { s =>
          s.toDF("doc_id", "text", "lang", "source", "n_chars")
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
        assert(q.exception.isEmpty, s"query died: ${q.exception}")
        gateVerdicts(out)
      } finally q.stop()
    }
    val oneShot = runGate(Seq(delivery1 ++ delivery2))
    val split = runGate(Seq(delivery1, delivery2))
    assert(split == oneShot,
      s"split vs one-shot: ${split.toSeq.diff(oneShot.toSeq)}")
    // Planted cross-delivery verdicts: the second copy of dupText owes
    // its keeper to delivery 1; the near variant to its delivery-1 twin;
    // the corpus copy to the corpus index.
    assert(split(10005L) == ("exact_dup", Some(10002L)), s"got: $split")
    assert(split(10006L) == ("near_dup", Some(10003L)), s"got: $split")
    assert(split(10001L)._1 == "exact_dup" &&
      split(10001L)._2.contains(corpusId), s"got: $split")
    assert(split(10007L)._2.isEmpty, s"unique doc must not attribute: $split")
  }

  test("streaming ingest gate RESTART: kill after delivery 1, restart from " +
       "the same checkpoint, cross-delivery dups in delivery 2 still caught") {
    import spark.implicits._
    import graft.queries.DedupOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dupText = (1 to 25).map(i => s"zqrst$i").mkString(" ")
    val nearA = (1 to 60).map(i => s"zqrpl$i").mkString(" ")
    val nearB = ((1 to 59).map(i => s"zqrpl$i") :+ "zqrchanged").mkString(" ")
    val unique = (1 to 25).map(i => s"zqrlone$i").mkString(" ")
    def row(id: Long, text: String) =
      (id, text, "en", DedupOps.IncomingSource, text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_rst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_rstck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_gate_rsto").toString + "/v"
    graft.core.Fs.deleteOnExit(dir); graft.core.Fs.deleteOnExit(ckpt)
    Seq(row(20001L, dupText), row(20002L, nearA))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val q1 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
      out, Some(ckpt))
    try {
      q1.processAllAvailable()
      assert(q1.exception.isEmpty, s"first run died: ${q1.exception}")
    } finally q1.stop()
    // Delivery 2 lands while the gate is DOWN; the restarted query must
    // screen it against delivery 1's PERSISTED fingerprints — with the
    // old driver-memory-only index these two verdicts were silently
    // 'admitted'.
    Seq(row(20005L, dupText), row(20006L, nearB), row(20007L, unique))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val q2 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
      out, Some(ckpt))
    try {
      q2.processAllAvailable()
      assert(q2.exception.isEmpty, s"restarted run died: ${q2.exception}")
      val v = gateVerdicts(out)
      assert(v(20005L) == ("exact_dup", Some(20001L)),
        s"cross-restart exact dup missed: $v")
      assert(v(20006L) == ("near_dup", Some(20002L)),
        s"cross-restart near dup missed: $v")
      assert(v(20007L)._2.isEmpty, s"unique doc must not attribute: $v")
      assert(v.contains(20001L) && v.contains(20002L),
        s"pre-restart verdicts must be retained: $v")
    } finally q2.stop()
    // Stage 3 — simulate spark.sql.streaming.minBatchesToRetain purging
    // the oldest COMMIT entry (what a >100-delivery production gate
    // looks like on restart: the commits listing is a recent suffix, so
    // naive isin(commits) accounting would flag batch 0 as an orphan and
    // drop its fingerprints). Batches commit sequentially, so
    // [0, max(commits)] is the sound committed set and batch 0 must
    // still rebuild from the durable index. The offsets entry stays:
    // Spark's own restart requires the latest-1 offsets entry, and real
    // retention (min 2 batches) always preserves it.
    assert(new java.io.File(ckpt, "commits/0").delete(),
      "test premise: batch 0's commit entry must exist to be purged")
    new java.io.File(ckpt, "commits/.0.crc").delete(): Unit
    Seq(row(20009L, dupText))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val q3 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
      out, Some(ckpt))
    try {
      q3.processAllAvailable()
      assert(q3.exception.isEmpty, s"post-purge restart died: ${q3.exception}")
      val v3 = gateVerdicts(out)
      assert(v3(20009L) == ("exact_dup", Some(20001L)),
        s"purged-log restart must still rebuild batch 0's fingerprints: $v3")
    } finally q3.stop()
  }

  test("streaming ingest gate REPLAY: a delivery whose commit was lost " +
       "re-runs idempotently — verdicts AND the durable index land " +
       "identically, the lineage guard accepts the in-flight partition") {
    import spark.implicits._
    import graft.queries.DedupOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dupText = (1 to 25).map(i => s"zqrp$i").mkString(" ")
    val unique = (1 to 25).map(i => s"zqrpu$i").mkString(" ")
    def row(id: Long, text: String) =
      (id, text, "en", DedupOps.IncomingSource, text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_rp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_rpck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_gate_rpo").toString + "/v"
    graft.core.Fs.deleteOnExit(dir); graft.core.Fs.deleteOnExit(ckpt)
    def deliver(rows: Seq[(Long, String, String, String, Long)]): Unit =
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("append").parquet(dir)
    deliver(Seq(row(40001L, dupText)))
    val q1 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
      out, Some(ckpt))
    try {
      q1.processAllAvailable()
      deliver(Seq(row(40005L, dupText), row(40006L, unique)))
      q1.processAllAvailable()
      assert(q1.exception.isEmpty, s"query died: ${q1.exception}")
    } finally q1.stop()
    val before = gateVerdicts(out)
    assert(before(40005L) == ("exact_dup", Some(40001L)), s"got: $before")
    // Lose batch 1's commit — the at-least-once window foreachBatch
    // must survive: the verdict partition and all three index
    // partitions for batch 1 exist on disk but nothing vouches for them.
    val commit1 = new java.io.File(ckpt, "commits/1")
    assert(commit1.isFile, "test premise: two committed batches")
    assert(commit1.delete())
    // Local-FS artifact: ChecksumFs keeps a .crc sidecar per log file;
    // losing the commit means losing both (a real cluster store has no
    // sidecar, and a stale one here blocks the replay's rename).
    new java.io.File(ckpt, "commits/.1.crc").delete(): Unit
    val q2 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
      out, Some(ckpt))
    try {
      q2.processAllAvailable()
      assert(q2.exception.isEmpty, s"replay run died: ${q2.exception}")
      assert(gateVerdicts(out) == before,
        "replayed batch must overwrite its own partitions, changing nothing")
      // The durable index holds exactly the two batch partitions — the
      // replay rewrote, never duplicated.
      Seq("hash", "sigs", "bands").foreach { sub =>
        val parts = new java.io.File(s"$out/_index/$sub").listFiles()
          .filter(_.isDirectory).map(_.getName).toSet
        assert(parts == Set("_batch_id=0", "_batch_id=1"),
          s"index $sub partitions: $parts")
      }
    } finally q2.stop()
  }

  test("ingest gate fails fast when outDir holds partitions from another " +
       "checkpoint's lineage") {
    import spark.implicits._
    import graft.queries.DedupOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    def row(id: Long, text: String) =
      (id, text, "en", DedupOps.IncomingSource, text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_lin").toString
    val out = java.nio.file.Files.createTempDirectory("graft_gate_lino").toString + "/v"
    graft.core.Fs.deleteOnExit(dir)
    Seq(row(30001L, (1 to 25).map(i => s"zqlin$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    // First run: fresh (implicit temp) checkpoint populates outDir.
    val q1 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf, out)
    try {
      q1.processAllAvailable()
      assert(q1.exception.isEmpty, s"seed run died: ${q1.exception}")
    } finally q1.stop()
    // Second run with a DIFFERENT fresh checkpoint pointed at the same
    // outDir: its lineage accounts for none of the existing partitions.
    val ex = intercept[IllegalStateException] {
      DocStreaming.ingestGateStream(spark,
        DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf, out)
    }
    assert(ex.getMessage.contains("lineage"), ex.getMessage)
  }

  test("ingest gate fails fast when the committed history's outDir was " +
       "wiped: a restart must not silently admit cross-delivery dups") {
    import spark.implicits._
    import graft.queries.DedupOps
    val docs = Tables.documents(spark, SparkTestBase.sf)
    def row(id: Long, text: String) =
      (id, text, "en", DedupOps.IncomingSource, text.length.toLong)
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_wipe").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gate_wipeck").toString
    val outRoot = java.nio.file.Files.createTempDirectory("graft_gate_wipeo").toString
    val out = outRoot + "/v"
    graft.core.Fs.deleteOnExit(dir); graft.core.Fs.deleteOnExit(ckpt)
    Seq(row(31001L, (1 to 25).map(i => s"zqwip$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val q1 = DocStreaming.ingestGateStream(spark,
      DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
      out, Some(ckpt))
    try {
      q1.processAllAvailable()
      assert(q1.exception.isEmpty, s"seed run died: ${q1.exception}")
    } finally q1.stop()
    // The checkpoint committed delivery 1, but its output (verdicts AND
    // the _index fingerprints) disappears — the silent-vacuous-guards
    // case ADVICE r11 flagged: with no partitions to account for, both
    // the orphan and coverage checks pass and the seen-state rebuilds
    // as None, admitting dups against the pre-wipe delivery.
    graft.core.Fs.deleteRecursively(out)
    val ex = intercept[IllegalStateException] {
      DocStreaming.ingestGateStream(spark,
        DocStreaming.docStream(spark, dir, docs.schema), SparkTestBase.sf,
        out, Some(ckpt))
    }
    assert(ex.getMessage.contains("wiped or relocated"), ex.getMessage)
  }
}

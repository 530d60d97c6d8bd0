package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreaming

/** Structured-Streaming ↔ batch parity: the streaming window queries must
  * produce exactly the batch results on the same data.
  */
class EventStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    Tables.events(spark, SparkTestBase.sf).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling windows == batch tumbling windows") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.tumblingCounts(stream), "tumbling_out")
    try {
      val streamed = spark.table("tumbling_out")
        .select("w_start", "event_type", "n", "value_cents")
      val batch = graft.queries.EventOps.queries("ev_tumbling")(spark, SparkTestBase.sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch mismatch")
    } finally q.stop()
  }

  test("streaming windowed HLL distinct == batch exact count distinct (sparse regime)") {
    import org.apache.spark.sql.functions._
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.windowDistinctUsers(stream), "hll_windows_out")
    try {
      val streamed = spark.table("hll_windows_out").select("w_start", "n_users")
      val batch = Tables.events(spark, SparkTestBase.sf)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"), col("n_users"))
      // At per-window cardinalities the lgK=14 sketch is coupon-exact, so
      // the streaming estimates equal the exact batch distinct counts —
      // the same exactness contract q_hll_distinct's oracle pins.
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream sketch/batch exact mismatch")
    } finally q.stop()
  }

  test("streaming windowed KMV audience sketches: EXACT batch parity " +
       "(deterministic sketch) and exact estimates in the unsaturated regime") {
    import org.apache.spark.sql.functions._
    import graft.functions.KmvSketch._
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.windowAudienceSketch(stream), "kmv_windows_out")
    try {
      val streamed = spark.table("kmv_windows_out").collect()
        .map(r => (r.get(0), r.getString(1), r.getSeq[Long](2), r.getLong(3)))
        .toSet
      assert(streamed.nonEmpty)
      // Batch truth: KMV is deterministic, so the streamed sketch ARRAYS
      // and estimates must equal the batch build bit-for-bit (the KLL
      // twin can only assert rank bands; this one is exact).
      val batch = Tables.events(spark, SparkTestBase.sf)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(kmv_sketch_agg(graft.functions.GraftFunctions.md5_64(
          col("user_id").cast("string"))).as("sk"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("event_type"), col("sk"), kmv_est_milli(col("sk")).as("est_milli"))
        .collect()
        .map(r => (r.get(0), r.getString(1), r.getSeq[Long](2), r.getLong(3)))
        .toSet
      assert(streamed == batch, "stream/batch KMV sketch mismatch")
      // This SF's windows are far under K distinct users → the estimate
      // is the exact distinct count.
      val exact = Tables.events(spark, SparkTestBase.sf)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"),
          col("event_type"), col("n"))
        .collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
      streamed.foreach { case (w, t, _, estMilli) =>
        assert(estMilli == exact((w, t)) * 1000L,
          s"($w, $t): est $estMilli vs exact ${exact((w, t))}")
      }
    } finally q.stop()
  }

  test("streaming windowed KLL quantiles: every per-window estimate holds " +
       "the inclusive rank bound against the batch values") {
    import org.apache.spark.sql.functions._
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.windowValueQuantiles(stream), "kll_windows_out")
    try {
      val streamed = spark.table("kll_windows_out")
        .select("w_start", "p50_cents", "p95_cents").collect()
        .map(r => (r.get(0), r.getDouble(1), r.getDouble(2))).toSeq
      assert(streamed.nonEmpty)
      // Batch truth: the window's exact value multiset; KLL compaction is
      // randomized, so the contract is each estimate's true INCLUSIVE
      // rank within the (generously slacked) bound — the q_kll_quantiles
      // oracle discipline applied per window.
      val batch = Tables.events(spark, SparkTestBase.sf)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(collect_list(round(col("value") * 100).cast("long")).as("vs"))
        .select(col("window.start").cast("timestamp_ntz").as("w_start"), col("vs"))
        .collect()
        .map(r => r.get(0) -> r.getSeq[Long](1).sorted).toMap
      assert(streamed.map(_._1).toSet == batch.keySet, "window set mismatch")
      for ((w, p50, p95) <- streamed; (p, est) <- Seq((0.5, p50), (0.95, p95))) {
        val vs = batch(w)
        // Discrete, TIE-AWARE form of the rank bound (windows can be
        // tiny and values can repeat): the estimate occupies the item-
        // rank run (count(<est), count(<=est)]; that interval must come
        // within max(1, ε·n) of the ⌈p·n⌉ target — the 1-item floor
        // because ranks are integral, the interval because a repeated
        // value's whole run is one legitimate answer.
        val target = math.ceil(p * vs.size)
        val slack = math.max(1.0, graft.queries.Relational.KllRankEps * vs.size)
        val rLo = vs.count(_ < est.toLong)
        val rHi = vs.count(_ <= est.toLong)
        assert(rLo <= target + slack && rHi >= target - slack,
          s"window $w p=$p: est $est spans item-ranks ($rLo, $rHi] of " +
            s"n=${vs.size}, target $target")
      }
    } finally q.stop()
  }

  test("streaming session windows == batch session windows") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.sessionCounts(stream), "sessions_out")
    try {
      val streamed = spark.table("sessions_out")
        .select("user_id", "session_start", "session_end", "n")
      val batch = graft.queries.EventOps.queries("ev_sessions")(spark, SparkTestBase.sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch session mismatch")
    } finally q.stop()
  }

  test("streaming dedup drops duplicates with bounded state") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    // Duplicate the stream source: every event appears twice.
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val ev = Tables.events(spark, SparkTestBase.sf)
    ev.unionAll(ev).write.mode("overwrite").parquet(dupDir)
    val stream = EventStreaming.eventStream(spark, dupDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.dedupedEvents(stream), "dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val n = spark.table("dedup_out")
        .select("user_id", "event_type", "ts").distinct().count()
      val expected = ev.select("user_id", "event_type", "ts").distinct().count()
      assert(n == expected, s"streamed $n vs batch-distinct $expected")
    } finally q.stop()
  }

  test("streaming first-touch: finalized keys exactly match batch ev_first_touch") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.firstTouches(spark, stream), "ft_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("ft_out")
        .select(col("user_id"), col("event_type"), col("first_event_id"),
          col("first_ts").cast("timestamp_ntz").as("first_ts"), col("first_value"))
      val batch = graft.queries.EventOps.queries("ev_first_touch")(spark, SparkTestBase.sf)
      // Every emitted row is watermark-finalized, so it must be bit-equal
      // to a batch row (no false or duplicate emissions)...
      assert(streamed.count() == streamed.distinct().count(), "duplicate emission")
      assert(streamed.exceptAll(batch).isEmpty, "streamed row not in batch result")
      // ...and every key whose first touch is clearly behind the final
      // watermark (max ts − 1 s delay, 2 s margin) must have emitted.
      val maxTs = Tables.events(spark, SparkTestBase.sf)
        .agg(max(col("ts"))).head.getTimestamp(0)
      val horizon = new java.sql.Timestamp(maxTs.getTime - 2000L)
      val mustHave = batch.where(col("first_ts") < lit(horizon).cast("timestamp_ntz"))
      assert(mustHave.exceptAll(streamed).isEmpty,
        "finalized key missing from stream output")
      assert(streamed.count() > 0, "no key finalized")
    } finally q.stop()
  }

  test("first-touch tombstone: a key returning after finalization never re-emits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ft_multi").toString
    graft.core.Fs.deleteOnExit(dir)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // One parquet file per micro-batch (maxFilesPerTrigger=1), mtime/path
    // ordered. Watermark delay is 1 s.
    val files = Seq(
      // b1: the key's true first touch + a watermark pusher.
      Seq((1L, ts("2020-01-01 10:00:00"), 1L, "click", 1.0),
        (90L, ts("2020-01-01 23:00:00"), 90L, "view", 0.0)),
      // b2: pusher → key 1 has no data, its timeout fires → emit+tombstone.
      Seq((91L, ts("2020-01-01 23:30:00"), 91L, "view", 0.0)),
      // b3: key 1 RETURNS with a non-late event (>= watermark 23:29:59).
      Seq((2L, ts("2020-01-01 23:45:00"), 1L, "click", 2.0)),
      // b4: pusher far enough that a (buggy) re-armed timeout would fire.
      Seq((92L, ts("2020-01-02 01:00:00"), 92L, "view", 0.0)))
    files.zipWithIndex.foreach { case (rows, i) =>
      val staging = java.nio.file.Files.createTempDirectory("graft_ft_stage").toString
      graft.core.Fs.deleteOnExit(staging)
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit(null).cast("string"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(dir, f"file_$i%02d.parquet"))
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreaming.runToMemory(
      EventStreaming.firstTouches(spark, stream), "ft_multi_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      q.processAllAvailable() // drain no-data batches' timeout emissions
      val rows = spark.table("ft_multi_out")
        .where(col("user_id") === 1L).collect()
      assert(rows.length == 1,
        s"key must emit exactly once, got ${rows.mkString("; ")}")
      assert(rows.head.getAs[Long]("first_event_id") == 1L,
        "the ORIGINAL first touch must be the one emitted")
    } finally q.stop()
  }

  test("stream-stream interval join == batch ev_interval_join") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.intervalJoin(stream), "ivj_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("ivj_out")
        .select(col("user_id"), col("click_id"), col("view_id"),
          col("click_ts").cast("timestamp_ntz").as("click_ts"),
          col("view_ts").cast("timestamp_ntz").as("view_ts"))
      val batch = graft.queries.EventOps.queries("ev_interval_join")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch interval-join mismatch")
    } finally q.stop()
  }

  test("streaming as-of matches == batch ev_asof_join") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.asofMatches(spark, stream), "asof_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("asof_out")
        .select(col("click_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("click_value"), col("view_id"), col("view_value"))
      val batch = graft.queries.EventOps.queries("ev_asof_join")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch as-of mismatch")
    } finally q.stop()
  }

  test("stream-static as-of (broadcast index) == batch ev_asof_native; " +
       "zero state operators") {
    val ev = Tables.events(spark, SparkTestBase.sf)
    val views = ev.where(col("event_type") === "view")
    val stream = EventStreaming.eventStream(spark, eventsDir, ev.schema)
    val clicks = stream.where(col("event_type") === "click")
    val q = EventStreaming.runToMemory(
      EventStreaming.asofStreamStatic(spark, clicks, views), "asof_ss_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("asof_ss_out")
        .select(col("click_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("click_value"), col("view_id"), col("view_value"))
      val batch = graft.queries.EventOps.queries("ev_asof_native")(spark, SparkTestBase.sf)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream-static/batch as-of mismatch")
      // The whole point of the shape: enrichment with NO state store.
      assert(q.lastProgress != null && q.lastProgress.stateOperators.isEmpty,
        "stream-static as-of must run stateless")
    } finally q.stop()
  }

  test("stream-static as-of refuses an oversized reference snapshot " +
       "(broadcast bound enforced before the collect)") {
    val ev = Tables.events(spark, SparkTestBase.sf)
    val views = ev.where(col("event_type") === "view")
    val stream = EventStreaming.eventStream(spark, eventsDir, ev.schema)
    val clicks = stream.where(col("event_type") === "click")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1") // 1 byte: nothing fits
      val err = intercept[IllegalArgumentException] {
        EventStreaming.asofStreamStatic(spark, clicks, views)
      }
      assert(err.getMessage.contains("autoBroadcastJoinThreshold"),
        s"error should name the governing conf: ${err.getMessage}")
      // The batch planner's pin works here too: an explicit broadcast pin
      // bypasses the estimate (caller asserts the snapshot fits).
      spark.conf.set("spark.graft.asof.strategy", "broadcast")
      try EventStreaming.asofStreamStatic(spark, clicks, views) // must not throw
      finally spark.conf.unset("spark.graft.asof.strategy")
      // threshold <= 0 disables AUTO-broadcast for joins; this operator
      // has no shuffle form, so a small snapshot must still pass (the
      // 10 MB default bound applies, not "always refuse").
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      EventStreaming.asofStreamStatic(spark, clicks, views) // must not throw
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("refreshing stream-static as-of: each micro-batch joins against the " +
       "CURRENT reference snapshot (dimension updates are visible)") {
    import spark.implicits._
    val viewsDir = java.nio.file.Files.createTempDirectory("graft_asof_views").toString
    val clicksDir = java.nio.file.Files.createTempDirectory("graft_asof_clicks").toString
    graft.core.Fs.deleteOnExit(viewsDir); graft.core.Fs.deleteOnExit(clicksDir)
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    def write(dir: String, rows: (Long, java.sql.Timestamp, Long, String, Double)*): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    // Snapshot A: user 1 has one view at t0.
    write(viewsDir, (100L, t(0), 1L, "view", 1.0))
    write(clicksDir, (200L, t(5), 1L, "click", 9.0))
    val schema = spark.read.parquet(viewsDir).schema
    val stream = EventStreaming.eventStream(spark, clicksDir, schema)
      .where(col("event_type") === "click")
    spark.sql("DROP TABLE IF EXISTS asof_refresh_out")
    val q = EventStreaming.asofRefreshing(spark, stream, viewsDir, schema,
      "asof_refresh_out")
    try {
      // Batch 1 joined against snapshot A.
      val b1 = spark.table("asof_refresh_out")
        .select("click_id", "view_id").collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(b1.toSeq == Seq(200L -> 100L), b1.mkString(","))
      // The DIMENSION updates: user 1 gets a newer view; a frozen index
      // would keep matching view 100 — the refreshed join must pick 101.
      write(viewsDir, (101L, t(10), 1L, "view", 2.0))
      write(clicksDir, (201L, t(15), 1L, "click", 9.0))
      q.processAllAvailable()
      val b2 = spark.table("asof_refresh_out")
        .where(col("click_id") === 201L)
        .select("view_id").collect().map(_.getLong(0))
      assert(b2.toSeq == Seq(101L),
        s"batch 2 must see the updated snapshot: got ${b2.mkString(",")}")
      // Exactly-once under replay: re-running a batch's write through the
      // same dynamic-partition-overwrite discipline must leave the table
      // unchanged (a replayed foreachBatch rewrites its own _batch_id
      // partition, never appends beside the first attempt).
      val before = spark.table("asof_refresh_out").count()
      // (Materialized copy: a real replay recomputes the batch from the
      // SOURCE; reading the sink to overwrite itself is refused by Spark.)
      val replay = spark.createDataFrame(
        spark.table("asof_refresh_out").where(col("_batch_id") === 1L)
          .collect().toList.asJava,
        spark.table("asof_refresh_out").schema)
      replay.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").insertInto("asof_refresh_out")
      spark.catalog.refreshTable("asof_refresh_out")
      assert(spark.table("asof_refresh_out").count() == before,
        "replayed batch must overwrite its partition, not append")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS asof_refresh_out")
    }
  }

  test("as-of state TTL: idle state evicts once the watermark passes; recent state survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_ttl").toString
    def t(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min
    def write(rows: (Long, java.sql.Timestamp, Long, String, Double)*): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    // Batch 1: user 1 views at t0; filler user 9 keeps the clock.
    write((100L, t(0), 1L, "view", 1.0), (102L, t(0), 9L, "click", 0.0))
    val schema = spark.read.parquet(dir).schema
    val stream = EventStreaming.eventStream(spark, dir, schema)
    val ttlMs = 60L * 60000L // 1 hour
    val q = EventStreaming.runToMemory(
      EventStreaming.asofMatches(spark, stream, stateTtlMs = Some(ttlMs)), "asof_ttl_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      q.processAllAvailable()
      // Batch 2: the clock jumps to t0+3h (> view + TTL); since Spark 3.4
      // state eviction uses the CURRENT batch's watermark, user 1's state
      // dies at the end of this very batch. User 7 views at t0+2:50 —
      // within TTL of the new watermark, so that state survives.
      write((103L, t(180), 9L, "click", 0.0), (106L, t(170), 7L, "view", 7.0))
      q.processAllAvailable()
      // Batch 3: user 7's click matches its recent view; user 1's click
      // finds nothing — the TTL evicted that state.
      write((104L, t(200), 7L, "click", 7.5), (105L, t(210), 1L, "click", 1.5))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val out = spark.table("asof_ttl_out")
        .select("click_id", "user_id", "view_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(2)).map(_.toString.toLong)).toMap
      assert(out(104L).contains(106L), s"within-TTL state must match: $out")
      assert(out(105L).isEmpty, s"evicted state must yield no match: $out")
    } finally q.stop()
  }

  test("streaming as-of with state TTL matches batch on a single-batch replay") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.asofMatches(spark, stream, stateTtlMs = Some(10L * 3600000L)),
      "asof_ttl_parity_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("asof_ttl_parity_out")
        .select(col("click_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("click_value"), col("view_id"), col("view_value"))
      val batch = graft.queries.EventOps.queries("ev_asof_join")(spark, SparkTestBase.sf)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "TTL'd stream/batch as-of mismatch")
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals match batch aggregation") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.runningUserTotals(spark, stream), "running_out",
      org.apache.spark.sql.streaming.OutputMode.Update)
    try {
      // Final state per user (last update) must equal the batch group-by.
      val streamed = spark.table("running_out")
        .groupBy("user_id").agg(max(col("n")).as("n"), max(col("total_cents")).as("total_cents"))
      val batch = Tables.events(spark, SparkTestBase.sf)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("total_cents"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stateful stream totals mismatch")
    } finally q.stop()
  }
}

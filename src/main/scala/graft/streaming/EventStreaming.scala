package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured-Streaming surface of the event operators: the same window
  * primitives as graft.queries.EventOps, driven from `readStream` with
  * watermarks, plus custom session state via flatMapGroupsWithState.
  * Batch/stream parity is asserted in EventStreamingSpec.
  */
object EventStreaming {

  /** Parquet file-stream over a directory holding the NORMALIZED events
    * table (write `graft.Tables.events(...)` out first — the raw testdata
    * file has nanos timestamps and other tables beside it).
    */
  def eventStream(spark: SparkSession, eventsDir: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(eventsDir)

  /** Watermarked tumbling-window aggregation (append mode). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("value_cents"))

  /** Watermarked per-window distinct-user SKETCHES — streaming's answer
    * to COUNT DISTINCT, which is not directly supported in streaming
    * aggregations (distinct state would be unbounded per key). The HLL
    * sketch is fixed-size mergeable state per window: late arrivals fold
    * into the same registers, and the emitted per-window sketches remain
    * union-able downstream (e.g. hourly → daily without re-reading the
    * stream) — the same persist-then-merge contract as batch
    * q_hll_distinct, with the same lgK=14 exactness regime. */
  def windowDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      // BOTH the estimate and the sketch bytes: estimates are NOT
      // mergeable, so the downstream hourly→daily rollup the contract
      // promises needs the sk column to hll_union_agg over.
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        expr("hll_sketch_estimate(sk)").as("n_users"), col("sk"))

  /** Watermarked per-window value-quantile SKETCHES — the KLL member of
    * the streaming sketch pair next to [[windowDistinctUsers]]'s HLL:
    * exact streaming percentiles would need every value in state
    * (unbounded per window); the KLL sketch is fixed-size mergeable
    * state, late arrivals fold in, and the emitted sketch bytes stay
    * merge-able downstream (hourly → daily via
    * [[graft.functions.KllMergeAgg]] without re-reading the stream) —
    * the q_kll_quantiles persist-then-merge contract on an unbounded
    * stream. Emits probed p50/p95 (cents) AND the sketch (estimates are
    * not mergeable; the bytes are).
    */
  def windowValueQuantiles(events: DataFrame): DataFrame = {
    import graft.functions.KllSketch._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kll_sketch_agg(
        round(col("value") * 100).cast("long").cast("double")).as("sk"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        kll_quantiles(col("sk"), Seq(0.5, 0.95)).as("q"), col("sk"))
      .select(col("w_start"), col("q")(0).as("p50_cents"),
        col("q")(1).as("p95_cents"), col("sk"))
  }

  /** Per-(hour window, event type) distinct-USER KMV sketches — the
    * streaming PRODUCER of the persisted segment sketches q_kmv_set_ops
    * serves from: each window emits a mergeable array of the K smallest
    * user-hash values plus its milli distinct estimate. Downstream
    * audience-overlap questions (union/intersection between any two
    * windows or event types) then run on sketch rows alone via
    * kmv_union_milli/kmv_inter_milli — never a replay of the stream.
    * KMV is DETERMINISTIC (md5 + K-minimum selection), so unlike the
    * windowed-KLL twin the batch-parity spec compares sketch bytes and
    * estimates EXACTLY; state per open window is K longs, bounded by
    * the watermark horizon like every windowed aggregate here.
    */
  def windowAudienceSketch(events: DataFrame): DataFrame = {
    import graft.functions.KmvSketch._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(kmv_sketch_agg(graft.functions.GraftFunctions.md5_64(
        col("user_id").cast("string"))).as("sk"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("sk"), kmv_est_milli(col("sk")).as("est_milli"))
  }

  /** Watermarked session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"), col("n"))

  /** Watermarked streaming dedup: duplicate events (same user, type,
    * timestamp) are dropped with bounded state.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  final case class UserAgg(user_id: Long, n: Long, total_cents: Long)

  /** Custom running state per user via flatMapGroupsWithState — the
    * mapGroupsWithState surface for state Spark's windows can't express.
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").as("user"),
      round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0L))
          var n = prev.n; var total = prev.total_cents
          rows.foreach { case (_, c) => n += 1; total += c }
          val next = UserAgg(user, n, total)
          state.update(next)
          Iterator(next)
      }.toDF()
  }

  final case class AsofMatch(click_id: Long, user_id: Long,
      ts: java.sql.Timestamp, click_value: Double,
      view_id: java.lang.Long, view_value: java.lang.Double)

  final case class LastView(ts: java.sql.Timestamp, id: Long, value: Double)

  /** Streaming AS-OF join — the stateful counterpart of the batch
    * ev_asof_join query: per user, each click is matched to the latest
    * view at-or-before its timestamp. State per user is ONE row (the last
    * view seen), maintained with flatMapGroupsWithState — the shape
    * Spark's built-in stream-stream joins can't express (they need a
    * bounded time-interval condition, not "latest prior").
    *
    * Within a micro-batch the group's rows are sorted by event time
    * before folding, so replaying a finite dataset in one batch
    * reproduces the batch semantics exactly (asserted in
    * EventStreamingSpec); across batches the single-row state carries the
    * last view forward, which is correct whenever micro-batches arrive in
    * event-time order per user.
    */
  def asofMatches(spark: SparkSession, events: DataFrame,
      stateTtlMs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    // With a TTL, idle users' single-row state is evicted once the event-
    // time watermark passes their last activity + TTL — the knob that
    // bounds total state at scale (users × 1 row, minus the idle tail).
    // Since Spark 3.4 eviction uses the CURRENT batch's watermark, so
    // state dies in the same batch that advances the clock past the TTL.
    // The watermark delay is a small constant (the TTL is an eviction
    // knob, not a lateness policy — using the TTL itself as the delay
    // would double effective retention). Without a TTL (the parity-test
    // default) state is NoTimeout.
    val src = stateTtlMs.fold(events)(_ => events.withWatermark("ts", "1 second"))
    val timeout = stateTtlMs.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.EventTimeTimeout)
    val typed = src
      .where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, String, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[LastView, AsofMatch](
        OutputMode.Append, timeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, String, Long, Double)],
            state: GroupState[LastView]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          var last = state.getOption
          val out = Seq.newBuilder[AsofMatch]
          // Full-precision event-time order (epoch seconds + nanos — a
          // bare getTime would truncate to milliseconds and misorder
          // sub-millisecond-distinct events vs the batch window's ts
          // ordering); views sort before clicks on a ts tie, matching the
          // batch union-trick's (ts, tag) order.
          rows.toSeq.sortBy(r => (r._2.toInstant.getEpochSecond, r._2.getNanos,
            if (r._3 == "view") 0 else 1)).foreach {
            case (_, ts, "view", id, v) => last = Some(LastView(ts, id, v))
            case (_, ts, "click", id, v) =>
              out += AsofMatch(id, user, ts, v,
                last.map(l => java.lang.Long.valueOf(l.id)).orNull,
                last.map(l => java.lang.Double.valueOf(l.value)).orNull)
            case _ => ()
          }
          last.foreach { l =>
            state.update(l)
            // Arm eviction at lastView + TTL, clamped past the current
            // watermark: Spark REJECTS a timeout at or before the
            // watermark (IllegalArgumentException kills the query). Under
            // current-watermark eviction a carried-over state always has
            // timeout > watermark, so the clamp is defensive — it protects
            // against the older previous-watermark eviction semantics.
            stateTtlMs.foreach { ttl =>
              state.setTimeoutTimestamp(
                math.max(l.ts.getTime + ttl, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.result().iterator
          }
      }.toDF()
  }

  /** STREAM-STATIC as-of — the broadcast-index shape of the native batch
    * operator (BroadcastAsOfJoinExec, plans/AsOfJoin.scala) applied to a
    * streaming probe side: the STATIC reference (views) is collected
    * into a per-key time-sorted index and broadcast once; every
    * streaming click binary-searches its user's run for the greatest
    * view time at-or-before its own. The per-row work is STATELESS, so
    * the plan has ZERO state operators (asserted in EventStreamingSpec):
    * no watermark, no state store, no eviction policy to tune — unlike
    * [[asofMatches]], whose per-user state exists to track a reference
    * that is itself streaming. This is the landing-zone enrichment
    * pattern at scale (enrich an event stream against a slowly-changing
    * dimension snapshot); the bound is the same one the batch strategy
    * checks before planning the broadcast exec — the reference index
    * must fit in a broadcast — and it is ENFORCED here before the
    * collect: the pruned reference projection's optimizer size estimate
    * must be within `spark.sql.autoBroadcastJoinThreshold`, else the
    * call fails fast (an oversized snapshot would otherwise OOM the
    * driver mid-collect). `spark.graft.asof.strategy=broadcast` pins
    * past the check, mirroring the batch planner's pin, for callers who
    * know the estimate is pessimistic. Ties at one (user, ts) resolve to the
    * greatest view_id (the fixtures carry none — AsOfJoinSpec asserts
    * that invariant).
    */
  def asofStreamStatic(spark: SparkSession, clicks: DataFrame,
      views: DataFrame): DataFrame = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    val pruned = views.select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    val pinned = spark.conf.getOption("spark.graft.asof.strategy").contains("broadcast")
    if (!pinned) {
      // Same gate the batch AsOfJoinStrategy applies before planning
      // BroadcastAsOfJoinExec: size the PRUNED reference projection's
      // optimized plan against the broadcast threshold. Fail fast here —
      // the alternative is a driver OOM halfway through the collect.
      // `autoBroadcastJoinThreshold <= 0` means "never auto-broadcast
      // JOINS" — the batch planner degrades to shuffle there, but this
      // operator HAS no shuffle form (the broadcast index is its whole
      // mechanism), so treating <=0 as "always refuse" would break the
      // common -1 tuning for a 10-row snapshot. Fall back to Spark's
      // default 10 MB bound instead; the explicit pin remains the
      // override for larger snapshots.
      val bound = if (threshold > 0) threshold else 10L * 1024 * 1024
      val estBytes = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
      require(estBytes <= bound,
        s"asofStreamStatic builds a broadcast index from the static reference, " +
          s"but its estimated size ($estBytes bytes) exceeds $bound bytes " +
          s"(spark.sql.autoBroadcastJoinThreshold, or the 10 MB default when " +
          s"that is disabled). Filter the snapshot, raise the threshold, or " +
          s"set spark.graft.asof.strategy=broadcast to pin past this check.")
    }
    val index: Map[Long, (Array[Long], Array[Long], Array[Double])] = pruned
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .collect()
      .groupBy(_._1)
      .map { case (uid, rows) =>
        val sorted = rows.sortBy(r => (micros(r._2), r._3))
        (uid, (sorted.map(r => micros(r._2)), sorted.map(_._3), sorted.map(_._4)))
      }
    val bc = spark.sparkContext.broadcast(index)
    clicks
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .map { case (cid, uid, ts, cv) =>
        val t = micros(ts)
        bc.value.get(uid) match {
          case Some((times, ids, vals)) =>
            // Greatest i with times(i) <= t — same floor rule as the
            // batch exec's per-partition binary search.
            var lo = 0; var hi = times.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0)
              AsofMatch(cid, uid, ts, cv, ids(ans), vals(ans))
            else AsofMatch(cid, uid, ts, cv, null, null)
          case None => AsofMatch(cid, uid, ts, cv, null, null)
        }
      }.toDF()
  }

  final case class FirstTouch(user_id: Long, event_type: String,
      first_event_id: Long, first_ts: java.sql.Timestamp, first_value: Double)

  /** firstTouches state: best-so-far candidate + emitted tombstone. */
  final case class FtState(best: FirstTouch, emitted: Boolean)

  /** Streaming first-touch attribution — the stateful counterpart of the
    * batch ev_first_touch query. State per (user, type) is ONE row (the
    * best-so-far earliest event). Emission is watermark-FINALIZED: a key
    * emits exactly once, when the event-time watermark passes its
    * first-touch time — at that point any event that could still beat the
    * candidate would be beyond-watermark late and dropped anyway, so the
    * answer is provably final. This is the Append-mode pattern for
    * "emit-once top-1 per key" that Update-mode retraction can't give.
    */
  def firstTouches(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.withWatermark("ts", "1 second")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
      .as[(Long, String, Long, java.sql.Timestamp, Double)]
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[FtState, FirstTouch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((user, typ), rows, state) =>
          if (state.hasTimedOut) {
            val out = state.get.best
            // TOMBSTONE, not remove(): a later non-late event for this key
            // would otherwise re-open the group and emit a second, wrong
            // "first" touch. One emitted-flag row per key is the
            // irreducible state of exactly-once first-touch semantics
            // (same cardinality as the batch result itself).
            state.update(FtState(out, emitted = true))
            Iterator(out)
          } else if (state.getOption.exists(_.emitted)) {
            // Key already finalized — later events can't be the first.
            Iterator.empty
          } else {
            // Full-precision (seconds, nanos, id) order — same tie-break
            // as the batch window's ORDER BY (ts, event_id).
            val best = (rows.map(r => FirstTouch(user, typ, r._3, r._4, r._5))
              ++ state.getOption.map(_.best).iterator)
              .minBy(f => (f.first_ts.toInstant.getEpochSecond,
                f.first_ts.getNanos, f.first_event_id))
            state.update(FtState(best, emitted = false))
            // Finalize when the watermark passes the candidate's time
            // (clamped past the current watermark — Spark rejects a
            // timeout at or before it).
            state.setTimeoutTimestamp(math.max(best.first_ts.getTime + 1L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }.toDF()
  }

  /** Stream–stream time-interval join — the twin of the batch
    * ev_interval_join query, using Spark's native stream-stream join:
    * equality on user_id plus a bounded time condition, which is exactly
    * what lets the state store discard rows once the watermark passes the
    * interval (views older than click-watermark − 1 h can never match
    * again). No custom state needed — this is the operator Spark built
    * for the job.
    */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click").select(
      col("user_id").as("c_user"), col("event_id").as("click_id"),
      col("ts").as("click_ts")).withWatermark("click_ts", "1 second")
    val views = events.where(col("event_type") === "view").select(
      col("user_id").as("v_user"), col("event_id").as("view_id"),
      col("ts").as("view_ts")).withWatermark("view_ts", "1 second")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** REFRESHING stream-static as-of — [[asofStreamStatic]] freezes the
    * reference snapshot at query start (one collect, one broadcast),
    * which is right for an immutable corpus-delivery dimension; real
    * slowly-changing dimensions UPDATE while the stream runs. This is
    * the Spark-native refresh pattern: `foreachBatch` hands each
    * micro-batch to the BATCH as-of operator (the custom
    * AsOfJoinPlan/Exec, which streaming cannot host natively) against a
    * FRESH read of the reference path — every micro-batch sees the
    * snapshot as of its own start, the broadcast is rebuilt only when
    * the batch runs, and the whole batch planner (size-based
    * broadcast/shuffle choice, skew salting) applies per batch.
    * foreachBatch-plus-batch-operator is the standard escape hatch for
    * any operator Structured Streaming can't express; results land in
    * `sinkTable` (created on first batch).
    *
    * EXACTLY-ONCE: foreachBatch is at-least-once (a failed batch
    * replays), so a plain append would duplicate the replayed batch's
    * rows. The sink partitions by the engine-stable `_batch_id` and
    * OVERWRITES dynamically — a replay rewrites its own partition
    * instead of appending next to the first attempt's rows, the
    * standard idempotent-foreachBatch discipline.
    */
  def asofRefreshing(spark: SparkSession, clicks: DataFrame,
      viewsPath: String, viewsSchema: org.apache.spark.sql.types.StructType,
      sinkTable: String): StreamingQuery = {
    val q = clicks
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val views = spark.read.schema(viewsSchema).parquet(viewsPath)
          .where(col("event_type") === "view")
          .select(col("user_id"), col("ts"),
            col("event_id").as("view_id"), col("value").as("view_value"))
        val joined = graft.plans.AsOfJoin.asof(
          batch, views, "user_id", "ts", "ts",
          carry = Seq("view_id", "view_value"))
        val out = joined.withColumn("_batch_id", lit(batchId))
        if (!spark.catalog.tableExists(sinkTable))
          out.write.partitionBy("_batch_id").saveAsTable(sinkTable)
        else
          // insertInto (not saveAsTable: overwrite there replaces the
          // whole table) + dynamic mode: only the partitions present in
          // this batch — i.e. its own _batch_id — are rewritten, so a
          // replayed batch lands exactly once. Positional resolution is
          // safe: the projection order is fixed and the partition column
          // is last, matching the created table's layout.
          out.write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").insertInto(sinkTable)
        // The session caches the table's resolved relation; without an
        // explicit refresh a concurrent reader of `sinkTable` keeps
        // seeing the pre-append file listing (measured: batch 2's rows
        // invisible to spark.table until refreshTable).
        spark.catalog.refreshTable(sinkTable)
        ()
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Drive a streaming DataFrame through a memory sink to completion. */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }
}

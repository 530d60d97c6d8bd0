package graft

import org.apache.spark.sql.functions._
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

  test("streaming as-of with state TTL still matches batch on replay") {
    val schema = Tables.events(spark, SparkTestBase.sf).schema
    val stream = EventStreaming.eventStream(spark, eventsDir, schema)
    val q = EventStreaming.runToMemory(
      EventStreaming.asofMatches(spark, stream, stateTtl = Some("10 hours")), "asof_ttl_out",
      org.apache.spark.sql.streaming.OutputMode.Append)
    try {
      val streamed = spark.table("asof_ttl_out")
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

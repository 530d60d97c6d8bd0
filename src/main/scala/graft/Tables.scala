package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (repo TESTDATA.md).
  * All queries take `(spark, sfDir)` and read through here so the scan
  * always goes through the Parquet V2 reader with pushdown/pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives in whatever resolution the producer wrote:
    * Parquet TIMESTAMP(NANOS) (readable only as a long via the
    * SPARK-40819 legacy conf), TIMESTAMP(MICROS) without timezone
    * (reads as TIMESTAMP_NTZ), or a session-zone timestamp. Normalize
    * to a microsecond TimestampType column so downstream operators see
    * one type regardless of producer version.
    *
    * The nanosAsLong conf is SCOPED, not session-wide: it is consulted at
    * execution time, so the one-time fix is a NORMALIZING REWRITE — the
    * raw table is copied once per (session, dir) to a micros-typed parquet
    * under the session temp dir inside the conf window, and every events
    * query then reads that copy lazily. Unlike an in-memory lineage cut,
    * this keeps the parquet scan columnar (column pruning + pushdown
    * intact) and pins nothing in executor storage; it is exactly the
    * one-time normalization a 100 TB pipeline would run on such a
    * producer quirk. The copy also spreads the single producer file
    * across the session's parallelism (see below), which a raw read
    * would not.
    */
  // Weak keys: a strong (SparkSession, dir) key would pin every stopped
  // session (and its normalized copy path) for the JVM's life in a
  // session-churning driver. The inner per-dir map holds only strings, so
  // nothing retains the session once callers drop it.
  //
  // Concurrency note: the nanosAsLong conf window inside the one-time
  // normalization is session-global. A concurrent thread reading a
  // DIFFERENT nanos-timestamp parquet during that window would silently
  // get longs — the engine assumes table setup (first events access per
  // session) is not raced against other nanos reads, which holds for the
  // driver mains (sequential query execution) and the test harness.
  private val eventsCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val perDir = eventsCache.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
    val normPath = perDir.computeIfAbsent(dir, { _ =>
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val out = java.nio.file.Files
          .createTempDirectory("graft_events_norm").toString
        // The copy is session-scoped scratch: remove it when the JVM exits
        // so repeated driver runs don't accumulate normalized copies.
        graft.core.Fs.deleteOnExit(out)
        val raw = spark.read.parquet(s"$dir/events.parquet")
        // Rewrite by the type the file actually reads as: nanos-as-long
        // (legacy producer) → micros; TIMESTAMP_NTZ (micros, no zone) →
        // session-zone timestamp (UTC in every entry point), which is
        // value-identical to what the nanos path produced.
        val tsNorm = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
          case _ =>
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType)
        }
        raw.withColumn("ts", tsNorm)
          // Spread the copy across the session's parallelism: the raw
          // file is one split, and writing it back as one file would
          // serialize every event query's map side into a single task.
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(out)
        out
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    })
    spark.read.parquet(normPath)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** documents with per-row-compute parallelism ensured: a small corpus
    * file arrives as ONE input split, which serializes heavy per-row work
    * (tokenization, hashing, regex) into a single task; at production
    * scale the scan is already split and the repartition shuffle moves
    * each row once. Use for queries whose map-side work dominates.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

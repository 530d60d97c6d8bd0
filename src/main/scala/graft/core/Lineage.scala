package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{count, lit, when}

/** The engine's single lineage-cut seam.
  *
  * Fixpoint loops, id-map accumulators, and signature materialization all
  * need their plan lineage truncated (otherwise every pass re-executes all
  * prior passes). Locally the right tool is an eager `localCheckpoint` —
  * no cluster store round-trip — but on a real cluster localCheckpoint
  * pins blocks to executors and LOSES them on executor death, killing a
  * long fixpoint. Set `spark.graft.checkpoint.reliable=true` (plus
  * `spark.graft.checkpoint.dir`, or a sparkContext checkpoint dir set by
  * the application) and every cut becomes a reliable `checkpoint` on the
  * cluster store instead. One conf, one call site.
  */
object Lineage {
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("spark.graft.checkpoint.reliable").contains("true")) {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption("spark.graft.checkpoint.dir").getOrElse(
          throw new IllegalStateException(
            "spark.graft.checkpoint.reliable=true requires spark.graft.checkpoint.dir " +
              "or a SparkContext checkpoint dir"))
        spark.sparkContext.setCheckpointDir(dir)
      }
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  /** [[cut]] LAZILY: the returned frame's blocks materialize as a side
    * effect of the caller's next action over it — one scheduler
    * round-trip for cut + action instead of two (the [[cutCounted]]
    * mechanism with a caller-chosen action). The action MUST compute
    * every partition (a global aggregate/TakeOrdered does; a `limit`
    * pushed into the scan does not), otherwise uncomputed partitions
    * re-execute lineage on the next use. Reliable-checkpoint configs
    * fall back to the eager cluster-safe form. */
  def cutLazy(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("spark.graft.checkpoint.reliable").contains("true")) cut(df)
    else df.localCheckpoint(eager = false)
  }

  /** [[cut]] + row count in ONE Spark job where the backend allows it.
    * Iterative engines always need both (materialize the pass result,
    * then branch on emptiness); run separately that is two scheduler
    * round-trips per pass. A non-eager localCheckpoint materializes its
    * blocks as a side effect of the first action, so count() doubles as
    * the materializing job. Reliable checkpoints re-execute lineage on
    * materialization, so there the eager two-job form stays (correctness
    * over a saved job on the path that only runs on real clusters).
    */
  def cutCounted(df: DataFrame): (DataFrame, Long) = {
    val spark = df.sparkSession
    if (spark.conf.getOption("spark.graft.checkpoint.reliable").contains("true")) {
      val c = cut(df)
      (c, c.count())
    } else {
      val c = df.localCheckpoint(eager = false)
      (c, c.count())
    }
  }

  /** [[cut]] + total row count + predicate-match count in ONE Spark job
    * (same mechanism as [[cutCounted]]). The load engine's stage bodies
    * all follow materialize → "any errors?" → "any rows at all?", which
    * as separate actions is three scheduler round-trips per table.
    */
  def cutStats(df: DataFrame, pred: Column): (DataFrame, Long, Long) = {
    val spark = df.sparkSession
    val c =
      if (spark.conf.getOption("spark.graft.checkpoint.reliable").contains("true")) cut(df)
      else df.localCheckpoint(eager = false)
    val row = c.select(count(lit(1)), count(when(pred, lit(1)))).head()
    (c, row.getLong(0), row.getLong(1))
  }

  /** [[cutStats]] + key-cardinality stats in the SAME single job: returns
    * (frame, total rows, predicate matches, non-null keys, distinct keys).
    * Lets the load engine detect duplicate input ids for free — the
    * distinct aggregate shuffles only key values over the materializing
    * scan, where the eager groupBy+join it replaces cost two extra
    * full-lineage jobs per staged table.
    */
  def cutStatsKeyed(df: DataFrame, pred: Column, key: Column)
      : (DataFrame, Long, Long, Long, Long) = {
    val spark = df.sparkSession
    val c =
      if (spark.conf.getOption("spark.graft.checkpoint.reliable").contains("true")) cut(df)
      else df.localCheckpoint(eager = false)
    val row = c.select(count(lit(1)), count(when(pred, lit(1))),
      count(key), org.apache.spark.sql.functions.count_distinct(key)).head()
    (c, row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  /** Release the storage behind a frame returned by [[cut]] once it is
    * SUPERSEDED — iterative operators (fixpoint id accumulators, star-
    * contraction rounds) re-cut an accumulator every pass, and without an
    * explicit release every superseded round's blocks stay pinned in
    * executor storage for the life of the session. At 100 TB that pinned
    * memory is the difference between a fixpoint that runs and one that
    * evicts its own shuffle buffers. No-op for frames that are not a
    * materialized cut (reliable checkpoints keep their files; the RDD
    * handle is simply not persisted).
    *
    * Only call this when NO still-live plan references the frame: the cut
    * truncated lineage, so evicted blocks cannot be recomputed.
    */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Drop ALL storage the session has pinned — cached frames and every
    * persisted RDD (checkpoint blocks included). For batch harnesses
    * (Bench/Profile) that run many independent pipelines in one session:
    * query N's dead blocks must not squeeze query N+1's shuffle memory.
    * Never call mid-pipeline — any live cut frame becomes irrecoverable.
    */
  def releaseAllStorage(spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    } catch { case _: Throwable => () }

  /** `.cutLineage` postfix form so call sites read like the checkpoint
    * calls they replace. */
  implicit class LineageOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = Lineage.cut(df)
  }
}

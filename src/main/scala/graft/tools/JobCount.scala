package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: steal-invariant cost profile — Spark job/stage/task counts and
  * executor CPU nanos per SparkEntry query. Wall time on this VM swings 4-8x
  * with host CPU-steal bursts; scheduler counts and on-CPU nanos do not,
  * so they are the metric to optimize the many-small-jobs engine gates by.
  *
  * Usage: runMain graft.tools.JobCount <sfDir> <query...|all>
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: JobCount <sfDir> <query...|all>"); sys.exit(2) }
    val sfDir = args(0)
    val names = if (args.drop(1).toSeq == Seq("all")) graft.SparkEntry.queries.keys.toSeq.sorted
                else args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val cpuNanos = new AtomicLong
    val sites = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val traceSites = sys.env.contains("JOBCOUNT_SITES")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceSites) {
          val s = j.stageInfos.lastOption.map(_.name).getOrElse("?").takeWhile(_ != '\n').take(90)
          sites.computeIfAbsent(s, _ => new AtomicLong).incrementAndGet()
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) cpuNanos.addAndGet(t.taskMetrics.executorCpuTime)
      }
    })
    // Warm up shared one-time costs outside any per-query tally.
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.events(spark, sfDir).count()
    names.foreach { n =>
      jobs.set(0); stages.set(0); tasks.set(0); cpuNanos.set(0)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener events are async (the bus drain API is private[spark]);
      // a short settle keeps counts exact for profiling purposes.
      Thread.sleep(200)
      println(f"[jobcount] $n%-24s jobs=${jobs.get}%4d stages=${stages.get}%5d tasks=${tasks.get}%6d cpu=${cpuNanos.get / 1e9}%8.2fs wall=$wall%6.2fs")
      if (traceSites) {
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2.get).foreach { case (s, c) =>
          println(f"[jobcount]   ${c.get}%5d  $s")
        }
        sites.clear()
      }
      graft.core.Lineage.releaseAllStorage(spark)
    }
    spark.stop()
  }
}

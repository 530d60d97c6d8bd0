package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-stage executor-CPU attribution for one SparkEntry query —
  * stages keyed by their call site (first line of the stage name), CPU and
  * wall-in-stage summed across all stages sharing a site. Steal-invariant
  * like JobCount, but answers WHERE the CPU goes, not just how much.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.StageCpu <sfDir> <query>
  */
object StageCpu {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) { System.err.println("usage: StageCpu <sfDir> <query>"); sys.exit(2) }
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("GRAFT_KRYO").contains("1"))
      builder.config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    final case class Acc(cpu: AtomicLong = new AtomicLong,
        run: AtomicLong = new AtomicLong, n: AtomicLong = new AtomicLong,
        ser: AtomicLong = new AtomicLong, shw: AtomicLong = new AtomicLong,
        shr: AtomicLong = new AtomicLong)
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, Acc]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val site = s.stageInfo.name.takeWhile(_ != '\n').take(110)
        val a = bySite.computeIfAbsent(site, _ => Acc())
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          a.cpu.addAndGet(m.executorCpuTime)
          a.run.addAndGet(m.executorRunTime)
          a.ser.addAndGet(m.resultSerializationTime)
          a.shw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          a.shr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
        a.n.incrementAndGet()
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.events(spark, sfDir).count()
    bySite.clear()
    val t0 = System.nanoTime()
    val cnt = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[stagecpu] $name rows=$cnt wall=$wall%.2fs")
    import scala.jdk.CollectionConverters._
    val rows = bySite.asScala.toSeq.sortBy(-_._2.cpu.get)
    val totCpu = rows.map(_._2.cpu.get).sum / 1e9
    println(f"[stagecpu] total stage cpu=$totCpu%.2fs  runTime=${rows.map(_._2.run.get).sum / 1e3}%.2fs")
    rows.take(30).foreach { case (site, a) =>
      println(f"[stagecpu] cpu=${a.cpu.get / 1e9}%8.2fs run=${a.run.get / 1e3}%8.2fs n=${a.n.get}%3d shw=${a.shw.get / 1e6}%8.1fMB shr=${a.shr.get / 1e6}%8.1fMB  $site")
    }
    spark.stop()
  }
}

// Dev probe (not part of the library): WHERE does the driver time of the
// many-small-jobs engine gates go? Sums QueryPlanningTracker phase times
// (analysis / optimization / planning) and execution wall across every
// query execution a gate runs, via a QueryExecutionListener. Run:
//   sbt "runMain graft.tools.EnginePhases <sfDir> <query...>"
package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

object EnginePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("x_engine_fixpoint")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val execs = new AtomicLong
    val wallNs = new AtomicLong
    val phaseNs = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    val listener = new QueryExecutionListener {
      private def record(qe: QueryExecution, durationNs: Long): Unit = {
        execs.incrementAndGet()
        wallNs.addAndGet(durationNs)
        qe.tracker.phases.foreach { case (phase, summary) =>
          phaseNs.computeIfAbsent(phase, _ => new AtomicLong)
            .addAndGet((summary.endTimeMs - summary.startTimeMs) * 1000000L)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        record(qe, durationNs)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        record(qe, 0L)
    }
    spark.listenerManager.register(listener)
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.events(spark, sfDir).count()
    names.foreach { n =>
      Thread.sleep(300)
      execs.set(0); wallNs.set(0); phaseNs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      import scala.jdk.CollectionConverters._
      val phases = phaseNs.asScala.toSeq.sortBy(-_._2.get)
        .map { case (p, v) => f"$p=${v.get / 1e9}%.2fs" }.mkString(" ")
      println(f"[phases] $n wall=$wall%.2fs execs=${execs.get} " +
        f"execWall=${wallNs.get / 1e9}%.2fs $phases")
      graft.core.Lineage.releaseAllStorage(spark)
    }
    spark.stop()
  }
}

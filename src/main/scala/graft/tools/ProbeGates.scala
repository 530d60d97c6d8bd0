// Dev probe (not part of the library): per-job timing breakdown of the
// two engine gates. Run: sbt "runMain graft.tools.ProbeGates <sfDir>"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

object ProbeGates {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map.empty[Int, (Long, String)]
    val jobs = mutable.Buffer.empty[(Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += ((j.jobId, System.nanoTime() - t0, d))
        }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    sys.env.get("PROBE_AQE_OFF").foreach { _ =>
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("x_engine_fixpoint", "x_engine_extract_resume")
    names.foreach { name =>
      jobs.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val byDur = jobs.sortBy(-_._2)
      println(f"== $name total ${total}%.2f s, jobs ${jobs.size}, " +
        f"job-sum ${jobs.map(_._2).sum / 1e9}%.2f s")
      byDur.take(12).foreach { case (id, ns, d) =>
        println(f"  job $id%4d ${ns / 1e9}%6.2f s  ${d.take(90)}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: dump `.explain("formatted")` for registered queries AND the
  * session-materialized COMPUTE frames the registered plans hide behind
  * artifact scans (bm25Compute, bigramLmOf) — the round-12 plan-evidence
  * generator for plans/r12/.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <name...>
  * Names may be registered query names or the specials
  * `compute:bm25` / `compute:bigram_lm`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: PlanDump <sfDir> <outDir> <name...>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    args.drop(2).foreach { name =>
      val (fileName, df) = name match {
        case "compute:bm25" =>
          ("compute_bm25", graft.queries.PipelineOps.bm25Compute(spark, sfDir))
        case "compute:bigram_lm" =>
          ("compute_bigram_lm", graft.queries.PipelineOps.bigramLmOf(
            graft.Tables.documentsSpread(spark, sfDir)))
        case n => (n, graft.SparkEntry.queries(n)(spark, sfDir))
      }
      java.nio.file.Files.writeString(outDir.resolve(s"$fileName.txt"), fmt(df))
      println(s"[plandump] wrote $fileName.txt")
      graft.core.Lineage.releaseAllStorage(spark)
    }
    spark.stop()
  }
}

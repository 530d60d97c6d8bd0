package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time and/or explain individual SparkEntry queries.
  *
  * Usage: runMain graft.tools.Profile <sfDir> [--explain] <query...>
  * ("all" runs every query). Prints per-query wall time; with --explain,
  * the formatted physical plan (pushed filters, codegen spans, joins).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args(0).startsWith("--")) {
      System.err.println("usage: graft.tools.Profile <sfDir> [--explain] <query...|all>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val names0 = args.drop(1).filterNot(_.startsWith("--")).toSeq
    val names = if (names0 == Seq("all")) graft.SparkEntry.queries.keys.toSeq.sorted
                else names0
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      if (explain) {
        println(s"==== $n ====")
        df.explain("formatted")
      }
      val t1 = System.nanoTime()
      val cnt = df.count()
      val ran = (System.nanoTime() - t1) / 1e9
      println(f"[profile] $n%-24s build=$built%6.2fs run=$ran%6.2fs rows=$cnt")
      // Per-query storage isolation, same as Bench: dead checkpoint blocks
      // from query N must not skew query N+1's measurement.
      graft.core.Lineage.releaseAllStorage(spark)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Dev probe: stage-by-stage timing of the d4 n-gram Jaccard pipeline. */
object D4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d4probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    import graft.core.Lineage.LineageOps
    val tNum = 4L; val tDen = 5L
    val g = t("g cutLineage") {
      graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"),
          GraftFunctions.char_ngrams(col("text"), 3).as("grams"))
        .cutLineage
    }
    val dfRows = t("dfreq collect") {
      g.select(col("lang"), explode(col("grams")).as("gram"))
        .groupBy("lang", "gram").agg(count(lit(1)).as("df"))
        .collect()
    }
    val byLang = new java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]]()
    dfRows.foreach { r =>
      byLang.computeIfAbsent(r.getString(0), _ => new java.util.HashMap[String, java.lang.Long]())
        .put(r.getString(1), r.getLong(2))
    }
    val pidx = g.select(col("lang"), col("doc_id"), size(col("grams")).as("sz"),
      posexplode(GraftFunctions.rare_prefix(
        col("lang"), col("grams"), byLang, tNum, tDen)).as(Seq("pos", "gram")))
    t("pidx count") { println("pidx rows: " + pidx.count()) }
    val alphaExpr = expr(
      s"(CAST(sz_a + sz_b AS BIGINT) * $tNum + ${tNum + tDen - 1}) div ${tNum + tDen}")
    val cand = pidx.select(col("lang"), col("gram"), col("doc_id").as("doc_a"),
        col("sz").as("sz_a"), col("pos").as("pa"))
      .join(pidx.select(col("lang"), col("gram"), col("doc_id").as("doc_b"),
        col("sz").as("sz_b"), col("pos").as("pb")), Seq("lang", "gram"))
      .where(col("doc_a") < col("doc_b") &&
        least(col("sz_a"), col("sz_b")) * tDen >=
          greatest(col("sz_a"), col("sz_b")) * tNum)
      .withColumn("alpha", alphaExpr)
      .where(lit(1) + least(col("sz_a") - col("pa") - 1, col("sz_b") - col("pb") - 1)
        >= col("alpha"))
      .dropDuplicates("doc_a", "doc_b")
      .select(col("lang"), col("doc_a"), col("doc_b"),
        col("sz_a"), col("sz_b"), col("alpha"))
    t("cand count") { println("cand: " + cand.count()) }
    val vg = g.select(col("doc_id"), array_sort(col("grams")).as("vgrams"),
      GraftFunctions.gram_hist64(col("grams")).as("hist"))
    val ga = vg.select(col("doc_id").as("doc_a"), col("vgrams").as("g_a"),
      col("hist").as("h_a"))
    val gb = vg.select(col("doc_id").as("doc_b"), col("vgrams").as("g_b"),
      col("hist").as("h_b"))
    val withH = cand.join(broadcast(ga.drop("g_a")), Seq("doc_a"))
      .join(broadcast(gb.drop("g_b")), Seq("doc_b"))
      .where(GraftFunctions.min_sum64(col("h_a"), col("h_b")).cast("bigint") >= col("alpha"))
    t("hist-screen count") { println("after hist screen: " + withH.count()) }
    val inter = GraftFunctions.sorted_intersect_size(col("g_a"), col("g_b"))
    val out = t("full verify") {
      cand.join(broadcast(ga), Seq("doc_a")).join(broadcast(gb), Seq("doc_b"))
        .where(
          GraftFunctions.min_sum64(col("h_a"), col("h_b")).cast("bigint") >= col("alpha") &&
          inter.cast("double") /
            (col("sz_a") + col("sz_b") - inter).cast("double") >= 0.8)
        .count()
    }
    println(s"[d4probe] pairs: $out")
    spark.stop()
  }
}

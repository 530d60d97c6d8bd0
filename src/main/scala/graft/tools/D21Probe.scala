package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.core.Lineage.LineageOps

/** Dev probe: per-phase wall-clock breakdown of d21_suffix_dup
  * (offsets / level-0 vocab / doubling rounds / SA sort / LCP walk /
  * rollup). Mirrors [[graft.queries.SuffixOps.suffixDupOf]] with timers
  * at each eager cut so the phases materialize where production does.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.D21Probe <sfDir>
  */
object D21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.SuffixOps.{Cap, Levels, PosThreshold}

    var last = System.nanoTime()
    def lap(label: String): Unit = {
      val now = System.nanoTime()
      println(f"[d21] $label%-28s ${(now - last) / 1e9}%7.2fs")
      last = now
    }

    def sortedIndex(df: DataFrame, keys: Seq[String], out: String): DataFrame = {
      val parts = spark.sessionState.conf.numShufflePartitions
      val sorted = df
        .repartitionByRange(parts, keys.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
      val schema = sorted.schema.add(out, LongType, nullable = false)
      val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
      spark.createDataFrame(rdd, schema)
    }

    val docs0 = Tables.documentsSpread(spark, sfDir)
    val toks = split(trim(col("text")), "\\s+")
    val docs = docs0.select(col("doc_id"), toks.as("toks"))
    val lens0 = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    lap("setup")
    val offs = graft.core.Lineage.cut(graft.queries.SuffixOps.prefixOffsets(lens0))
    val lens = offs.select(col("doc_id"), col("n"))
    lap("offsets")

    val real = docs.join(offs, Seq("doc_id"))
      .select(col("doc_id"), col("off"), col("n"), posexplode(col("toks")))
      .select(col("doc_id"), (col("off") + col("pos")).as("pos"),
        least(col("n") - col("pos"), lit(Cap.toLong)).as("maxl"),
        col("col").as("tok"))
    val vocab = sortedIndex(real.select(col("tok")).distinct(), Seq("tok"), "r0")
      .withColumn("r0", col("r0") + 1L)
    val realR = real.join(vocab, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("maxl"), col("r0").as("rk"))
    val sent = offs.select(col("doc_id"), (col("off") + col("n")).as("pos"),
      lit(0L).as("maxl"), (-col("doc_id") - 1L).as("rk"))
    var r = realR.unionByName(sent)
      .select(col("doc_id"), col("pos"), col("maxl"),
        array(col("rk")).as("rs"), col("rk"))
      .cutLineage
    lap("level0")

    for (j <- 1 to Levels) {
      val d = 1L << (j - 1)
      val shifted = r.select((col("pos") - d).as("pos"), col("rk").as("rk2"))
      val paired = r.join(shifted, Seq("pos"), "left")
        .withColumn("rk2f", coalesce(col("rk2"), lit(Long.MinValue) + col("pos")))
      val ranked = sortedIndex(
        paired.select(col("rk"), col("rk2f")).distinct(), Seq("rk", "rk2f"), "nrk")
      r = paired.join(ranked, Seq("rk", "rk2f"))
        .select(col("doc_id"), col("pos"), col("maxl"),
          concat(col("rs"), array(col("nrk"))).as("rs"), col("nrk").as("rk"))
        .cutLineage
      lap(s"doubling round $j")
    }

    val sa = sortedIndex(r.where(col("maxl") > 0), Seq("rk", "pos"), "sa")
      .cutLineage
    lap("sa sort")
    val lookup = r.select(col("pos"), col("rs"))
    val a = sa.select(col("sa"), col("doc_id").as("doc_a"), col("pos").as("p"))
    val b = sa.select((col("sa") - 1L).as("sa"), col("doc_id").as("doc_b"),
      col("pos").as("q"))
    var adj = a.join(b, Seq("sa"))
      .select(col("doc_a"), col("p"), col("doc_b"), col("q"), lit(0L).as("acc"))
      .cutLineage
    lap("adjacency")
    for (j <- Levels to 0 by -1) {
      val step = 1L << j
      val ra = lookup.select(col("pos").as("pa"), col("rs").as("rsa"))
      val rb = lookup.select(col("pos").as("pb"), col("rs").as("rsb"))
      adj = adj
        .join(ra, col("pa") === col("p") + col("acc"), "left")
        .join(rb, col("pb") === col("q") + col("acc"), "left")
        .withColumn("acc",
          when(element_at(col("rsa"), j + 1) === element_at(col("rsb"), j + 1),
            col("acc") + step).otherwise(col("acc")))
        .select(col("doc_a"), col("p"), col("doc_b"), col("q"), col("acc"))
        .cutLineage
      lap(s"lcp level $j")
    }
    val perPos = adj.select(col("doc_a").as("doc_id"), col("p").as("pos"), col("acc"))
      .unionByName(adj.select(col("doc_b").as("doc_id"), col("q").as("pos"), col("acc")))
      .groupBy(col("doc_id"), col("pos"))
      .agg(max(col("acc")).as("dl"))
    val perDoc = perPos.groupBy("doc_id")
      .agg(least(max(col("dl")), lit(Cap.toLong)).as("max_dup_tokens"),
        sum(when(col("dl") >= PosThreshold, 1L).otherwise(0L)).as("n_dup_pos_ge8"))
    val out = lens.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_dup_tokens"), lit(0L)).as("max_dup_tokens"),
        coalesce(col("n_dup_pos_ge8"), lit(0L)).as("n_dup_pos_ge8"))
    val cnt = out.count()
    lap("rollup+count")
    println(s"[d21] rows=$cnt")
    spark.stop()
  }
}

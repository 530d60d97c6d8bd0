package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev tool: A/B-time the round-11 DataFrame shape of d21 against the
  * current SuffixOps implementation, alternating in ONE JVM so host-load
  * drift hits both arms equally. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.D21AB <sfDir> [reps]
  */
object D21AB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm codegen/JIT once.
    try spark.range(1000000).selectExpr("sum(id)").collect() catch { case _: Throwable => () }

    // Job/stage/shuffle accounting per arm — the physical-plan evidence the
    // lineage cuts hide from explain() (each cut truncates the visible plan
    // to the final rollup).
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    def time(label: String)(f: => Long): Double = {
      val (j0, s0, b0) = (jobs.get, stages.get, shuffleBytes.get)
      val t0 = System.nanoTime()
      val n = f
      val el = (System.nanoTime() - t0) / 1e9
      graft.core.Lineage.releaseAllStorage(spark)
      Thread.sleep(200) // let listener events drain
      println(f"[d21ab] $label%-6s ${el}%7.2fs rows=$n jobs=${jobs.get - j0} " +
        f"stages=${stages.get - s0} shuffleMB=${(shuffleBytes.get - b0) / 1e6}%.1f")
      el
    }

    val plansDir = sys.env.get("GRAFT_D21_PLANS")
    if (plansDir.isDefined) {
      val dir = java.nio.file.Paths.get(plansDir.get)
      java.nio.file.Files.createDirectories(dir)
      def fmt(df: DataFrame): String =
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      def run(label: String, f: => DataFrame): (DataFrame, String) = {
        val (j0, s0, b0) = (jobs.get, stages.get, shuffleBytes.get)
        val t0 = System.nanoTime()
        val df = f
        val n = df.count()
        val el = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val hdr = f"-- $label: wall=${el}%.2fs rows=$n jobs=${jobs.get - j0} " +
          f"stages=${stages.get - s0} shuffleMB=${(shuffleBytes.get - b0) / 1e6}%.1f\n" +
          "-- NOTE: every lineage cut / RDD phase executes EAGERLY while the\n" +
          "-- frame is built, so the formatted plan below shows only the final\n" +
          "-- rollup; the job/stage/shuffle counters above are the evidence for\n" +
          "-- everything the cuts hide. See the round-1 fragment (before file)\n" +
          "-- for the per-round exchange shape the rework removed.\n"
        (df, hdr)
      }
      val (odf, ohdr) = run("d21_suffix_dup round-11 shape",
        oldSuffixDup(graft.Tables.documentsSpread(spark, sfDir)))
      // Representative round-1 fragment of the old shape, pre-cut: the
      // 5-exchange pattern (shift join both sides, pair distinct, range
      // sort, 2-exchange join-back) paid once per doubling round.
      val frag = oldRound1Fragment(graft.Tables.documentsSpread(spark, sfDir))
      java.nio.file.Files.writeString(dir.resolve("d21_suffix_dup_before.txt"),
        ohdr + fmt(odf) + "\n-- round-1 doubling fragment (pre-cut), one of 7 rounds:\n" + fmt(frag))
      graft.core.Lineage.releaseAllStorage(spark)
      val (ndf, nhdr) = run("d21_suffix_dup round-12 shape",
        graft.queries.SuffixOps.suffixDupOf(graft.Tables.documentsSpread(spark, sfDir)))
      java.nio.file.Files.writeString(dir.resolve("d21_suffix_dup_after.txt"),
        nhdr + fmt(ndf))
      println(s"[d21ab] plans written to ${dir}")
      spark.stop()
      return
    }

    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to reps) {
      olds += time("old") { oldSuffixDup(graft.Tables.documentsSpread(spark, sfDir)).count() }
      news += time("new") { graft.queries.SuffixOps.suffixDupOf(
        graft.Tables.documentsSpread(spark, sfDir)).count() }
    }
    println(f"[d21ab] old min=${olds.min}%.2f med=${olds.sorted.apply(olds.size / 2)}%.2f")
    println(f"[d21ab] new min=${news.min}%.2f med=${news.sorted.apply(news.size / 2)}%.2f")
    spark.stop()
  }

  /** Round-1 of the old doubling loop, UNCUT, so its full exchange pattern
    * is visible to explain — the shape that repeated 7 times. */
  def oldRound1Fragment(docs0: DataFrame): DataFrame = {
    import graft.queries.SuffixOps.Cap
    val toks = split(trim(col("text")), "\\s+")
    val docs = docs0.select(col("doc_id"), toks.as("toks"))
    val lens0 = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val offs = graft.core.Lineage.cut(graft.queries.SuffixOps.prefixOffsets(lens0))
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
    val r = graft.core.Lineage.cut(realR.unionByName(sent)
      .select(col("doc_id"), col("pos"), col("maxl"),
        array(col("rk")).as("rs"), col("rk")))
    val shifted = r.select((col("pos") - 1L).as("pos"), col("rk").as("rk2"))
    val paired = r.join(shifted, Seq("pos"), "left")
      .withColumn("rk2f", coalesce(col("rk2"), lit(Long.MinValue) + col("pos")))
    val ranked = sortedIndex(
      paired.select(col("rk"), col("rk2f")).distinct(), Seq("rk", "rk2f"), "nrk")
    paired.join(ranked, Seq("rk", "rk2f"))
      .select(col("doc_id"), col("pos"), col("maxl"),
        concat(col("rs"), array(col("nrk"))).as("rs"), col("nrk").as("rk"))
  }

  // ---- round-11 shape, verbatim ----
  private def sortedIndex(df: DataFrame, keys: Seq[String], out: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  def oldSuffixDup(docs0: DataFrame): DataFrame = {
    import graft.core.Lineage.LineageOps
    import graft.queries.SuffixOps.{Cap, Levels, PosThreshold}
    val toks = split(trim(col("text")), "\\s+")
    val docs = docs0.select(col("doc_id"), toks.as("toks"))
    val lens0 = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val offs = graft.core.Lineage.cut(graft.queries.SuffixOps.prefixOffsets(lens0))
    val lens = offs.select(col("doc_id"), col("n"))
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
    }
    val sa = sortedIndex(r.where(col("maxl") > 0), Seq("rk", "pos"), "sa")
      .cutLineage
    val lookup = r.select(col("pos"), col("rs"))
    val a = sa.select(col("sa"), col("doc_id").as("doc_a"), col("pos").as("p"))
    val b = sa.select((col("sa") - 1L).as("sa"), col("doc_id").as("doc_b"),
      col("pos").as("q"))
    var adj = a.join(b, Seq("sa"))
      .select(col("doc_a"), col("p"), col("doc_b"), col("q"), lit(0L).as("acc"))
      .cutLineage
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
    }
    val perPos = adj.select(col("doc_a").as("doc_id"), col("p").as("pos"), col("acc"))
      .unionByName(adj.select(col("doc_b").as("doc_id"), col("q").as("pos"), col("acc")))
      .groupBy(col("doc_id"), col("pos"))
      .agg(max(col("acc")).as("dl"))
    val perDoc = perPos.groupBy("doc_id")
      .agg(least(max(col("dl")), lit(Cap.toLong)).as("max_dup_tokens"),
        sum(when(col("dl") >= PosThreshold, 1L).otherwise(0L)).as("n_dup_pos_ge8"))
    lens.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_dup_tokens"), lit(0L)).as("max_dup_tokens"),
        coalesce(col("n_dup_pos_ge8"), lit(0L)).as("n_dup_pos_ge8"))
  }
}

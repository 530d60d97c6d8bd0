package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's IVF claim, demonstrated: with the embedding table
  * partitioned by cell (label), probing nprobe cells becomes partition
  * pruning — the scan reads only the probed partitions.
  */
class IvfPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("cell-partitioned ANN probe prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Tables.embeddings(spark, SparkTestBase.sf)
      .write.mode("overwrite").partitionBy("label").parquet(dir)

    val probes = Seq(3, 7) // the "nearest centroids" of some query
    val cells = spark.read.parquet(dir).where(col("label").isin(probes: _*))

    // Partition pruning shows up as PartitionFilters on the scan and a
    // partition count smaller than the full table's.
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { cells.explain("formatted") }
    val plan = out.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("label"), plan)

    // Only the probed cells' rows are read.
    val full = Tables.embeddings(spark, SparkTestBase.sf)
    val expected = full.where(col("label").isin(probes: _*)).count()
    assert(cells.count() == expected)
    assert(expected > 0 && expected < full.count())

    // Runtime proof, not just plan text: the scan's numPartitions metric
    // must equal the probe count (AQE wraps the plan; unwrap stages).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case qs: QueryStageExec => scansOf(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scansOf)
    }
    val executed = cells.where(lit(true)) // fresh execution to read metrics from
    executed.collect()
    val scanMetrics = scansOf(executed.queryExecution.executedPlan)
    assert(scanMetrics.nonEmpty)
    assert(scanMetrics.head.metrics("numPartitions").value == probes.size.toLong)

    // And the pruned scan feeds the same brute-force top-k as in
    // SimilarityOps (cosine over the pruned cells only).
    val q = full.where(col("vec_id") === 0)
      .select(org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")).as("qv"))
    val topk = cells
      .select(col("vec_id"), org.apache.spark.sql.functions.transform(col("embedding"), x => x.cast("double")).as("v"))
      .crossJoin(broadcast(q))
      .withColumn("cos", graft.functions.GraftFunctions.cosine(col("v"), col("qv")))
      .orderBy(col("cos").desc, col("vec_id")).limit(5)
      .collect()
    assert(topk.length == 5)
  }

  test("range search: triangle-inequality prune is lossless and actually prunes clustered cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // Plant 6 well-separated cluster centers 40 apart in one coordinate;
    // members jitter ±0.5 per dim, so every cell radius ≪ the separation
    // and a ball around a point near center 0 can only touch cell 0.
    val dim = 8
    val rows = (0 until 300).map { i =>
      val label = i % 6
      val v = Array.tabulate(dim)(j =>
        (if (j == 0) label * 40.0 else 0.0) + rnd.nextDouble() - 0.5)
      (i.toLong, label.toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "label", "v")
    val q = e.where(col("vec_id") === 0).select(col("v").as("qv"))
    val cent = graft.queries.SimilarityOps.centroids(e)
    val distSqMax = 4.0
    val (kept, hits) = graft.queries.SimilarityOps.rangeSearchPruned(
      e.where(col("vec_id") =!= 0), q, cent, distSqMax)
    // The prune fired: only the query's own cell survives the bound.
    assert(kept == Seq(0L), s"kept=$kept")
    // And it lost nothing: pruned result == brute force over ALL cells.
    val brute = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dist_sq",
        graft.queries.SimilarityOps.distSq(col("v"), col("qv")))
      .where(col("dist_sq") <= lit(distSqMax))
      .select(col("vec_id"), col("label"), col("dist_sq"))
      .collect().map(_.toSeq).toSet
    assert(brute.nonEmpty)
    assert(hits.collect().map(_.toSeq).toSet == brute)
  }

  test("range search on the isotropic corpus: prune keeps every cell, ball matches brute force") {
    val d = SparkTestBase.sf
    val full = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val q = full.where(col("vec_id") === 0).select(col("v").as("qv"))
    val cent = graft.queries.SimilarityOps.centroids(full)
    val (kept, hits) = graft.queries.SimilarityOps.rangeSearchPruned(
      full.where(col("vec_id") =!= 0), q, cent,
      graft.queries.SimilarityOps.RangeDistSqMax)
    // Near-isotropic vectors: the bound correctly refuses to prune.
    assert(kept.toSet == full.select("label").distinct()
      .collect().map(_.get(0)).toSet)
    val brute = full.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dist_sq",
        graft.queries.SimilarityOps.distSq(col("v"), col("qv")))
      .where(col("dist_sq") <= lit(graft.queries.SimilarityOps.RangeDistSqMax))
      .count()
    assert(brute > 0 && hits.count() == brute)
  }

  test("adaptive IVF top-k: exact (recall 10/10) on the planted-cluster " +
       "corpus while probing a strict subset of cells") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // Same planted geometry as the range test: 6 centers 40 apart, cell
    // radius ≪ separation, so the query's own cell already contains its
    // true top-k and the expansion bound stops at 1 cell.
    val dim = 8
    val rows = (0 until 300).map { i =>
      val label = i % 6
      val v = Array.tabulate(dim)(j =>
        (if (j == 0) label * 40.0 else 0.0) + rnd.nextDouble() - 0.5)
      (i.toLong, label.toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "label", "v")
    val q = e.where(col("vec_id") === 0).select(col("v").as("qv"))
    val cent = graft.queries.SimilarityOps.centroids(e)
    val (probes, top) = graft.queries.SimilarityOps.ivfAdaptiveTopK(
      e.where(col("vec_id") =!= 0), q, cent, k = 10, initialProbes = 1)
    val brute = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dist_sq",
        graft.queries.SimilarityOps.distSq(col("v"), col("qv")))
      .orderBy(col("dist_sq").asc, col("vec_id")).limit(10)
      .select(col("vec_id"), col("label"), col("dist_sq"))
      .collect().map(_.toSeq)
    // Recall 10/10 — adaptive probing is exact by its stop rule...
    assert(top.collect().map(_.toSeq).toSeq == brute.toSeq)
    // ...and on clustered data it got there WITHOUT a full scan.
    assert(probes.size < 6, s"expected a strict subset of cells, probed $probes")
  }

  test("adaptive IVF top-k on the isotropic corpus: still exact — the " +
       "expansion honestly widens as far as the data demands") {
    val full = Tables.embeddings(spark, SparkTestBase.sf)
      .select(col("vec_id"), col("label"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val q = full.where(col("vec_id") === 0).select(col("v").as("qv"))
    val cent = graft.queries.SimilarityOps.centroids(full)
    val (_, top) = graft.queries.SimilarityOps.ivfAdaptiveTopK(
      full.where(col("vec_id") =!= 0), q, cent, k = 10)
    val brute = full.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("dist_sq",
        graft.queries.SimilarityOps.distSq(col("v"), col("qv")))
      .orderBy(col("dist_sq").asc, col("vec_id")).limit(10)
      .select(col("vec_id"), col("label"), col("dist_sq"))
      .collect().map(_.toSeq)
    assert(top.collect().map(_.toSeq).toSeq == brute.toSeq)
  }
}

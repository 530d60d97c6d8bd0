package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocStreaming, EventStreaming}

/** Stream–static join parity: streaming contamination scoring over a
  * document file-stream must reproduce the batch tx_contamination rows
  * exactly (Complete mode, finite replay).
  */
class DocStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("streaming contamination == batch tx_contamination") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream").toString
    graft.core.Fs.deleteOnExit(dir)
    docs.write.mode("overwrite").parquet(dir)
    val stream = DocStreaming.docStream(spark, dir, docs.schema)
    val bench = DocStreaming.benchmarkGrams(spark, SparkTestBase.sf)
    val q = EventStreaming.runToMemory(
      DocStreaming.contaminationScores(stream, bench), "contam_out")
    try {
      val streamed = spark.table("contam_out")
        .select("doc_id", "source", "n_grams", "n_hit", "contamination")
      val batch = SparkEntry.queries("tx_contamination")(spark, SparkTestBase.sf)
        .select("doc_id", "source", "n_grams", "n_hit", "contamination")
      assert(streamed.count() == batch.count(), "row count mismatch")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "stream/batch contamination mismatch")
    } finally q.stop()
  }

  test("stream side of the contamination join does not shuffle for the join") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val bench = DocStreaming.benchmarkGrams(spark, SparkTestBase.sf)
    // Same plan shape in batch: the join itself must be broadcast (the
    // only Exchange is the final per-doc aggregation's).
    val plan = DocStreaming.contaminationScores(docs, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "stream-static join must broadcast")
  }
}

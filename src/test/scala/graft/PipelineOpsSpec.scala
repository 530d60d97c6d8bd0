package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineOps

/** Value-level coverage for the pipeline operators (contamination,
  * repetition, packing). The DuckDB oracle proves cross-engine equality;
  * these prove the values mean what they claim, on both synthetic frames
  * and the real sf0.001 tables.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, SparkTestBase.sf)

  test("contamination: benchmark docs excluded, fractions in [0,1]") {
    val rows = q("tx_contamination").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[String]("source") == PipelineOps.BenchmarkSource))
    rows.foreach { r =>
      val c = r.getAs[Double]("contamination")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Int]("n_grams").toLong)
    }
  }

  test("contamination: doc sharing an 8-gram with the benchmark is flagged") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"$passage tail words here", PipelineOps.BenchmarkSource),
      (2L, s"lead in words $passage", "srcX"),
      (3L, "nothing shared with the benchmark at all in this one", "srcX"))
      .toDF("doc_id", "text", "source")
    val out = PipelineOps.contaminationOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(out(2L) == 1L, "candidate sharing the passage must hit exactly once")
    assert(out(3L) == 0L, "unrelated candidate must not hit")
  }

  test("repetition: repeated doc scores high, distinct doc scores zero") {
    import spark.implicits._
    val repeated = Seq.fill(10)("spam ham").mkString(" ")
    val distinctDoc = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, repeated), (2L, distinctDoc)).toDF("doc_id", "text")
    val out = PipelineOps.repetitionOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup2_frac"), r.getAs[Double]("top_tok_frac"))).toMap
    // 20 tokens → 19 bigrams, only 2 distinct ("spam ham", "ham spam").
    assert(out(1L)._1 > 0.85, s"repeated doc dup2=${out(1L)._1}")
    assert(out(1L)._2 == 0.5, "each of the 2 tokens is half the doc")
    assert(out(2L)._1 == 0.0)
    assert(out(2L)._2 == 0.05, "every token unique → top share = 1/20")
  }

  test("repetition on sf0.001: fractions well-formed") {
    val rows = q("tx_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("dup2_frac", "dup3_frac", "top_tok_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
      assert(r.getAs[Double]("top_tok_frac") > 0.0)
    }
  }

  test("pack: offsets are gap-free within each (lang, shard) stream") {
    val rows = q("tx_pack").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("start_off"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_off")))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, stream) =>
      val ordered = stream.sortBy(_._3)
      var expected = 0L
      ordered.foreach { case (_, _, _, nTok, startOff, chunkId, chunkOff) =>
        assert(startOff == expected, "stream must be gap-free")
        assert(chunkId == startOff / PipelineOps.ChunkTokens)
        assert(chunkOff == startOff % PipelineOps.ChunkTokens)
        expected += nTok
      }
    }
  }

  test("pack: deterministic across runs") {
    val a = q("tx_pack").collect().map(_.toString).sorted
    val b = q("tx_pack").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}

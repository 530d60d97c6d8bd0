package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.queries.PipelineOps

/** Differential testing for the pipeline operators: Spark results vs an
  * independent plain-Scala reference over randomized corpora (seeded,
  * deterministic) with hostile whitespace — multi-space runs, tabs,
  * newlines, short docs. Catches index-arithmetic edges the fixed corpus
  * and the SQL oracle (which mirrors the same construction) could both
  * miss.
  */
class PipelineDifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val Ws = Array(" ", "  ", "\t", " \n ", "\f")
  private val Vocab = (1 to 12).map(i => s"w$i")

  private def randomDoc(rnd: Random): String = {
    val n = rnd.nextInt(20) // 0..19 tokens
    if (n == 0) ""
    else (1 to n).map(_ => Vocab(rnd.nextInt(Vocab.length)))
      .mkString(Ws(rnd.nextInt(Ws.length))) // one separator style per doc
  }

  private def tokensOf(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array("") else t.split("[ \\t\\n\\x0B\\f\\r]+")
  }

  private def gramsOf(text: String, n: Int): Seq[String] = {
    val toks = tokensOf(text)
    val count = math.max(toks.length - n + 1, 1)
    (0 until count).map(i => toks.slice(i, i + n).mkString(" "))
  }

  (0 until 3).foreach { trial =>
    test(s"repetition matches plain-Scala reference (trial $trial)") {
      import spark.implicits._
      val rnd = new Random(1234 + trial)
      val docs = (0L until 150L).map(i => (i, randomDoc(rnd)))
      val df = docs.toDF("doc_id", "text")
      val got = PipelineOps.repetitionOf(df).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_tokens"), r.getAs[Double]("dup2_frac"),
            r.getAs[Double]("dup3_frac"), r.getAs[Double]("top_tok_frac")))
        .toMap
      docs.foreach { case (id, text) =>
        val toks = tokensOf(text)
        def dupFrac(n: Int): Double = {
          val g = gramsOf(text, n)
          (g.size - g.distinct.size).toDouble / g.size.toDouble
        }
        val top = toks.groupBy(identity).values.map(_.length).max
        val (nT, d2, d3, tf) = got(id)
        assert(nT == toks.length, s"doc $id n_tokens")
        assert(d2 == dupFrac(2), s"doc $id dup2 ($text)")
        assert(d3 == dupFrac(3), s"doc $id dup3 ($text)")
        assert(tf == top.toDouble / toks.length.toDouble, s"doc $id top_tok")
      }
    }

    test(s"pack offsets match plain-Scala reference (trial $trial)") {
      import spark.implicits._
      val rnd = new Random(99 + trial)
      val langs = Seq("en", "de", "zh")
      val docs = (0L until 200L).map { i =>
        (i, randomDoc(rnd), langs(rnd.nextInt(3)), "srcX", 0L)
      }
      val dir = java.nio.file.Files.createTempDirectory("graft_diff_docs").toString
      graft.core.Fs.deleteOnExit(dir)
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("tx_pack")(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("shard"), r.getAs[Long]("start_off"),
            r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_off")))
        .toMap
      // Reference: per (lang, id % 16) stream in id order, cumulative sum.
      docs.groupBy(d => (d._3, d._1 % PipelineOps.PackShards)).foreach {
        case (_, stream) =>
          var off = 0L
          stream.sortBy(_._1).foreach { case (id, text, _, _, _) =>
            val nTok = if (text.trim.isEmpty) 0 else tokensOf(text).length
            val (shard, startOff, chunkId, chunkOff) = got(id)
            assert(shard == id % PipelineOps.PackShards)
            assert(startOff == off, s"doc $id start_off")
            assert(chunkId == off / PipelineOps.ChunkTokens)
            assert(chunkOff == off % PipelineOps.ChunkTokens)
            off += nTok
          }
      }
    }

    test(s"contamination matches plain-Scala reference (trial $trial)") {
      import spark.implicits._
      val rnd = new Random(777 + trial)
      val srcs = Seq(PipelineOps.BenchmarkSource, "srcA", "srcB")
      // Longer docs so 8-grams exist; small vocab makes overlaps common.
      val docs = (0L until 120L).map { i =>
        val n = 8 + rnd.nextInt(12)
        val text = (1 to n).map(_ => Vocab(rnd.nextInt(6))).mkString(" ")
        (i, text, srcs(rnd.nextInt(3)))
      }
      val df = docs.toDF("doc_id", "text", "source")
      val got = PipelineOps.contaminationOf(df).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_grams"), r.getAs[Long]("n_hit")))
        .toMap
      val benchSet = docs.filter(_._3 == PipelineOps.BenchmarkSource)
        .flatMap(d => gramsOf(d._2, PipelineOps.ContamGramWidth).distinct)
        .toSet
      val cands = docs.filter(_._3 != PipelineOps.BenchmarkSource)
      assert(got.size == cands.size)
      cands.foreach { case (id, text, _) =>
        val g = gramsOf(text, PipelineOps.ContamGramWidth).distinct
        val (nGrams, nHit) = got(id)
        assert(nGrams == g.size, s"doc $id n_grams")
        assert(nHit == g.count(benchSet), s"doc $id n_hit")
      }
    }
  }
}

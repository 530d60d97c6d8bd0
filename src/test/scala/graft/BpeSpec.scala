package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.bpe_encode
import graft.queries.BpeOps

/** Differential gate for the distributed BPE trainer/encoder: an obviously
  * correct in-memory model (the textbook greedy algorithm) must agree with
  * the Spark implementation on real and adversarial corpora. The DuckDB
  * oracle re-derives the same algorithm independently in SQL; this spec is
  * the engine-internal check that survives without DuckDB.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- in-memory reference model (code-point symbols) ----

  private def chars(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def mergeOnce(toks: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(texts: Seq[String], k: Int): Seq[BpeOps.Merge] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split("[ \n\t]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => chars(w) -> g.size.toLong }
    val merges = Seq.newBuilder[BpeOps.Merge]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, f) <- words; i <- 0 until toks.length - 1)
        pc((toks(i), toks(i + 1))) = pc.getOrElse((toks(i), toks(i + 1)), 0L) + f
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        merges += BpeOps.Merge(step, l, r, cnt)
        words = words.groupBy { case (toks, _) => mergeOnce(toks, l, r) }
          .map { case (t, g) => t -> g.values.sum }
        step += 1
      }
    }
    merges.result()
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Vector[String] =
    text.split("[ \n\t]+").filter(_.nonEmpty).toVector.flatMap { w =>
      merges.foldLeft(chars(w)) { case (t, (l, r)) => mergeOnce(t, l, r) }
    }

  // ---- differentials ----

  test("trainer matches the in-memory model on the real corpus") {
    val sf = SparkTestBase.sf
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0)).toSeq
    val expected = refTrain(texts, BpeOps.DefaultMerges)
    val got = BpeOps.train(Tables.documents(spark, sf), BpeOps.DefaultMerges)
    assert(got == expected)
  }

  test("trainer handles runs, ties, and single-char words like the model") {
    import spark.implicits._
    // 'aaaa' exercises the left-to-right non-overlap rule ([a,a,a,a] →
    // [aa,aa]); 'bc'/'cb' counts tie and must break (l, r)-lexicographic;
    // 'x' contributes no pairs.
    val texts = Seq("aaaa aaa bc bc cb cb x", "aaaa cb bc x x")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val expected = refTrain(texts, 6)
    val got = BpeOps.train(docs, 6)
    assert(got == expected)
    // And the run actually merged pairwise: step 1 must be (a, a).
    assert(got.head.l == "a" && got.head.r == "a")
  }

  test("trainer stops when the corpus has no pairs left") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // 'ab' fuses in one merge; afterwards every word is a single token.
    val got = BpeOps.train(docs, 10)
    assert(got == Seq(BpeOps.Merge(1, "a", "b", 2L)))
  }

  test("encoder matches the reference fold, including astral code points") {
    import spark.implicits._
    // U+1D11E (musical G clef) is an astral char: a UTF-16 split would
    // shear it into surrogates; code-point tokenization must not.
    val clef = new String(Character.toChars(0x1D11E))
    val texts = Seq(s"hello hello help $clef$clef$clef", "hello help he")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeOps.train(docs, 8)
    assert(merges == refTrain(texts, 8))
    assert(merges.exists(m => m.l == clef && m.r == clef),
      s"astral pair should be learnable: $merges")
    val pairs = merges.map(m => (m.l, m.r))
    val got = docs.select(col("doc_id"), bpe_encode(col("text"), pairs).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refEncode(t, pairs), s"doc $i")
    }
  }

  test("encoder treats tabs/newlines as word boundaries and drops empties") {
    import spark.implicits._
    val docs = Seq((1L, " a\tb\nc  d ")).toDF("doc_id", "text")
    val got = docs.select(bpe_encode(col("text"), Nil).as("t"))
      .head.getSeq[String](0)
    assert(got == Seq("a", "b", "c", "d"))
  }

  test("bpe coverage: per-lang stats agree with tx_bpe_apply and the " +
       "merges genuinely compress") {
    val cov = SparkEntry.queries("tx_bpe_coverage")(spark, SparkTestBase.sf)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_cp"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("merged_tokens"),
          r.getAs[Long]("cp_per_token_micro"))).toMap
    // Conservation against the apply query: Σ total_tokens == Σ apply
    // n_tokens (same encode, same empty-doc exclusion).
    val applyTotal = SparkEntry.queries("tx_bpe_apply")(spark, SparkTestBase.sf)
      .collect().map(_.getAs[Long]("n_tokens")).sum
    assert(cov.values.map(_._3).sum == applyTotal)
    cov.foreach { case (lang, (nd, ncp, nt, nm, cpt)) =>
      assert(nd > 0 && nt > 0 && ncp >= nt, s"$lang: cp >= tokens")
      assert(nm <= nt)
      // cp/token ≥ 1 by construction; > 1 exactly when merges fired.
      assert(cpt >= 1000000L)
      if (nm > 0) assert(cpt > 1000000L, s"$lang: merges must compress")
      assert(cpt == ncp * 1000000L / nt)
    }
    // The trained merges fire somewhere on this corpus.
    assert(cov.values.map(_._4).sum > 0, "no merge ever applied")
  }
}

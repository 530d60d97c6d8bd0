package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ExprUtil, GraftFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** The round-4 codegen expressions each replaced an interpreted
  * higher-order-function chain; these specs pin VALUE EQUALITY against the
  * exact HOF form they replaced (on real corpus data including multi-byte
  * text, and on adversarial generated inputs) — the license to claim the
  * swap is purely physical.
  */
class CodegenTwinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach(i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  private def docs = Tables.documents(spark, sf)

  test("char_ngrams == array_distinct(transform(sequence, substr)) on the corpus (incl. zh)") {
    val hof = when(length(col("text")) >= 3,
      array_distinct(transform(
        sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    val diff = docs.select(col("doc_id"),
        array_sort(GraftFunctions.char_ngrams(col("text"), 3)).as("a"),
        array_sort(hof).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("char_ngrams: property — matches code-point windows on generated unicode") {
    forAll(Gen.listOfN(24, Gen.oneOf(
        Gen.alphaNumChar, Gen.const(' '), Gen.const('é'), Gen.const('漢'),
        Gen.const('\uD83D'), Gen.const('\uDE00'))) // incl. surrogate halves
      .map(_.mkString)) { s0 =>
      // Build a valid-UTF-8 string (paired surrogates survive, lone
      // surrogates are replaced, matching what Spark's UTF8String stores).
      val s = new String(s0.getBytes("UTF-8"), "UTF-8")
      val got = {
        val arr = ExprUtil.charNgrams(UTF8String.fromString(s), 3)
        (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      }
      val cps = s.codePoints().toArray
      val expected = (0 to cps.length - 3)
        .map(i => new String(cps, i, 3)).distinct
      assert(got == expected, s"input=${s.getBytes("UTF-8").toSeq}")
    }
  }

  test("word_shingles == sequence/slice/concat_ws chain on the corpus") {
    val toks = split(trim(col("text")), "\\s+")
    val hof = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3)))))
    val diff = docs.select(col("doc_id"),
        array_sort(GraftFunctions.word_shingles(toks, 3)).as("a"),
        array_sort(hof).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("md5_64_array == transform(md5_64) element-wise on the corpus") {
    val toks = array_distinct(split(trim(col("text")), "\\s+"))
    val diff = docs.select(
        GraftFunctions.md5_64_array(toks).as("a"),
        transform(toks, t => GraftFunctions.md5_64(t)).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.isEmpty)
  }

  test("minhash_sigs == per-perm array_min(transform(mul_add64)) on the corpus") {
    import graft.queries.DedupOps.{NumPerms, PermA, PermC}
    val toks = split(trim(col("text")), "\\s+")
    val bh = GraftFunctions.md5_64_array(GraftFunctions.word_shingles(toks, 3))
    val perPerm = array((0 until NumPerms).map { p =>
      array_min(transform(bh, h => GraftFunctions.mul_add64(h, PermA(p), PermC(p))))
    }: _*)
    val diff = docs.select(
        GraftFunctions.minhash_sigs(bh, PermA, PermC).as("a"), perPerm.as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.isEmpty)
  }

  test("simhash_fold == aggregate/zip_with vote fold on the corpus") {
    val masks = array((0 until 64).map(b => lit(1L << b)): _*)
    val hashes = GraftFunctions.md5_64_array(
      array_distinct(split(trim(col("text")), "\\s+")))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    val hof = aggregate(zip_with(votes, masks,
      (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    val diff = docs.select(
        GraftFunctions.simhash_fold(hashes).as("a"), hof.as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("gram histogram bound: min_sum64 >= true intersection size (lossless screen)") {
    // The d4 screen is only allowed to REFUTE: for every real pair the
    // bound must dominate the true intersection.
    val g = docs.limit(60).select(col("doc_id"),
      GraftFunctions.char_ngrams(col("text"), 3).as("grams"))
    val a = g.select(col("doc_id").as("ia"), col("grams").as("ga"),
      GraftFunctions.gram_hist64(col("grams")).as("ha"))
    val b = g.select(col("doc_id").as("ib"), col("grams").as("gb"),
      GraftFunctions.gram_hist64(col("grams")).as("hb"))
    val bad = a.crossJoin(b).where(col("ia") < col("ib"))
      .where(GraftFunctions.min_sum64(col("ha"), col("hb")) <
        size(array_intersect(col("ga"), col("gb"))))
    assert(bad.isEmpty, "histogram bound under-counted an intersection")
  }

  test("frame_byte_sums == sampleFrames byte sums (incl. multi-byte payloads)") {
    import spark.implicits._
    val rows = Seq("", "a", "x" * 255, "y" * 256, "z" * 257, "w" * 2049,
      "é" * 200, "漢字" * 300).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "text")
    val viaExpr = df.select(col("doc_id"),
        posexplode(GraftFunctions.frame_byte_sums(col("text").cast("binary"))))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaLoop = rows.flatMap { case (id, t) =>
      graft.queries.MultimodalOps.sampleFrames(id, t.getBytes("UTF-8"))
        .map(f => (f.doc_id, f.frame_idx, f.byte_sum))
    }.toSet
    assert(viaExpr == viaLoop)
  }

  test("rare_prefix == distributed df-join + window-rank prefix (d4 fallback parity)") {
    // Force the fallback path with vocabLimit=0 and compare d4's output
    // against the default per-row-prefix path — both must emit the same
    // verified pairs.
    def run(): Set[(Long, Long)] =
      graft.queries.DedupOps.queries("d4_ngram_jaccard")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perRow = run()
    spark.conf.set("spark.graft.ngram.vocabLimit", "0")
    val windowed = try run() finally spark.conf.unset("spark.graft.ngram.vocabLimit")
    assert(perRow == windowed)
    assert(perRow.nonEmpty)
  }
}

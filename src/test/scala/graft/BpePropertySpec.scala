package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import graft.functions.ExprUtil

/** Seeded property fuzz for the BPE kernels: the JVM helpers behind
  * [[graft.functions.BpeMergePair]] / [[graft.functions.BpeEncode]] /
  * [[graft.functions.CodePoints]] against an obviously-correct model, on
  * generated inputs that include merge-run overlaps, multi-byte and
  * astral characters, and degenerate words — plus a low-count fuzz of the
  * DISTRIBUTED trainer end-to-end.
  */
class BpePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach(i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  // model ------------------------------------------------------------

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

  private def mergeOnce(t: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == l && t(i + 1) == r) { out += (l + r); i += 2 }
      else { out += t(i); i += 1 }
    }
    out.result()
  }

  private def toArrayData(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString)
      .toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])

  private def fromArrayData(a: ArrayData): Vector[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toVector

  // generators — alphabet stresses runs (few symbols) and multi-byte
  private val sym = Gen.oneOf("a", "b", "é", "汉", new String(Character.toChars(0x1D11E)))
  private val word = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, sym)).map(_.mkString)
  private val text = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val pair = for { l <- sym; r <- sym } yield (l, r)

  test("bpeMergePair == model merge on generated token runs") {
    val toksGen = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, sym))
    forAll(Gen.zip(toksGen, pair)) { case (toks, (l, r)) =>
      val got = fromArrayData(ExprUtil.bpeMergePair(toArrayData(toks),
        UTF8String.fromString(l), UTF8String.fromString(r)))
      assert(got == mergeOnce(toks.toVector, l, r), s"toks=$toks pair=($l,$r)")
    }
  }

  test("codePoints == model char split (incl. astral)") {
    forAll(word) { w =>
      val got = fromArrayData(ExprUtil.codePoints(UTF8String.fromString(w)))
      assert(got == chars(w), s"word=$w")
    }
  }

  test("bpeEncode == model fold on generated texts and merge lists") {
    val merges = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, pair))
    forAll(Gen.zip(text, merges)) { case (t, ms) =>
      val lefts = ms.map(m => UTF8String.fromString(m._1)).toArray
      val rights = ms.map(m => UTF8String.fromString(m._2)).toArray
      val got = fromArrayData(ExprUtil.bpeEncode(UTF8String.fromString(t), lefts, rights))
      val want = t.split("[ \n\t]+").filter(_.nonEmpty).toVector.flatMap { w =>
        ms.foldLeft(chars(w)) { case (x, (l, r)) => mergeOnce(x, l, r) }
      }
      assert(got == want, s"text='$t' merges=$ms")
    }
  }

  test("distributed trainer == model trainer on random corpora") {
    import spark.implicits._
    val corpus = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, text))
    forAll(corpus, n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.queries.BpeOps.train(docs, 4)
      // model trainer (same as BpeSpec's, k=4)
      var words: Map[Vector[String], Long] = texts
        .flatMap(_.split("[ \n\t]+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => chars(w) -> g.size.toLong }
      val expected = Seq.newBuilder[graft.queries.BpeOps.Merge]
      var step = 1
      var done = false
      while (step <= 4 && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((toks, f) <- words; i <- 0 until toks.length - 1)
          pc((toks(i), toks(i + 1))) = pc.getOrElse((toks(i), toks(i + 1)), 0L) + f
        if (pc.isEmpty) done = true
        else {
          val ((l, r), cnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }
          expected += graft.queries.BpeOps.Merge(step, l, r, cnt)
          words = words.groupBy { case (t, _) => mergeOnce(t, l, r) }
            .map { case (t, g) => t -> g.values.sum }
          step += 1
        }
      }
      assert(got == expected.result(), s"corpus=$texts")
    }
  }
}

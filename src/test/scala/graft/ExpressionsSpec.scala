package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{FieldContext, TransformException, Transforms, TransformSpec}
import graft.functions.{ExprUtil, GraftFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** Custom expression semantics + transform type gating. */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("rolling hash: deterministic golden values, distributed == local") {
    import spark.implicits._
    val local = ExprUtil.rollingHash(UTF8String.fromString("hello world"))
    // Stability contract: the fingerprint must never change across builds.
    assert(local == ExprUtil.rollingHash(UTF8String.fromString("hello world")))
    assert(ExprUtil.rollingHash(UTF8String.fromString("")) == 1125899906842597L)
    val viaSpark = Seq("hello world", "", "a").toDF("s")
      .select(GraftFunctions.rolling_hash64(col("s"))).collect().map(_.getLong(0))
    assert(viaSpark(0) == local)
    assert(viaSpark(1) == 1125899906842597L)
    assert(viaSpark(2) == ExprUtil.rollingHash(UTF8String.fromString("a")))
  }

  test("cdc_chunks: tiling invariant, edge cases, shift resistance") {
    import spark.implicits._
    def chunksOf(texts: String*): Array[Seq[(Int, Int, Long)]] =
      texts.toDF("s")
        .select(GraftFunctions.cdc_chunks(col("s"), 8, 32).as("c"))
        .collect()
        .map(_.getSeq[org.apache.spark.sql.Row](0)
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))))
    val base = "the quick brown fox jumps over the lazy dog, " * 8
    val Array(cs, empty, short) = chunksOf(base, "", "ab")
    // Chunks tile [0, n) exactly: starts are cumulative lens, total == n.
    assert(cs.head._1 == 0)
    assert(cs.map(_._2).sum == base.getBytes("UTF-8").length)
    cs.sliding(2).foreach { case Seq((s1, l1, _), (s2, _, _)) =>
      assert(s1 + l1 == s2)
    case _ => ()
    }
    assert(cs.forall(_._2 > 0))
    // Empty text → no chunks; text shorter than the window → one chunk.
    assert(empty.isEmpty)
    assert(short == Seq((0, 2, ExprUtil.rollingHash(UTF8String.fromString("ab")))))
    // THE CDC property: prepending a prefix shifts offsets but preserves
    // the suffix's chunk fingerprints — fixed-stride chunking would lose
    // every chunk after the edit, CDC realigns after at most one chunk.
    val Array(shifted) = chunksOf("EDIT-INSERTED-PREFIX. " + base)
    val baseHashes = cs.map(_._3).toSet
    val survivors = shifted.map(_._3).count(baseHashes.contains)
    assert(survivors >= cs.size - 2,
      s"expected nearly all of ${cs.size} base chunks to survive a prefix edit, got $survivors")
  }

  test("cdc_chunks: seeded fuzz vs naive O(n·w) recompute model") {
    // Model: recompute every window hash from scratch (the oracle's
    // shape) and segment greedily — any drift in the kernel's O(1)
    // rolling update (subtract-multiply-add order, unsigned byte
    // handling, short-input path) diverges on some generated input.
    def model(s: String, w: Int, div: Int): Seq[(Int, Int, Long)] = {
      val bytes = s.getBytes("UTF-8")
      val n = bytes.length
      if (n == 0) return Seq.empty
      val B = 1000003L
      def winHash(p: Int): Long = { // p = 1-based end
        var h = 0L
        for (i <- (p - w) until p) h = h * B + (bytes(i) & 0xFF)
        h
      }
      def chunkHash(a: Int, b: Int): Long = {
        var h = 1125899906842597L
        for (i <- a until b) h = h * B + (bytes(i) & 0xFF)
        h
      }
      val bnds = 0 +: (w until n).filter(p => (winHash(p) & (div - 1)) == 0L) :+ n
      bnds.sliding(2).map { case Seq(a, b) => (a, b - a, chunkHash(a, b)) }.toSeq
    }
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", " aeiou", "abcdefghij .,!", "日本語テキストabc", "\u0000\u00ff x")
    for (trial <- 0 until 200) {
      val alpha = alphabets(trial % alphabets.size)
      val len = rnd.nextInt(120)
      val s = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val got = {
        val arr = ExprUtil.cdcChunks(UTF8String.fromString(s), 8, 32)
        (0 until arr.numElements()).map { i =>
          val r = arr.getStruct(i, 3)
          (r.getInt(0), r.getInt(1), r.getLong(2))
        }
      }
      assert(got == model(s, 8, 32), s"kernel/model drift on ${s.take(40)}… (trial $trial)")
      // The lazy Generator must emit the identical segmentation — its
      // fused single-pass fingerprint and its warm-up/short-input paths
      // are separate code, and the corpus differential never exercises
      // empty or sub-window strings.
      val gen = graft.functions.CdcChunksGen(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType), 8, 32)
      val viaGen = gen.eval(null).iterator.toSeq
        .map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
      assert(viaGen == got, s"generator/kernel drift on ${s.take(40)}… (trial $trial)")
    }
  }

  test("cdc generator path == array path on the corpus; plan is a bare Generate") {
    val conf = graft.queries.TextOps.CdcGeneratorConf
    val arrayPath = SparkEntry.queries("tx_cdc_chunk")(spark, SparkTestBase.sf)
    spark.conf.set(conf, "true")
    try {
      val genPath = SparkEntry.queries("tx_cdc_chunk")(spark, SparkTestBase.sf)
      assert(genPath.columns.toSeq == arrayPath.columns.toSeq)
      assert(genPath.exceptAll(arrayPath).isEmpty &&
        arrayPath.exceptAll(genPath).isEmpty,
        "generator chunks diverge from array chunks")
      // The generator plans as a Generate directly over the scan — no
      // intermediate array construction node in the projection.
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { genPath.explain("formatted") }
      val p = out.toString
      assert(p.contains("cdc_chunks_gen"), p.take(800))
      assert(!p.contains("posexplode"), "generator path must not build the array form")
    } finally spark.conf.unset(conf)
  }

  test("canonical_id: null-safe on invalid input inside codegen") {
    import spark.implicits._
    val out = Seq("001000000000001", "bad", null.asInstanceOf[String]).toDF("id")
      .select(GraftFunctions.canonical_id(col("id"))).collect()
    assert(out(0).getString(0).length == 18)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("primitivize boolean columns match reference semantics") {
    import spark.implicits._
    val df = Seq("YES", "y", "1", "No", "F", "0", "", "nonsense")
      .toDF("v")
      .select(col("v"),
        GraftFunctions.primitivizeBool(col("v")).as("b"),
        GraftFunctions.primitivizeBoolError(col("v")).as("err"))
    val got = df.collect().map(r => r.getString(0) ->
      ((if (r.isNullAt(1)) None else Some(r.getBoolean(1))), Option(r.getString(2)))).toMap
    assert(got("YES") == (Some(true), None))
    assert(got("y") == (Some(true), None))
    assert(got("1") == (Some(true), None))
    assert(got("No") == (Some(false), None))
    assert(got("F") == (Some(false), None))
    assert(got("") == (Some(false), None))
    assert(got("nonsense")._1.isEmpty)
    assert(got("nonsense")._2.exists(_.contains("Invalid Boolean value nonsense")))
  }

  test("sorted_intersect_size == size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c", "x"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("a")),
      (Seq("a"), Seq("a")),
      (Seq("a", "z"), Seq("b", "y"))).toDF("a", "b")
    val got = df.select(
      GraftFunctions.sorted_intersect_size(col("a"), col("b")),
      size(array_intersect(col("a"), col("b")))).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("transforms are type-gated like the reference (transforms.py:42-47)") {
    val stringField = FieldContext("Name", "xsd:string")
    val boolField = FieldContext("IsActive", "xsd:boolean")
    // string transforms work on string fields
    Transforms("lowercase").get(stringField)
    // ... and throw on non-string fields
    val e = intercept[TransformException](Transforms("lowercase").get(boolField))
    assert(e.getMessage.contains("not available for fields of type xsd:boolean"))
    // required options enforced
    val e2 = intercept[TransformException](Transforms("prefix").get(stringField))
    assert(e2.getMessage.contains("requires options"))
  }

  test("plugin transforms register and compose (schemas.py:37-43)") {
    object Reverse extends graft.core.TransformProvider {
      val name = "reverse"
      def build(f: FieldContext, o: Map[String, String]) = c => reverse(c)
    }
    Transforms.register(Reverse)
    import spark.implicits._
    val chain = Transforms.chain(
      Seq(TransformSpec("lowercase"), TransformSpec("reverse")),
      FieldContext("x", "xsd:string"))
    val out = Seq("ABC").toDF("x").select(chain(col("x"))).collect().head.getString(0)
    assert(out == "cba")
  }

  test("nfc_normalize: composes decomposed sequences, fixes fingerprints, " +
       "identity on NFC input (fast path returns the same bytes)") {
    import spark.implicits._
    val composed = "café"            // é as one code point
    val decomposed = "café"          // e + combining acute
    val hangulD = "가"           // decomposed 가
    val rows = Seq((1L, composed), (2L, decomposed), (3L, hangulD),
      (4L, "plain ascii"), (5L, "é́")) // precomposed base + another combiner
    val out = rows.toDF("id", "s")
      .select(col("id"), graft.functions.GraftFunctions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, s) =>
      val expect = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(out(id) == expect, s"row $id")
    }
    // The canonicalization actually matters: decomposed == composed
    // after, so fingerprints over normalized text collide as they must.
    assert(out(1L) == out(2L) && out(1L) == composed)
    assert(out(3L) == "가") // precomposed Hangul syllable GA
    assert(out(4L) == "plain ascii")
  }

  test("hyperplane_bands == the composed per-plane dot_fold/when chain, " +
       "bit-for-bit, including near-zero dots") {
    import spark.implicits._
    val dim = 16; val bands = 8; val rowsPerBand = 4
    val rnd = new scala.util.Random(41)
    val planes = Array.tabulate(bands * rowsPerBand, dim)((_, _) => rnd.nextDouble() * 2 - 1)
    // Random vectors plus adversarial rows: an exact-zero dot (sign
    // boundary, >= 0 must set the bit) and an all-zeros vector.
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.tabulate(dim)(_ => rnd.nextDouble() * 2 - 1))) :+
      (200L, Seq.fill(dim)(0.0))
    val df = rows.toDF("id", "v")
    val fused = df.select(col("id"),
      graft.functions.GraftFunctions.hyperplane_bands(
        col("v"), planes.flatten.toIndexedSeq, dim, bands, rowsPerBand).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigBits = planes.toIndexedSeq.map { p =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(graft.functions.GraftFunctions.dot_fold(col("v"), planeCol) >= 0, 1L)
        .otherwise(0L)
    }
    val composedCols = (0 until bands).map { b =>
      (0 until rowsPerBand).map(r => sigBits(b * rowsPerBand + r) * lit(1L << r))
        .reduce(_ + _).as(s"band_$b")
    }
    val composed = df.select((col("id") +: composedCols): _*)
      .collect().map(r => r.getLong(0) -> (1 to bands).map(r.getLong(_)).toSeq).toMap
    assert(fused.keySet == composed.keySet)
    fused.foreach { case (id, keys) =>
      assert(keys == composed(id), s"row $id: fused $keys vs composed ${composed(id)}")
    }
  }
}

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
}

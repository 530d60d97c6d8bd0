package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.SalesforceId

/** Golden vectors from /root/reference/test/test_unit/test_SalesforceId.py:7-40
  * plus algebraic properties (idempotence, 15↔18 equivalence, rejection).
  */
class SalesforceIdSpec extends AnyFunSuite {

  /** Deterministic sample-driven property check (no scalatestplus offline). */
  def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  val golden = Map(
    "01Q36000000RXX5" -> "01Q36000000RXX5EAO",
    "005360000016xkG" -> "005360000016xkGAAQ",
    "01I36000002zD9R" -> "01I36000002zD9REAU",
    "0013600001ohPTp" -> "0013600001ohPTpAAM",
    "0033600001gyv5B" -> "0033600001gyv5BAAQ",
  )

  test("golden 15→18 pairs") {
    golden.foreach { case (id15, id18) =>
      assert(SalesforceId.canonicalize(id15) == id18)
      assert(SalesforceId.canonicalize(id18) == id18)
      assert(SalesforceId.equivalent(id15, id18))
    }
  }

  test("invalid lengths rejected") {
    intercept[IllegalArgumentException](SalesforceId.canonicalize("test"))
    intercept[IllegalArgumentException](SalesforceId.canonicalize(""))
    assert(SalesforceId.canonicalOrNull("xyz") == null)
    assert(SalesforceId.canonicalOrNull(null) == null)
  }

  val idChar: Gen[Char] = Gen.oneOf(
    ('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9'))
  val id15Gen: Gen[String] = Gen.listOfN(15, idChar).map(_.mkString)

  test("canonicalization is idempotent and length-18") {
    forAll(id15Gen) { id15 =>
      val c = SalesforceId.canonicalize(id15)
      assert(c.length == 18)
      assert(SalesforceId.canonicalize(c) == c)
      assert(c.startsWith(id15))
      // suffix is drawn from the base-32 alphabet
      assert(c.drop(15).forall(ch => (ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '5')))
    }
  }

  test("case flip in any position changes the checksum bucket") {
    forAll(id15Gen) { id15 =>
      val pos = 0
      val c = id15.charAt(pos)
      if (c.isLetter) {
        val flipped = (if (c.isUpper) c.toLower else c.toUpper) + id15.substring(1)
        assert(SalesforceId.canonicalize(flipped).drop(15) !=
          SalesforceId.canonicalize(id15).drop(15))
      }
    }
  }

  test("catalyst expression matches pure function and survives codegen") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions.col
    val df = golden.keys.toSeq.toDF("id")
      .select(col("id"), canonical_id(col("id")).as("id18"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == golden)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CanonicalId, GraftFunctions}
import graft.plans.{CanonicalIdIdempotence, GraftExtensions}

/** Catalyst extension surface: the idempotence rule collapses the double
  * canonicalization an extract→load round trip produces.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def countCanonical(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.expressions
      .map(_.collect { case c: CanonicalId => c }.size).sum

  test("canonical_id(canonical_id(x)) collapses to one application") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CanonicalIdIdempotence
    try {
      // Non-local source (range) so ConvertToLocalRelation can't pre-fold
      // the whole projection away before we inspect it.
      def ids = spark.range(5)
        .select(concat(lit("001"), lpad(col("id").cast("string"), 12, "0")).as("id"))
      val df = ids.select(GraftFunctions.canonical_id(
        GraftFunctions.canonical_id(col("id"))).as("c"))
      assert(countCanonical(df) == 1, df.queryExecution.optimizedPlan.toString)
      // Semantics unchanged: equals the single application.
      val single = ids.select(GraftFunctions.canonical_id(col("id")).as("c"))
      assert(df.collect().toSeq == single.collect().toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CanonicalIdIdempotence)
    }
  }

  test("GraftExtensions injects the rule into a session-extensions registry") {
    // Full end-to-end needs a fresh SparkSession (one JVM, one context in
    // tests); instantiating and applying proves the conf-pluggable class
    // wires without error.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("SQL function registry: custom expressions callable from spark.sql text") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    // canonical_id against a golden 15→18 pair.
    assert(spark.sql("SELECT canonical_id('01Q36000000RXX5') AS c")
      .head().getString(0) == "01Q36000000RXX5EAO")
    // char_ngrams needs a literal n; distinct 2-grams of 'abab' = {ab, ba}.
    assert(spark.sql("SELECT char_ngrams('abab', 2) AS g")
      .head().getSeq[String](0).toSet == Set("ab", "ba"))
    // dot_fold over array literals.
    assert(spark.sql(
      "SELECT dot_fold(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
    // mul_add64 wraps mod 2^64 (ANSI-safe) with literal constants.
    assert(spark.sql(
      s"SELECT mul_add64(${Long.MaxValue}L, 2L, 3L) AS m")
      .head().getLong(0) == Long.MaxValue * 2 + 3)
    // SQL simhash path == Column-API simhash path, token for token.
    val viaSql = spark.sql(
      "SELECT simhash_fold(md5_64_array(array('the', 'quick', 'fox'))) AS s")
      .head().getLong(0)
    val viaApi = spark.range(1)
      .select(GraftFunctions.simhash_fold(GraftFunctions.md5_64_array(
        array(lit("the"), lit("quick"), lit("fox")))).as("s"))
      .head().getLong(0)
    assert(viaSql == viaApi)
    // minhash_sigs defaults to the engine's committed permutation family.
    val sqlSig = spark.sql(
      "SELECT minhash_sigs(md5_64_array(array('a b c'))) AS sig")
      .head().getSeq[Long](0)
    val apiSig = spark.range(1)
      .select(GraftFunctions.minhash_sigs(
        GraftFunctions.md5_64_array(array(lit("a b c"))),
        graft.queries.DedupOps.PermA, graft.queries.DedupOps.PermC).as("sig"))
      .head().getSeq[Long](0)
    assert(sqlSig == apiSig && sqlSig.length == graft.queries.DedupOps.NumPerms)
  }

  test("SQL function registry: loud failures on bad arity / non-literal n") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT canonical_id('a', 'b')").collect()
    }
    assert(e1.getMessage.contains("1 argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT char_ngrams('abc', length('xy'))").collect()
    }
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
  }
}

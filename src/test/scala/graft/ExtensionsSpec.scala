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
}

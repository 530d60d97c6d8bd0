package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's bucketing claim, demonstrated: orders and lineitem written
  * bucketed by the join key join WITHOUT a shuffle on either side — the
  * co-located join layout for repeated large-table joins at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bucketed tables join with no shuffle exchange") {
    val sf = SparkTestBase.sf
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // Force the sort-merge path: at test scale the planner would broadcast
    // the small side (at 100 TB neither side broadcasts — SMJ is the shape
    // bucketing exists for).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { joined.explain("formatted") }
      val plan = out.toString
      // Co-located: the sort-merge join reads both bucketed layouts
      // directly — no Exchange (shuffle) feeds the join.
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + plan.take(1200))
      assert(plan.contains("SelectedBucketsCount"), plan.take(1200))
      // Value-level correctness, not just cardinality: a pairing-sensitive
      // checksum (sum of per-row products) catches rows matched to wrong
      // partners even when the join count is preserved.
      def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)),
          sum((round(col("o_totalprice") * 100) * round(col("l_quantity"))).cast("long")))
          .head
        (r.getLong(0), r.getLong(1))
      }
      val expected = checksum(Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey")))
      assert(checksum(joined) == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}

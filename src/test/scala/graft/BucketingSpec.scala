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

  test("src_bucketed_join: executed plan is exchange-free below the join") {
    val df = SparkEntry.queries("src_bucketed_join")(spark, SparkTestBase.sf)
    df.collect()
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case o => o +: o.children.flatMap(expand)
    }
    val nodes = expand(df.queryExecution.executedPlan)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.size == 1, nodes.map(_.nodeName).mkString(", "))
    val below = smj.flatMap(j => j.children.flatMap(expand))
    // The join consumes the bucketed scans DIRECTLY: the bucket layout
    // supplies the clustering, so no Exchange feeds either side — the
    // expensive half of the join is gone. A narrow in-partition SortExec
    // remains: since Spark 3.0 the bucketed scan no longer advertises its
    // sortBy ordering (spark.sql.legacy.bucketedTableScan.outputOrdering
    // restores that), and sorting already-sorted runs is cheap and
    // partition-local — no data movement. The query's ONLY shuffle is the
    // final 25-row nation aggregate.
    assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "bucketed join input must not be shuffled: " + below.map(_.nodeName).mkString(", "))
    assert(below.count(_.isInstanceOf[SortExec]) == 2,
      below.map(_.nodeName).mkString(", "))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 1,
      nodes.map(_.nodeName).mkString(", "))
  }
}

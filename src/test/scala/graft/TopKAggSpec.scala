package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKByLong

/** The native top-k aggregate (TypedImperativeAggregate) must agree with
  * the window row_number form on real data, under any partitioning (the
  * merge path), and must plan as an object hash aggregate with NO window
  * operator.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def windowForm = {
    val li = Tables.lineitem(spark, SparkTestBase.sf)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("line_id"))
    li.withColumn("rank", row_number().over(
        Window.partitionBy(col("l_suppkey"))
          .orderBy(col("cents").desc, col("line_id"))))
      .where(col("rank") <= graft.queries.Relational.TopKAggK)
      .select("l_suppkey", "rank", "cents", "line_id")
  }

  test("q_topk_agg == window row_number form") {
    val agg = SparkEntry.queries("q_topk_agg")(spark, SparkTestBase.sf)
    val win = windowForm
    assert(agg.count() == win.count(), "row count mismatch")
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "aggregate/window top-k mismatch")
  }

  test("buffer merge is partitioning-invariant") {
    val li = Tables.lineitem(spark, SparkTestBase.sf)
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_suppkey"))
      .agg(TopKByLong.top_k_by(
        round(col("l_extendedprice") * 100).cast("long"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long"), 3).as("top"))
    val a = run(li.repartition(1))
    val b = run(li.repartition(37, col("l_orderkey")))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "result depends on partitioning — merge path broken")
  }

  test("plans as ObjectHashAggregate, no Window operator") {
    val plan = SparkEntry.queries("q_topk_agg")(spark, SparkTestBase.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert(!plan.contains("Window"), "top-k aggregate must not fall back to a window")
    // Partial aggregation on the map side: the buffer, not the rows,
    // crosses the exchange.
    assert(plan.contains("partial_top_k_by") || plan.contains("partial top_k_by")
      || plan.toLowerCase.contains("partial"), plan.take(1200))
  }
}

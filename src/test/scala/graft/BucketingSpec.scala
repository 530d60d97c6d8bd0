package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md's bucketing claim, demonstrated: two tables bucketed on the
  * join key join WITHOUT a shuffle exchange (the repeated-id-map-remap /
  * co-located fact-join path at 100 TB).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("bucketed tables join with no shuffle exchange") {
    val orders = Tables.orders(spark, SparkTestBase.sf)
    val lineitem = Tables.lineitem(spark, SparkTestBase.sf)
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_orders_b")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_lineitem_b")
    try {
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), Seq("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
      val plan = planOf(joined)
      // The join itself must not re-partition bucketed inputs.
      val joinSection = plan.split("HashAggregate").head
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // Still correct.
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val direct = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}

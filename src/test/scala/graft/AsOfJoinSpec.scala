package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoin, BroadcastAsOfJoinExec}

/** The native broadcast as-of join (logical node + planner strategy +
  * physical operator) against the composed shuffle form and hand-checked
  * boundary cases.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def probes(rows: (Long, Long, Long)*) = // (id, key, t)
    rows.toDF("p_id", "key", "t")
  private def refs(rows: (Long, Long, Long)*) = // (id, key, t)
    rows.toDF("r_id", "key", "t")

  test("floor semantics: greatest ref time <= probe time; unmatched probes null") {
    val p = probes((1L, 10L, 100L), (2L, 10L, 55L), (3L, 10L, 5L), (4L, 99L, 100L))
    val r = refs((7L, 10L, 10L), (8L, 10L, 55L), (9L, 10L, 90L), (5L, 11L, 1L))
    val out = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      .select("p_id", "r_id").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out(1L) == 9L)  // 90 <= 100
    assert(out(2L) == 8L)  // exact tie on time matches (<=)
    assert(out(3L) == -1L) // no ref at-or-before 5
    assert(out(4L) == -1L) // key absent from reference side
  }

  test("physical plan uses BroadcastAsOfJoinExec; probe side has no shuffle") {
    val p = probes((1L, 10L, 100L))
    val r = refs((7L, 10L, 10L))
    val df = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case e: BroadcastAsOfJoinExec => e }.nonEmpty)
    assert(!plan.toString.contains("Exchange"))
  }

  test("parity with the shuffle (union+window) form on the events table") {
    val d = "/root/testdata/sf0.001"
    val shuffle = graft.queries.EventOps.queries("ev_asof_join")(spark, d)
      .collect().map(_.toSeq).toSet
    val native = graft.queries.EventOps.queries("ev_asof_native")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty)
    assert(native == shuffle)
  }

  test("null key / null time probe rows pass through with null carries") {
    val p = Seq((1L, Some(10L), Some(100L)), (2L, None, Some(100L)), (3L, Some(10L), None))
      .toDF("p_id", "key", "t")
    val r = refs((7L, 10L, 10L))
    val out = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      .collect().map(x => x.getLong(0) -> x.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
  }
}

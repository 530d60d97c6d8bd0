package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the integer fixed-point PageRank (q_pagerank) that the
  * value-exact oracle row doesn't state explicitly.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("rank mass is conserved up to integer-truncation loss") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_pagerank")(spark, sf)
    val row = df.agg(count(lit(1)), sum(col("rank_e12"))).head
    val (n, total) = (row.getLong(0), row.getLong(1))
    val ideal = n * graft.queries.GraphOps.PageRankScale
    // Each `div` truncates < 1 unit per edge per round and the damped
    // base re-injects (1-d) exactly; mass can only leak DOWN and only by
    // truncation dust. 1% is orders of magnitude above the real loss and
    // orders below any algorithmic error.
    assert(total <= ideal, s"rank mass grew: $total > $ideal")
    assert(total > ideal - ideal / 100, s"rank mass leaked: $total vs $ideal")
  }

  test("ranks are deterministic across runs (integer arithmetic, no float sums)") {
    val a = SparkEntry.queries("q_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = SparkEntry.queries("q_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}

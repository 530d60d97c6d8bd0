package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run and return rows on sf0.001; value-level
  * correctness is covered by the DuckDB oracle gate (tools/check_oracle.py
  * emulates it locally; the driver runs it per round at sf0.01).
  */
class RelationalQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but should be a deliberate short list
    assert(missing.forall(n => SparkEntry.rowsOnlyQueries.contains(n)),
      s"queries without oracle nor rows-only registration: " +
        s"${missing -- SparkEntry.rowsOnlyQueries}")
  }

  test("oracle keys all have query implementations") {
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, SparkTestBase.sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

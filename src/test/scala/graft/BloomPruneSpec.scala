package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrune

/** The explicit bloom semi-join reduction ([[graft.operators.BloomPrune]]):
  * superset-then-join exactness, real pruning power, and cross-frame filter
  * reuse — the properties q_bloom_prune's oracle row rests on.
  */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("pruned fact is a superset of joining rows and a fraction of the fact") {
    val dim = Tables.customer(spark, sf).where(col("c_acctbal") > 9500)
      .select(col("c_custkey"))
    val fact = Tables.orders(spark, sf)
    val pruned = BloomPrune.filterBy(fact, col("o_custkey"), dim, col("c_custkey"),
      expectedKeys = 1L << 16)
    val factN = fact.count()
    val prunedN = pruned.count()
    val joiningN = fact.join(dim, col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(joiningN <= prunedN, "bloom must never drop a joining row (no false negatives)")
    // ~5% selectivity: anything near factN means the filter did nothing.
    assert(prunedN < factN / 2, s"expected real pruning: $prunedN of $factN")
    // The final join must equal the plain join exactly (false positives
    // removed by the join).
    val viaBloom = pruned.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain)
  }

  test("null keys never survive the bloom+join pipeline") {
    import spark.implicits._
    val dim = Seq(Some(1L), Some(2L), None).toDF("k")
    val fact = Seq(Some(1L), Some(9L), None).toDF("fk")
    val pruned = BloomPrune.filterBy(fact, col("fk"), dim, col("k"), 16L)
    // The dim's NULL hashes into the filter, so the fact NULL may pass the
    // bloom — the contract says the JOIN drops it, and it does.
    val out = pruned.join(dim, col("fk") === col("k")).select("fk")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("a built filter is reusable across frames and stages") {
    import spark.implicits._
    val dim = Seq(10L, 20L, 30L).toDF("k")
    val bloom = BloomPrune.buildFilter(dim, col("k"), 16L)
    val f1 = Seq(10L, 11L).toDF("a").where(BloomPrune.mightContain(bloom, col("a")))
    val f2 = Seq(20L, 21L).toDF("b").where(BloomPrune.mightContain(bloom, col("b")))
    assert(f1.collect().map(_.getLong(0)).toSet.contains(10L))
    assert(f2.collect().map(_.getLong(0)).toSet.contains(20L))
    // False-positive rate at 16 expected keys over 2 probes should admit
    // nothing else here (deterministic hash family, fixed data).
    assert(f1.count() + f2.count() <= 3)
  }
}

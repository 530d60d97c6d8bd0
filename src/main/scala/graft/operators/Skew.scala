package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for joins whose key distribution is heavy-
  * tailed (SCALE.md "salting for skew"). AQE's skew-join split handles
  * sort-merge joins after the fact; salting is the a-priori tool when a
  * known-hot key (a null-substitute, a default FK, a mega-customer) would
  * otherwise pin one task.
  *
  * `saltedJoin` replicates the BUILD side `salts` times and scatters the
  * PROBE side uniformly across the replicas, so the hot key's rows spread
  * over `salts` tasks. Exact same rows as the plain equi-join (proven in
  * SkewSpec); shuffle volume cost is build×salts, so use a broadcastable-
  * small build side or a modest salt count.
  */
object Skew {
  /** Inner equi-join of `probe` and `build` on `key`, salted `salts` ways.
    * Column sets must be disjoint apart from `key`.
    *
    * The salt comes from `monotonically_increasing_id`, not a row hash:
    * hot-key rows are often byte-identical (a keys-only probe frame), and
    * hashing columns would send every copy to ONE salt bucket — paying
    * the build replication for zero spread. The salt is purely a
    * distribution choice (every assignment produces the same join rows),
    * so its task-retry nondeterminism cannot change the result.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol: Column = pmod(monotonically_increasing_id(), lit(salts))
    val salted = probe.withColumn("__salt", saltCol.cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

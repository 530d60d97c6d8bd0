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
  * PROBE side across the replicas, so the hot key's rows spread over
  * `salts` tasks. Exact same rows as the plain equi-join (proven in
  * SkewSpec); shuffle volume cost is build×salts, so use a broadcastable-
  * small build side or a modest salt count.
  */
object Skew {
  /** Inner equi-join of `probe` and `build` on `key`, salted `salts` ways.
    * Column sets must be disjoint apart from `key`.
    *
    * Salt derivation is DETERMINISTIC by default: `xxhash64` over
    * `probeUniqueCols` (or all probe columns when empty). A recomputed
    * probe partition after a fetch failure then reassigns identical salts,
    * so no reducer double-fetches or misses rows — positional salts
    * (`monotonically_increasing_id`, `rand`) silently corrupt exactly that
    * retry path when the probe is shuffle output whose partition contents
    * don't reproduce (SPARK-23207 class).
    *
    * The deterministic salt cannot spread byte-identical probe rows (equal
    * rows hash to one bucket). If the hot key's rows are duplicates AND
    * you still need them spread, pass `spreadIdenticalRows = true` to fall
    * back to a positional salt — callers must then guarantee the probe is
    * a deterministic scan (file read, not shuffle/sample output), which is
    * what makes retry reassignment impossible in that mode.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int,
                 probeUniqueCols: Seq[String] = Nil,
                 spreadIdenticalRows: Boolean = false): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol: Column =
      if (spreadIdenticalRows) pmod(monotonically_increasing_id(), lit(salts))
      else {
        val cols =
          if (probeUniqueCols.nonEmpty) probeUniqueCols.map(col)
          else probe.columns.toSeq.map(col)
        pmod(xxhash64(cols: _*), lit(salts))
      }
    val salted = probe.withColumn("__salt", saltCol.cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

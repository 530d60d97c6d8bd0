package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction via an explicit bloom filter.
  *
  * Spark's own `InjectRuntimeFilter` rule builds the same shape
  * automatically — but only inside a single query plan, only for
  * equi-shuffle-joins, and only past size thresholds tuned for clusters
  * (the fact side must scan >10 GB before the rule even considers it).
  * This operator packages the identical primitive as a first-class,
  * caller-controlled step for the places the rule cannot reach:
  *
  *   - pruning a scan that feeds a custom physical operator (e.g. the
  *     native as-of join, whose probe side the injection rule does not
  *     recognize as a join input);
  *   - pruning BEFORE a materialization boundary (checkpoint, parquet
  *     stage hand-off, `Materialize.once`), where the dim filter lives in
  *     a different query than the fact scan;
  *   - dim key sets too large to broadcast as an exact hash relation but
  *     whose bloom is 10–100× smaller (a 10⁸-key set is ~800 MB of longs;
  *     its 1%-fpp bloom is ~120 MB, and a coarser 5% one ~75 MB).
  *
  * Correctness contract: `might_contain` admits false positives, so the
  * pruned frame is a SUPERSET of the joining fact rows. Callers MUST keep
  * the real join after it — the bloom only cuts shuffle/scan volume; the
  * join supplies exactness. (A false-negative is impossible, so no
  * joining row is ever lost.) Rows whose key is NULL never join under SQL
  * equality, and `might_contain(null-hash)` — XxHash64 folds NULL to the
  * seed — would admit them only if the dim side also had a NULL key;
  * either way the join drops them, preserving value-exactness.
  *
  * Scale posture: the filter is built by one partial-aggregate pass over
  * the dim side (each task ORs its local bloom; merge is associative), a
  * single serialized-bloom row returns to the driver, and the fact side
  * evaluates `might_contain` inside whole-stage codegen against the
  * literal filter. No shuffle is added on either side.
  */
object BloomPrune {

  /** Expected distinct dim keys when the caller does not know: sized so
    * the bloom stays ~1 MB (Spark's default fpp 3% → ~7.3 bits/key). */
  val DefaultExpectedKeys = 1000000L

  /** Serialize the bloom filter of `dim`'s `key` column (one job: a
    * partial agg per task + one merged row on the driver). An EMPTY dim
    * yields an empty filter (might_contain false everywhere), never
    * null — BloomFilterAggregate returns SQL NULL over zero rows, which
    * would NPE any caller persisting the bytes. */
  def buildFilter(dim: DataFrame, key: Column,
      expectedKeys: Long = DefaultExpectedKeys): Array[Byte] = {
    val hashed = XxHash64(Seq(GraftSqlShim.expression(key)), 42L)
    val agg = new BloomFilterAggregate(hashed, expectedKeys)
      .toAggregateExpression()
    val bytes = dim.select(GraftSqlShim.column(agg)).head.getAs[Array[Byte]](0)
    if (bytes != null) bytes
    else {
      // Minimal, not expectedKeys-sized: ~1 MB of zeros to say
      // "contains nothing" would be embedded as a plan literal.
      val empty = org.apache.spark.util.sketch.BloomFilter.create(1)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      out.toByteArray
    }
  }

  /** `fact` restricted to rows whose `factKey` might appear in `dim`'s
    * `dimKey` set. Superset semantics — follow with the real join. */
  def filterBy(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, expectedKeys: Long = DefaultExpectedKeys): DataFrame = {
    val bloom = buildFilter(dim, dimKey, expectedKeys)
    fact.filter(mightContain(bloom, factKey))
  }

  /** The `might_contain` predicate over a previously built filter — for
    * callers that persist the bloom across stages/queries. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlShim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftSqlShim.expression(key)), 42L)))
}

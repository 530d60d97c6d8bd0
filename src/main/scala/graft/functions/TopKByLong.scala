package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native per-group top-k AGGREGATE: keeps the k best (key desc, id asc)
  * pairs of a group in a bounded buffer, with map-side partial
  * aggregation and buffer MERGE — the scale shape for grouped top-k.
  *
  * Versus the window form (`row_number over (partition by g order by
  * ...) <= k`): the window — even with the WindowGroupLimit rewrite —
  * shuffles up to k rows per group per input split and then SORTS each
  * group's survivors; this aggregate shuffles one k-bounded BUFFER per
  * group per split and never sorts anything wider than k. At 10⁹ groups
  * the difference is a shuffle of k·splits·groups rows vs groups
  * serialized buffers. It also demonstrates the one Catalyst extension
  * surface the scalar codegen expressions don't: a
  * TypedImperativeAggregate (executed by ObjectHashAggregate), the
  * preference-order step between built-in composition and a custom
  * physical operator.
  *
  * Buffer layout: Array[Long] of 1 + 2k slots — [n, key₀, id₀, key₁,
  * id₁, …] kept sorted best-first; insertion is O(k) (k is a small
  * constant by contract). Determinism: total order (key desc, id asc),
  * so ties cannot reorder across partitionings.
  *
  * Result: array<struct<key long, id long>> of the ≤k entries, best
  * first. Null keys are skipped (SQL aggregate convention); null ids are
  * allowed through as a key with MinValue id would be — callers pass
  * non-null ids (enforced by the wrapper's cast discipline).
  */
case class TopKByLong(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(k > 0 && k <= 1024, s"top_k_by k must be in [1, 1024], got $k")

  override def prettyName: String = "top_k_by"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + 2 * k)

  /** a=(key,id) beats b when key greater, or equal key and id smaller. */
  private def beats(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
    ka > kb || (ka == kb && ia < ib)

  private def insert(buf: Array[Long], key: Long, id: Long): Unit = {
    val n = buf(0).toInt
    if (n == k && !beats(key, id, buf(1 + 2 * (k - 1)), buf(2 + 2 * (k - 1)))) return
    // Find insertion point among the n sorted entries, shift the tail.
    var pos = n
    while (pos > 0 && beats(key, id, buf(2 * pos - 1), buf(2 * pos))) pos -= 1
    if (pos >= k) return
    val last = math.min(n, k - 1) // entry k-1 falls off when full
    var i = last
    while (i > pos) {
      buf(1 + 2 * i) = buf(2 * i - 1)
      buf(2 + 2 * i) = buf(2 * i)
      i -= 1
    }
    buf(1 + 2 * pos) = key
    buf(2 + 2 * pos) = id
    if (n < k) buf(0) = n + 1
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val kv = left.eval(input)
    if (kv != null) {
      val iv = right.eval(input)
      insert(buf, kv.asInstanceOf[Long],
        if (iv == null) Long.MaxValue else iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    val n = other(0).toInt
    var i = 0
    while (i < n) { insert(buf, other(1 + 2 * i), other(2 + 2 * i)); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = InternalRow(buf(1 + 2 * i), buf(2 + 2 * i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bb = ByteBuffer.allocate(8 * (1 + 2 * n))
    bb.putLong(n.toLong)
    var i = 1
    while (i <= 2 * n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong().toInt
    val buf = createAggregationBuffer()
    buf(0) = n.toLong
    var i = 1
    while (i <= 2 * n) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByLong =
    copy(left = newLeft, right = newRight)
}

object TopKByLong {
  /** Column wrapper: per-group top-k (key desc, id asc) as
    * array<struct<key,id>>, best first. Integral inputs are cast to long
    * here — the aggregate's update() reads raw longs, so an un-cast INT
    * column would ClassCastException inside executor tasks. */
  def top_k_by(key: Column, id: Column, k: Int): Column =
    GraftSqlShim.column(
      TopKByLong(GraftSqlShim.expression(key.cast("long")),
          GraftSqlShim.expression(id.cast("long")), k)
        .toAggregateExpression())
}

package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Deterministic K-Minimum-Values (theta-style) sketch — the SET-OPERATION
  * member of the sketch family (HLL: distinct counts, count-min: frequencies,
  * KLL: quantiles, here: distinct-count UNION and INTERSECTION estimates, the
  * sketch algebra HLL lacks). The sketch of a key set is its K smallest
  * distinct md5-64 hashes in UNSIGNED order; because the hash and the
  * selection are deterministic, the ESTIMATES themselves are exact integers
  * both engines reproduce — the oracle compares values, not error-bound
  * booleans (stronger than the q_hll/q_kll property gates, possible only
  * because KMV, unlike HLL registers or KLL compaction, has no randomized
  * or implementation-defined state).
  *
  * Estimator convention (all integer arithmetic, both engines):
  * a SATURATED sketch (|S| = K) has theta = the K-th smallest hash (as an
  * unsigned value in [0, 2^64)) and K−1 "live" entries strictly below it;
  * an unsaturated sketch has theta = 2^64 and all entries live. Then
  * est_milli = live · 1000 · 2^64 ⌊/⌋ theta — exactly live·1000 for
  * unsaturated sketches (the small-set regime is EXACT). Intersection of
  * two sketches: theta = min(theta_a, theta_b), common = live entries
  * below theta present in BOTH, est = common · 1000 · 2^64 ⌊/⌋ theta.
  * Union: the K smallest of the combined live entries below theta, then
  * the per-sketch estimator. The ⌊/⌋ runs in BigInteger (the numerator
  * needs ~2^84) — these run on nlist-sized merged frames, bounded
  * metadata, never per corpus row.
  *
  * The 100 TB story is the standard sketch story plus ALGEBRA: sketch each
  * shard/partition once (K longs each, mergeable via the aggregate's
  * partial/final path), persist them, and answer "how many distinct users
  * in A ∪ B / A ∩ B" for ANY pair of segments later from the persisted
  * sketches — an exact distinct-intersection is a full co-shuffle of both
  * segments per question asked.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65536, s"kmv_sketch_agg k must be in [8, 65536], got $k")

  override def prettyName: String = "kmv_sketch_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    KmvSketch.newBuffer()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvSketch.insert(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.insert(buf, it.next(), k)
    buf
  }

  /** Sorted (unsigned ascending) retained hashes. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = KmvSketch.newBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Cell-wise merge of retained-hash KMV sketch arrays — the persist-then-
  * merge aggregate (the kll_merge_agg contract for set sketches): shard
  * sketches land as K-long arrays, and any union of shards answers later
  * by merging the arrays. KMV merge is DETERMINISTIC AND LOSSLESS w.r.t.
  * the direct build: the K smallest of a union of K-smallest subsets is
  * the K smallest of the union, so merged == direct bit-for-bit
  * (spec-pinned) — not merely error-preserving like HLL/KLL merges. */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65536, s"kmv_merge_agg k must be in [8, 65536], got $k")

  override def prettyName: String = "kmv_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    KmvSketch.newBuffer()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      var i = 0
      while (i < arr.length) { KmvSketch.insert(buf, arr(i), k); i += 1 }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.insert(buf, it.next(), k)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = KmvSketch.newBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** Distinct-count estimate (milli-scaled BIGINT) of one KMV sketch. */
case class KmvEstMilli(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "kmv_est_milli"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def nullSafeEval(arr: Any): Any =
    KmvSketch.estMilli(
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KmvSketch.estMilli($c.toLongArray(), $k);")

  override protected def withNewChildInternal(newChild: Expression): KmvEstMilli =
    copy(child = newChild)
}

/** Distinct-count estimate (milli) of the INTERSECTION of two KMV sketches. */
case class KmvInterMilli(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with BinaryLike[Expression] {
  override def prettyName: String = "kmv_inter_milli"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.interMilli(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(),
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.KmvSketch.interMilli($a.toLongArray(), $b.toLongArray(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvInterMilli =
    copy(left = newLeft, right = newRight)
}

/** Distinct-count estimate (milli) of the UNION of two KMV sketches. */
case class KmvUnionMilli(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with BinaryLike[Expression] {
  override def prettyName: String = "kmv_union_milli"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    KmvSketch.unionMilli(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(),
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.KmvSketch.unionMilli($a.toLongArray(), $b.toLongArray(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnionMilli =
    copy(left = newLeft, right = newRight)
}

object KmvSketch {
  /** Default K: unsaturated (EXACT) below 256 distinct keys, ~1/√(K−2) ≈ 6%
    * relative error above — the estimates stay deterministic either way. */
  val DefaultK = 256

  private val Two64 = BigInteger.ONE.shiftLeft(64)
  private val Thousand = BigInteger.valueOf(1000)

  def newBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })

  /** Bounded distinct insert: keep the K unsigned-smallest. */
  def insert(buf: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
      if (buf.add(h)) buf.remove(buf.last())
    }
  }

  private def unsigned(h: Long): BigInteger = {
    val b = BigInteger.valueOf(h)
    if (h < 0) b.add(Two64) else b
  }

  /** theta of a sorted retained array: the K-th smallest if saturated,
    * else 2^64. */
  private def thetaOf(arr: Array[Long], k: Int): BigInteger =
    if (arr.length >= k) unsigned(arr(k - 1)) else Two64

  /** live · 1000 · 2^64 ⌊/⌋ theta — exact integers end to end. */
  private def ratioMilli(live: Long, theta: BigInteger): Long =
    BigInteger.valueOf(live).multiply(Thousand).multiply(Two64)
      .divide(theta).longValueExact()

  def estMilli(arr: Array[Long], k: Int): Long = {
    val theta = thetaOf(arr, k)
    val live = if (arr.length >= k) (k - 1).toLong else arr.length.toLong
    ratioMilli(live, theta)
  }

  /** Entries of a sorted retained array strictly below theta. */
  private def liveBelow(arr: Array[Long], theta: BigInteger): Array[Long] =
    arr.filter(h => unsigned(h).compareTo(theta) < 0)

  def interMilli(a: Array[Long], b: Array[Long], k: Int): Long = {
    val theta = thetaOf(a, k).min(thetaOf(b, k))
    val la = liveBelow(a, theta).toSet
    val common = liveBelow(b, theta).count(la.contains)
    ratioMilli(common.toLong, theta)
  }

  def unionMilli(a: Array[Long], b: Array[Long], k: Int): Long = {
    val theta = thetaOf(a, k).min(thetaOf(b, k))
    val m = (liveBelow(a, theta) ++ liveBelow(b, theta)).distinct
      .sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0)
    if (m.length >= k) ratioMilli((k - 1).toLong, unsigned(m(k - 1)))
    else ratioMilli(m.length.toLong, theta)
  }

  def kmv_sketch_agg(h: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      KmvSketchAgg(GraftSqlShim.expression(h), k).toAggregateExpression())

  def kmv_merge_agg(sk: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      KmvMergeAgg(GraftSqlShim.expression(sk), k).toAggregateExpression())

  def kmv_est_milli(sk: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(KmvEstMilli(GraftSqlShim.expression(sk), k))

  def kmv_inter_milli(a: Column, b: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      KmvInterMilli(GraftSqlShim.expression(a), GraftSqlShim.expression(b), k))

  def kmv_union_milli(a: Column, b: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      KmvUnionMilli(GraftSqlShim.expression(a), GraftSqlShim.expression(b), k))
}

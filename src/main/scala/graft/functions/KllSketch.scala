package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches — the quantile member of the sketch
  * family next to HLL (q_hll_distinct) and count-min (ev_cms_probe),
  * backed by the same Apache DataSketches library Spark already ships
  * for `hll_sketch_agg`/`count_min_sketch`. The 100 TB story is the
  * standard sketch story: sketch each shard ONCE (a few KB each),
  * persist the sketches, and answer p50/p95/p99 over any union of
  * shards later by MERGING sketches — never a second scan, where the
  * exact answer (`percentile`) costs a full shuffle-and-sort of the
  * column per question asked.
  *
  * Executed by ObjectHashAggregate: the buffer is the live heap sketch,
  * serialized only across partial/final boundaries. KLL compaction is
  * randomized, so estimates are APPROXIMATE AND RUN-VARYING — callers
  * gate on the published normalized rank-error bound (k=200 → ε≈1.33%
  * at 99% confidence), never on exact estimate values; `q_kll_quantiles`
  * asserts the inclusive rank of every probe against a slacked bound.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_sketch_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Cell-wise merge of serialized KLL sketches — the "answer any union of
  * shards from their persisted sketches" aggregate. Null inputs (e.g. an
  * empty shard's missing row) are skipped.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_merge_agg k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Probe a serialized KLL sketch for a fixed rank list (INCLUSIVE
  * criteria: quantile q has rank = fraction of items ≤ q, the same
  * definition the query's exact-rank gate recomputes). Runs on
  * nlist-sized merged frames — bounded metadata, not data — but still
  * implements doGenCode (static-helper call) like every graft
  * expression. An empty sketch yields null.
  */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
  extends UnaryExpression {

  require(ranks.nonEmpty && ranks.forall(r => r > 0.0 && r < 1.0),
    s"ranks must lie in (0, 1): $ranks")

  override def prettyName: String = "kll_quantiles"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(bytes: Any): Any =
    KllQuantiles.probe(bytes.asInstanceOf[Array[Byte]], ranks.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks.toArray, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.KllQuantiles.probe($c, $ranksRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

object KllQuantiles {
  /** Static probe shared by eval and generated code. */
  def probe(bytes: Array[Byte], ranks: Array[Double]): GenericArrayData = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else new GenericArrayData(
      sk.getQuantiles(ranks, QuantileSearchCriteria.INCLUSIVE))
  }
}

object KllSketch {
  /** Default sketch parameter: ~1.33% normalized rank error at 99%
    * confidence, a few KB serialized. */
  val DefaultK = 200

  def kll_sketch_agg(v: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      KllSketchAgg(GraftSqlShim.expression(v.cast("double")), k)
        .toAggregateExpression())

  def kll_merge_agg(sk: Column, k: Int = DefaultK): Column =
    GraftSqlShim.column(
      KllMergeAgg(GraftSqlShim.expression(sk), k).toAggregateExpression())

  def kll_quantiles(sk: Column, ranks: Seq[Double]): Column =
    GraftSqlShim.column(KllQuantiles(GraftSqlShim.expression(sk), ranks))
}

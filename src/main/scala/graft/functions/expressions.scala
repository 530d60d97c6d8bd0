package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.SalesforceId

/** Static helpers invoked from generated code (must be object-level so the
  * Java codegen can call them via static forwarders).
  */
object ExprUtil {
  def canonicalId(s: UTF8String): UTF8String = {
    if (s == null) return null
    val r = SalesforceId.canonicalOrNull(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Merge-count of common elements between two LEXICOGRAPHICALLY SORTED
    * string arrays — O(n+m), zero allocation, vs array_intersect's
    * per-row hash-set build. Caller must guarantee sorted, distinct input
    * (array_sort(array_distinct(...))).
    */
  def sortedIntersectSize(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Ordered left-fold dot product over two double arrays: acc += a[i]*b[i]
    * for i = 0..n-1 — bit-identical to functions.aggregate(zip_with(a,b,_*_))
    * and to DuckDB's list_reduce over the same element order, but a tight
    * primitive loop instead of per-element interpreted lambda evaluation
    * (HigherOrderFunctions do not participate in codegen, so on a pair-join
    * hot path the HOF form dominates the query cost).
    * Null semantics MATCH the HOF form: a null element on either side, or
    * unequal lengths (zip_with pads with null), yields NULL — not a
    * silently-zeroed term.
    */
  def dotFold(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** 64-bit polynomial rolling hash (base 1000003, seeded) over UTF-8 bytes.
    * Deterministic document fingerprint primitive; stable across JVMs.
    */
  def rollingHash(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + bytes(i)
      i += 1
    }
    h
  }
}

/** Canonicalize a Salesforce id column to its 18-char form; invalid → null.
  * Native expression (with codegen) rather than a Scala UDF so it stays
  * inside whole-stage codegen on the hot path.
  */
case class CanonicalId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "canonical_id"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.canonicalId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExprUtil.canonicalId($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): CanonicalId =
    copy(child = newChild)
}

/** 64-bit rolling hash of a string column (document fingerprinting). */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any =
    ExprUtil.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprUtil.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

/** Wrapping multiply-add mod 2^64: `a * x + c` with Java two's-complement
  * wraparound (the multiply-shift universal hash family used to derive
  * MinHash permutations from one base hash). A dedicated expression
  * because Column arithmetic runs under ANSI mode and throws on the
  * overflow this hash RELIES on; kept codegen'd so the 32-permutation
  * fan-out stays inside whole-stage codegen. The same arithmetic is
  * reproducible in DuckDB as HUGEINT mod-2^64 folds, which is what makes
  * the MinHash/SimHash operators oracle-checkable at all.
  */
case class MulAdd64(child: Expression, a: Long, c: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mul_add64"

  override def nullSafeEval(input: Any): Any =
    a * input.asInstanceOf[Long] + c

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"(${a}L * $x + ${c}L)")

  override protected def withNewChildInternal(newChild: Expression): MulAdd64 =
    copy(child = newChild)
}

/** Size of the intersection of two sorted, distinct string arrays
  * (set-similarity verification hot path — merge scan instead of
  * array_intersect's hash-set build per row).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprUtil.sortedIntersectSize(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExprUtil.sortedIntersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Ordered-fold dot product of two array<double> columns (codegen'd; see
  * [[ExprUtil.dotFold]] for the FP-order contract).
  */
case class DotFold(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_fold"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = ExprUtil.dotFold(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ExprUtil.dotFold($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for graft's custom functions. */
object GraftFunctions {
  import org.apache.spark.sql.functions._

  def canonical_id(c: Column): Column =
    GraftSqlShim.column(CanonicalId(GraftSqlShim.expression(c)))

  def rolling_hash64(c: Column): Column =
    GraftSqlShim.column(RollingHash64(GraftSqlShim.expression(c)))

  /** Wrapping `a * x + c` mod 2^64 over a long column (ANSI-safe). */
  def mul_add64(x: Column, a: Long, c: Long): Column =
    GraftSqlShim.column(MulAdd64(GraftSqlShim.expression(x), a, c))

  /** First 64 bits of md5(c) as a signed long — the avalanche-quality
    * string hash used by the MinHash/SimHash family. Built purely from
    * codegen'd built-ins: two 32-bit hex chunks (conv stays under 2^32,
    * so the ANSI cast cannot overflow) recombined with shift/or (bitwise,
    * wrap-safe). Reproducible in DuckDB as a hex-digit fold over md5(·).
    */
  def md5_64(c: Column): Column = {
    val h = md5(c)
    shiftleft(conv(substring(h, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(h, 9, 8), 16, 10).cast("long"))
  }

  /** Requires both arrays sorted + distinct. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftSqlShim.column(SortedIntersectSize(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Ordered-fold dot product of two array<double> columns — same FP
    * result as aggregate(zip_with(a, b, _*_), 0.0, _+_), but codegen'd.
    * Requires equal lengths and no null elements.
    */
  def dot_fold(a: Column, b: Column): Column =
    GraftSqlShim.column(DotFold(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** 3-char key prefix used for polymorphic-lookup dispatch (SURVEY J5/T8). */
  def key_prefix(c: Column): Column = substring(c, 1, 3)

  /** Boolean-synonym coercion (reference primitivize, amaxa/amaxa.py:349-375):
    * null / {no,n,false,f,0,""} → false; {yes,y,true,t,1} → true;
    * anything else is a row error and yields null here (pair with
    * [[primitivizeBoolError]] for the error channel).
    */
  def primitivizeBool(c: Column): Column = {
    val l = lower(c)
    when(c.isNull || l.isin("no", "n", "false", "f", "0", ""), lit(false))
      .when(l.isin("yes", "y", "true", "t", "1"), lit(true))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Error message column for values primitivizeBool rejects (else null). */
  def primitivizeBoolError(c: Column): Column = {
    val l = lower(c)
    when(
      c.isNotNull &&
        !l.isin("no", "n", "false", "f", "0", "", "yes", "y", "true", "t", "1"),
      concat(lit("Invalid Boolean value "), c))
      .otherwise(lit(null).cast("string"))
  }

  /** Cosine similarity between two array<double> columns, computed with
    * codegen'd higher-order functions (no UDF): dot / (|a|*|b|).
    * Deterministic left-to-right accumulation (functions.aggregate folds
    * in element order), so results are bit-stable across runs/engines that
    * fold in the same order.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    // Zero-norm guard: ANSI mode makes 0/0 a DIVIDE_BY_ZERO error, not
    // NaN — an all-zero vector must yield null (excluded by thresholds),
    // not abort the query.
    val den = na * nb
    when(den === 0.0d, lit(null).cast("double")).otherwise(dot / den)
  }
}

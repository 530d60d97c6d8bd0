package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** AS-OF JOIN as a first-class operator: logical node + planner strategy +
  * TWO physical implementations, registered through
  * `SparkSessionExtensions` (or appended to
  * `spark.experimental.extraStrategies` on a live session). The strategy
  * chooses the physical shape the way Spark chooses between broadcast-hash
  * and sort-merge for equi-joins — by the reference side's estimated size
  * against `spark.sql.autoBroadcastJoinThreshold`:
  *
  *   - [[BroadcastAsOfJoinExec]]: collect the reference side to a
  *     key → time-sorted-rows index, broadcast it, and binary-search per
  *     probe row — zero shuffles, one pass over the probe side. Right when
  *     the reference side fits the same budget a broadcast hash join would
  *     (the quotes/dimension side of the classic as-of workload). The probe
  *     side streams through unmodified, so at 100 TB the scan parallelism
  *     is preserved and there is no skew surface (no per-key partitions).
  *   - [[ShuffleAsOfJoinExec]]: hash-cluster both sides on the key, sort by
  *     (key, time), merge each partition pair in one forward pass — right
  *     when both sides are large; the scale class of a sort-merge join.
  *
  * (`EventOps.asof`, query `ev_asof_join`, additionally keeps the composed
  * union+window form — the same semantics written with built-in operators
  * only, no extensions required.)
  *
  * Semantics: left outer; for each probe row the match among reference
  * rows of the same key is chosen by `direction` (pandas merge_asof's
  * axis):
  *
  *   - 0 = backward (default): greatest reference time ≤ probe time;
  *   - 1 = forward: smallest reference time ≥ probe time;
  *   - 2 = nearest: whichever of the two candidates has the smaller
  *     |Δtime|, preferring the backward candidate on an exact tie;
  *
  * optionally bounded by `tolerance` ≥ 0, with -1 the only unbounded
  * sentinel (same units as the time column — microseconds for
  * timestamps): a candidate farther than the bound is
  * discarded, the probe row keeps nulls. Ties on the reference time are
  * resolved by the carried projection's byte order (backward keeps the
  * greatest, forward the smallest — both index-sort endpoints), making
  * every pick deterministic for any input order. Unmatched probes carry
  * nulls.
  *
  * Reference for the workload shape: amaxa's extraction joins each record
  * batch against previously-extracted parent state
  * (/root/reference/amaxa/amaxa.py:300-330) — a point-in-time lookup this
  * operator generalizes to event time.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    // Caller's physical-shape pin ("broadcast" | "shuffle"), like a join
    // hint: it travels WITH the node, so unlike a session conf it survives
    // AQE re-optimization replanning the subtree mid-query.
    hint: Option[String] = None,
    direction: Int = 0, // 0=backward, 1=forward, 2=nearest
    tolerance: Long = -1L) // max |Δtime| in time-column units; -1 = unbounded
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carried.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] the way Spark plans equi-joins: broadcast when
  * the reference side's estimated size fits the broadcast budget, the
  * co-partitioned merge otherwise. Precedence mirrors join hints: the
  * plan-node hint wins, then `spark.graft.asof.strategy`
  * (`auto`|`broadcast`|`shuffle`, default auto), then the stats decision.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      val conf = SQLConf.get
      val threshold = conf.autoBroadcastJoinThreshold
      val mode = p.hint.getOrElse(
        conf.getConfString("spark.graft.asof.strategy", "auto"))
      val useBroadcast = mode match {
        case "broadcast" => true
        case "shuffle" => false
        case _ => threshold > 0 && p.right.stats.sizeInBytes <= threshold
      }
      if (useBroadcast)
        BroadcastAsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKey, p.rightKey, p.leftTime, p.rightTime, p.carried,
          p.direction, p.tolerance) :: Nil
      else
        ShuffleAsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKey, p.rightKey, p.leftTime, p.rightTime, p.carried,
          p.direction, p.tolerance) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast as-of join. The reference (right) side is collected
  * and indexed on the driver — the same budget class as a broadcast hash
  * join's build side — then each probe partition binary-searches the
  * per-key time-sorted arrays. No shuffle, no sort on the probe side.
  *
  * Participates in whole-stage codegen on the probe side (the pattern of
  * Spark's own BroadcastHashJoinExec: produce from the streamed child,
  * consume emits the index lookup inline), so scans and filters around
  * the join stay in one generated function instead of breaking the span
  * at a mapPartitions boundary. The interpreted doExecute remains as the
  * non-codegen fallback.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    direction: Int = 0,
    tolerance: Long = -1L) // -1 = unbounded (public API admits no other negative)
  extends BinaryExecNode with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ carried.map(_.withNullability(true))

  // java.util.HashMap rather than a Scala Map: the generated Java consume
  // path does a plain .get (boxed-key equals/hashCode matches the
  // interpreted eval's boxing), with no Option allocation per probe row.
  private def buildIndex(): java.util.HashMap[Any, (Array[Long], Array[InternalRow])] = {
    val keyEval = BindReferences.bindReference(rightKey, right.output)
    val timeEval = BindReferences.bindReference(rightTime, right.output)
    val carryProj = UnsafeProjection.create(carried, right.output)
    val grouped = right.executeCollect().iterator.flatMap { row =>
      val k = keyEval.eval(row)
      val t = timeEval.eval(row)
      if (k == null || t == null) Iterator.empty
      else Iterator.single((k, (t.asInstanceOf[Number].longValue(),
        carryProj(row).copy().asInstanceOf[UnsafeRow])))
    }.toSeq.groupBy(_._1)
    val out = new java.util.HashMap[Any, (Array[Long], Array[InternalRow])](
      grouped.size * 2)
    grouped.foreach { case (k, rows) =>
      // Sort by time; equal times fall back to the projected row's full
      // byte content (not its hash — a collision would leave the winner to
      // collection order) so the pick is deterministic for any input order.
      // Bytes are extracted ONCE per row before the sort: getBytes inside
      // the comparator would re-copy the row O(n log n) times.
      val sorted = rows.map { case (_, (t, r)) => (t, r.getBytes, r) }
        .sortWith { case ((t1, b1, _), (t2, b2, _)) =>
          t1 < t2 || (t1 == t2 && java.util.Arrays.compare(b1, b2) < 0)
        }
      out.put(k, (sorted.map(_._1).toArray, sorted.map(_._3: InternalRow).toArray))
    }
    out
  }

  // Shared by the interpreted and codegen paths: the index is built and
  // broadcast once per plan instance regardless of which path executes.
  // NOTE: like BroadcastHashJoinExec's prepareBroadcast, the codegen path
  // resolves this during CODE GENERATION — so explain("codegen") on an
  // unexecuted as-of plan runs the reference-side collect, exactly as it
  // kicks off the broadcast build for Spark's own broadcast joins.
  @transient private lazy val indexBroadcast
      : Broadcast[java.util.HashMap[Any, (Array[Long], Array[InternalRow])]] =
    sparkContext.broadcast(buildIndex())

  override protected def doExecute(): RDD[InternalRow] = {
    val index = indexBroadcast
    val leftOut = left.output
    val carriedLocal = carried
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val dir = direction
    val tol = tolerance
    left.execute().mapPartitions { iter =>
      val keyEval = BindReferences.bindReference(lKeyExpr, leftOut)
      val timeEval = BindReferences.bindReference(lTimeExpr, leftOut)
      // Both the exprs and the bind schema must carry nullable=true for the
      // carried columns: BindReferences takes nullability from the input
      // schema, and a non-nullable bound reference would read the null-fill
      // row as 0 instead of null.
      val carriedNullable = carriedLocal.map(_.withNullability(true))
      val proj = UnsafeProjection.create(
        leftOut ++ carriedNullable, leftOut ++ carriedNullable)
      val nullRight = new GenericInternalRow(carriedLocal.length)
      val joined = new JoinedRow
      iter.map { lrow =>
        val k = keyEval.eval(lrow)
        val t = timeEval.eval(lrow)
        var m: InternalRow = nullRight
        if (k != null && t != null) {
          val entry = index.value.get(k)
          if (entry != null) {
            val i = BroadcastAsOfJoinExec.matchIndex(
              entry._1, t.asInstanceOf[Number].longValue(), dir, tol)
            if (i >= 0) m = entry._2(i)
          }
        }
        proj(joined(lrow, m))
      }
    }
  }

  // ---- whole-stage codegen (probe side streams through) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].inputRDDs()

  // Exactly one output row per streamed input row, so copy-on-emit is
  // whatever the streamed side needs (the default for binary nodes throws).
  override def needCopyResult: Boolean =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].needCopyResult

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].produce(ctx, this)

  override def doConsume(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      input: Seq[org.apache.spark.sql.catalyst.expressions.codegen.ExprCode],
      row: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String = {
    import org.apache.spark.sql.catalyst.expressions.codegen.{
      CodeGenerator, EmptyBlock, ExprCode, JavaCode}
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // The Broadcast object rides the reference array; each task resolves
    // .value() once into a mutable-state field (BroadcastHashJoinExec's
    // prepareBroadcast shape).
    val bcTerm = ctx.addReferenceObj("asofBroadcast", indexBroadcast)
    val idxTerm = ctx.addMutableState("java.util.HashMap", "asofIndex",
      v => s"$v = (java.util.HashMap) $bcTerm.value();", forceInline = true)
    ctx.currentVars = input
    val keyEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val timeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val matched = ctx.freshName("asofMatched")
    val entry = ctx.freshName("asofEntry")
    val lookup =
      s"""
         |${keyEv.code}
         |${timeEv.code}
         |InternalRow $matched = null;
         |if (!${keyEv.isNull} && !${timeEv.isNull}) {
         |  scala.Tuple2 $entry = (scala.Tuple2) $idxTerm.get(${keyEv.value});
         |  if ($entry != null) {
         |    long[] ${entry}_t = (long[]) $entry._1();
         |    int ${entry}_i = graft.plans.BroadcastAsOfJoinExec.matchIndex(
         |      ${entry}_t, (long) ${timeEv.value}, $direction, ${tolerance}L);
         |    if (${entry}_i >= 0) {
         |      $matched = ((InternalRow[]) $entry._2())[${entry}_i];
         |    }
         |  }
         |}
       """.stripMargin
    val carriedVars = carried.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val evalCode =
        code"""
          |boolean $isNull = true;
          |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
          |if ($matched != null && !$matched.isNullAt($i)) {
          |  $isNull = false;
          |  $value = ${CodeGenerator.getValue(matched, a.dataType, i.toString)};
          |}
        """.stripMargin
      ExprCode(evalCode, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    // Emit the carried evaluations HERE (they must follow the lookup);
    // hand consume() code-free copies so it does not re-emit them.
    s"""
       |$lookup
       |${carriedVars.map(_.code.toString).mkString("\n")}
       |${consume(ctx, input ++ carriedVars.map(_.copy(code = EmptyBlock)))}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  /** Greatest index with times(i) <= t, or -1. Public static so the
    * generated consume code can call it directly. */
  def floorSearch(times: Array[Long], t: Long): Int = {
    var lo = 0; var hi = times.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  /** Smallest index with times(i) >= t, or -1. */
  def ceilSearch(times: Array[Long], t: Long): Int = {
    var lo = 0; var hi = times.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) >= t) { ans = mid; hi = mid - 1 } else lo = mid + 1
    }
    ans
  }

  /** Non-negative a−b for a ≥ b, saturating at Long.MaxValue: a true
    * difference past 2^63−1 (possible only for raw-long time columns
    * spanning nearly the full long range — never for timestamps) wraps
    * negative in two's complement, which would falsely pass a tolerance
    * check; saturate instead so it compares as "very far". */
  def delta(a: Long, b: Long): Long = {
    val d = a - b
    if (d < 0) Long.MaxValue else d
  }

  /** The direction's pick in a (time, bytes)-sorted per-key index, or -1.
    * dir 0=backward (floor, LAST of an equal-time run = max bytes),
    * 1=forward (ceil, FIRST of a run = min bytes), 2=nearest (smaller
    * |Δ|, exact tie → backward). tol ≥ 0 bounds the accepted |Δ|.
    * Public static: the generated consume code calls it with the plan's
    * direction/tolerance baked in as literals. */
  def matchIndex(times: Array[Long], t: Long, dir: Int, tol: Long): Int = {
    if (dir == 0) {
      val f = floorSearch(times, t)
      if (f >= 0 && (tol < 0 || delta(t, times(f)) <= tol)) f else -1
    } else if (dir == 1) {
      val c = ceilSearch(times, t)
      if (c >= 0 && (tol < 0 || delta(times(c), t) <= tol)) c else -1
    } else {
      val f = floorSearch(times, t)
      val c = ceilSearch(times, t)
      val fOk = f >= 0 && (tol < 0 || delta(t, times(f)) <= tol)
      val cOk = c >= 0 && (tol < 0 || delta(times(c), t) <= tol)
      if (fOk && (!cOk || delta(t, times(f)) <= delta(times(c), t))) f
      else if (cOk) c
      else -1
    }
  }
}

/** Physical co-partitioned merge as-of join — the BOTH-SIDES-LARGE shape.
  * Each side is hash-clustered on its key and sorted by (key, time);
  * EnsureRequirements inserts the exchanges and sorts, so AQE sizes the
  * shuffle like any sort-merge join. Each partition pair then merges in a
  * single forward pass with O(1) state: because probe times ascend within
  * a key, the latest reference row at-or-before the probe time is
  * maintained by a moving cursor — no per-key buffering, no index, no
  * driver-side collect. AQE's partition coalescing applies to the
  * inserted exchanges; its skew-SPLITTING rule does not (it matches only
  * the built-in join execs), so a heavily skewed key takes the same
  * mitigation any sort-merge join needs — salting upstream, or routing
  * the hot keys through the broadcast form.
  *
  * Tie-break parity with the broadcast form: among reference rows with
  * equal (key, time), backward keeps the greatest carried-projection
  * bytes and forward the smallest — exactly the two endpoints
  * [[BroadcastAsOfJoinExec]]'s (time, bytes)-sorted index returns; a
  * nearest-direction exact-distance tie prefers the backward candidate.
  *
  * The merge state is RUN-based (a run = the consecutive reference rows
  * sharing one (key, time)): the cursor holds at most two runs' picks —
  * the floor run (greatest time strictly below the pending run) and the
  * pending run (first at-or-after the last probe time, the forward
  * candidate) — each reduced to its min-bytes and max-bytes rows as it is
  * consumed, so state stays O(1) regardless of run length and all three
  * directions read off the same cursor.
  */
case class ShuffleAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    carried: Seq[Attribute],
    direction: Int = 0,
    tolerance: Long = -1L) // -1 = unbounded (public API admits no other negative)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carried.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val carriedLocal = carried
    val lKeyExpr = leftKey; val lTimeExpr = leftTime
    val rKeyExpr = rightKey; val rTimeExpr = rightTime
    val dir = direction; val tol = tolerance
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    left.execute().zipPartitions(right.execute()) { (liter, riter) =>
      val lKeyEval = BindReferences.bindReference(lKeyExpr, leftOut)
      val lTimeEval = BindReferences.bindReference(lTimeExpr, leftOut)
      val rKeyEval = BindReferences.bindReference(rKeyExpr, rightOut)
      val rTimeEval = BindReferences.bindReference(rTimeExpr, rightOut)
      val carryProj = UnsafeProjection.create(carriedLocal, rightOut)
      val carriedNullable = carriedLocal.map(_.withNullability(true))
      val proj = UnsafeProjection.create(
        leftOut ++ carriedNullable, leftOut ++ carriedNullable)
      val nullRight = new GenericInternalRow(carriedLocal.length)
      val joined = new JoinedRow
      val rIter = riter.buffered
      // Hoisted once per partition: inside the probe loop the eta-
      // expansion would allocate a closure per row.
      val d = BroadcastAsOfJoinExec.delta _
      // Run-based cursor state for `curKey` (see class doc). Values
      // evaluated off the iterator's reused row buffer are copied before
      // they outlive a next() (InternalRow.copyValue / row.copy()).
      var curKey: Any = null
      var prevProbeT = Long.MinValue
      var floorTime = Long.MinValue
      var floorRow: UnsafeRow = null // floor run's max-bytes pick
      var pendValid = false
      var pendTime = Long.MinValue
      var pendMinRow: UnsafeRow = null // pending run's min-bytes pick (forward)
      var pendMaxRow: UnsafeRow = null // pending run's max-bytes pick (→ floor)
      // Load the next same-key run into the pending state; false when the
      // next reference row belongs to a later key or the side is drained.
      // Rows for earlier keys are discarded — both streams ascend by key,
      // so they can never match again.
      def fetchRun(k: Any): Boolean = {
        var found = false
        var scanning = true
        while (scanning && rIter.hasNext) {
          val head = rIter.head
          val hk = rKeyEval.eval(head)
          val ht = rTimeEval.eval(head)
          if (hk == null || ht == null) { rIter.next(); () } // never matchable
          else {
            val c = keyOrd.compare(hk, k)
            if (c < 0) { rIter.next(); () }
            else if (c > 0) scanning = false
            else { found = true; scanning = false }
          }
        }
        if (!found) return false
        val t0 = rTimeEval.eval(rIter.head).asInstanceOf[Number].longValue()
        var minRow: UnsafeRow = null; var minB: Array[Byte] = null
        var maxRow: UnsafeRow = null; var maxB: Array[Byte] = null
        var more = true
        while (more && rIter.hasNext) {
          val head = rIter.head
          val hk = rKeyEval.eval(head)
          val ht = rTimeEval.eval(head)
          val same = hk != null && ht != null && keyOrd.compare(hk, k) == 0 &&
            ht.asInstanceOf[Number].longValue() == t0
          if (same) {
            val pr = carryProj(head).copy() // exact-size buffer; getBytes is zero-copy
            val b = pr.getBytes
            if (minRow == null || java.util.Arrays.compare(b, minB) < 0) {
              minRow = pr; minB = b
            }
            if (maxRow == null || java.util.Arrays.compare(b, maxB) > 0) {
              maxRow = pr; maxB = b
            }
            rIter.next(); ()
          } else more = false
        }
        pendValid = true; pendTime = t0; pendMinRow = minRow; pendMaxRow = maxRow
        true
      }
      liter.map { lrow =>
        val k = lKeyEval.eval(lrow)
        val tv = lTimeEval.eval(lrow)
        var m: InternalRow = nullRight
        if (k != null && tv != null) {
          val t = tv.asInstanceOf[Number].longValue()
          if (curKey == null || keyOrd.compare(curKey, k) != 0) {
            curKey = InternalRow.copyValue(k)
            prevProbeT = Long.MinValue
            floorTime = Long.MinValue; floorRow = null
            pendValid = false; pendMinRow = null; pendMaxRow = null
          }
          // Contract check: the cursor state is valid only if probe times
          // ascend within a key — EnsureRequirements' (key, time) ordering
          // violated means any answer would be silently wrong. Fail loudly.
          if (t < prevProbeT) throw new IllegalStateException(
            s"as-of merge: probe stream not time-ascending within key " +
              s"(previous probe time $prevProbeT > probe time $t)")
          prevProbeT = t
          // Advance: every run strictly below t converts to the floor (its
          // max-bytes pick); afterwards the pending run, if any, is the
          // first at-or-after t.
          var advancing = true
          while (advancing) {
            if (!pendValid && !fetchRun(k)) advancing = false
            else if (pendTime < t) {
              floorTime = pendTime; floorRow = pendMaxRow; pendValid = false
            } else advancing = false
          }
          // Backward candidate: an exact-time pending run wins over the
          // floor (greatest time <= t includes == t, max-bytes pick).
          var bTime = Long.MinValue
          var bRow: UnsafeRow = null
          if (pendValid && pendTime == t) { bTime = t; bRow = pendMaxRow }
          else if (floorRow != null) { bTime = floorTime; bRow = floorRow }
          if (dir == 0) {
            if (bRow != null && (tol < 0 || d(t, bTime) <= tol)) m = bRow
          } else if (dir == 1) {
            if (pendValid && (tol < 0 || d(pendTime, t) <= tol)) m = pendMinRow
          } else {
            val bOk = bRow != null && (tol < 0 || d(t, bTime) <= tol)
            val fOk = pendValid && (tol < 0 || d(pendTime, t) <= tol)
            if (bOk && (!fOk || d(t, bTime) <= d(pendTime, t))) m = bRow
            else if (fOk) m = pendMinRow
          }
        }
        proj(joined(lrow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ShuffleAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Idempotently register the planner strategy on a live session (the
    * fresh-session path is `spark.sql.extensions=graft.plans.GraftExtensions`).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** left outer as-of: for each `left` row, the `right` row with equal
    * `key` picked by `direction` — "backward" (default: greatest right
    * time ≤ left time), "forward" (smallest right time ≥ left time), or
    * "nearest" (smaller |Δtime|, exact tie → backward) — optionally
    * bounded by `tolerance` ≥ 0 (-1 = unbounded) in the time column's native units
    * (MICROSECONDS for timestamps); pandas merge_asof's surface. `carry`
    * names the right columns appended (nullable) to the left schema.
    * `strategy` optionally pins the physical shape ("broadcast" |
    * "shuffle"); by default the planner decides from the reference side's
    * size estimate.
    *
    * Automatic skew mitigation: when `spark.graft.asof.skew.threshold` is
    * set to a positive row count AND the join will take the merge shape
    * (pinned "shuffle", or auto with a reference side too big to
    * broadcast), the SAME query text routes through [[asofSkewAware]] with
    * that hot-row threshold and `spark.graft.asof.skew.salts` salts
    * (default 8) — so a skewed 100 TB key survives without the caller
    * knowing to call the skew variant, the way AQE's skew-join rule
    * rescues built-in sort-merge joins (that rule cannot match a custom
    * exec). Broadcast plans never salt: the probe side has no per-key
    * partitions, so there is no skew surface. Off by default — the
    * detection aggregate is only worth its one extra job when the caller
    * expects hot keys.
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTimeCol: String, rightTimeCol: String, carry: Seq[String],
      strategy: Option[String] = None,
      direction: String = "backward",
      tolerance: Long = -1L): DataFrame = {
    // Validate the hint BEFORE the skew gate consults it: the gate's
    // `case _` arm would otherwise swallow a typo'd hint as "auto" and
    // could route to the salted merge without the fail-fast asofPlan's
    // require ever seeing the original string.
    require(strategy.forall(Set("broadcast", "shuffle")),
      s"asof strategy must be broadcast or shuffle (got ${strategy.getOrElse("")})")
    // Only -1 means "unbounded"; any other negative tolerance is a caller
    // arithmetic bug — pandas merge_asof rejects it, and silently treating
    // it as unbounded would disable the bound without error.
    require(tolerance >= 0 || tolerance == -1L,
      s"asof tolerance must be >= 0, or -1 for unbounded (got $tolerance)")
    val spark0 = left.sparkSession
    val skewThreshold = spark0.conf
      .getOption("spark.graft.asof.skew.threshold")
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
    if (skewThreshold > 0) {
      // Mirror the strategy's broadcast-vs-merge decision (hint wins, then
      // the session conf, then the stats estimate) — salting a plan that
      // would broadcast would only add cost. The estimate runs on the
      // PRUNED projection (key, time, carry) so a wide reference table
      // whose joined subtree would broadcast after column pruning is not
      // mis-routed to the salted merge by its full-width stats.
      val mode = strategy.getOrElse(
        spark0.conf.getOption("spark.graft.asof.strategy").getOrElse("auto"))
      val threshold = spark0.sessionState.conf.autoBroadcastJoinThreshold
      lazy val prunedStats = right
        .select((Seq(key, rightTimeCol) ++ carry).distinct
          .map(org.apache.spark.sql.functions.col): _*)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val wouldShuffle = mode match {
        case "broadcast" => false
        case "shuffle" => true
        case _ => !(threshold > 0 && prunedStats <= threshold)
      }
      if (wouldShuffle) {
        val salts = spark0.conf.getOption("spark.graft.asof.skew.salts")
          .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(8)
        return asofSkewAware(left, right, key, leftTimeCol, rightTimeCol,
          carry, skewThreshold, salts, direction, tolerance)
      }
    }
    asofPlan(left, right, key, leftTimeCol, rightTimeCol, carry, strategy,
      direction, tolerance)
  }

  /** [[asof]] minus the auto-skew gate: builds the logical node directly.
    * [[asofSkewAware]] lands here with its composite salted key —
    * re-entering the public face would re-trigger the gate and recurse.
    */
  private def asofPlan(left: DataFrame, right: DataFrame, key: String,
      leftTimeCol: String, rightTimeCol: String, carry: Seq[String],
      strategy: Option[String], direction: String = "backward",
      tolerance: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Fail fast on a typo'd hint: silently falling through to the stats
    // decision could broadcast-collect the very side the caller pinned
    // away. (The conf knob documents auto as ITS fallback; the explicit
    // per-call argument has no excuse.)
    require(strategy.forall(Set("broadcast", "shuffle")),
      s"asof strategy must be broadcast or shuffle (got ${strategy.get})")
    val dirCode = direction match {
      case "backward" => 0
      case "forward" => 1
      case "nearest" => 2
      case other => throw new IllegalArgumentException(
        s"asof direction must be backward, forward or nearest (got $other)")
    }
    // The operator does NO implicit key coercion (unlike equi-joins, where
    // the analyzer inserts casts): the broadcast index is a hash lookup
    // and the merge compares with the LEFT key's ordering, so mismatched
    // key types (int probe vs long reference) would miss or miscompare
    // silently. Floating-point keys are rejected outright — their Java
    // box equality (-0.0 != 0.0) diverges from SQL comparison semantics;
    // cast to a precise type upstream.
    val lkType = left.schema(key).dataType
    val rkType = right.schema(key).dataType
    require(normalized(lkType) == normalized(rkType), // nullability is not equality
      s"asof key types must match (left $lkType vs right $rkType); cast upstream")
    require(!hasFloatingPoint(lkType),
      s"asof does not support floating-point keys ($lkType); cast upstream")
    val spark = left.sparkSession
    ensureStrategy(spark)
    require(carry.forall(c => !left.columns.contains(c)),
      s"carry columns ${carry.filter(left.columns.contains)} collide with left columns")
    // Pin each side behind a fresh-alias Project: when both sides derive
    // from the same scan they share exprIds, and DeduplicateRelations
    // renews the duplicated subtree's ids without being able to rewrite a
    // custom node's references unambiguously (the same id exists on both
    // sides). Alias ids are globally unique and survive the renewal.
    val lf = left.select(left.columns.map(c => col(c).as(c)).toSeq: _*)
    val rf = right.select(right.columns.map(c => col(c).as(c)).toSeq: _*)
    val lplan = lf.queryExecution.analyzed
    val rplan = rf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    GraftSqlShim.ofRows(spark, AsOfJoinPlan(
      lplan, rplan,
      attr(lplan, key), attr(rplan, key),
      attr(lplan, leftTimeCol), attr(rplan, rightTimeCol),
      carry.map(attr(rplan, _)), strategy, dirCode, tolerance))
  }

  import org.apache.spark.sql.types._

  /** Type with every nested nullability flag erased — the comparison the
    * private-to-Spark DataType.sameType performs. */
  private def normalized(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        StructField(f.name, normalized(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(normalized(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(normalized(m.keyType), normalized(m.valueType), valueContainsNull = true)
    case o => o
  }

  private def hasFloatingPoint(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: StructType => s.fields.exists(f => hasFloatingPoint(f.dataType))
    case a: ArrayType => hasFloatingPoint(a.elementType)
    case m: MapType => hasFloatingPoint(m.keyType) || hasFloatingPoint(m.valueType)
    case _ => false
  }

  /** Skew-aware as-of over the merge shape: the mitigation
    * [[ShuffleAsOfJoinExec]]'s scaladoc prescribes for hot keys, packaged.
    *
    * Probe keys with more than `hotRowThreshold` rows (EXACT per-key
    * counts — one map-combined aggregate over the key column; a sampled
    * estimate would make the plan non-deterministic) are salted `salts`
    * ways by probe-row hash, and their reference rows are replicated once
    * per salt, so every probe row still sees its key's full reference set
    * and the result is row-identical to plain [[asof]] — but the hot
    * key's probe work lands on `salts` partitions instead of one. Cold
    * keys ride along with salt 0 and zero replication. One merge pass
    * over the composite (key, salt) struct — no union of per-path plans.
    *
    * Cost model: replication multiplies only the HOT reference rows by
    * `salts`; with K hot keys of R reference rows each, that is K·R·salts
    * extra shuffled rows against a probe-side hot partition shrunk by
    * `salts` — the standard salted-join trade.
    */
  def asofSkewAware(left: DataFrame, right: DataFrame, key: String,
      leftTimeCol: String, rightTimeCol: String, carry: Seq[String],
      hotRowThreshold: Long, salts: Int,
      direction: String = "backward", tolerance: Long = -1L): DataFrame = {
    // Named imports: the functions._ wildcard would shadow the left/right
    // parameters with the same-named SQL string functions.
    import org.apache.spark.sql.functions.{array, broadcast, col, count,
      explode, lit, pmod, sequence, struct, when, xxhash64}
    require(salts >= 1, s"salts must be >= 1 (got $salts)")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .where(col("__n") > hotRowThreshold)
      .select(col(key).as("__hotk"))
    val hotB = broadcast(hot)
    // A null key must stay null through the composite (struct(null, 0) is
    // NOT null, and would make null probe keys match null reference keys —
    // plain asof never does).
    def composite(saltCol: org.apache.spark.sql.Column) =
      when(col(key).isNull, lit(null))
        .otherwise(struct(col(key).as("k"), saltCol.cast("int").as("s")))
    // Salt from a hash of ALL probe columns, not just the time: hot keys
    // with few distinct timestamps (coarse event-time granularity) would
    // otherwise collapse onto one salt and keep the skew while still
    // paying the reference replication.
    val probeHash = xxhash64(left.columns.map(col).toSeq: _*)
    val l2 = left.join(hotB, col(key) === col("__hotk"), "left")
      .withColumn("__asof_k", composite(
        when(col("__hotk").isNull, lit(0))
          .otherwise(pmod(probeHash, lit(salts)))))
      .drop("__hotk")
    val r2 = right.join(hotB, col(key) === col("__hotk"), "left")
      .withColumn("__salt", explode(
        when(col("__hotk").isNull, array(lit(0)))
          .otherwise(sequence(lit(0), lit(salts - 1)))))
      .withColumn("__asof_k", composite(col("__salt")))
      .drop("__hotk", "__salt")
    asofPlan(l2, r2, "__asof_k", leftTimeCol, rightTimeCol, carry,
      Some("shuffle"), direction, tolerance)
      .drop("__asof_k")
  }
}

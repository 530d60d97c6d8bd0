package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOfJoin, BroadcastAsOfJoinExec, ShuffleAsOfJoinExec}

/** The native broadcast as-of join (logical node + planner strategy +
  * physical operator) against the composed shuffle form and hand-checked
  * boundary cases.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def probes(rows: (Long, Long, Long)*) = // (id, key, t)
    rows.toDF("p_id", "key", "t")
  private def refs(rows: (Long, Long, Long)*) = // (id, key, t)
    rows.toDF("r_id", "key", "t")

  test("floor semantics: greatest ref time <= probe time; unmatched probes null") {
    val p = probes((1L, 10L, 100L), (2L, 10L, 55L), (3L, 10L, 5L), (4L, 99L, 100L))
    val r = refs((7L, 10L, 10L), (8L, 10L, 55L), (9L, 10L, 90L), (5L, 11L, 1L))
    val out = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      .select("p_id", "r_id").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out(1L) == 9L)  // 90 <= 100
    assert(out(2L) == 8L)  // exact tie on time matches (<=)
    assert(out(3L) == -1L) // no ref at-or-before 5
    assert(out(4L) == -1L) // key absent from reference side
  }

  test("physical plan uses BroadcastAsOfJoinExec; probe side has no shuffle; codegen fused") {
    // fallback=false: a Janino compile failure in the generated consume
    // code must THROW here, not silently run the interpreted path (the
    // `*(n)` marker is assigned at planning and cannot detect that).
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val p = probes((1L, 10L, 100L))
      val r = refs((7L, 10L, 10L))
      val df = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case e: BroadcastAsOfJoinExec => e }.nonEmpty)
      assert(!plan.toString.contains("Exchange"))
      // The `*(n)` prefix marks whole-stage-codegen membership: the probe
      // side must fuse THROUGH the custom exec, not break the span at it.
      assert(plan.toString.linesIterator.exists(l =>
        l.contains("BroadcastAsOfJoin") && l.trim.startsWith("*(")),
        s"expected codegen'd BroadcastAsOfJoin:\n$plan")
      // Execute under no-fallback so the generated code actually compiles
      // and produces the right row.
      val out = df.collect()
      assert(out.length == 1 && out.head.getLong(3) == 7L)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("mismatched and floating-point key types are rejected up front") {
    val p = probes((1L, 10L, 100L))
    val rInt = Seq((7, 10, 10)).toDF("r_id", "key", "t") // int key vs long probe
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(p, rInt, "key", "t", "t", Seq("r_id"))
    }
    val pD = Seq((1L, 10.0, 100L)).toDF("p_id", "key", "t")
    val rD = Seq((7L, 10.0, 10L)).toDF("r_id", "key", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(pD, rD, "key", "t", "t", Seq("r_id"))
    }
  }

  test("parity with the shuffle (union+window) form on the events table") {
    val d = "/root/testdata/sf0.001"
    val shuffle = graft.queries.EventOps.queries("ev_asof_join")(spark, d)
      .collect().map(_.toSeq).toSet
    val native = graft.queries.EventOps.queries("ev_asof_native")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty)
    assert(native == shuffle)
  }

  private def withStrategy[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.graft.asof.strategy", mode)
    try body finally spark.conf.unset("spark.graft.asof.strategy")
  }

  /** Every node of the final plan with AQE wrappers expanded: the shuffle
    * form has exchanges, so AQE wraps it in AdaptiveSparkPlanExec and
    * ResultQueryStage/ShuffleQueryStage LEAF wrappers that plain collect
    * cannot see through. Call AFTER an action so the adaptive plan is
    * final.
    */
  private def finalNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def expand(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case other => other +: other.children.flatMap(expand)
    }
    expand(df.queryExecution.executedPlan)
  }

  test("planner picks the co-partitioned merge when broadcast is off; semantics identical") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = probes((1L, 10L, 100L), (2L, 10L, 55L), (3L, 10L, 5L), (4L, 99L, 100L))
      val r = refs((7L, 10L, 10L), (8L, 10L, 55L), (9L, 10L, 90L), (5L, 11L, 1L))
      val df = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      // Execute df ITSELF (not a derived select) so finalPlan sees the
      // finished adaptive plan; r_id is column 3 of the joined output.
      val out = df.collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
      assert(out == Map(1L -> 9L, 2L -> 8L, 3L -> -1L, 4L -> -1L))
      assert(finalNodes(df).exists(_.isInstanceOf[ShuffleAsOfJoinExec]))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("equal-(key,time) reference ties break identically in both physical forms") {
    val p = probes((1L, 10L, 100L), (2L, 20L, 100L))
    // Two refs tie at (key=10, t=50) and three at (key=20, t=80).
    val r = refs((3L, 10L, 50L), (9L, 10L, 50L),
      (4L, 20L, 80L), (8L, 20L, 80L), (6L, 20L, 80L))
    def run(mode: String) = withStrategy(mode) {
      val df = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      val cls = if (mode == "shuffle") classOf[ShuffleAsOfJoinExec]
        else classOf[BroadcastAsOfJoinExec]
      val out = df.collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
      assert(finalNodes(df).exists(_.getClass == cls))
      out
    }
    val b = run("broadcast")
    val s = run("shuffle")
    assert(b == s)
    // And the pick is input-order independent: reversing the reference
    // side changes nothing.
    val rRev = refs((6L, 20L, 80L), (8L, 20L, 80L), (4L, 20L, 80L),
      (9L, 10L, 50L), (3L, 10L, 50L))
    val s2 = withStrategy("shuffle") {
      AsOfJoin.asof(p, rRev, "key", "t", "t", Seq("r_id"))
        .select("p_id", "r_id").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    assert(s2 == s)
  }

  test("shuffle-form parity with the broadcast form on the events table") {
    val d = "/root/testdata/sf0.001"
    val broadcast = graft.queries.EventOps.queries("ev_asof_native")(spark, d)
      .collect().map(_.toSeq).toSet
    val shuffled = withStrategy("shuffle") {
      graft.queries.EventOps.queries("ev_asof_native")(spark, d)
        .collect().map(_.toSeq).toSet
    }
    assert(shuffled.nonEmpty)
    assert(shuffled == broadcast)
  }

  test("per-call strategy hint pins the merge shape even when broadcast fits") {
    val p = probes((1L, 10L, 100L))
    val r = refs((7L, 10L, 10L))
    val df = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), Some("shuffle"))
    val out = df.collect()
    assert(out.length == 1 && out.head.getLong(3) == 7L)
    assert(finalNodes(df).exists(_.isInstanceOf[ShuffleAsOfJoinExec]))
  }

  // Randomized differential (seeded): both physical forms against an
  // independent scala model, over many keys and partitions. Reference
  // (key, time) pairs are kept distinct so the model's floor pick is
  // unambiguous; tie-break determinism has its own dedicated test above.
  (0 until 3).foreach { trial =>
    test(s"randomized differential: broadcast == merge == scala model (trial $trial)") {
      val rnd = new scala.util.Random(7 + trial)
      val keys = 12L
      val refRows = rnd.shuffle((0 until 300).map { i =>
        (i.toLong + 1000, rnd.nextLong(keys), rnd.nextLong(1000))
      }.distinctBy(r => (r._2, r._3)))
      val probeRows = (0 until 300).map { i =>
        (i.toLong, rnd.nextLong(keys + 3), rnd.nextLong(1200)) // some keys unmatched
      }
      val model: Map[Long, Seq[(Long, Long)]] = refRows.groupBy(_._2)
        .map { case (k, rs) => k -> rs.map(r => (r._3, r._1)).sortBy(_._1).toSeq }
      def expect(k: Long, t: Long): Long = model.get(k)
        .flatMap(_.takeWhile(_._1 <= t).lastOption).map(_._2).getOrElse(-1L)
      val p = probeRows.toDF("p_id", "key", "t").repartition(7)
      val r = refRows.toDF("r_id", "key", "t").repartition(5)
      def run(mode: String) = withStrategy(mode) {
        AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id")).collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
      }
      val exp = probeRows.map(pr => pr._1 -> expect(pr._2, pr._3)).toMap
      assert(run("broadcast") == exp)
      assert(run("shuffle") == exp)
    }
  }

  test("skew-aware salted form is row-identical to the plain operator") {
    val rnd = new scala.util.Random(99)
    // One very hot key (600 probe rows), a few cold keys, and null keys on
    // both sides; duplicate reference times occur, so the tie-break path
    // is exercised through the salting too.
    val probeRows = (0 until 600).map(i => (i.toLong, Some(1L), rnd.nextLong(1000))) ++
      (600 until 700).map(i => (i.toLong, Some(2L + i % 5), rnd.nextLong(1000))) ++
      Seq((990L, Option.empty[Long], 10L))
    val refRows = (0 until 200).map(i => (i.toLong + 5000, Some(1L), rnd.nextLong(1000))) ++
      (200 until 260).map(i => (i.toLong + 5000, Some(2L + i % 5), rnd.nextLong(1000))) ++
      Seq((9999L, Option.empty[Long], 5L))
    val p = probeRows.toDF("p_id", "key", "t")
    val r = refRows.toDF("r_id", "key", "t")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    val plain = norm(AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id")))
    val salted = norm(AsOfJoin.asofSkewAware(p, r, "key", "t", "t", Seq("r_id"),
      hotRowThreshold = 100, salts = 4))
    assert(salted == plain)
    // Null-key probes stay unmatched (struct(null, salt) must not revive
    // null-equality).
    assert(salted(990L) == -1L)
  }

  test("auto-skew: threshold conf routes plain asof through the salted merge; broadcast never salts") {
    val rnd = new scala.util.Random(7)
    val probeRows = (0 until 400).map(i => (i.toLong, 1L, rnd.nextLong(1000))) ++
      (400 until 450).map(i => (i.toLong, 2L + i % 3, rnd.nextLong(1000)))
    val refRows = (0 until 150).map(i => (i.toLong + 5000, 1L, rnd.nextLong(1000))) ++
      (150 until 180).map(i => (i.toLong + 5000, 2L + i % 3, rnd.nextLong(1000)))
    val p = probeRows.toDF("p_id", "key", "t")
    val r = refRows.toDF("r_id", "key", "t")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    val plain = norm(AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), Some("shuffle")))
    spark.conf.set("spark.graft.asof.skew.threshold", "100")
    spark.conf.set("spark.graft.asof.skew.salts", "4")
    try {
      // Merge shape + threshold → the SAME call text plans the salted
      // composite key (pinned: the exec's key is the __asof_k struct, and
      // the salt explode is in the plan) and stays row-identical.
      val auto = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), Some("shuffle"))
      val planStr = auto.queryExecution.executedPlan.toString
      assert(planStr.contains("ShuffleAsOfJoin") && planStr.contains("__asof_k"),
        s"expected salted merge plan, got:\n$planStr")
      assert(norm(auto) == plain)
      // Broadcast pin under the same conf: no skew surface, no salting.
      val bcast = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), Some("broadcast"))
      val bplan = bcast.queryExecution.executedPlan.toString
      assert(bplan.contains("BroadcastAsOfJoin") && !bplan.contains("__asof_k"),
        s"expected unsalted broadcast plan, got:\n$bplan")
      assert(norm(bcast) == plain)
    } finally {
      spark.conf.unset("spark.graft.asof.skew.threshold")
      spark.conf.unset("spark.graft.asof.skew.salts")
    }
  }

  test("forward and nearest directions: hand-checked boundaries, both physical forms") {
    val p = probes((1L, 10L, 100L), (2L, 10L, 55L), (3L, 10L, 5L), (4L, 10L, 95L))
    val r = refs((7L, 10L, 10L), (8L, 10L, 55L), (9L, 10L, 90L))
    def run(dir: String, mode: String) = withStrategy(mode) {
      AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), direction = dir)
        .select("p_id", "r_id").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    }
    for (mode <- Seq("broadcast", "shuffle")) {
      // forward: smallest ref time >= probe time; exact time matches (>=).
      assert(run("forward", mode) ==
        Map(1L -> -1L, 2L -> 8L, 3L -> 7L, 4L -> -1L), s"forward/$mode")
      // nearest: probe 5 is 5 from ref 10 (ceil only); probe 95 is 5 from
      // ref 90 (floor only); probe 100 floor-only; probe 55 exact.
      assert(run("nearest", mode) ==
        Map(1L -> 9L, 2L -> 8L, 3L -> 7L, 4L -> 9L), s"nearest/$mode")
    }
  }

  test("nearest prefers the backward candidate on an exact distance tie") {
    val p = probes((1L, 10L, 50L))
    val r = refs((7L, 10L, 40L), (8L, 10L, 60L)) // both Δ10
    for (mode <- Seq("broadcast", "shuffle")) withStrategy(mode) {
      val out = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"),
        direction = "nearest").select("r_id").collect()
      assert(out.head.getLong(0) == 7L, s"mode=$mode")
    }
  }

  test("tolerance bounds the accepted distance in every direction") {
    val p = probes((1L, 10L, 100L), (2L, 10L, 12L))
    val r = refs((7L, 10L, 10L), (9L, 10L, 103L))
    def run(dir: String, tol: Long, mode: String) = withStrategy(mode) {
      AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"),
        direction = dir, tolerance = tol)
        .select("p_id", "r_id").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    }
    for (mode <- Seq("broadcast", "shuffle")) {
      // backward tol=5: probe 100 is 90 past ref 10 → null; probe 12 is 2 → match.
      assert(run("backward", 5L, mode) == Map(1L -> -1L, 2L -> 7L), s"b/$mode")
      // forward tol=5: probe 100 is 3 before ref 103 → match; probe 12 is 91 → null.
      assert(run("forward", 5L, mode) == Map(1L -> 9L, 2L -> -1L), s"f/$mode")
      // nearest tol=2: probe 100 (floor Δ90, ceil Δ3) → null; probe 12 Δ2 → match.
      assert(run("nearest", 2L, mode) == Map(1L -> -1L, 2L -> 7L), s"n/$mode")
    }
  }

  test("forward equal-(key,time) ties break identically in both physical forms") {
    val p = probes((1L, 10L, 30L), (2L, 20L, 30L))
    val r = refs((3L, 10L, 50L), (9L, 10L, 50L),
      (4L, 20L, 80L), (8L, 20L, 80L), (6L, 20L, 80L))
    def run(mode: String) = withStrategy(mode) {
      AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), direction = "forward")
        .select("p_id", "r_id").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    val b = run("broadcast")
    assert(b == run("shuffle"))
    // Input-order independence of the pick.
    val rRev = refs((6L, 20L, 80L), (8L, 20L, 80L), (4L, 20L, 80L),
      (9L, 10L, 50L), (3L, 10L, 50L))
    val s2 = withStrategy("shuffle") {
      AsOfJoin.asof(p, rRev, "key", "t", "t", Seq("r_id"), direction = "forward")
        .select("p_id", "r_id").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    assert(s2 == b)
  }

  test("invalid direction is rejected up front") {
    val p = probes((1L, 10L, 100L))
    val r = refs((7L, 10L, 10L))
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), direction = "sideways")
    }
  }

  // Randomized differential over all three directions with and without a
  // tolerance, both physical forms, against an independent scala model.
  (0 until 2).foreach { trial =>
    test(s"randomized differential: directions+tolerance vs scala model (trial $trial)") {
      val rnd = new scala.util.Random(41 + trial)
      val keys = 10L
      val refRows = rnd.shuffle((0 until 250).map { i =>
        (i.toLong + 1000, rnd.nextLong(keys), rnd.nextLong(800))
      }.distinctBy(r => (r._2, r._3)))
      val probeRows = (0 until 250).map { i =>
        (i.toLong, rnd.nextLong(keys + 2), rnd.nextLong(1000))
      }
      val model: Map[Long, Seq[(Long, Long)]] = refRows.groupBy(_._2)
        .map { case (k, rs) => k -> rs.map(r => (r._3, r._1)).sortBy(_._1).toSeq }
      def expect(dir: String, tol: Long)(k: Long, t: Long): Long = {
        val rs = model.getOrElse(k, Seq.empty)
        val f = rs.takeWhile(_._1 <= t).lastOption
          .filter(x => tol < 0 || t - x._1 <= tol)
        val c = rs.dropWhile(_._1 < t).headOption
          .filter(x => tol < 0 || x._1 - t <= tol)
        (dir match {
          case "backward" => f
          case "forward" => c
          case "nearest" => (f, c) match {
            case (Some(ff), Some(cc)) =>
              if (t - ff._1 <= cc._1 - t) Some(ff) else Some(cc)
            case (x, y) => x.orElse(y)
          }
        }).map(_._2).getOrElse(-1L)
      }
      val p = probeRows.toDF("p_id", "key", "t").repartition(5)
      val r = refRows.toDF("r_id", "key", "t").repartition(3)
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(-1L, 37L);
           mode <- Seq("broadcast", "shuffle")) {
        val got = withStrategy(mode) {
          AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"),
            direction = dir, tolerance = tol).collect()
            .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
        }
        val exp = probeRows.map(pr => pr._1 -> expect(dir, tol)(pr._2, pr._3)).toMap
        assert(got == exp, s"direction=$dir tolerance=$tol mode=$mode")
      }
    }
  }

  test("skew-aware salted form matches plain asof for forward and nearest") {
    val rnd = new scala.util.Random(17)
    val probeRows = (0 until 300).map(i => (i.toLong, 1L, rnd.nextLong(1000))) ++
      (300 until 360).map(i => (i.toLong, 2L + i % 4, rnd.nextLong(1000)))
    val refRows = (0 until 120).map(i => (i.toLong + 5000, 1L, rnd.nextLong(1000))) ++
      (120 until 160).map(i => (i.toLong + 5000, 2L + i % 4, rnd.nextLong(1000)))
    val p = probeRows.toDF("p_id", "key", "t")
    val r = refRows.toDF("r_id", "key", "t")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    for (dir <- Seq("forward", "nearest")) {
      val plain = norm(AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"),
        direction = dir))
      val salted = norm(AsOfJoin.asofSkewAware(p, r, "key", "t", "t", Seq("r_id"),
        hotRowThreshold = 80, salts = 4, direction = dir))
      assert(salted == plain, s"direction=$dir")
    }
  }

  test("null key / null time probe rows pass through with null carries") {
    val p = Seq((1L, Some(10L), Some(100L)), (2L, None, Some(100L)), (3L, Some(10L), None))
      .toDF("p_id", "key", "t")
    val r = refs((7L, 10L, 10L))
    val out = AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"))
      .collect().map(x => x.getLong(0) -> x.isNullAt(3)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("negative tolerance other than the -1 unbounded sentinel is rejected") {
    val p = probes((1L, 10L, 100L))
    val r = refs((7L, 10L, 10L))
    // -2 is a miscomputed bound, not a request for "unbounded": pandas
    // merge_asof rejects negative tolerance and so do we — silently
    // disabling the bound would be an invisible correctness change.
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), tolerance = -2L)
    }
    assert(e.getMessage.contains("tolerance"))
    // The sentinel and any non-negative value still pass validation.
    AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), tolerance = -1L).count()
    AsOfJoin.asof(p, r, "key", "t", "t", Seq("r_id"), tolerance = 0L).count()
  }

  test("fixture invariant: view rows have unique (user_id, ts) — the " +
       "forward/nearest oracle tie-break on view_id is only equivalent to " +
       "the engine's carried-struct order under this uniqueness") {
    // ev_asof_forward/nearest oracles rank duplicate-(user_id, ts) views
    // by view_id while the engine's run cursor breaks such ties by the
    // carried projection's order (view_id first, so they coincide — but
    // only because view_id leads the carry). If a fixture regeneration
    // ever introduces duplicate (user_id, ts) view pairs, fail HERE with
    // an explanation instead of as a silent oracle hash mismatch.
    val views = spark.read.parquet(s"${SparkTestBase.sf}/events.parquet")
      .where(col("event_type") === "view")
    val dups = views.groupBy("user_id", "ts").count().where(col("count") > 1).count()
    assert(dups == 0L,
      s"$dups duplicate (user_id, ts) view pairs — ev_asof_forward/nearest " +
      "oracles' view_id tie-break no longer matches engine byte-order ties; " +
      "regenerate fixtures or extend the oracle ORDER BY")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the integer fixed-point PageRank (q_pagerank) that the
  * value-exact oracle row doesn't state explicitly.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("rank mass is conserved up to integer-truncation loss") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_pagerank")(spark, sf)
    val row = df.agg(count(lit(1)), sum(col("rank_e12"))).head
    val (n, total) = (row.getLong(0), row.getLong(1))
    val ideal = n * graft.queries.GraphOps.PageRankScale
    // Each `div` truncates < 1 unit per edge per round and the damped
    // base re-injects (1-d) exactly; mass can only leak DOWN and only by
    // truncation dust. 1% is orders of magnitude above the real loss and
    // orders below any algorithmic error.
    assert(total <= ideal, s"rank mass grew: $total > $ideal")
    assert(total > ideal - ideal / 100, s"rank mass leaked: $total vs $ideal")
  }

  test("ranks are deterministic across runs (integer arithmetic, no float sums)") {
    val a = SparkEntry.queries("q_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = SparkEntry.queries("q_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("q_triangles matches a local brute-force model of the same graph") {
    import org.apache.spark.sql.functions._
    // Rebuild the co-purchase edge list independently and enumerate
    // triangles with a plain adjacency-set model — no orientation, no
    // Spark — then compare per-corner counts with the degree-oriented
    // distributed count.
    val co = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s"),
        date_trunc("week", col("o_orderdate")).as("w"),
        col("o_custkey").as("c"))
      .distinct()
    val edges = co.toDF("s", "w", "c1")
      .join(co.toDF("s", "w", "c2"), Seq("s", "w"))
      .where(col("c1") < col("c2"))
      .select("c1", "c2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      // Count each triangle once at its lexicographically-first edge.
      (adj(a) intersect adj(b)).filter(c => c > b).foreach { c =>
        counts(a) += 1; counts(b) += 1; counts(c) += 1
      }
    }
    val got = SparkEntry.queries("q_triangles")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == counts.toMap, "per-corner triangle counts diverge")
    assert(got.values.sum % 3 == 0 && got.values.sum > 0)
  }

  test("q_modularity: conservation identities and Q in range") {
    val rows = SparkEntry.queries("q_modularity")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // n_nodes, intra, degsum
    val m2 = rows.map(_._3).sum // Σ degrees == total directed edges
    // Every intra edge is also a degree contribution of its community.
    assert(rows.forall { case (_, intra, dsum) => intra <= dsum })
    assert(rows.map(_._2).sum <= m2)
    val q = rows.map { case (_, intra, dsum) =>
      intra.toDouble / m2 - math.pow(dsum.toDouble / m2, 2)
    }.sum
    assert(q >= -0.5 && q <= 1.0, s"modularity out of range: $q")
  }

  test("q_kcore: whole sub-threshold chain removed in one synchronous round; clique intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A 4-clique (every node degree 3) with a pendant chain 4-10-11-12:
    // at k=3 EVERY chain node starts below threshold (degrees 2, 2, 1),
    // so the synchronous round removes all three AT ONCE — the
    // one-round case; node 4's degree drops to 3 and stays.
    val clique = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = (clique ++ chain).toDF("src", "dst")
    val out = graft.queries.GraphOps.kcoreOf(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"expected exactly the 4-clique at degree 3, got $out")
  }

  test("q_kcore: multi-round cascade — removal drops a neighbor below k only in a later round") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // k=2 caterpillar into a triangle: pendant 10 (deg 1) hangs off 11
    // (deg 2 = k, SAFE in round 1), which hangs off 12 (deg 2), which
    // hangs off triangle corner 3. Each round's removal drops exactly
    // one more node below k, exercising the frontier formulation's
    // decremented-degree path across FOUR rounds: {10} → {11} → {12} →
    // {} (3 drops from deg 3 to 2 and stays). A stale-degree bug in the
    // iterated decrement would keep 11 or 12 alive.
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val tail = Seq((3L, 12L), (12L, 11L), (11L, 10L))
    val edges = (tri ++ tail).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val out = graft.queries.GraphOps.kcoreOf(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"expected exactly the triangle at degree 2, got $out")
  }

  test("LPA zero-change early-stop: converged graph exits before the round " +
       "cap with output identical to the full unrolled rounds") {
    import spark.implicits._
    // Self-loops make the init labeling (label = node id) an immediate
    // fixpoint: every node's only neighbor label is its own id, so
    // round 1 changes zero labels and the loop must exit at rounds=1.
    val fixed = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("src", "dst")
    val (labsF, roundsF) = graft.queries.GraphOps.lpaLabelsWithRounds(fixed)
    assert(roundsF == 1, s"fixpoint graph must stop after round 1, ran $roundsF")
    assert(labsF.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))

    // Two self-looped nodes joined by an edge: round 1 flips node 2 to
    // label 1 (tie → min), round 2 changes nothing → exit at rounds=2,
    // one round under the cap, with the same labels the full unroll
    // would produce (a fixpoint is invariant under further rounds).
    val pair = Seq((1L, 1L), (2L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (labsP, roundsP) = graft.queries.GraphOps.lpaLabelsWithRounds(pair)
    assert(roundsP == 2, s"expected convergence detected at round 2, ran $roundsP")
    assert(labsP.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L))

    // A complete triangle still changes a label in round 2 (node 1's
    // 2→1), so the check after round 2 sees a diff and round 3 runs:
    // the early-stop must NOT fire before a real fixpoint.
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val (labsT, roundsT) = graft.queries.GraphOps.lpaLabelsWithRounds(tri)
    assert(roundsT == graft.queries.GraphOps.LpaRounds,
      s"non-converged graph must run the full cap, ran $roundsT")
    assert(labsT.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("q_bfs hop plan: level anti-joins and the edge side are exchange-free — " +
       "only the candidate distinct shuffles") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // Force the non-broadcast planner (the scale shape) — the level
    // frames keep their EXPLICIT broadcast hints (bfs broadcasts below
    // an exact row bound), but nothing else may be bailed out by the
    // test-scale planner's tiny-table broadcasts.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val G = graft.queries.GraphOps
      val edges = G.edgesOf(spark, sf).select(col("src"), col("dst"))
      // Verbatim hop shapes from GraphOps.bfs: seed level, hop-1 level,
      // then the hop-2 candidate plan (the steady-state two-anti shape).
      val l0 = graft.core.Lineage.cut(
        spark.range(1).select(lit(G.BfsSource).as("node")))
      val l1 = graft.core.Lineage.cut(
        edges.join(broadcast(l0), edges("src") === l0("node"))
          .select(col("dst").as("node")).distinct()
          .join(broadcast(l0), Seq("node"), "left_anti"))
      val hop2 = edges.join(broadcast(l1), edges("src") === l1("node"))
        .select(col("dst").as("node")).distinct()
        .join(broadcast(l1), Seq("node"), "left_anti")
        .join(broadcast(l0), Seq("node"), "left_anti")
      assert(hop2.count() > 0, "hop-2 frontier must be non-empty on the trade graph")
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case q: QueryStageExec => expand(q.plan)
        case o => o +: o.children.flatMap(expand)
      }
      val nodes = expand(hop2.queryExecution.executedPlan)
      val shuffles = nodes.collect { case e: ShuffleExchangeExec => e }
      // THE pin: one hop = ONE shuffle (the candidate distinct, which IS
      // the algorithm). The bounded levels broadcast into the edge join
      // and both anti-joins, keeping the bucketed edge scan's side
      // exchange-free — a growing-dist re-shuffle (the round-7 shape)
      // would surface here as extra exchanges.
      assert(shuffles.size == 1,
        s"expected exactly 1 shuffle (the distinct), got ${shuffles.size}:\n" +
          nodes.map(_.nodeName).mkString("\n"))
      graft.core.Lineage.release(l0)
      graft.core.Lineage.release(l1)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("per-round rank join is exchange-free on the bucketed edge side") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // Force the sort-merge path: at 100 TB the node-sized rank frame does
    // not broadcast — SMJ against the bucketed edge scan is the shape the
    // layout exists for (the test-scale planner would broadcast it and
    // hide the exchange this pin guards against).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ewd = graft.queries.GraphOps.edgesOf(spark, sf)
      val prev = graft.core.Lineage.cut(
        ewd.select(col("src").as("node")).distinct()
          .select(col("node"),
            lit(graft.queries.GraphOps.PageRankScale).as("r")))
      // One pagerank round, verbatim shape from GraphOps.pagerank.
      val round = ewd.join(prev, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("r"))
      round.collect()
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case q: QueryStageExec => expand(q.plan)
        case o => o +: o.children.flatMap(expand)
      }
      val nodes = expand(round.queryExecution.executedPlan)
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smj.size == 1, nodes.map(_.nodeName).mkString(", "))
      val sides = smj.head.children.map(expand)
      val bucketSides = sides.filter(_.exists {
        case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
        case _ => false
      })
      assert(bucketSides.size == 1,
        "exactly one join side must read the bucketed edge table: " +
          sides.map(_.map(_.nodeName).mkString(">")).mkString(" | "))
      // THE pin: the m-edge side reaches the per-round join straight from
      // its bucket layout — zero shuffles. Only the node-sized rank frame
      // (the other side) may move.
      assert(!bucketSides.head.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "edge side of the per-round join must be exchange-free:\n" +
          bucketSides.head.map(_.nodeName).mkString("\n"))
      graft.core.Lineage.release(prev)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}

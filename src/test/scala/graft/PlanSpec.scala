package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these queries
  * scale-correct must survive refactors, not just their row values.
  * Each assertion pins a plan feature the 100 TB posture depends on.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  /** Count nodes of a given name via the formatted plan's numbered node
    * detail list ("(3) Exchange") — immune to tree-art prefixes (`+-`
    * vs `:-`) that a branch position change would introduce. */
  private def countNodes(plan: String, node: String): Int =
    plan.linesIterator.count(_.matches(s"""\\(\\d+\\) $node.*"""))

  test("f2: filter is pushed to the parquet scan") {
    val p = planOf("f2_filter_pushdown")
    assert(p.contains("PushedFilters:"), p.take(800))
    assert(p.contains("GreaterThan(l_discount") || p.contains("GreaterThanOrEqual(l_shipdate"),
      "expected lineitem predicates in PushedFilters")
  }

  test("s1: projection prunes the read schema to selected columns") {
    val p = planOf("s1_scan_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice"),
      readSchema)
  }

  test("q3 and ANN top-k use TakeOrderedAndProject, not a global sort") {
    assert(planOf("q3_topk_revenue").contains("TakeOrderedAndProject"))
    assert(planOf("ann_brute_topk").contains("TakeOrderedAndProject"))
  }

  test("q5: small dimension joins broadcast") {
    val p = planOf("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("d5: pair verify is the codegen'd dot_fold, not interpreted HOFs") {
    // The registered query serves the session-materialized pair parquet
    // (a plain scan); the plan contract is on the COMPUTE pipeline.
    val df = graft.queries.DedupOps.computeEmbeddingPairs(spark, sf, 8192)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val p = out.toString
    assert(p.contains("dot_fold"), "expected dot_fold in d5 plan")
    // The pair-join filter must not fall back to the aggregate() HOF form.
    val joinSection = p.substring(p.indexOf("SortMergeJoin").max(0))
    assert(!joinSection.contains("zip_with"), "pair verify regressed to HOF zip_with")
  }

  test("d4: verify joins broadcast, no cartesian product, histogram screen in the plan") {
    val p = planOf("d4_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
    // The verify-side gram tables are semi-join-reduced to candidate docs
    // and broadcast (candidate-bounded, never corpus-bounded); the
    // candidate stream must never shuffle against them.
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(p.contains("LeftSemi"), "candidate-doc semi-join reduction missing")
    assert(p.contains("sorted_intersect_size"), "merge-intersect verify missing")
    // The lossless intersection upper bound sits in the candidate stage,
    // which the registered query lineage-cuts (so it is absent from the
    // final frame's plan) — pin it on the stage that executes it.
    val candPlan = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        graft.queries.DedupOps.ngramCandidates(spark, sf).explain("formatted")
      }
      out.toString
    }
    assert(candPlan.contains("min_sum64"), "histogram screen missing from candidate plan")
    assert(!candPlan.contains("CartesianProduct"))
  }

  test("tx_contamination: benchmark gram set joins broadcast, corpus never self-joins") {
    val p = planOf("tx_contamination")
    assert(p.contains("BroadcastHashJoin Inner"), p.take(800))
    assert(!p.contains("SortMergeJoin Inner"), "benchmark hit join must not shuffle the corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("tx_pack: exactly one shuffle (the (lang, shard) window), no join") {
    val p = planOf("tx_pack")
    assert(p.contains("Window"))
    val exchanges = countNodes(p, "Exchange")
    assert(exchanges == 1, s"expected 1 Exchange, plan:\n${p.take(1200)}")
  }

  test("tx_chunk / tx_cdc_chunk: zero shuffles — chunking is per-row explode") {
    for (q <- Seq("tx_chunk", "tx_cdc_chunk")) {
      val p = planOf(q)
      assert(countNodes(p, "Exchange") == 0, s"$q should not shuffle:\n${p.take(1200)}")
      assert(p.contains("Generate"), s"$q should explode per-row:\n${p.take(1200)}")
    }
  }

  test("src_schema_evolution: merged-schema scan, no shuffle, no per-file union plan") {
    val p = planOf("src_schema_evolution")
    // Schema merge happens in the footer read at planning: ONE scan over
    // both delivery dirs, not a Union of two scans, and nothing shuffles.
    assert(countNodes(p, "Exchange") == 0, s"merged read must not shuffle:\n${p.take(1200)}")
    assert(countNodes(p, "Union") == 0, s"merge is schema-level, not a plan Union:\n${p.take(1200)}")
    assert(p.contains("c_acctbal"), "evolved column present in the read schema")
  }

  test("d11_chunk_dedup: skew-proof shape — no window sort over chunk_hash, " +
       "min-struct election partial-aggregates map-side") {
    val p = planOf("d11_chunk_dedup")
    // The first-occurrence election must be an aggregate (map-side
    // combinable min(struct)), never a row_number window: a corpus-wide
    // boilerplate chunk makes chunk_hash groups corpus-sized, and a
    // window would sort that whole group on one task.
    assert(countNodes(p, "Window") == 0,
      s"election must be an agg, not a window:\n${p.take(1200)}")
    // The struct-min plans as a SortAggregate (struct buffers are not
    // hash-agg mutable) — that's fine: the PARTIAL phase still runs
    // map-side below the exchange (each task sorts only its own
    // partition by chunk_hash), so the hot hash collapses to one row
    // per map task before any shuffle.
    assert(p.contains("partial_min(struct"),
      s"first-occurrence min must partial-aggregate map-side:\n${p.take(1600)}")
    // Three hash shuffles (per-doc totals, per-hash firsts, firsts'
    // per-doc re-agg) + the final doc_id join; the join keys are unique
    // per side so it cannot skew (and broadcasts at test SF).
    assert(countNodes(p, "Exchange") <= 4, s"expected <= 4 Exchanges:\n${p.take(1200)}")
    assert(p.contains("Generate"), "chunk explode must stay map-side")
  }

  test("tx_winnow: zero exchanges — winnowing is pure per-row work") {
    val p = planOf("tx_winnow")
    assert(countNodes(p, "Exchange") == 0,
      s"winnowing must not shuffle:\n${p.take(1200)}")
    assert(countNodes(p, "Window") == 0 && countNodes(p, "Generate") == 0,
      s"no per-gram explode or per-doc window may survive:\n${p.take(1200)}")
  }

  test("tx_weighted_sample: distributed top-k (TakeOrderedAndProject), " +
       "no global sort") {
    val p = planOf("tx_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k merge:\n${p.take(1200)}")
    // The only Sort allowed is the final k-row rank window's — never a
    // pre-limit global sort of the corpus.
    assert(countNodes(p, "Sort") <= 1, s"corpus-wide sort leaked in:\n${p.take(1200)}")
  }

  test("ev_cumulative_users: the running-distinct trap stays avoided — " +
       "no distinct aggregation inside a window") {
    val p = planOf("ev_cumulative_users")
    // One window (the day-axis running sum) over at most ~days rows.
    assert(countNodes(p, "Window") == 1, s"expected exactly 1 Window:\n${p.take(1200)}")
  }

  test("q_range_lookup: bucketed range join is an EQUI join — no nested " +
       "loop, no cartesian") {
    val p = planOf("q_range_lookup")
    // The whole point of range bucketing: a pure BETWEEN join would plan
    // BroadcastNestedLoopJoin (O(facts × ranges) compares); the bucketed
    // form must be an ordinary hash/sort-merge equi join on the bucket.
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNL in plan:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n${p.take(1200)}")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi join on the bucket key:\n${p.take(1200)}")
  }

  test("ev_sequence_match: one exchange, leads share a single window sort") {
    val p = planOf("ev_sequence_match")
    assert(countNodes(p, "Exchange") == 1, s"expected 1 Exchange:\n${p.take(1200)}")
    assert(countNodes(p, "Window") == 1, s"all three leads must share one Window:\n${p.take(1200)}")
    assert(countNodes(p, "Sort") == 1, s"expected a single window sort:\n${p.take(1200)}")
  }

  test("ann_hard_negatives: broadcast batch + WindowGroupLimit, no cartesian") {
    val p = planOf("ann_hard_negatives")
    // Each task forwards <= k rows per query to the shuffle...
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    // ...and the batch join is a broadcast, never a shuffled cartesian.
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("w3_range_frame: one exchange (the per-customer window), range frame in plan") {
    val p = planOf("w3_range_frame")
    assert(p.contains("RangeFrame"), p.take(1200))
    assert(countNodes(p, "Exchange") == 1,
      s"expected 1 Exchange, plan:\n${p.take(1200)}")
  }

  test("ev_gap_fill: raw events materialized once; grid/join/fill run over the aggregate") {
    val p = planOf("ev_gap_fill")
    assert(p.contains("Window"), p.take(1200))
    // Zero parquet scans in the final plan: the hourly aggregate is
    // lineage-cut, so the grid derivation and the left join both read
    // the materialized types×hours frame — without the cut this plan
    // held TWO raw-event scans (one under each consumer).
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 0, s"expected 0 raw scans, got $scans:\n${p.take(1500)}")
  }

  test("q_triangles: wedge stream is bloom-pruned before the closing join") {
    val p = planOf("q_triangles")
    assert(p.contains("might_contain"), p.take(1500))
  }

  test("q_pivot: partial+final aggregate, no Expand (conditional agg, not pivot op)") {
    val p = planOf("q_pivot")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Expand"), "pivot must not expand rows")
  }

  test("q_grouping_sets: one Expand + one aggregate pass for both sets") {
    val p = planOf("q_grouping_sets")
    assert(p.contains("Expand"))
    val exchanges = countNodes(p, "Exchange")
    assert(exchanges == 1, s"both grouping sets must aggregate in one pass, plan:\n${p.take(1200)}")
  }

  test("ev_first_touch: rank filter lowers to map-side WindowGroupLimit") {
    val p = planOf("ev_first_touch")
    // Partial WindowGroupLimit before the Exchange means each input split
    // forwards at most one row per key — the 100 TB top-1 shape.
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("tx_domain_quota: per-source cap lowers to map-side WindowGroupLimit") {
    val p = planOf("tx_domain_quota")
    // The window shuffle must carry O(sources x N) rows, not the corpus:
    // a partial WindowGroupLimit ahead of the Exchange is the proof.
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("src_partitioned_pruning: lang predicate prunes partitions, not rows") {
    val p = planOf("src_partitioned_pruning")
    val pf = p.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("lang") && pf.contains("IN (en,fr)"), s"got: $pf")
  }

  test("src_v2_scan: pushdown + pruning survive the format(\"graft\") DSv2 face") {
    val p = planOf("src_v2_scan")
    assert(p.contains("BatchScan graft:"), p.take(800))
    assert(p.contains("GreaterThan(c_acctbal"),
      "acctbal predicate must reach PushedFilters through the custom format")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("c_custkey") && !readSchema.contains("c_address"),
      s"read schema not pruned through the DSv2 face: $readSchema")
  }

  test("q_dpp_prune: runtime dynamic partition pruning planted on the fact scan") {
    val p = planOf("q_dpp_prune")
    assert(p.contains("dynamicpruning"),
      "expected a dynamicpruning subquery in the fact's PartitionFilters\n" + p.take(1200))
  }

  test("f8_fuzzy_match: blocked equi join, never a cartesian distance scan") {
    val p = planOf("f8_fuzzy_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "fuzzy match must block on the equi key before running edit distance")
    assert(p.contains("Join") || p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("engine semi joins: traversal uses LeftSemi joins, no cartesian") {
    val p = planOf("s3_fk_membership")
    assert(p.contains("LeftSemi"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q4_priority_exists: the EXISTS lowers to a LeftSemi join") {
    val p = planOf("q4_priority_exists")
    assert(p.contains("LeftSemi"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("src_upsert_merge: base anti-joins the broadcast delta keys — no base shuffle") {
    val p = planOf("src_upsert_merge")
    assert(p.contains("BroadcastHashJoin LeftAnti"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the 100 TB base must never shuffle for an upsert merge")
  }

  test("src_merge_cdc: base anti-joins the broadcast touched keys — no base shuffle") {
    val p = planOf("src_merge_cdc")
    assert(p.contains("BroadcastHashJoin LeftAnti"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the 100 TB base must never shuffle for a CDC merge")
  }

  test("a3_skew_agg: two aggregate levels, salt fans the first exchange out") {
    val p = planOf("a3_skew_agg")
    // partial+final for each of the two groupBys = 4 HashAggregates.
    assert(countNodes(p, "HashAggregate") == 4, p.take(1200))
    assert(p.contains("__salt") || p.contains("pmod"), "salted key missing from plan")
  }

  test("tx_line_dedup and tx_keywords: shuffle joins only, never cartesian") {
    Seq("tx_line_dedup", "tx_keywords").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n plan has a non-equi join")
    }
  }

  test("tx_pii_scrub: pure per-row work — zero exchanges") {
    val p = planOf("tx_pii_scrub")
    assert(countNodes(p, "Exchange") == 0, p.take(1200))
  }

  test("q18: the qty_cents filter runs below the joins (aggregate-then-join)") {
    // The qty_cents filter must sit below the joins — never above them
    // (joining the full lineitem agg output and filtering later would
    // shuffle every order key at 100 TB). In the tree-string plan a
    // parent prints BEFORE its children, so "filter below join" means
    // the filter LINE comes after the first join line.
    val p = SparkEntry.queries("q18_big_orders")(spark, sf)
      .queryExecution.executedPlan.toString
    val lines = p.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("Join"))
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("qty_cents"))
    assert(joinIdx >= 0, s"no join in plan:\n${p.take(600)}")
    assert(filterIdx > joinIdx,
      s"qty_cents filter must be BELOW the joins (filter@$filterIdx, join@$joinIdx):\n${p.take(1200)}")
  }

  test("q16: count(DISTINCT) plans as two-phase expand/partial aggregation") {
    val p = planOf("q16_brand_suppliers")
    // Catalyst's distinct-aggregate rewrite: >= 3 HashAggregate levels
    // (partial-distinct, merge, final) — never a per-group row collection.
    assert(countNodes(p, "HashAggregate") >= 3, p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q21: the EXISTS chain lowers to LeftSemi + LeftAnti, id-only") {
    val p = planOf("q21_supplier_chain")
    assert(p.contains("LeftSemi"), "multi-supplier EXISTS must be a semi join")
    assert(p.contains("LeftAnti"), "sole-late NOT EXISTS must be an anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q22: the per-nation aggregate broadcasts back to the row side") {
    val p = planOf("q22_above_nation_avg")
    // TWO broadcasts required: the tiny nation table auto-broadcasts
    // regardless, so >= 1 would pass even if the nav (group-average) side
    // regressed to a shuffle — the guarded property is that BOTH small
    // sides broadcast and the customer rows are never re-exchanged.
    assert(countNodes(p, "BroadcastExchange") >= 2,
      "both the nav aggregate and the nation dim must broadcast")
  }

  test("q_bloom_prune: explicit might_contain evaluates at the fact scan") {
    val p = planOf("q_bloom_prune")
    // The operator's whole point is WHERE the predicate runs: on the
    // orders scan, before any join/shuffle — not as a post-join filter.
    val scanBlock = p.split("""\(\d+\) Scan parquet""").find(_.contains("o_orderkey"))
    assert(scanBlock.exists(_.contains("might_contain")),
      "bloom predicate must sit on the fact scan:\n" + p.take(1200))
  }

  test("tx_bm25: top-k is TakeOrderedAndProject, not a global sort") {
    // Pin the COMPUTE plan: the registered query serves the session-
    // materialized ranking (a plain artifact scan), so the shape worth
    // pinning is the one the materialization runs once.
    val df = graft.queries.PipelineOps.bm25Compute(spark, sf)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val p = out.toString
    assert(countNodes(p, "TakeOrderedAndProject") == 1, p.take(1500))
    // The only Sort allowed is the 10-row window's; a full-width Sort
    // before the limit would mean the top-k shuffled the whole corpus.
    // Negative lookahead: "(7) SortMergeJoin"/"SortAggregate" are NOT
    // Sorts, and a join-strategy flip must not trip this pin.
    assert(countNodes(p, "Sort(?!MergeJoin|Aggregate)") <= 1, p.take(1500))
  }

  test("src_scd2_merge: base is split map-side by broadcast semi/anti joins") {
    val p = planOf("src_scd2_merge")
    // The history merge must never shuffle the base: the delta keys ride
    // broadcasts into one anti (unchanged) + two semi (closed, opened)
    // probes. Any SortMergeJoin here means the 100 TB side shuffled.
    // (Tree-section matches: the numbered detail list drops join types.)
    def treeCount(s: String) = s.r.findAllMatchIn(p).size
    assert(treeCount("BroadcastHashJoin LeftAnti") == 1, p.take(1500))
    assert(treeCount("BroadcastHashJoin LeftSemi") == 2, p.take(1500))
    assert(treeCount("SortMergeJoin") == 0, p.take(1500))
    assert(treeCount("Exchange hashpartitioning") == 0, p.take(1500))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    import org.apache.spark.sql.functions._
    // At 100 TB the big win on a selective dim-filter join is Spark's
    // runtime BLOOM FILTER: the filtered dim side builds a bloom filter
    // whose might_contain() is injected into the fact scan, dropping
    // non-joining fact rows BEFORE the shuffle. Local datasets sit under
    // the application-side size threshold, so lower it to observe the
    // plan Spark would pick at scale; broadcast is disabled to force the
    // shuffle join the filter exists for.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
      val joined = Tables.lineitem(spark, sf)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact scan:\n${p.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ev_asof_skew: 3 exchanges (hot-count + two merge sides), 1 broadcast reused, 1 salt explode") {
    // Counted on the EXECUTED adaptive plan: exchange reuse is an AQE
    // runtime decision, so the pre-execution formatted plan still shows
    // the hot-key subtree twice.
    val df = SparkEntry.queries("ev_asof_skew")(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case o => o +: o.children.flatMap(expand)
    }
    val nodes = expand(df.queryExecution.executedPlan)
    def n(pred: SparkPlan => Boolean) = nodes.count(pred)
    assert(n(_.isInstanceOf[graft.plans.ShuffleAsOfJoinExec]) == 1)
    // Hot-key count aggregate + the merge's two cluster exchanges — any
    // fourth shuffle means the salting started re-shuffling something.
    assert(n(_.isInstanceOf[ShuffleExchangeExec]) == 3,
      s"expected exactly 3 shuffles:\n${nodes.map(_.nodeName).mkString(", ")}")
    // ONE broadcast of the hot-key set, REUSED by the second side's screen.
    assert(n(_.isInstanceOf[BroadcastExchangeExec]) == 1,
      nodes.map(_.nodeName).mkString(", "))
    assert(n(_.isInstanceOf[ReusedExchangeExec]) == 1,
      nodes.map(_.nodeName).mkString(", "))
    assert(n(_.nodeName == "Generate") == 1)
  }

  test("q2/q17: correlated scalar subqueries decorrelate into aggregate " +
       "joins — no subquery expression survives, no nested-loop join") {
    for (name <- Seq("q2_min_cost_supplier", "q17_small_qty")) {
      val df = SparkEntry.queries(name)(spark, sf)
      // Decorrelation is an optimizer rewrite: the OPTIMIZED plan must
      // carry no scalar-subquery expression (a surviving one would mean
      // per-outer-row re-execution) and must contain the Aggregate the
      // rewrite introduces for the correlated aggregate.
      val opt = df.queryExecution.optimizedPlan
      val optStr = opt.toString
      assert(!optStr.contains("scalar-subquery"),
        s"$name: correlated subquery not decorrelated:\n" + optStr.take(1500))
      assert(opt.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size >= 2, s"$name: expected the decorrelated per-key aggregate")
      // Physical: hash/merge joins only. A BroadcastNestedLoopJoin or
      // CartesianProduct here would be the O(n·m) shape decorrelation
      // exists to avoid.
      val phys = {
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
        out.toString
      }
      assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
        s"$name: nested-loop shape in physical plan:\n" + phys.take(1500))
    }
  }

  test("q20: nested IN chain lowers to left-semi joins — no nested loop, " +
       "no per-row subquery") {
    val df = SparkEntry.queries("q20_part_suppliers")(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val semis = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.size >= 2,
      s"expected both INs as semi joins:\n${opt.toString.take(1200)}")
    val phys = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
      out.toString
    }
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      phys.take(1200))
  }

  test("q6: every pushable predicate reaches the lineitem scan") {
    val p = planOf("q6_forecast_revenue")
    // The shipdate band and quantity bound are plain column comparisons —
    // they must appear in PushedFilters (row-group pruning at 100 TB);
    // the basis-point discount band wraps the column in round() so it
    // legitimately stays a post-scan filter.
    assert(p.contains("PushedFilters:"), p.take(800))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      s"q6 scan filters not pushed: $pushed")
    // Single-table agg: the only exchange is the partial/final agg pair's.
    assert(countNodes(p, "Exchange") <= 1, p.take(1200))
  }

  test("q19: the disjunctive predicate keeps the equi join — no nested " +
       "loop, and the join key is extracted from the OR-of-ANDs") {
    val p = planOf("q19_disjunctive_revenue")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q19 degenerated to a nested loop:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(800))
  }

  test("q11/q12: scalar-subquery threshold and interval lateness stay " +
       "hash-join shapes — no per-row re-execution, no nested loop") {
    for (name <- Seq("q11_important_stock", "q12_late_lines")) {
      val p = planOf(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name: nested-loop shape:\n" + p.take(1200))
    }
  }

  test("q13: the distribution partitions every customer exactly once") {
    val rows = SparkEntry.queries("q13_customer_distribution")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.values.sum == nCust, "distribution must partition all customers")
  }

  test("pipe_embed_contamination: the cross join is the DELIBERATE bounded-" +
       "broadcast shape — bench side broadcast, no shuffle feeds the join") {
    val p = planOf("pipe_embed_contamination")
    // No equi key exists (every candidate scores every benchmark vector),
    // so BroadcastNestedLoopJoin with the BOUNDED benchmark side broadcast
    // is the correct plan — the corpus side streams through it map-side;
    // the only exchange is the per-doc max aggregate's.
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(countNodes(p, "Exchange") <= 2, // partial/final agg only
      "corpus side must not shuffle for the join:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }
}

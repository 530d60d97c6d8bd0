package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over the relational schema: PageRank on the
  * customer↔supplier trade graph (edges = distinct (customer, supplier)
  * pairs that share a lineitem, both directions, so every node with an
  * edge has out-degree ≥ 1 and the walk has no dangling mass).
  *
  * The rank arithmetic is INTEGER fixed-point (ranks scaled by 10^12,
  * damping 0.85 as ×17 div 20, per-edge contribution r div deg): every
  * operation is an exact integer op with identical truncation semantics
  * in Spark (`div`) and DuckDB (`//`), so a float summation-order
  * divergence cannot exist and the oracle compares rank values EXACTLY
  * after [[PageRankIters]] rounds — the same determinism discipline as
  * the integer-exact k-means. (Float PageRank would need a tolerance gate:
  * groupBy sum order is nondeterministic.)
  *
  * Scale shape: one shuffle per iteration (groupBy dst), edges/degrees
  * computed once and reused, rank state lineage-cut per round — the
  * standard Pregel-without-Pregel loop. At 100 TB graph scale the only
  * adjustment is the scale constant: with ~10^9+ nodes the ×17 hub sums
  * approach int64, so drop the fixed-point scale to 10^10 or move the
  * sum to DECIMAL(38,0) — both stay exact.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed iteration count (unrolled in the oracle SQL). */
  val PageRankIters = 5

  /** Fixed-point scale: ranks start at 10^12. */
  val PageRankScale = 1000000000000L

  /** Bucket fan-out of the shared edge table (matches the session's
    * shuffle partitioning so the non-bucketed join side lands in the
    * same layout). */
  val EdgeBuckets = 32

  /** The shared trade graph: SYMMETRIC (src, dst, deg) — out-degree
    * pre-joined — materialized ONCE per (session, corpus) and written
    * `bucketBy(src)`. Node namespace: customer = 2k, supplier = 2k+1.
    *
    * Every iterative consumer (pagerank, bfs, label_prop, kcore,
    * modularity) joins this frame on `src` once per ROUND; from a plain
    * materialized parquet each of those joins re-shuffles all m edges
    * every iteration, which is the dominant cost of the whole family
    * (~22 s of the sf0.1 bench). The bucketed layout pays that shuffle
    * exactly once at write time: the scan reports hash-clustered-by-src
    * output, so per-round joins plan with NO exchange below the edge
    * side (GraphSpec pins this) and only the node-sized rank/label/
    * frontier frame moves — the production answer at 100 TB graph
    * scale, where the edge table lands bucketed once per corpus
    * delivery and every downstream traversal inherits the layout.
    * Degree is pre-joined here for the same reason: it is a per-round
    * constant consumed by pagerank (contribution = r div deg), kcore
    * (initial alive set) and modularity (degree sums), and computing it
    * inside the bucketed block is itself exchange-free-adjacent (one
    * hash agg over the pre-shuffled pairs).
    */
  private[graft] def edgesOf(s: SparkSession, d: String): DataFrame =
    graft.core.Materialize.onceBucketed(
        s, s"graph_edges_deg:$d", EdgeBuckets, "src") {
      // The directed pair set lands as plain parquet FIRST: the bucketed
      // plan below references the symmetric edge frame twice (rows +
      // degree), i.e. the pair subplan four times — from a materialized
      // scan those are cheap re-reads, while inlining the
      // lineitem⋈orders distinct here would recompute the most
      // expensive stage per reference (measured +2 s on the family's
      // first consumer).
      val e0 = graft.core.Materialize.once(s, s"graph_edges:$d") {
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
      }
      val e = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
    }

  private val pagerank: Q = (s, d) => {
    // (src, dst, deg) from the bucketed shared table: the per-round rank
    // join plans with NO exchange below the edge side (degree was
    // pre-joined at materialization — a per-round constant), so each
    // iteration moves only the node-sized rank frame plus the groupBy(dst)
    // redistribution that IS the algorithm.
    //
    // Per-round cuts are LAZY (round-13; guide §2.4, the BPE cutLazy
    // move): pagerank runs NO mid-loop action — the caller's single final
    // action is what materializes every round, each round's blocks
    // persisting as a side effect of the next round's stages — so an
    // eager per-round checkpoint was one pure-overhead materialization
    // job per iteration. The mid-loop release(prev) goes with it: a lazy
    // cut's blocks must not be unpersisted before they materialize
    // (truncated lineage cannot recompute), and the superseded rounds are
    // node-sized frames reclaimed right after the query by the harness
    // (one query per JVM in production; reliable-checkpoint clusters fall
    // back to eager cuts inside cutLazy, where files — not executor
    // blocks — hold the state, and release was a no-op there anyway).
    val ewd = edgesOf(s, d)
    val base = PageRankScale * 3 / 20 // (1-d)·scale, exact: 15e10
    var r = ewd.select(col("src").as("node")).distinct()
      .select(col("node"), lit(PageRankScale).as("r"))
    for (_ <- 1 to PageRankIters) {
      val prev = r
      r = graft.core.Lineage.cutLazy(
        ewd.join(prev, col("src") === col("node"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy(col("dst"))
          .agg((lit(base) + expr("(17 * sum(c)) div 20")).as("r"))
          .select(col("dst").as("node"), col("r")))
    }
    r.select(col("node"), col("r").as("rank_e12"))
  }

  /** Triangle counting with DEGREE-ORDERED orientation — the classic
    * bound that makes distributed triangle enumeration feasible: orient
    * every edge from its lower-(degree, id) endpoint to the higher, so
    * wedges are enumerated only at each edge's LOW-rank endpoint and the
    * total wedge work is O(Σ_v d⁺(v)²) = O(m^1.5) instead of Σ d(v)²,
    * which a hub node would blow up (a 10⁶-degree hub contributes 10¹²
    * unordered wedges but its oriented out-degree is bounded by O(√m)).
    * Each triangle is counted exactly once (its rank-minimal corner).
    *
    * Graph: customers co-purchasing from the same supplier in the same
    * week — the (supplier, week) blocking keeps the pair generation
    * bounded per bucket, the same discipline as the LSH band buckets
    * (a hot bucket at 100 TB takes the same cap-or-salt remedies).
    * Output: per-customer triangle participation counts (each triangle
    * credits its three corners), the local-clustering numerator.
    */
  private val triangles: Q = (s, d) => {
    val co = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s"),
        date_trunc("week", col("o_orderdate")).as("w"),
        col("o_custkey").as("c"))
      .distinct()
    // Cut the reused frames once: `e` feeds both the degree count and the
    // orientation joins, and `oriented` appears THREE times in the
    // triangle plan (two wedge legs + the closing edge) — without the
    // cuts each consumer would re-run the (supplier, week) self-join, the
    // heaviest stage (same hoist-the-invariant move as pagerank's ewd).
    // `e` cuts via cutCounted: the count job doubles as its materializer
    // (round-13, guide §2.4 — replacing the eager checkpoint job), and
    // the edge count it returns SIZES THE BLOOM below. `oriented` cuts
    // LAZILY: the first action this query runs is BloomPrune's
    // filter-build aggregate — a global agg over `closing` ⊂ oriented —
    // so that one already-required job materializes it. release(e) sits
    // below the bloom build (truncated lineage cannot recompute
    // unpersisted-before-materialization blocks).
    val (e, nEdges) = graft.core.Lineage.cutCounted(co.toDF("s", "w", "c1")
      .join(co.toDF("s", "w", "c2"), Seq("s", "w"))
      .where(col("c1") < col("c2"))
      .select(col("c1"), col("c2")).distinct())
    val deg = e.select(col("c1").as("n")).unionByName(e.select(col("c2").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val lowerIsC1 = col("dg1") < col("dg2") ||
      (col("dg1") === col("dg2") && col("c1") < col("c2"))
    val oriented = graft.core.Lineage.cutLazy(e
      .join(deg.toDF("c1", "dg1"), Seq("c1"))
      .join(deg.toDF("c2", "dg2"), Seq("c2"))
      .select(
        when(lowerIsC1, col("c1")).otherwise(col("c2")).as("u"),
        when(lowerIsC1, col("c2")).otherwise(col("c1")).as("v"),
        when(lowerIsC1, col("dg2")).otherwise(col("dg1")).as("dv")))
    // Wedge at the low corner, ordered so (v, w) is itself oriented; the
    // closing join then only needs equality.
    val wedge = oriented.toDF("u", "v", "dv")
      .join(oriented.toDF("u", "w", "dw"), Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    // Only ~3% of wedges close into triangles (measured at sf0.1:
    // 391k of 13.2M) but ALL of them would enter the closing join's
    // shuffle — exactly BloomPrune's across-a-custom-shape use case: one
    // pass over the (checkpointed) edge set builds the bloom, the wedge
    // stream drops non-members inside the same codegen stage that
    // produced it, and the ~30x-smaller survivor set shuffles into the
    // exact join (superset semantics — the join supplies exactness).
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    // expectedKeys = the EXACT oriented-edge count (|closing| = |e|, known
    // from e's materializing count — no extra job): the round-13 sf1
    // ScaleProbe caught the default 1M-key bloom SATURATING at 10× scale
    // (fpp → 1, wedge shuffle 24× for 10× data instead of ~10×). Sized
    // from the data, the filter stays at its design ~3% fpp at any SF —
    // ~7.3 bits/edge, so 10⁸ edges ≈ 91 MB of bloom, inside broadcast
    // bounds; far beyond that, raise fpp or shard the filter per tenant
    // (the guide §3.2 sizing trade).
    val wedgePruned = graft.operators.BloomPrune.filterBy(
      wedge, struct(col("v"), col("w")), closing, struct(col("v"), col("w")),
      expectedKeys = math.max(nEdges, 1L))
    // The bloom build above ran the query's first action — e and oriented
    // are materialized now; e's blocks are dead weight (every later
    // reference reads oriented).
    graft.core.Lineage.release(e)
    val tri = wedgePruned.join(closing, Seq("v", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("cust"))
      .groupBy("cust").agg(count(lit(1)).as("n_tri"))
  }

  /** Hop cap for [[bfs]] (unrolled in the oracle; covers the trade
    * graph's small diameter at every test SF). */
  val BfsMaxHops = 6

  /** Source node: customer 1 (node id 2 in the 2k/2k+1 namespace). */
  val BfsSource = 2L

  /** Level rows below which [[bfs]] broadcasts a level frame into the
    * per-hop joins (one bigint column — 4M rows ≈ 32 MB, far inside the
    * 8 GB broadcast hard cap). Every level's row count is already known
    * EXACTLY (cutCounted materializes it), so the decision costs
    * nothing and cannot mis-estimate; above the bound the level falls
    * back to a shuffled join of its own size — never of the
    * accumulated reach. */
  val BfsLevelBroadcastRows = 4L * 1000 * 1000

  /** Bounded BFS hop distance from one node over the trade graph — the
    * third iterative pattern next to pagerank's full relaxation and the
    * dedup components' star contraction: a FRONTIER loop. Each hop
    * expands only the newly-reached nodes (join frontier → edges,
    * distinct) and stops early when the frontier drains (graph diameter,
    * not the hop cap, is the usual terminator). Distances are exact
    * smallest hop counts — no tie-break surface.
    *
    * Settled-set subtraction uses the BFS LEVEL INVARIANT instead of an
    * ever-growing dist frame: a neighbor of a dist-(h−1) node has dist
    * ∈ {h−2, h−1, h} (dist < h−2 would give the frontier node a path
    * shorter than h−1), so anti-joining the candidate set against ONLY
    * the two previous levels is a complete settled check. Per hop that
    * is constant work in the frontier's size — each level participates
    * in exactly two later hops and then never moves again, total
    * anti-join volume O(2·reached) across the whole run, vs the
    * round-7 shape that rebuilt and RE-SHUFFLED the accumulated dist
    * union into every hop (O(diameter · reached)). Levels below
    * [[BfsLevelBroadcastRows]] (known exactly — no estimator) broadcast
    * into both the edge join and the anti-joins, making the common hop
    * a SINGLE shuffle (the candidate distinct, which IS the algorithm)
    * over the exchange-free bucketed edge scan; a 100 TB-scale frontier
    * past the bound degrades to shuffled joins of the LEVEL's size,
    * never the accumulated reach. O(diameter) rounds, per-round cost
    * proportional to the frontier's edge boundary — the textbook Pregel
    * BFS with the settled check kept O(1) frames per hop.
    */
  private val bfs: Q = (s, d) => {
    // Bucketed scan (projection keeps the src clustering): per-hop
    // frontier joins need no exchange on the edge side.
    val edges = edgesOf(s, d).select(col("src"), col("dst"))
    // levels(h) = the (node, rows) set at exact hop distance h, each a
    // lineage-cut frame with its exact row count.
    var levels = Vector((graft.core.Lineage.cut(
      s.range(1).select(lit(BfsSource).as("node"))), 1L))
    def sized(l: (DataFrame, Long)): DataFrame =
      if (l._2 <= BfsLevelBroadcastRows) broadcast(l._1) else l._1
    var hop = 1
    var done = false
    while (hop <= BfsMaxHops && !done) {
      val fr = sized(levels(hop - 1))
      var cand = edges.join(fr, edges("src") === fr("node"))
        .select(col("dst").as("node")).distinct()
        .join(sized(levels(hop - 1)), Seq("node"), "left_anti")
      if (hop >= 2)
        cand = cand.join(sized(levels(hop - 2)), Seq("node"), "left_anti")
      val (next, n) = graft.core.Lineage.cutCounted(cand)
      if (n == 0) { done = true; graft.core.Lineage.release(next) }
      else { levels = levels :+ (next, n); hop += 1 }
    }
    levels.zipWithIndex
      .map { case ((l, _), h) => l.select(col("node"), lit(h).as("dist")) }
      .reduce(_ unionByName _)
  }

  /** Synchronous rounds for [[labelProp]] (unrolled in the oracle). */
  val LpaRounds = 3

  /** Label propagation community detection — synchronous variant with a
    * TOTAL tie order, because the textbook asynchronous LPA (random
    * visit order, random tie coin) is exactly what a distributed
    * reproducible pipeline cannot ship: labels init to node id; each
    * round every node adopts the most frequent neighbor label, ties to
    * the smallest label; [[LpaRounds]] fixed rounds. Deterministic by
    * construction (integer counts, total order), so the oracle unrolls
    * the same rounds and compares exactly — the q_pagerank discipline
    * applied to community detection. Per round: one join + two hash
    * aggregates (the argmax is a min over (−count, label) structs,
    * map-side combinable), label state lineage-cut — the same
    * Pregel-without-Pregel loop as pagerank.
    */
  private val labelProp: Q = (s, d) => lpaLabels(s, d)

  /** LPA labels, materialized once per (session, corpus): q_label_prop
    * and q_modularity consume the same label frame, and the 3-round loop
    * is the expensive half of each. The edge cut lives INSIDE the
    * memoized block so a cache hit runs no Spark job at all (an eager
    * cut before the cache check would materialize the full edge table
    * only to throw it away), and the final-round label cut is released
    * once the parquet write has consumed it — Materialize.once writes
    * before returning, so by the time the handle is visible here the
    * blocks are dead weight. */
  private def lpaLabels(s: SparkSession, d: String): DataFrame = {
    var lastCut: Option[DataFrame] = None
    val out = graft.core.Materialize.once(s, s"lpa_labels:$d") {
      // The bucketed edge scan needs no lineage cut of its own (it IS a
      // materialized artifact), and each LPA round's src join consumes
      // its clustering exchange-free.
      val labels = lpaLabelsOf(edgesOf(s, d).select(col("src"), col("dst")))
      lastCut = Some(labels)
      labels
    }
    // Runs only on the computing call (cache hits never set it).
    lastCut.foreach(graft.core.Lineage.release)
    out
  }

  /** The LPA round loop over an already-cut symmetric edge frame; the
    * returned label frame is materialized (cut on the final round), so
    * callers may release `edges` afterwards. Shared by q_label_prop and
    * q_modularity so the community definition cannot drift. */
  def lpaLabelsOf(edges: DataFrame): DataFrame = lpaLabelsWithRounds(edges)._1

  /** [[lpaLabelsOf]] plus the number of rounds actually executed —
    * synchronous LPA is a fixpoint iteration, so once a round changes
    * ZERO labels every further round is a no-op on the same input and
    * the loop may exit with bit-identical output (the unrolled-round
    * oracle still matches by construction). The change count is exact
    * (a node-keyed join of two already-materialized label frames — the
    * q_kcore monotone early-stop discipline), and it is checked only
    * between rounds: the final round never pays for a count it cannot
    * act on. At scale this converts "rounds × shuffles always" into
    * "rounds-until-convergence × shuffles", which for the many corpora
    * that settle in 1-2 rounds halves the family's cost.
    */
  def lpaLabelsWithRounds(edges: DataFrame): (DataFrame, Int) = {
    // Round-13 job fusion (guide §2.4, the cutCounted/cutLazy discipline):
    // every round that is FOLLOWED by a convergence count cuts LAZILY —
    // the count job over labels⋈prev computes every partition of the new
    // label frame, so it doubles as the materializer and the eager
    // per-round checkpoint job disappears (2 jobs/round → 1). The initial
    // frame is lazy for the same reason (round 1's count reads it via
    // prev). Only the FINAL round keeps the eager cut: no count follows
    // it, and release(prev) below must not run while a still-lazy frame's
    // lineage references prev's (truncated, hence unrecomputable) blocks.
    var labels = graft.core.Lineage.cutLazy(
      edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")))
    var rounds = 0
    var converged = false
    while (rounds < LpaRounds && !converged) {
      val prev = labels
      val next = edges.join(prev, col("src") === col("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("negcnt"), col("label"))).as("best"))
        .select(col("dst").as("node"), col("best.label").as("label"))
      rounds += 1
      if (rounds < LpaRounds) {
        labels = graft.core.Lineage.cutLazy(next)
        // Both sides are cut (materialized) frames of (node, label): the
        // diff count replays no round work — and it is the action that
        // materializes this round's lazy cut (and, in round 1, the lazy
        // initial frame read through prev).
        val changed = labels.as("a")
          .join(prev.as("b"), col("a.node") === col("b.node"))
          .where(col("a.label") =!= col("b.label")).count()
        converged = changed == 0L
      } else {
        labels = graft.core.Lineage.cut(next)
      }
      graft.core.Lineage.release(prev)
    }
    (labels, rounds)
  }

  /** Community-quality metrics (the per-community ingredients of Newman
    * modularity) over the LPA communities — the evaluation step a
    * community-detection pipeline runs on its own output: per community,
    * node count, intra-community directed edge count and degree sum.
    * Modularity is then Σ_c (intra_c·m2 − degree_sum_c²)/m2² with
    * m2 = total directed edges — every term an exact integer here, so
    * the oracle compares values exactly (the q_pagerank discipline:
    * no float accumulation anywhere). Shapes: two node-keyed label
    * joins onto the edge list + three hash aggregates; at 100 TB the
    * label frame co-shuffles with edges on node id — no broadcast
    * assumption, no skew surface beyond a hub community's single
    * aggregate row.
    */
  private val modularity: Q = (s, d) => {
    val ewd = edgesOf(s, d) // bucketed (src, dst, deg) scan — no cut needed
    val labels = lpaLabels(s, d)
    val intra = ewd
      .join(labels.select(col("node").as("src"), col("label").as("community")), Seq("src"))
      .join(labels.select(col("node").as("dst"), col("label").as("dst_label")), Seq("dst"))
      .where(col("community") === col("dst_label"))
      .groupBy(col("community")).agg(count(lit(1)).as("intra_edges"))
    // Degree was pre-joined at edge materialization; one row per node
    // falls out of a distinct over (src, deg), which the src clustering
    // satisfies without an exchange.
    val deg = ewd.select(col("src"), col("deg")).distinct()
    val byComm = labels
      .join(deg.select(col("src").as("node"), col("deg")), Seq("node"))
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    byComm.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"))
  }

  /** Peel threshold and bounded round count for [[kcore]]. */
  val KcoreK = 10
  val KcoreRounds = 8

  /** k-core decomposition (bounded peeling): repeatedly remove nodes of
    * degree < K in the SURVIVING subgraph; what remains after
    * [[KcoreRounds]] rounds is (a bounded-round approximation of) the
    * K-core — the standard densest-region screen (spam/bot rings, "core"
    * community extraction). Bounded rounds are the q_pagerank /
    * q_label_prop determinism discipline: both engines run the SAME fixed
    * round count, so results match exactly whether or not peeling has
    * converged — and because peeling is monotone (rounds after the
    * fixpoint are no-ops) the Spark loop may still early-stop when a
    * round removes nothing without diverging from the unrolled oracle.
    * Per round: membership semi-join on both endpoints + one count
    * aggregate — shuffle keys are node ids, state is one id column,
    * lineage-cut per round. Output: surviving nodes + their final
    * in-subgraph degree.
    */
  private val kcore: Q = (s, d) =>
    kcoreOf(edgesOf(s, d).select(col("src"), col("dst")), KcoreK,
      materialized = true)

  /** Frame-parameterized peeling (specs plant cascade graphs). `edgesIn`
    * must be symmetric (both directions present). `materialized = true`
    * skips the defensive lineage cut — pass it when `edgesIn` is already
    * a durable scan (the bucketed shared table), whose src clustering
    * the initial degree count then consumes exchange-free.
    *
    * FRONTIER formulation — the naive per-round recount joins the FULL
    * edge table against the membership twice every round (8 × O(m) semi
    * joins; measured 5 s at sf0.1); instead, maintain (node, deg) where
    * deg is the degree WITHIN the current survivor set, and per round
    * subtract only the edges incident to the just-removed frontier. After
    * round one the per-round cost is proportional to the frontier's edge
    * boundary — the cascade's actual size — not the graph. Synchronous
    * equivalence: the round-t frontier is exactly the set the naive
    * formulation removes in round t, so the unrolled recount oracle
    * matches round for round.
    */
  def kcoreOf(edgesIn: DataFrame, k: Int,
      materialized: Boolean = false): DataFrame = {
    val edges = if (materialized) edgesIn else graft.core.Lineage.cut(edgesIn)
    // Round-13 job fusion (guide §2.4): the per-round (node, deg) state
    // cuts LAZILY — the frontier's cutCounted count scans every partition
    // of it (the deg<k filter is narrow), so that one job materializes
    // both frames and the eager alive-checkpoint job disappears (2
    // jobs/round → 1). The superseded alive/frontier releases move BELOW
    // the count: a lazy cut's blocks must be materialized before the
    // frames its lineage references are unpersisted (truncated lineage
    // cannot recompute).
    var alive = graft.core.Lineage.cutLazy(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")))
    var (frontier, nFrontier) = graft.core.Lineage.cutCounted(
      alive.where(col("deg") < k).select("node"))
    var round = 0
    while (round < KcoreRounds && nFrontier > 0) {
      val dec = edges
        .join(frontier.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("dec"))
        .select(col("src").as("node"), col("dec"))
      val nextAlive = graft.core.Lineage.cutLazy(
        alive.join(frontier, Seq("node"), "left_anti")
          .join(dec, Seq("node"), "left")
          .select(col("node"),
            (col("deg") - coalesce(col("dec"), lit(0L))).as("deg")))
      val (f, n) = graft.core.Lineage.cutCounted(
        nextAlive.where(col("deg") < k).select("node"))
      graft.core.Lineage.release(alive)
      graft.core.Lineage.release(frontier)
      alive = nextAlive
      frontier = f
      nFrontier = n
      round += 1
    }
    // deg tracks the survivor-induced degree throughout, so `alive` IS
    // the answer (already materialized — safe to release edges). The
    // deg>0 filter mirrors the oracle's final recount, which emits no
    // row for a not-yet-peeled node whose surviving degree hit zero
    // (only reachable on a round-limit exit; at convergence deg ≥ k).
    graft.core.Lineage.release(edges)
    graft.core.Lineage.release(frontier)
    alive.where(col("deg") > 0)
  }

  val queries: Map[String, Q] = Map(
    "q_pagerank" -> pagerank,
    "q_triangles" -> triangles,
    "q_bfs" -> bfs,
    "q_kcore" -> kcore,
    "q_label_prop" -> labelProp,
    "q_modularity" -> modularity)

  private def iterSql(i: Int): String =
    s"""r$i AS MATERIALIZED (
       |  SELECT e.dst AS node,
       |    CAST(${PageRankScale * 3 / 20} + (17 * sum(r.r // d.deg)) // 20 AS BIGINT) AS r
       |  FROM edges e
       |  JOIN deg d ON d.src = e.src
       |  JOIN r${i - 1} r ON e.src = r.node
       |  GROUP BY 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pagerank" -> {
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |deg AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
         |r0 AS MATERIALIZED (
         |  SELECT src AS node, CAST(${PageRankScale} AS BIGINT) AS r FROM deg),
         |${(1 to PageRankIters).map(iterSql).mkString(",\n")}
         |SELECT node, r AS rank_e12 FROM r$PageRankIters""".stripMargin
    },
    // Orientation-free mirror: canonical c1<c2 edges, triangles as
    // x<y<z 3-joins — any total order counts each triangle exactly once,
    // so the id order here and the engine's (degree, id) order agree on
    // the SET of triangles and hence on every per-corner count.
    "q_triangles" ->
      """WITH co AS (SELECT DISTINCT l_suppkey AS s,
        |    date_trunc('week', o_orderdate) AS w, o_custkey AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS MATERIALIZED (SELECT DISTINCT a.c AS c1, b.c AS c2
        |  FROM co a JOIN co b ON a.s = b.s AND a.w = b.w AND a.c < b.c),
        |tri AS (SELECT e1.c1 AS x, e1.c2 AS y, e2.c2 AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.c1 = e2.c1 AND e1.c2 < e2.c2
        |  JOIN e e3 ON e3.c1 = e1.c2 AND e3.c2 = e2.c2)
        |SELECT cust, CAST(count(*) AS BIGINT) AS n_tri
        |FROM (SELECT unnest([x, y, z]) AS cust FROM tri)
        |GROUP BY 1""".stripMargin,
    // Unrolled k-step-walk levels: a node at hop distance k has a k-walk
    // (appears in r_k) and no shorter walk (absent from every earlier
    // level), so min-over-levels IS the BFS distance — no recursive CTE
    // path explosion.
    "q_bfs" -> {
      val levels = (1 to BfsMaxHops).map(i =>
        s"""r$i AS MATERIALIZED (SELECT DISTINCT e.dst AS node
           |  FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.node)""".stripMargin)
        .mkString(",\n")
      val union = (0 to BfsMaxHops)
        .map(i => s"SELECT node, $i AS d FROM r$i").mkString("\nUNION ALL\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |r0 AS (SELECT CAST($BfsSource AS BIGINT) AS node),
         |$levels,
         |lvl AS ($union)
         |SELECT node, CAST(min(d) AS INT) AS dist FROM lvl GROUP BY node""".stripMargin
    },
    // Unrolled peel rounds; the final select recomputes the in-subgraph
    // degree exactly as the engine does after its loop. Extra rounds past
    // the fixpoint are no-ops (peeling is monotone), so the engine's
    // early stop cannot diverge from the full unroll.
    "q_kcore" -> {
      val rounds = (1 to KcoreRounds).map(i =>
        s"""n$i AS MATERIALIZED (
           |  SELECT e.src AS node FROM edges e
           |  JOIN n${i - 1} a ON e.src = a.node
           |  JOIN n${i - 1} b ON e.dst = b.node
           |  GROUP BY e.src HAVING count(*) >= $KcoreK)""".stripMargin)
        .mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
         |n0 AS (SELECT DISTINCT src AS node FROM edges),
         |$rounds
         |SELECT e.src AS node, CAST(count(*) AS BIGINT) AS deg
         |FROM edges e
         |JOIN n$KcoreRounds a ON e.src = a.node
         |JOIN n$KcoreRounds b ON e.dst = b.node
         |GROUP BY e.src""".stripMargin
    },
    // Same unrolled-round discipline as q_pagerank: each round's argmax
    // is a ranked pick over (count DESC, label ASC) — the engine's
    // min-over-(−count, label) struct, spelled as a window rank.
    "q_label_prop" ->
      s"""WITH $lpaCtes
         |SELECT node, label FROM l$LpaRounds""".stripMargin,
    // SAME unrolled community CTEs as q_label_prop (shared string), then
    // exact-integer per-community aggregates.
    "q_modularity" ->
      s"""WITH $lpaCtes,
         |lab AS (SELECT node, label FROM l$LpaRounds),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |  FROM edges GROUP BY 1),
         |intra AS (SELECT a.label AS community,
         |    CAST(count(*) AS BIGINT) AS intra_edges
         |  FROM edges e
         |  JOIN lab a ON e.src = a.node
         |  JOIN lab b ON e.dst = b.node
         |  WHERE a.label = b.label GROUP BY 1),
         |byc AS (SELECT l.label AS community,
         |    CAST(count(*) AS BIGINT) AS n_nodes,
         |    CAST(sum(d.deg) AS BIGINT) AS degree_sum
         |  FROM lab l JOIN deg d ON l.node = d.node GROUP BY 1)
         |SELECT byc.community, byc.n_nodes,
         |  coalesce(intra.intra_edges, 0) AS intra_edges, byc.degree_sum
         |FROM byc LEFT JOIN intra ON byc.community = intra.community""".stripMargin)

  /** Shared unrolled-LPA CTE chain (edges → l0 → … → l[LpaRounds]) for
    * the q_label_prop and q_modularity oracles. */
  private def lpaCtes: String = {
    val rounds = (1 to LpaRounds).map(i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT e.dst AS node, l.label, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY e.dst
         |                         ORDER BY count(*) DESC, l.label) AS rk
         |    FROM edges e JOIN l${i - 1} l ON e.src = l.node
         |    GROUP BY e.dst, l.label)
         |  WHERE rk = 1)""".stripMargin).mkString(",\n")
    s"""e0 AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
       |$rounds""".stripMargin
  }
}

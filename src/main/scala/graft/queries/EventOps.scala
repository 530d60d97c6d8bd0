package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream operators over the `events` table, expressed with the same
  * window primitives Structured Streaming uses (`window`, `session_window`)
  * so the batch results here are exactly what the streaming queries in
  * graft.streaming produce (see EventStreamingSpec for the readStream
  * equivalence test).
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows per event type: count + exact cents sum. */
  private val tumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      // timestamp_ntz: every other timestamp in the dataset is NTZ and so
      // are DuckDB results — keep the output schema uniform (values are
      // identical under the UTC session zone).
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("value_cents"))

  /** Gap-fill + forward-fill resample — the time-series regularization
    * every downstream model/dashboard needs: per event type, the hourly
    * count series with MISSING hours materialized (the full min→max hour
    * grid via `sequence`) and filled with the last observed value
    * (`last(_, ignoreNulls)` over an hour-ordered window), flagged so the
    * consumer can tell observed from imputed.
    *
    * Scale shape: the only data-sized operation is the hourly count
    * aggregate (one shuffle, map-side combined); the grid explode, the
    * left join back, and the forward-fill window all run on the AGGREGATE
    * (types × hours rows — time-bounded, not corpus-bounded), and a
    * window partitioned by event_type over a few thousand hour rows per
    * type cannot skew no matter how many raw events an hour holds.
    */
  private val gapFill: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // Cut after the aggregate: BOTH consumers below (the span/grid
    // derivation and the left join) read `hourly`, and without the cut
    // each would re-scan the raw events — two 100 TB scans for one
    // types×hours-sized frame (PlanSpec pins the single-materialization
    // shape).
    val hourly = graft.core.Lineage.cut(Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_obs")))
    val grid = hourly.groupBy("event_type")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h").cast("timestamp_ntz").as("h"),
        last(col("n_obs"), ignoreNulls = true).over(w).as("n"),
        col("n_obs").isNull.as("filled"))
  }

  /** Session windows (30-minute gap) per user via session_window; output
    * min/max/count (gap-closure end is engine-specific, min/max are not).
    */
  private val sessions: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"), col("n"))

  /** JSON property extraction + sliding 2h/1h windows. */
  private val enriched: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("k_sum"))

  /** AS-OF JOIN — each click matched to the latest view of the same user
    * at-or-before its timestamp. Spark has no asof operator; the
    * scale-correct distributed form is the UNION + ordered-window trick:
    * tag reference rows 0 and probe rows 1, sort within user by (ts, tag)
    * — one shuffle, one sort, no per-key loop and no range cross join —
    * and carry the reference columns forward with last(..., ignoreNulls)
    * over the unbounded-preceding frame. Probe rows then hold exactly the
    * as-of match (ties impossible: (user_id, ts) is unique in this data).
    * Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  private val asof: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val views = ev.where(col("event_type") === "view").select(
      col("user_id"), col("ts"), lit(0).as("tag"),
      col("event_id").as("ref_id"), col("value").as("ref_value"),
      lit(null).cast("long").as("probe_id"), lit(null).cast("double").as("probe_value"))
    val clicks = ev.where(col("event_type") === "click").select(
      col("user_id"), col("ts"), lit(1).as("tag"),
      lit(null).cast("long").as("ref_id"), lit(null).cast("double").as("ref_value"),
      col("event_id").as("probe_id"), col("value").as("probe_value"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(clicks)
      .withColumn("view_id", last(col("ref_id"), ignoreNulls = true).over(w))
      .withColumn("view_value", last(col("ref_value"), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("probe_id").as("click_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("probe_value").as("click_value"), col("view_id"), col("view_value"))
  }

  /** First-touch attribution: the earliest event per (user, type), with
    * event_id as the deterministic tie-break. One shuffle on the group
    * key; row_number + filter lowers to a partial top-1 per key under
    * AQE, never a global sort.
    */
  private val firstTouch: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"),
        col("ts").cast("timestamp_ntz").as("first_ts"),
        col("value").as("first_value"))
  }

  /** Contiguous event-sequence detection — MATCH_RECOGNIZE's core pattern
    * (view, then click, then purchase as three CONSECUTIVE events in the
    * user's timeline, nothing interleaved) without the MATCH_RECOGNIZE
    * operator Spark lacks: two `lead`s over one (user, ts, event_id)
    * window turn the pattern into a per-row predicate. This is the
    * complement of ev_funnel (which allows interleaving); contiguity is
    * what session-replay and bot-detection pipelines ask for. One shuffle
    * (the window partition), sort amortized across all three leads, filter
    * after — no self-joins (the naive 3-way self-join shuffles the events
    * table three times and explodes on hot users). event_id tiebreak makes
    * same-timestamp ordering deterministic in both engines.
    */
  private val sequenceMatch: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .withColumn("ts3", lead("ts", 2).over(w))
      .where(col("event_type") === "view" &&
        col("t2") === "click" && col("t3") === "purchase")
      .select(col("user_id"),
        col("event_id").as("start_event_id"),
        col("ts").cast("timestamp_ntz").as("start_ts"),
        col("ts3").cast("timestamp_ntz").as("end_ts"))
  }

  /** Time-interval join: each click paired with EVERY view of the same
    * user in the preceding hour — the bounded-window variant of the as-of
    * join (all candidates, not just the latest). Equi key (user_id) +
    * range predicate: one shuffle per side on the key, range filtered
    * inside the sorted join — never a cross join. This is also exactly
    * the shape Structured Streaming's stream-stream join supports
    * (equality + time bound ⇒ bounded state), see
    * EventStreaming.intervalJoin + the parity spec.
    */
  private val intervalJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click").select(
      col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val views = ev.where(col("event_type") === "view").select(
      col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    clicks.join(views, Seq("user_id"))
      .where(col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"),
        col("view_ts").cast("timestamp_ntz").as("view_ts"))
  }

  /** Event-type transition matrix — the Markov-chain view of user
    * journeys (the input to next-action prediction and journey-drop-off
    * analysis): count, over every user timeline, how often event type A
    * is IMMEDIATELY followed by event type B. One lead over the
    * per-user (ts, event_id) window — the ev_sequence_match shuffle,
    * reused for an aggregate view — then a global (from, to) count,
    * map-side combinable into at most |types|² rows. Terminal events
    * (each user's last) have no successor and drop out, the standard
    * convention.
    */
  private val transitionMatrix: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Multi-touch attribution — the revenue-allocation operator behind
    * marketing analytics: each purchase's value is split LINEARLY across
    * the user's view/click touchpoints in the preceding hour. Credit is
    * EXACT-INTEGER: purchase value → cents (the established rounding
    * trick), base share = cents div n, and the division remainder goes to
    * the LATEST touch ((ts, event_id)-max, unique by construction) — so
    * credits sum to the purchase exactly and both engines agree
    * bit-for-bit (float division would need a tolerance gate). Shapes:
    * one user_id-keyed range join (the ev_interval_join shape) + one
    * purchase-partitioned window for (n, latest) — two shuffles;
    * purchases with no in-window touch drop out (inner join), the usual
    * "unattributed revenue" residual a real pipeline reports separately.
    */
  private val attribution: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    // Integer credit split relies on `div`/`%` (truncate toward zero)
    // agreeing with the oracle's `//`/`%`; that holds only for cents >= 0.
    // A refund fixture (negative value) must fail loudly here, not
    // silently diverge per-touch — raise_error keeps the guard codegen'd
    // and free on the non-negative path.
    val centsRaw = round(col("value") * 100).cast("long")
    val purchases = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("event_id").as("purchase_id"),
      col("ts").as("pts"),
      when(centsRaw < 0, raise_error(concat(
        lit("ev_attribution: negative purchase cents unsupported "),
        lit("(integer split assumes cents >= 0), got "),
        centsRaw.cast("string")))).otherwise(centsRaw).as("cents"))
    val touches = ev.where(col("event_type").isin("view", "click")).select(
      col("user_id"), col("event_id").as("touch_id"),
      col("event_type").as("touch_type"), col("ts").as("tts"))
    val w = Window.partitionBy("purchase_id")
    purchases.join(touches, Seq("user_id"))
      .where(col("tts") <= col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("latest", max(struct(col("tts"), col("touch_id"))).over(w))
      .select(col("user_id"), col("purchase_id"), col("touch_id"), col("touch_type"),
        (expr("cents div n") +
          when(struct(col("tts"), col("touch_id")) === col("latest"),
            expr("cents % n")).otherwise(lit(0L))).as("credit_cents"))
  }

  /** Session funnel: per 30-minute session, view/click volumes and
    * whether the session CONVERTED (some click at-or-after the first
    * view). One session_window aggregate; the conversion flag is pure
    * conditional aggregation — first-view and last-click extremes
    * compared after the fold, no ordering dependence.
    */
  private val funnel: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        max(when(col("event_type") === "click", col("ts"))).as("last_click"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("n_views"), col("n_clicks"),
        coalesce(col("last_click") >= col("first_view"), lit(false)).as("converted"))

  /** Weekly cohort retention — the user-lifecycle matrix behind every
    * growth dashboard: users grouped by first-seen ISO week, counted in
    * each later week they were active. Shapes: the (user, week) grid is
    * a distinct (map-side partial dedup, shuffle on (user, wk)); the
    * cohort week is a per-user window MIN — not a self-join back to a
    * groupBy, which would re-shuffle the grid a third time — costing one
    * user_id exchange; the final distinct-user count per (cohort,
    * offset) cell is Spark's standard two-phase distinct aggregate. A
    * user's weeks are at most a few hundred rows, so the window
    * partition can never skew. */
  /** Cumulative distinct users per day — the growth-dashboard "total
    * users to date" curve, and the classic running-distinct trap: a
    * naive COUNT(DISTINCT) OVER (ORDER BY day) re-scans every prior
    * day's users per output row (quadratic, and Spark refuses DISTINCT
    * in window frames anyway). The scale shape: elect each user's
    * FIRST-SEEN day (one map-side-combinable min per user), count new
    * users per day, then a running sum over the tiny day axis — the
    * expensive pass touches each event once, and the window sorts only
    * ~days rows. Also reports the per-day active count for contrast.
    */
  private val cumulativeUsers: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val byDay = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstSeen = byDay.groupBy("user_id").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val active = byDay.distinct()
      .groupBy("day").agg(count(lit(1)).as("active_users"))
    active.join(firstSeen, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      // partitionBy(lit(1)): same single-partition execution (the frame
      // is the ~days-row axis, bounded by construction), but an explicit
      // partition spec — so the suite log carries no WindowExec
      // single-partition warning and a REAL unpartitioned window stands
      // out when one regresses in.
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.partitionBy(lit(1))
          .orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("day").cast("string").as("day"), col("active_users"),
        col("new_users"), col("cum_users"))
  }

  private val retention: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val active = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohortWk = min(col("wk")).over(Window.partitionBy("user_id"))
    active.withColumn("cohort_wk", cohortWk)
      .groupBy(col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / lit(7)).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Rate-anomaly detection over hourly event counts — flag hours where
    * a type's volume exceeds mean + 2σ of its own hourly series. The
    * z-score test is kept INTEGER-EXACT: with per-type moments n_h, s1,
    * s2 (count / sum / sum-of-squares of hourly counts), n > μ + 2σ ⇔
    * lhs = n·n_h − s1 > 0 ∧ lhs² > 4·(n_h·s2 − s1²) — no division, no
    * sqrt, no FP anywhere, so both engines flag identical hours even on
    * exact boundaries. The moments and products are DECIMAL, not LONG
    * (same overflow posture as q_corr): s1² already passes int64 once a
    * type's total event count clears ~3·10⁹ — i.e. exactly the 100 TB
    * regime — while decimal(38) keeps every product ≤ ~10²⁰ exact;
    * DuckDB's HUGEINT sums match.
    *
    * Scale shape: hourly counts are one hash-groupBy; per-type moments
    * aggregate that (tiny) frame; the join back broadcasts the handful
    * of per-type stat rows to every hourly partition.
    */
  private val rateAnomaly: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val nDec = col("n").cast("decimal(18,0)")
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).cast("decimal(18,0)").as("n_h"),
        sum(nDec).as("s1"), sum(nDec * nDec).as("s2"))
    val lhs = nDec * col("n_h") - col("s1")
    val disc = lit(4).cast("decimal(18,0)") *
      (col("n_h") * col("s2") - col("s1") * col("s1"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("h").cast("timestamp_ntz").as("h"),
        col("n"), (lhs > 0 && lhs * lhs > disc).as("anomalous"))
  }

  /** The same as-of join through the NATIVE operator
    * (graft.plans.AsOfJoinPlan): the strategy plans BroadcastAsOfJoinExec
    * when the views side's estimated size fits the broadcast threshold
    * (zero shuffles; each click partition binary-searches the broadcast
    * index) and the co-partitioned ShuffleAsOfJoinExec merge when it does
    * not — so the SAME query text is scale-correct when the reference
    * side is half of a 100 TB events table. Same oracle as ev_asof_join;
    * AsOfJoinSpec pins both plan shapes, their tie-break parity, and
    * parity with the composed union+window form.
    */
  /** Shared clicks/views projections + output select for the operator
    * faces; `join` supplies the specific as-of call, so the event
    * projections cannot drift between the native/merge/skew queries.
    */
  private def asofThroughOperator(s: SparkSession, d: String,
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click").select(
      col("event_id").as("click_id"), col("user_id"), col("ts"),
      col("value").as("click_value"))
    val views = ev.where(col("event_type") === "view").select(
      col("user_id"), col("ts"),
      col("event_id").as("view_id"), col("value").as("view_value"))
    join(clicks, views)
      .select(col("click_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("click_value"), col("view_id"), col("view_value"))
  }

  private val asofCarry = Seq("view_id", "view_value")

  private val asofNative: Q = (s, d) => asofThroughOperator(s, d,
    graft.plans.AsOfJoin.asof(_, _, "user_id", "ts", "ts", asofCarry))

  /** Skew-aware salted variant over the merge shape
    * ([[graft.plans.AsOfJoin.asofSkewAware]]): users with more than 15
    * clicks count as hot (a hot/cold mix at every test SF — the corpus
    * median is ~13) and are salted 4 ways with reference replication.
    * Row-identical to the plain operator by construction; same oracle.
    */
  private val asofSkew: Q = (s, d) => asofThroughOperator(s, d,
    graft.plans.AsOfJoin.asofSkewAware(_, _, "user_id", "ts", "ts", asofCarry,
      hotRowThreshold = 15, salts = 4))

  /** The SAME operator pinned to [[graft.plans.ShuffleAsOfJoinExec]] — the
    * both-sides-large physical shape — so the co-partitioned merge has its
    * own driver-gated oracle row. The hint rides the logical node, so the
    * pin survives AQE replanning (a session conf would not).
    */
  private val asofMerge: Q = (s, d) => asofThroughOperator(s, d,
    graft.plans.AsOfJoin.asof(_, _, "user_id", "ts", "ts", asofCarry,
      Some("shuffle")))

  /** FORWARD direction through the merge shape: each click matched to the
    * EARLIEST view at-or-after it (merge_asof direction="forward") — the
    * "next touchpoint" question attribution asks alongside "last
    * touchpoint". Pinned to the co-partitioned merge so the run-based
    * cursor's forward candidate has its own driver-gated oracle row.
    */
  private val asofForward: Q = (s, d) => asofThroughOperator(s, d,
    graft.plans.AsOfJoin.asof(_, _, "user_id", "ts", "ts", asofCarry,
      Some("shuffle"), direction = "forward"))

  /** NEAREST direction (smaller |Δt|, exact tie → backward) through the
    * auto strategy — broadcast at test SF, merge when the reference side
    * outgrows the threshold, same text either way.
    */
  private val asofNearest: Q = (s, d) => asofThroughOperator(s, d,
    graft.plans.AsOfJoin.asof(_, _, "user_id", "ts", "ts", asofCarry,
      direction = "nearest"))

  /** Backward with a 1-hour TOLERANCE (micros — the timestamp column's
    * native units): a view more than an hour before the click is no
    * longer its attribution, the probe keeps nulls. Merge-pinned so the
    * tolerance check rides the scale shape.
    */
  private val asofTolerance: Q = (s, d) => asofThroughOperator(s, d,
    graft.plans.AsOfJoin.asof(_, _, "user_id", "ts", "ts", asofCarry,
      Some("shuffle"), tolerance = 3600L * 1000000L))

  /** Typed JSON property extraction — `from_json` with an explicit schema
    * (vectorized Jackson parse to a struct, one pass per row), not the
    * per-path string probing of `get_json_object` that [[enriched]] uses:
    * with k paths the latter re-parses the document k times, which at
    * 100 TB of event payloads is k scans' worth of CPU. Malformed
    * documents yield NULL fields (PERMISSIVE mode) and flow into the
    * aggregates as SQL nulls rather than failing the job — the posture a
    * pipeline over billions of third-party payloads needs. */
  private val propsExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k"))
      .groupBy(col("event_type"))
      // 100 TB note: k_sum as int64 wraps silently in Spark once the
      // per-type payload sum clears 2⁶³ (DuckDB's HUGEINT would error
      // instead — a divergence no fixture exercises). The deployment
      // remedy is the rate-anomaly decimal posture — sum
      // k.cast(decimal(18,0)) into decimal(38,0) — kept OUT of the
      // registered output only because the oracle harness renders
      // DECIMAL through pandas as float text, which can never
      // hash-match an integer column.
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).as("k_sum"), min(col("k")).as("k_min"),
        max(col("k")).as("k_max"), countDistinct(col("k")).as("k_distinct"))

  /** VARIANT-typed payload path (Spark 4's shredded semi-structured
    * binary): `try_parse_json` once into a VariantType column — malformed
    * payloads become NULL variants, not job failures — then typed
    * `variant_get` extraction. Differs from [[propsExtract]]'s
    * schema-on-read struct in the 100 TB posture: a variant column
    * persisted to parquet keeps the parsed binary (and shreds hot paths
    * to columns), so later queries extract without re-parsing text at
    * all, and fields NOT in a fixed schema stay queryable. */
  private val variantExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        expr("variant_get(try_parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy(col("event_type"))
      // Same int64 caveat as propsExtract, sharper here: k·k passes
      // int64 once |k| clears ~3·10⁹ (well inside BIGINT's own range) —
      // at deployment scale compute both sums over
      // k.cast(decimal(18,0)); see propsExtract for why the registered
      // output stays BIGINT.
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).as("k_sum"),
        sum(col("k") * col("k")).as("k_sumsq"))

  /** Id range probed against the count-min sketch: spans present AND
    * absent keys at every SF (shared with the oracle and EventOpsSpec). */
  val CmsProbeIds: Seq[Long] = 0L until 20L

  /** Mergeable count-min sketch frequency estimates — the bounded-memory
    * answer to ad-hoc "how often did key X occur?" over a 100 TB stream
    * without a per-key count table: each shard aggregates a fixed-size
    * CMS (`count_min_sketch`, Spark's codegen'd sketch aggregate), the
    * ~2 MB shard sketches merge cell-wise on the driver (associative —
    * the same persist-then-union deployment as the HLL sketches), and
    * any key can then be probed in O(1). CMS error is one-sided
    * (estimate ≥ truth, overshoot ≤ eps·N with prob. ≥ confidence); at
    * eps=1e-4 the probed estimates are collision-free and the DuckDB
    * exact-count oracle pins them value-for-value, absent keys included
    * (a CMS never under-counts, so 0 means 0). */
  private val cmsProbe: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.util.sketch.CountMinSketch
    val shards = Tables.events(s, d)
      .groupBy(pmod(col("event_id"), lit(8)).as("shard"))
      .agg(expr("count_min_sketch(user_id, 0.0001d, 0.999d, 42)").as("sk"))
      .collect()
    // Fold from a zero sketch with IDENTICAL parameters (merge requires
    // matching width/depth/seed): an empty events table then probes all
    // zeros instead of crashing reduceLeft on an empty shard list.
    val merged = shards.map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
      .foldLeft(CountMinSketch.create(0.0001, 0.999, 42)) { (a, b) =>
        a.mergeInPlace(b); a
      }
    CmsProbeIds.map(id => (id, merged.estimateCount(java.lang.Long.valueOf(id))))
      .toDF("user_id", "est_n")
  }

  /** Time-weighted average — the right mean for a sampled step signal
    * (a user's `value` holds until their next event, so a plain AVG
    * over-weights bursts): per user, twa = Σ valueᵢ·(tᵢ₊₁−tᵢ) / Σ dt
    * over the lead-differenced timeline (the final event opens no
    * interval). Exact accumulation, one float division: values as
    * cents, gaps as epoch-microsecond differences, the weighted sum
    * Σ cents·dt_us accumulated as DECIMAL(38,0) so a long-horizon user
    * can never silently wrap a BIGINT (the oracle's HUGEINT widening,
    * matched on our side explicitly since non-ANSI Spark wraps Long);
    * the published twa_milli = floor(double(wsum·10) / double(tsum)) —
    * the ×10 (cents·10 = value·10³) is still exact decimal, and the
    * ONE double division is mirrored bit-for-bit by the oracle's
    * HUGEINT→DOUBLE casts (both sides round the same exact integers to
    * nearest double). One window per user (the sessionize shuffle) +
    * one hash aggregate. */
  private val timeWeightedAvg: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("dt_us", unix_micros(lead(col("ts"), 1).over(w)) -
        unix_micros(col("ts")))
      .where(col("dt_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("cents").cast("decimal(18,0)") * col("dt_us")).as("wsum"),
        sum(col("dt_us")).as("tsum"))
      .select(col("user_id"), col("n_intervals"),
        floor((col("wsum") * lit(10L)).cast("double") /
            col("tsum").cast("double")).cast("long")
          .as("twa_milli"))
  }

  val queries: Map[String, Q] = Map(
    "ev_time_weighted_avg" -> timeWeightedAvg,
    "ev_props_extract" -> propsExtract,
    "ev_variant_extract" -> variantExtract,
    "ev_cms_probe" -> cmsProbe,
    "ev_tumbling" -> tumbling,
    "ev_gap_fill" -> gapFill,
    "ev_retention" -> retention,
    "ev_cumulative_users" -> cumulativeUsers,
    "ev_rate_anomaly" -> rateAnomaly,
    "ev_sessions" -> sessions,
    "ev_enriched" -> enriched,
    "ev_asof_join" -> asof,
    "ev_asof_native" -> asofNative,
    "ev_asof_merge" -> asofMerge,
    "ev_asof_skew" -> asofSkew,
    "ev_asof_forward" -> asofForward,
    "ev_asof_nearest" -> asofNearest,
    "ev_asof_tolerance" -> asofTolerance,
    "ev_first_touch" -> firstTouch,
    "ev_sequence_match" -> sequenceMatch,
    "ev_interval_join" -> intervalJoin,
    "ev_attribution" -> attribution,
    "ev_transition_matrix" -> transitionMatrix,
    "ev_funnel" -> funnel,
  )

  /** Shared by the shuffle (`ev_asof_join`) and native (`ev_asof_native`)
    * forms — one semantic definition, two physical strategies.
    */
  private val asofOracleSql =
    """WITH c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |             value AS click_value
      |           FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |        value AS view_value
      |      FROM events WHERE event_type = 'view')
      |SELECT c.click_id, c.user_id, c.ts, c.click_value, v.view_id, v.view_value
      |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin

  val oracle: Map[String, String] = Map(
    // The same lead-differenced step integral: cents x epoch-us gaps,
    // exact (HUGEINT here / DECIMAL(38,0) engine-side) weighted sum,
    // then the one shared double division.
    "ev_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |iv AS (SELECT user_id, cents,
        |    lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) - t_us AS dt_us
        |  FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(floor(CAST(sum(cents * dt_us) * 10 AS DOUBLE)
        |    / CAST(sum(dt_us) AS DOUBLE)) AS BIGINT) AS twa_milli
        |FROM iv WHERE dt_us IS NOT NULL GROUP BY user_id""".stripMargin,
    // CMS estimates are pinned against TRUE counts: one-sided error with
    // collision-free width at oracle scale makes them exact, including
    // the zero rows for ids the events table never saw.
    "ev_cms_probe" ->
      """SELECT t.user_id, CAST(coalesce(c.cnt, 0) AS BIGINT) AS est_n
        |FROM range(0, 20) t(user_id)
        |LEFT JOIN (SELECT user_id AS u, count(*) AS cnt FROM events GROUP BY 1) c
        |  ON t.user_id = c.u""".stripMargin,
    // json_valid + TRY_CAST mirror the engine's malformed-payload
    // tolerance (invalid JSON / non-integer k → NULL, not an error).
    // Remaining divergence not exercised by any fixture: a JSON float k
    // TRY_CASTs (rounds) in DuckDB where Spark's BIGINT schema nulls it.
    "ev_variant_extract" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN json_valid(props)
        |         THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(k) AS BIGINT) AS n_k,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(sum(k * k) AS BIGINT) AS k_sumsq
        |FROM e GROUP BY 1""".stripMargin,
    "ev_props_extract" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN json_valid(props)
        |         THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(k) AS BIGINT) AS n_k,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(min(k) AS BIGINT) AS k_min,
        |  CAST(max(k) AS BIGINT) AS k_max,
        |  CAST(count(DISTINCT k) AS BIGINT) AS k_distinct
        |FROM e GROUP BY 1""".stripMargin,
    "ev_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_gap_fill" ->
      """WITH hourly AS (SELECT event_type,
        |    time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h,
        |    count(*) AS n_obs
        |  FROM events GROUP BY 1, 2),
        |grid AS (SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS h
        |  FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
        |        FROM hourly GROUP BY 1)),
        |j AS (SELECT g.event_type, g.h, hourly.n_obs
        |      FROM grid g LEFT JOIN hourly
        |        ON hourly.event_type = g.event_type AND hourly.h = g.h)
        |SELECT event_type, h,
        |  CAST(last_value(n_obs IGNORE NULLS) OVER (PARTITION BY event_type
        |         ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n,
        |  (n_obs IS NULL) AS filled
        |FROM j""".stripMargin,
    "ev_sessions" ->
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP)
        |            >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "ev_enriched" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
        |w AS (SELECT ts, event_type, k,
        |    time_bucket(INTERVAL '1 hour', ts) AS h FROM e),
        |x AS (SELECT h AS w_start, event_type, k FROM w
        |      UNION ALL
        |      SELECT h - INTERVAL '1 hour' AS w_start, event_type, k FROM w)
        |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS k_sum
        |FROM x GROUP BY 1, 2""".stripMargin,
    "ev_asof_join" -> asofOracleSql,
    "ev_asof_native" -> asofOracleSql,
    "ev_asof_merge" -> asofOracleSql,
    "ev_asof_skew" -> asofOracleSql,
    // Direction/tolerance variants: DuckDB's ASOF JOIN is backward-only,
    // so these unroll to a ranked lateral pick. Tie-break on view_id is
    // nominal — the fixtures have no duplicate (user_id, ts) view pairs
    // (the backward oracle's ASOF already relies on that), and
    // AsOfJoinSpec's "fixture invariant" test asserts exactly this so a
    // fixture regeneration that breaks it fails with an explanation, not
    // a silent hash mismatch. view_id also leads the engine's carry list,
    // so struct byte-order ties and view_id order coincide regardless.
    "ev_asof_forward" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             value AS click_value
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |        value AS view_value
        |      FROM events WHERE event_type = 'view'),
        |m AS (SELECT c.click_id, v.view_id, v.view_value,
        |        row_number() OVER (PARTITION BY c.click_id
        |                           ORDER BY v.ts, v.view_id) AS rn
        |      FROM c JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts)
        |SELECT c.click_id, c.user_id, c.ts, c.click_value, m.view_id, m.view_value
        |FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON c.click_id = m.click_id""".stripMargin,
    "ev_asof_nearest" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             value AS click_value
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |        value AS view_value
        |      FROM events WHERE event_type = 'view'),
        |m AS (SELECT c.click_id, v.view_id, v.view_value,
        |        row_number() OVER (PARTITION BY c.click_id
        |          ORDER BY abs(epoch_us(v.ts) - epoch_us(c.ts)),
        |                   (CASE WHEN v.ts <= c.ts THEN 0 ELSE 1 END),
        |                   v.view_id) AS rn
        |      FROM c JOIN v ON c.user_id = v.user_id)
        |SELECT c.click_id, c.user_id, c.ts, c.click_value, m.view_id, m.view_value
        |FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON c.click_id = m.click_id""".stripMargin,
    "ev_asof_tolerance" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             value AS click_value
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |        value AS view_value
        |      FROM events WHERE event_type = 'view'),
        |m AS (SELECT c.click_id, v.view_id, v.view_value,
        |        row_number() OVER (PARTITION BY c.click_id
        |                           ORDER BY v.ts DESC, v.view_id) AS rn
        |      FROM c JOIN v ON c.user_id = v.user_id
        |        AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL '1 hour')
        |SELECT c.click_id, c.user_id, c.ts, c.click_value, m.view_id, m.view_value
        |FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON c.click_id = m.click_id""".stripMargin,
    "ev_first_touch" ->
      """SELECT user_id, event_type, event_id AS first_event_id,
        |  CAST(ts AS TIMESTAMP) AS first_ts, value AS first_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts, event_id) = 1""".stripMargin,
    "ev_sequence_match" ->
      """SELECT user_id, event_id AS start_event_id,
        |  CAST(ts AS TIMESTAMP) AS start_ts, CAST(ts3 AS TIMESTAMP) AS end_ts
        |FROM (SELECT user_id, event_id, ts, event_type,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3,
        |    lead(ts, 2) OVER w AS ts3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        |WHERE event_type = 'view' AND t2 = 'click' AND t3 = 'purchase'""".stripMargin,
    "ev_transition_matrix" ->
      """SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        |FROM (SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) AS to_type
        |  FROM events) t
        |WHERE to_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    // Integer credit split: cents // n everywhere, remainder to the
    // (ts, id)-max touch — mirrors the engine's struct-max tie-break.
    // CONSTRAINT: cents >= 0 (the engine raise_errors otherwise) — for
    // negative cents DuckDB's floor-// and truncate-% disagree with
    // Spark's truncate-div, so the equivalence below is only claimed on
    // the non-negative domain.
    "ev_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id,
        |    CAST(ts AS TIMESTAMP) AS pts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type,
        |    CAST(ts AS TIMESTAMP) AS tts
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.user_id, p.purchase_id, t.touch_id, t.touch_type,
        |    p.cents, t.tts,
        |    count(*) OVER w AS n,
        |    max(ROW(t.tts, t.touch_id)) OVER w AS latest
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 1 HOUR
        |  WINDOW w AS (PARTITION BY p.purchase_id))
        |SELECT user_id, purchase_id, touch_id, touch_type,
        |  cents // n + CASE WHEN ROW(tts, touch_id) = latest
        |                    THEN cents % n ELSE 0 END AS credit_cents
        |FROM j""".stripMargin,
    "ev_funnel" ->
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS TIMESTAMP)
        |            >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts, event_type,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM x)
        |SELECT user_id, min(ts) AS session_start,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
        |  coalesce(max(CASE WHEN event_type = 'click' THEN ts END)
        |           >= min(CASE WHEN event_type = 'view' THEN ts END), false) AS converted
        |FROM s GROUP BY user_id, sess""".stripMargin,
    // Moments/products in HUGEINT (int128) to mirror the Spark side's
    // decimal arithmetic — plain BIGINT would overflow at scale.
    "ev_rate_anomaly" ->
      """WITH hourly AS (SELECT event_type,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n_h,
        |    CAST(sum(n) AS HUGEINT) AS s1,
        |    CAST(sum(n*n) AS HUGEINT) AS s2
        |  FROM hourly GROUP BY 1)
        |SELECT h.event_type, h.h, h.n,
        |  (CAST(h.n AS HUGEINT) * s.n_h - s.s1 > 0 AND
        |   (CAST(h.n AS HUGEINT) * s.n_h - s.s1)
        |     * (CAST(h.n AS HUGEINT) * s.n_h - s.s1)
        |     > 4 * (s.n_h * s.s2 - s.s1 * s.s1)) AS anomalous
        |FROM hourly h JOIN stats s USING (event_type)""".stripMargin,
    // First-seen election + per-day running sum — same composition as
    // the engine (no COUNT(DISTINCT) over a window on either side).
    "ev_cumulative_users" ->
      """WITH bd AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |fs AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
        |       FROM (SELECT user_id, min(day) AS day FROM bd GROUP BY 1) GROUP BY 1),
        |act AS (SELECT day, CAST(count(*) AS BIGINT) AS active_users
        |        FROM (SELECT DISTINCT user_id, day FROM bd) GROUP BY 1)
        |SELECT CAST(act.day AS VARCHAR) AS day, act.active_users,
        |  CAST(coalesce(fs.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(fs.new_users, 0))
        |       OVER (ORDER BY act.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM act LEFT JOIN fs USING (day)""".stripMargin,
    "ev_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY 1)
        |SELECT cohort_wk,
        |  CAST(datediff('day', cohort_wk, wk) // 7 AS INT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,
    "ev_interval_join" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT c.user_id, c.click_id, v.view_id, c.click_ts, v.view_ts
        |FROM c JOIN v ON c.user_id = v.user_id
        | AND v.view_ts <= c.click_ts
        | AND v.view_ts >= c.click_ts - INTERVAL 1 HOUR""".stripMargin,
  )
}

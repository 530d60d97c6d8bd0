package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** Relational parity queries: one per operator row of SURVEY.md §2 that is
  * expressible over the driver's TPC-H-ish testdata, each with a DuckDB
  * oracle. Numeric aggregates use exact integer "cents" arithmetic
  * (`round(x * 10^k)` per row, then integer sum) so Spark and DuckDB agree
  * bit-for-bit regardless of summation order.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** k for the native top-k-aggregate query (shared with its spec). */
  val TopKAggK = 3

  /** Reference: extraction scan with projection (SURVEY S1/F1,
    * amaxa/api.py:140-165 + amaxa/amaxa.py:174-175). */
  private val s1: Q = (s, d) =>
    Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  private val pointIds: Seq[Long] = 1L to 3000L by 7

  /** Reference: retrieve-by-id-batch (SURVEY S2, amaxa/api.py:167-181) —
    * explicit id set → broadcast semi join, not chunked REST calls. */
  private val s2: Q = (s, d) => {
    import s.implicits._
    val ids = pointIds.toDF("o_orderkey")
    Tables.orders(s, d)
      .join(broadcast(ids), Seq("o_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  /** Reference: FK-membership query (SURVEY S3/J1, amaxa/api.py:183-196) —
    * the ≤190-id IN-list chunking becomes a single semi join. */
  private val s3: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    Tables.lineitem(s, d)
      .join(o, Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_quantity")
  }

  /** Reference: CSV sink + source round-trip (SURVEY S4/S5,
    * loader/extract_operation.py:125-158) with the Id-first-then-sorted
    * header contract. */
  /** Per-process AND per-data-dir unique scratch path (a shared path
    * would let a second data dir's write clobber a lazy frame still
    * reading the first), registered for JVM-exit cleanup.
    */
  private def roundTripDir(s: SparkSession, name: String, d: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_${name}_" +
      s"${s.sparkContext.applicationId}_${Integer.toHexString(d.hashCode)}"
    graft.core.Fs.deleteOnExit(out)
    out
  }

  private val s4: Q = (s, d) => {
    val n = Tables.nation(s, d)
    val keyFirst = "n_nationkey" +: n.columns.filterNot(_ == "n_nationkey").sorted.toSeq
    val ordered = n.select(keyFirst.map(col): _*)
    val out = roundTripDir(s, "csv_roundtrip", d)
    ordered.write.mode("overwrite").option("header", true).csv(out)
    s.read.schema(ordered.schema).option("header", true).csv(out)
  }

  /** Reference: user WHERE clause pushed into the scan (SURVEY F2,
    * amaxa/amaxa.py:669-679). Catalyst pushes both predicates to parquet. */
  private val f2: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(expr("l_shipdate >= '1995-01-01 00:00:00' AND l_discount > 0.05"))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount")

  private val synthBool =
    """CASE WHEN o_orderkey % 11 = 0 THEN ''
      |     WHEN o_orderkey % 7 = 0 THEN 'YES'
      |     WHEN o_orderkey % 5 = 0 THEN 'T'
      |     WHEN o_orderkey % 3 = 0 THEN 'No'
      |     WHEN o_orderkey % 2 = 0 THEN '0'
      |     ELSE 'true' END""".stripMargin

  /** Reference: boolean-synonym coercion (SURVEY F3, amaxa/amaxa.py:349-375). */
  private val f3: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("synth", expr(synthBool))
      .select(col("o_orderkey"), primitivizeBool(col("synth")).as("b"))

  /** Reference: Bulk-API epoch-ms → ISO-8601 datetime fix (SURVEY F4,
    * amaxa/api.py:148-165). */
  private val f4: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_format(
        timestamp_millis(unix_millis(col("o_orderdate").cast("timestamp"))),
        "yyyy-MM-dd'T'HH:mm:ss.SSS+0000").as("iso_dt"))

  /** Reference: field↔column renaming (SURVEY F5, amaxa/amaxa.py:857-858). */
  private val f5: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumnRenamed("c_custkey", "CustomerId")
      .withColumnRenamed("c_name", "CustomerName")
      .withColumnRenamed("c_mktsegment", "Segment")
      .select("CustomerId", "CustomerName", "Segment")

  /** Reference: row dedup on extraction (SURVEY F6, amaxa/amaxa.py:600-613). */
  private val f6: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"), year(col("l_shipdate")).as("ship_year"))
      .dropDuplicates()

  /** Reference: resume skip-filter (SURVEY F7, amaxa/amaxa.py:403-405) —
    * anti join against the already-loaded id map. */
  private val f7: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val loaded = o.filter(col("o_orderkey") % 5 < 2).select("o_orderkey")
    o.join(loaded, Seq("o_orderkey"), "left_anti")
      .select("o_orderkey", "o_orderstatus")
  }

  /** Reference: dependency resolution semi join (SURVEY J2,
    * amaxa/amaxa.py:805-818) — parents referenced from extracted children. */
  private val j2: Q = (s, d) => {
    val refs = Tables.orders(s, d)
      .filter(col("o_totalprice") > 150000.0)
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(s, d)
      .join(refs, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_nationkey")
  }

  /** Reference: id-map remap on load (SURVEY J3, amaxa/amaxa.py:321-347) —
    * broadcast left join + coalesce(new, original). */
  private val j3: Q = (s, d) => {
    val idMap = Tables.customer(s, d)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("old_id"), (col("c_custkey") + 1000000L).as("new_id"))
    Tables.orders(s, d)
      .join(broadcast(idMap), col("o_custkey") === col("old_id"), "left")
      .select(col("o_orderkey"), coalesce(col("new_id"), col("o_custkey")).as("remapped_custkey"))
  }

  /** Reference: outside-reference detection, drop-field behavior (SURVEY J4,
    * amaxa/amaxa.py:776-800): FK values outside the extracted set → null. */
  private val j4: Q = (s, d) => {
    val extracted = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey").as("ext_id"))
    Tables.orders(s, d)
      .join(broadcast(extracted), col("o_custkey") === col("ext_id"), "left")
      .select(
        col("o_orderkey"),
        when(col("ext_id").isNull, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("o_custkey_safe"))
  }

  /** Reference: polymorphic lookup dispatch by 3-char key prefix (SURVEY
    * J5/T8, amaxa/amaxa.py:749-785 + api.py:63-70). */
  private val j5: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
      .select(concat(lit("001"), lpad(col("o_orderkey").cast("string"), 12, "0")).as("ref_id"))
    val c = Tables.customer(s, d)
      .select(concat(lit("003"), lpad(col("c_custkey").cast("string"), 12, "0")).as("ref_id"))
    val dim = Seq(("001", "orders"), ("003", "customer")).toDF("prefix", "target_table")
    o.unionAll(c)
      .join(broadcast(dim), key_prefix(col("ref_id")) === col("prefix"))
      .select("ref_id", "target_table")
  }

  /** Reference: per-table exact counts gating the fixpoint (SURVEY A1,
    * amaxa/amaxa.py:713-726). */
  private val a1: Q = (s, d) => {
    Tables.names.map { t =>
      Tables.load(s, d, t).agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), col("n"))
    }.reduce(_ unionAll _)
  }

  /** Reference: id-set algebra — union/difference/intersection (SURVEY A2,
    * amaxa/amaxa.py:569-591, :615-619). */
  private val a2: Q = (s, d) => {
    val withOrders = Tables.orders(s, d).select(col("o_custkey").as("id")).distinct()
    val negBal = Tables.customer(s, d).filter(col("c_acctbal") < 0.0)
      .select(col("c_custkey").as("id")).distinct()
    val onlyOrders = withOrders.except(negBal).withColumn("tag", lit("only_orders"))
    val both = withOrders.intersect(negBal).withColumn("tag", lit("both"))
    val onlyNeg = negBal.except(withOrders).withColumn("tag", lit("only_negbal"))
    onlyOrders.unionAll(both).unionAll(onlyNeg)
  }

  /** Reference: scalar transform chain T1–T6 (amaxa/transforms.py:52-110,
    * composition amaxa/amaxa.py:860-861). */
  private val t1: Q = (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      lower(col("c_name")).as("lower_name"),
      upper(col("c_mktsegment")).as("upper_seg"),
      trim(col("c_name")).as("trimmed"),
      concat(lit("cust-"), col("c_name")).as("prefixed"),
      concat(col("c_name"), lit("-v1")).as("suffixed"),
      graft.core.Transforms.chain(
        Seq(
          graft.core.TransformSpec("strip"),
          graft.core.TransformSpec("lowercase"),
          graft.core.TransformSpec("prefix", Map("prefix" -> "x-")),
          graft.core.TransformSpec("suffix", Map("suffix" -> "-y"))),
        graft.core.FieldContext("c_name", "xsd:string"))(col("c_name")).as("chained"))

  /** Reference: SalesforceId 15→18 canonicalization (SURVEY T7,
    * amaxa/amaxa.py:55-91) as a codegen'd Catalyst expression; the oracle
    * re-derives the checksum in pure SQL. */
  private val t7: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("id15", id15Expr)
      .select(col("c_custkey"), col("id15"), canonical_id(col("id15")).as("id18"))

  private[queries] def id15Expr =
    concat(lit("001"),
      substring(md5(col("c_custkey").cast("string")), 1, 4),
      upper(substring(md5(col("c_custkey").cast("string")), 5, 4)),
      lpad(col("c_custkey").cast("string"), 4, "0"))

  private[queries] val id15Sql =
    "'001' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) || " +
      "upper(substr(md5(CAST(c_custkey AS VARCHAR)), 5, 4)) || " +
      "lpad(CAST(c_custkey AS VARCHAR), 4, '0')"

  /** Generates DuckDB SQL computing the 15→18 checksum suffix for `c`. */
  private[queries] def sfChecksumSql(c: String): String = {
    def chunk(i: Int): String = {
      val bits = (0 until 5).map { j =>
        val pos = i * 5 + j + 1
        s"(CASE WHEN substr($c,$pos,1) BETWEEN 'A' AND 'Z' THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ012345', ($bits) + 1, 1)"
    }
    s"$c || ${chunk(0)} || ${chunk(1)} || ${chunk(2)}"
  }

  /** TPC-H Q1-shaped pricing summary (aggregation extension, SURVEY A4). */
  private val q1: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(expr("l_shipdate <= '1998-09-02 00:00:00'"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("long")).as("sum_disc_e4"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * 1000000).cast("long")).as("sum_charge_e6"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-shaped top-k (sort/limit extension). */
  private val q3: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d).filter(expr("o_orderdate < '1995-03-15 00:00:00'"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = Tables.lineitem(s, d).filter(expr("l_shipdate > '1995-03-15 00:00:00'"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
        .cast("long")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Rollup aggregation (grouping-sets extension). */
  private val qRollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))

  /** TPC-H Q5-shaped six-table join: revenue per nation where customer and
    * supplier share the nation (multi-way join planning exercise).
    */
  private val q5: Q = (s, d) => {
    val region = Tables.region(s, d).filter(col("r_name") === "ASIA").select("r_regionkey")
    val nation = Tables.nation(s, d)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(s, d)
      .filter(expr("o_orderdate >= '1995-01-01 00:00:00' AND o_orderdate < '1997-01-01 00:00:00'"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
        .cast("long")).as("revenue_e4"))
  }

  /** TPC-H Q14-shaped promo-revenue share: ratio of two exact-cents sums
    * (identical integer operands → bit-identical double division).
    */
  private val q14: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(expr("l_shipdate >= '1995-09-01 00:00:00' AND l_shipdate < '1995-10-01 00:00:00'"))
    val part = Tables.part(s, d).select("p_partkey", "p_type")
    val joined = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val rev = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")
    joined.agg(
      sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(0L)).as("promo_e4"),
      sum(rev).as("total_e4"))
      .select(col("promo_e4"), col("total_e4"),
        (col("promo_e4").cast("double") / col("total_e4").cast("double")).as("promo_share"))
  }

  /** Correlated-scalar-subquery surface (TPC-H Q2/Q17 class): the SQL
    * text is shared VERBATIM with the DuckDB oracle (both dialects parse
    * it), so the gate proves Catalyst's decorrelation — not a hand-
    * rewritten join — computes the same answer. Catalyst rewrites each
    * correlated `(SELECT agg ... WHERE corr = outer)` into an aggregate
    * joined on the correlation key (RewriteCorrelatedScalarSubquery);
    * PlanSpec pins that the optimized plan carries no subquery expression
    * and the physical plan has no nested-loop/cartesian shape — the
    * decorrelated form is all hash/merge joins that scale like any other
    * join, where a per-outer-row subquery re-execution would be O(n·m).
    *
    * Money discipline as q1/q14: integer cents, BIGINT sums. Q17's
    * small-quantity predicate `qty < 0.2·avg(qty)` is algebraically
    * rearranged to the integer-exact `5·qty·count < sum` (quantities are
    * integral), so no float-rounding boundary can flip a row between
    * engines.
    */
  /** Run one of the shared-with-oracle SQL texts against a CHILD session
    * (`newSession`: own temp-view namespace and SQL conf, shared
    * SparkContext and cache). Registering the bare tpch view names in
    * the CALLER's session would both race two concurrent corpora in one
    * session (view swapped between createOrReplaceTempView and sql) and
    * leave session-global views shadowing `lineitem`/`orders`/… for any
    * later spark.sql — the same session-concurrency discipline as
    * Materialize.onceBucketed's per-session table names. The SQL text
    * itself stays VERBATIM-shared with the DuckDB oracle, which a
    * corpus-suffixed-view-name scheme would break. */
  private def tpchSql(s: SparkSession, d: String, sql: String): DataFrame = {
    val child = s.newSession()
    Tables.lineitem(child, d).createOrReplaceTempView("lineitem")
    Tables.part(child, d).createOrReplaceTempView("part")
    Tables.supplier(child, d).createOrReplaceTempView("supplier")
    Tables.nation(child, d).createOrReplaceTempView("nation")
    Tables.region(child, d).createOrReplaceTempView("region")
    Tables.customer(child, d).createOrReplaceTempView("customer")
    Tables.orders(child, d).createOrReplaceTempView("orders")
    child.sql(sql)
  }

  /** TPC-H Q2 shape on the available schema (no partsupp table): the
    * part↔supplier cost relation is derived from lineitem (cheapest
    * observed line price in cents per pair), and the correlated subquery
    * finds the minimum cost among EUROPE suppliers per part — with joins
    * INSIDE the correlated scope, the harder decorrelation case. */
  val Q2Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eu AS (
      |  SELECT s_suppkey, s_name
      |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE')
      |SELECT p.p_partkey, eu.s_suppkey, eu.s_name, ps.cost_cents
      |FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
      |JOIN eu ON eu.s_suppkey = ps.l_suppkey
      |WHERE p.p_size = 15
      |  AND ps.cost_cents = (
      |    SELECT min(ps2.cost_cents)
      |    FROM ps ps2 JOIN eu eu2 ON eu2.s_suppkey = ps2.l_suppkey
      |    WHERE ps2.l_partkey = p.p_partkey)""".stripMargin

  /** TPC-H Q17 shape: revenue lost to small-quantity lines, where
    * "small" is the integer-exact rearrangement of qty < 0.2·avg(qty)
    * over the part's own lineitems (two correlated aggregates). */
  val Q17Sql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS lost_cents,
      |  CAST(count(*) AS BIGINT) AS n_small
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#13'
      |  AND 5 * l.l_quantity *
      |    (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      |    < (SELECT sum(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  /** TPC-H Q13 shape: customer order-count distribution through a
    * filtered LEFT OUTER join (the filter lives in the ON clause so
    * customers with zero surviving orders still count at c_count = 0). */
  val Q13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q15 shape: top supplier by a windowed revenue view, selected
    * by an UNcorrelated scalar subquery over the same aggregate (the
    * view is named once and consumed twice — rows and max). Ties all
    * surface (= max, no LIMIT), so the result is a deterministic set. */
  val Q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.total_e4
      |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
      |WHERE r.total_e4 = (SELECT max(total_e4) FROM rev)""".stripMargin

  /** TPC-H Q20 shape: nested IN chain (supplier ∈ suppliers-of-parts ∈
    * name-filtered parts) with a HAVING threshold — Catalyst lowers both
    * INs to LEFT SEMI joins (no per-row subquery; quantities integral so
    * the HAVING compare is exact). */
  val Q20Sql: String =
    """SELECT s.s_suppkey, s.s_name, n.n_name
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 1600)""".stripMargin

  /** TPC-H Q6: single-table filter + aggregate — the canonical pushdown
    * showcase (every predicate reaches the parquet scan; no join, no
    * shuffle beyond the final partial/final agg pair). The discount band
    * compares integer basis points (`round(l_discount*100)`), not raw
    * doubles, so no float-literal/decimal-literal dialect difference can
    * flip a row between engines. */
  val Q6Sql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q7 (volume shipping): six-table join, bidirectional nation
    * pair, revenue per (supp_nation, cust_nation, year). Nation pair
    * chosen so both directions are populated at every test SF. */
  val Q7Sql: String =
    """WITH shipping AS (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
      |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT) AS rev_e4
      |  FROM supplier s
      |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
      |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
      |    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      |SELECT supp_nation, cust_nation, l_year,
      |  CAST(sum(rev_e4) AS BIGINT) AS revenue_e4,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM shipping GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 (national market share): eight-table join; the share is a
    * division of two identical-integer-operand sums (the q14 discipline —
    * bit-identical doubles on both engines). */
  val Q8Sql: String =
    """WITH all_nations AS (
      |  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
      |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT) AS volume_e4,
      |    n2.n_name AS supp_nation
      |  FROM part p
      |  JOIN lineitem l ON p.p_partkey = l.l_partkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |  JOIN region r ON n1.n_regionkey = r.r_regionkey
      |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
      |SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume_e4 ELSE 0 END) AS BIGINT) AS nation_e4,
      |  CAST(sum(volume_e4) AS BIGINT) AS total_e4,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume_e4 ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(volume_e4) AS DOUBLE) AS mkt_share
      |FROM all_nations GROUP BY o_year""".stripMargin

  /** TPC-H Q9 shape (product-type profit) on the available schema: no
    * partsupp table, so the per-(part,supplier) unit cost is DERIVED from
    * lineitem — min observed per-unit price in cents (the Q2 `ps` CTE
    * discipline; the division happens before rounding on identical
    * double operands, so both engines derive the same integer). Profit
    * is then revenue cents − qty·unit_cost, all integer. */
  val Q9Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    min(CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT)) AS unit_cost_cents
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT nation, o_year, CAST(sum(amount_cents) AS BIGINT) AS profit_cents,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM (
      |  SELECT n.n_name AS nation,
      |    CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
      |    CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
      |      - CAST(l.l_quantity AS BIGINT) * ps.unit_cost_cents AS amount_cents
      |  FROM lineitem l
      |  JOIN ps ON ps.l_partkey = l.l_partkey AND ps.l_suppkey = l.l_suppkey
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE p.p_name LIKE '%gear%') profit
      |GROUP BY nation, o_year""".stripMargin

  /** TPC-H Q10 (returned items): top 20 customers by returned-line
    * revenue in a quarter. The ORDER BY carries c_custkey as tiebreak so
    * the LIMIT cut is a deterministic set on both engines. */
  val Q10Sql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue_e4 DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q11 shape (important stock) without partsupp: per-part value
    * held by one nation's suppliers, kept where value exceeds 2× the
    * average — the defining uncorrelated-scalar-subquery-threshold shape,
    * rearranged to integer cross-multiplication (value·count > 2·total)
    * so no fraction literal or float division is compared. */
  val Q11Sql: String =
    """WITH val AS (
      |  SELECT l.l_partkey AS partkey,
      |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  WHERE n.n_name = 'NATION_3'
      |  GROUP BY l.l_partkey)
      |SELECT partkey, value_cents FROM val
      |WHERE value_cents * (SELECT CAST(count(*) AS BIGINT) FROM val)
      |    > 2 * (SELECT CAST(sum(value_cents) AS BIGINT) FROM val)""".stripMargin

  /** TPC-H Q12 shape (shipping-priority audit) on the available schema:
    * no l_shipmode/l_receiptdate, so "late" is shipped ≥60 days after the
    * order date and the group key is l_linestatus; the conditional
    * high/low-priority counts are the Q12 signature. */
  val Q12Sql: String =
    """SELECT l.l_linestatus AS linestatus,
      |  CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT' OR o.o_orderpriority = '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT' AND o.o_orderpriority <> '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l.l_linestatus""".stripMargin

  /** TPC-H Q19 shape (disjunctive predicate revenue) without
    * p_container/l_shipmode: OR-of-ANDs over brand × size × quantity
    * bands. The point is the optimizer extracting the common join key and
    * pushing the per-side conjuncts (brand/size to the part scan) while
    * the cross-table disjunction stays a post-join filter. */
  val Q19Sql: String =
    """SELECT
      |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity >= 1 AND l.l_quantity <= 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 10 AND l.l_quantity <= 20)
      |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 20 AND l.l_quantity <= 30)""".stripMargin

  private val q2MinCost: Q = (s, d) => tpchSql(s, d, Q2Sql)
  private val q17SmallQty: Q = (s, d) => tpchSql(s, d, Q17Sql)
  private val q13CustDist: Q = (s, d) => tpchSql(s, d, Q13Sql)
  private val q15TopSupplier: Q = (s, d) => tpchSql(s, d, Q15Sql)
  private val q20PartSuppliers: Q = (s, d) => tpchSql(s, d, Q20Sql)
  private val q6Forecast: Q = (s, d) => tpchSql(s, d, Q6Sql)
  private val q7Shipping: Q = (s, d) => tpchSql(s, d, Q7Sql)
  private val q8MktShare: Q = (s, d) => tpchSql(s, d, Q8Sql)
  private val q9Profit: Q = (s, d) => tpchSql(s, d, Q9Sql)
  private val q10Returned: Q = (s, d) => tpchSql(s, d, Q10Sql)
  private val q11Stock: Q = (s, d) => tpchSql(s, d, Q11Sql)
  private val q12Late: Q = (s, d) => tpchSql(s, d, Q12Sql)
  private val q19Disjunctive: Q = (s, d) => tpchSql(s, d, Q19Sql)

  /** JSONL source/sink round-trip over documents — the serialization
    * format training-data pipelines actually exchange. Schema-enforced
    * re-read (JSON escaping covers embedded newlines/quotes in text).
    */
  private val s5Jsonl: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars", "text")
    val out = roundTripDir(s, "jsonl_roundtrip", d)
    docs.write.mode("overwrite").json(out)
    s.read.schema(docs.schema).json(out)
  }

  /** Sliding ROWS-frame window: lag + 4-row moving aggregate per customer
    * in date order. Moving sum/count are exact integers; the average is
    * one double division of identical integer operands on both engines.
    */
  private val w2: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("o_totalprice") * 100).cast("long")
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val moving = byDate.rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), cents.as("price_cents"),
        lag(cents, 1).over(byDate).as("prev_cents"),
        sum(cents).over(moving).as("mov4_cents"),
        count(lit(1)).over(moving).as("mov4_n"))
      .withColumn("mov4_avg",
        col("mov4_cents").cast("double") / col("mov4_n").cast("double"))
  }

  /** RANGE-interval window frame — the frame type [[w2]]'s ROWS frame
    * does not cover: the 7-day trailing revenue per customer includes
    * every order whose DATE falls in the window, however many rows share
    * a date (peers enter the frame together — the defined RANGE
    * semantics in both engines, so same-date ties need no tie-break).
    * Spark's rangeBetween needs a numeric ordering column; days since a
    * fixed epoch is the standard encoding and DuckDB's native
    * `RANGE BETWEEN INTERVAL 6 DAYS PRECEDING` is its exact mirror.
    * Scale: one shuffle on the partition key; a customer's orders are
    * bounded, so the frame never skews.
    */
  private val w3: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("days"))
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("days"),
        cents.as("price_cents"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        count(lit(1)).over(w).as("n_7d"),
        sum(col("price_cents")).over(w).as("rev_7d_cents"))
  }

  /** Exact percentiles per group — the length/score-percentile filter
    * shape a training-data pipeline runs constantly. Inputs are exact
    * integer cents; the interpolated outputs are quantized (×1000 →
    * BIGINT) so the one-ulp difference between Spark's and DuckDB's
    * interpolation formulas cannot flip the compare.
    */
  private val qPercentiles: Q = (s, d) => {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(cents, array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
      .select(col("l_returnflag"),
        round(col("p")(0) * 1000).cast("long").as("p50_milli"),
        round(col("p")(1) * 1000).cast("long").as("p90_milli"),
        round(col("p")(2) * 1000).cast("long").as("p99_milli"))
  }

  /** Cube aggregation (grouping-sets extension, SURVEY A4). */
  private val qCube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))

  /** Suffix width of the fuzzy-join block key. The key's ENTROPY must
    * scale with the data: pick k so that ~10^k distinct suffixes keep
    * blocks at a bounded size (k=6 bounds blocks to ~n/10^6 — at sf100's
    * ~15M customers that is ~15 canonical rows per block). A fixed-narrow
    * key (k=3) caps at 1000 blocks and block size — hence total work —
    * grows linearly with data, turning the join quadratic overall. */
  val FuzzyBlockSuffix = 6

  /** Salt fan-out for the two-phase skewed aggregate (a3_skew_agg). */
  val SkewAggSalt = 64

  /** Blocked fuzzy join — approximate-key matching (the "recover the
    * canonical record for a misspelled reference" ETL step). Dirty
    * variants (every 3rd customer's name with its 3rd character dropped)
    * are matched back to the canonical names with Levenshtein ≤ 1,
    * BLOCKED on the last-[[FuzzyBlockSuffix]]-char key so the edit
    * distance only runs within small equi-join groups — block + verify,
    * never an all-pairs cross join. (The mangled character sits outside
    * the suffix, so the block key is edit-invariant for this error
    * model; a general deletion model blocks on several keys.)
    */
  private val f8FuzzyMatch: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val dirty = base.where(col("id") % 3 === 0)
      .select(col("id").as("dirty_id"),
        concat(substring(col("name"), 1, 2), expr("substring(name, 4)"))
          .as("dirty_name"))
    dirty.withColumn("bk", expr(s"right(dirty_name, $FuzzyBlockSuffix)"))
      .join(base.withColumn("bk", expr(s"right(name, $FuzzyBlockSuffix)")), Seq("bk"))
      .withColumn("distance", levenshtein(col("dirty_name"), col("name")))
      .where(col("distance") <= 1)
      .select(col("dirty_id"), col("id").as("matched_id"), col("distance"))
  }

  /** Fixed-width histogram over order totals ($10k bins) — the value-
    * distribution profile every quality dashboard needs. One hash
    * aggregate; bins are floor-exact in both engines. */
  private val qHistogram: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 10000).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))

  /** Grouped top-k as a native AGGREGATE (graft.functions.TopKByLong, a
    * TypedImperativeAggregate): top-3 line items by price per supplier.
    * The window form shuffles and sorts candidate rows; this shuffles one
    * k-bounded buffer per (group, split) and never sorts wider than k —
    * the shape that holds at 10⁹ groups. Differential equivalence to the
    * window form and the no-Window/ObjectHashAggregate plan are pinned in
    * TopKAggSpec; the oracle is the QUALIFY row_number form.
    */
  private val qTopkAgg: Q = (s, d) => {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    // No natural line id in the schema: (orderkey, linenumber) is the key
    // and linenumber < 10, so orderkey*10+linenumber is unique and the
    // same expression is exact in DuckDB.
    val lineId = (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
    Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(graft.functions.TopKByLong.top_k_by(cents, lineId, TopKAggK).as("top"))
      .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("l_suppkey"), (col("pos") + 1).as("rank"),
        col("e.key").as("cents"), col("e.id").as("line_id"))
  }

  /** Pearson correlation per group WITHOUT the cross-engine FP trap:
    * `corr()` aggregates doubles in partition order, so no two engines
    * (or two runs) agree bit-for-bit. Instead the five moments are exact
    * integer sums (cents), and the textbook formula is ONE double
    * expression over identical integers — deterministic on both sides.
    * Also the scale-correct shape: moments combine associatively, so
    * partial aggregation stays map-side. */
  private val qCorr: Q = (s, d) => {
    // Moments accumulate in DECIMAL, not LONG: sum(y²) over price-cents
    // longs is already at 80% of Long.MaxValue at sf0.1 and would wrap
    // silently just above it. decimal(12,0) per-row values → products and
    // sums stay well inside 38 digits at any SF; DuckDB's HUGEINT sums
    // match. The single decimal→double conversion per moment is the same
    // correctly-rounded IEEE value on both engines.
    val x = round(col("l_quantity") * 100).cast("decimal(12,0)")
    val y = round(col("l_extendedprice") * 100).cast("decimal(12,0)")
    def d2(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = d2(col("n")) * d2(col("sxy")) - d2(col("sx")) * d2(col("sy"))
    val disc1 = d2(col("n")) * d2(col("sxx")) - d2(col("sx")) * d2(col("sx"))
    val disc2 = d2(col("n")) * d2(col("syy")) - d2(col("sy")) * d2(col("sy"))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      // Degenerate groups are guarded on the DISCRIMINANTS, before any
      // sqrt: for a constant column the rounded doubles can land at a
      // tiny negative instead of exact 0, where Spark's sqrt gives NaN
      // but DuckDB ABORTS (sqrt-of-negative is an error there). <= 0 on
      // both engines makes "undefined correlation" an explicit NULL and
      // keeps sqrt's domain positive; CASE/when evaluate lazily so the
      // guarded branch never runs sqrt.
      .select(col("l_returnflag"), col("n"),
        when(disc1 <= 0.0 || disc2 <= 0.0, lit(null).cast("double"))
          .otherwise(num / (sqrt(disc1) * sqrt(disc2))).as("corr_qty_price"))
  }

  /** Status × year pivot via conditional aggregation — the portable (and
    * Catalyst-preferred) pivot form: one scan, one hash aggregate, no
    * pivot-value discovery pass. Exact-cents sums per status column. */
  private val qPivot: Q = (s, d) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    def statusSum(st: String) = sum(when(col("o_orderstatus") === st, cents))
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(statusSum("O").as("open_cents"),
        statusSum("F").as("filled_cents"),
        statusSum("P").as("pending_cents"),
        count(lit(1)).as("n_orders"))
  }

  /** Non-hierarchical GROUPING SETS ((returnflag), (linestatus)) — the
    * one grouping-sets shape rollup/cube cannot express. Uses the
    * Dataset.groupingSets API (Spark 4); both sets compute in one pass
    * with partial aggregation, same as rollup. */
  private val qGroupingSets: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))

  /** ORC source/sink round-trip over supplier — the second columnar
    * format a Spark shop actually exchanges (native vectorized reader,
    * same pushdown/pruning surface as parquet). Oracle reads the
    * original parquet: a lossless round-trip is exactly value equality. */
  private val srcOrc: Q = (s, d) => {
    val sup = Tables.supplier(s, d)
    val out = roundTripDir(s, "orc_roundtrip", d)
    sup.write.mode("overwrite").orc(out)
    s.read.schema(sup.schema).orc(out)
  }

  /** Planted malformed-line count for [[srcJsonl]] (shared with the
    * oracle's quarantine row). */
  val JsonlCorruptLines = 7

  /** Genuine documents whose `lang` IS the literal string '_corrupt' —
    * planted into the export (and mirrored as oracle literals) to prove
    * the quarantine key cannot collide with a real language value: the
    * card keys on a dedicated `quarantined` boolean, so these land as
    * ordinary ('_corrupt', false) rows while torn lines land as
    * (NULL, true). */
  val JsonlPlantedCorruptLang: Seq[String] = Seq(
    "quarantine is a flag not a language value one",
    "quarantine is a flag not a language value two")

  /** JSONL ingestion with malformed-line tolerance — THE landing format
    * of scraped LLM corpora (public dumps ship as JSON lines): the
    * documents table is exported as a JSONL delivery with
    * [[JsonlCorruptLines]] truncated lines planted (what a killed
    * uploader actually produces), then ingested back through Spark's
    * PERMISSIVE json reader — well-formed lines parse to typed columns,
    * malformed ones land in the corrupt-record column instead of failing
    * the job (at 100 TB one bad line must never kill a delivery; FAILFAST
    * is the mode you cannot run). The emitted report is the per-(lang,
    * quarantined) ingest card (docs, total chars, distinct content
    * hashes); torn lines land under a DEDICATED `quarantined` boolean
    * key — never a sentinel value smuggled into `lang`, which a genuine
    * lang value could collide with ([[JsonlPlantedCorruptLang]] plants
    * exactly that collision to keep the separation honest). The oracle
    * computes the same card from the source table directly (the
    * mm_decode_png closed-form discipline): equality proves the
    * export→parse round-trip character-for-character, and the planted
    * rows prove both the tolerance path and the collision-freedom
    * genuinely ran. Scale shape: the export is a straight map, the read
    * is Spark's codegen'd JSON scanner with schema projection, the card
    * one map-side-combinable groupBy to |langs|+2 rows.
    */
  private val srcJsonl: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val out = roundTripDir(s, "jsonl_ingest", d)
    val planted = JsonlPlantedCorruptLang.zipWithIndex.map { case (t, i) =>
      (-(i + 1).toLong, "_corrupt", t.length.toLong, t)
    }.toDF("doc_id", "lang", "n_chars", "text")
    val good = docs.select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .unionByName(planted)
      .select(to_json(struct(col("doc_id"), col("lang"),
        col("n_chars"), col("text"))).as("value"))
    // Truncated mid-string — invalid JSON, deterministic count.
    val bad = s.range(JsonlCorruptLines).select(
      concat(lit("{\"doc_id\": "), col("id"), lit(", \"lang\": \"en")).as("value"))
    good.unionByName(bad).write.mode("overwrite").text(out)
    val parsed = s.read
      .schema("doc_id LONG, lang STRING, n_chars LONG, text STRING, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(out)
    parsed
      .select(col("lang"), col("_corrupt").isNotNull.as("quarantined"),
        col("n_chars"), col("text"))
      .groupBy("lang", "quarantined")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).as("n_chars_sum"),
        count_distinct(md5(col("text"))).as("n_distinct_texts"))
  }

  /** Schema evolution across deliveries — the lakehouse fact of life a
    * long-lived 100 TB corpus store must absorb: delivery 1 lands with
    * the original column set, delivery 2 adds a column (`c_acctbal`),
    * and a single mergeSchema read serves the UNION with nulls filling
    * the old files — no rewrite of delivery 1 (at 100 TB a backfill
    * rewrite is the thing you cannot afford; schema-on-read absorbs the
    * drift for free). Footer-only schema merge at planning time; column
    * pruning/pushdown still apply per file (old files simply produce
    * nulls for the new column).
    */
  private val srcSchemaEvolution: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val out = roundTripDir(s, "schema_evo", d)
    cust.where(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .write.mode("overwrite").parquet(s"$out/delivery1")
    cust.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
      .write.mode("overwrite").parquet(s"$out/delivery2")
    s.read.option("mergeSchema", true)
      .parquet(s"$out/delivery1", s"$out/delivery2")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
  }

  /** Snapshot diff between two landed deliveries — the change-DETECTION
    * complement of src_upsert_merge/src_scd2_merge (which APPLY changes):
    * given yesterday's and today's full snapshots on disk, emit exactly
    * the added / removed / changed keys with old and new values, so every
    * downstream incremental job processes the delta instead of the 100 TB
    * snapshot. One key-keyed full outer join — both sides shuffle once on
    * the key; at scale both snapshots would be bucketed by key and the
    * join goes exchange-free (src_bucketed_join is the demonstrated
    * lever). Value comparison is exact: unchanged rows carry the
    * IDENTICAL stored double, and the synthesized change is ×2 (an
    * exponent increment — exact in IEEE754), so engine and oracle agree
    * bit-for-bit with no tolerance gate.
    */
  private val srcDeltaDiff: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val out = roundTripDir(s, "delta_diff", d)
    base.where(col("c_custkey") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$out/v1")
    base.where(col("c_custkey") % 10 =!= 1)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal") * 2)
          .otherwise(col("c_acctbal")))
      .write.mode("overwrite").parquet(s"$out/v2")
    val v1 = s.read.parquet(s"$out/v1")
      .select(col("c_custkey"), col("c_acctbal").as("old_acctbal"))
    val v2 = s.read.parquet(s"$out/v2")
      .select(col("c_custkey"), col("c_acctbal").as("new_acctbal"))
    v1.join(v2, Seq("c_custkey"), "full_outer")
      .withColumn("change_type",
        when(col("old_acctbal").isNull, "added")
          .when(col("new_acctbal").isNull, "removed")
          .when(col("old_acctbal") =!= col("new_acctbal"), "changed"))
      .where(col("change_type").isNotNull)
      .select(col("c_custkey"), col("change_type"),
        col("old_acctbal"), col("new_acctbal"))
  }

  /** Hive-style partitioned parquet layout: documents written
    * `partitionBy(lang)`, then read with a partition predicate. The
    * filter never touches row data — it prunes whole directories at
    * planning time (PartitionFilters in the scan, guarded by PlanSpec).
    * This is THE layout lever for a 100 TB corpus: per-language jobs
    * read only their partition's files. */
  private val srcPartitioned: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val out = roundTripDir(s, "partitioned_docs", d)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    s.read.parquet(out)
      .where(col("lang").isin("en", "fr"))
      // lang comes back as a partition column; re-select to fix both the
      // column order and the partition-value string type.
      .select(col("doc_id"), col("lang").cast("string").as("lang"),
        col("n_chars"))
  }

  /** Sort-clustered layout + row-group skipping — the data-skipping
    * lever for a time-keyed 100 TB fact table that partition directories
    * are too coarse for: `repartitionByRange(date).sortWithinPartitions
    * (date)` writes parquet whose per-file/row-group min–max date spans
    * are tight and disjoint, so a date-range predicate (pushed to the
    * scan) skips every file the range misses — the scan reads ~the
    * matching slice instead of the whole table. SortedSkippingSpec
    * proves it at runtime (scan numOutputRows ≈ match count on the
    * clustered copy, = table count on an anti-clustered one); this row
    * proves values survive the layout round trip. maxRecordsPerFile
    * bounds file size the way a compaction job would at scale.
    *
    * The clustering column is a real DATE, not the raw timestamp:
    * parquet stats pruning never fires for this corpus's timestamp
    * physical types (measured — both NTZ and session-zone variants read
    * every row group; DateType skips), so a time-keyed table needs a
    * date/day derived column as its clustering key for skipping to
    * work. SCALE.md records the measurement.
    */
  private val srcSorted: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .withColumn("o_date", to_date(col("o_orderdate")))
    val out = roundTripDir(s, "sorted_orders", d)
    o.repartitionByRange(math.max(2, s.sparkContext.defaultParallelism / 8),
        col("o_date"))
      .sortWithinPartitions("o_date")
      .write.mode("overwrite").option("maxRecordsPerFile", 20000).parquet(out)
    s.read.parquet(out)
      .where(expr("o_date >= '1995-03-01' AND o_date < '1995-06-01'"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_date").cast("string").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
  }

  /** Z-order (Morton) clustering — the MULTI-column data-skipping layout
    * that [[srcSorted]]'s linear sort cannot give: interleaving the bits
    * of two clustering dimensions ([[graft.functions.ZOrder64]], codegen)
    * and range-sorting by the interleave writes files whose (day,
    * custkey) bounding boxes are small in BOTH dimensions, so parquet
    * min–max stats prune a predicate on EITHER column — a linear sort
    * only ever prunes its leading column. ZOrderSkippingSpec measures
    * exactly that split at runtime (custkey-only predicate: z-clustered
    * scan reads a fraction, date-sorted scan reads everything); this row
    * proves values survive the layout round trip under a 2-D box
    * predicate.
    *
    * The two dimensions are scaled to COMPARABLE bit-widths first (day
    * index → 16-day buckets ≈ 8 bits, matching the custkey range) — raw
    * interleave of a 12-bit day with an 8-bit key would spend the top
    * splits entirely on day bits and degenerate into a date sort. That
    * rank/bucket normalization is the same move the lakehouse OPTIMIZE
    * ZORDER implementations make, and it's the part a naive morton-code
    * port gets wrong at 100 TB.
    */
  private val srcZorder: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .withColumn("o_date", to_date(col("o_orderdate")))
      .withColumn("day_bucket",
        (datediff(col("o_date"), lit("1992-01-01").cast("date")) / 16).cast("long"))
    val out = roundTripDir(s, "zorder_orders", d)
    o.repartitionByRange(math.max(2, s.sparkContext.defaultParallelism / 8),
        zorder64(col("day_bucket"), col("o_custkey").cast("long")))
      .sortWithinPartitions(zorder64(col("day_bucket"), col("o_custkey").cast("long")))
      .drop("day_bucket")
      .write.mode("overwrite").option("maxRecordsPerFile", 20000).parquet(out)
    s.read.parquet(out)
      .where(expr(
        "o_date >= '1995-03-01' AND o_date < '1995-09-01' AND o_custkey <= 400"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_date").cast("string").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
  }

  /** Dynamic partition pruning — the RUNTIME sibling of
    * `src_partitioned_pruning`'s static pruning, and the lever that
    * makes dimension-filtered scans of a partitioned 100 TB fact cheap
    * when the partition list isn't known until the dim filter runs:
    * Catalyst plants a dynamicpruning subquery on the fact's partition
    * column (pinned in PlanSpec), executes the filtered dim first, and
    * the fact scan then reads ONLY the partitions whose keys survived.
    * No query text asks for it — the partitioned layout plus the
    * dim-side filter is enough, which is exactly why layout is the
    * lever to design first at scale.
    */
  private val qDpp: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val out = roundTripDir(s, "dpp_docs", d)
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    val fact = s.read.parquet(out)
    // The dim must be a real source with a runtime filter: a local
    // relation's filter constant-folds away at optimization, and with
    // no selective predicate left on the dim side Catalyst (correctly)
    // plants no pruning subquery.
    val dimPath = s"$out/__dim"
    Seq(("en", 1), ("fr", 1), ("de", 2), ("ja", 2)).toDF("lang", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath)
    fact.join(dim.where(col("grp") === 1), Seq("lang"))
      .groupBy(col("lang").cast("string").as("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** DataSource V2 scan through the engine's own `format("graft")`
    * provider ([[graft.sources.GraftDataSource]]): resolves
    * option(table)/option(dir) the way [[graft.sources.FileTableStore]]
    * does and delegates planning to Spark's native file tables — the
    * reference's connector seam (amaxa/api.py:140-165) as a REAL Spark
    * extension point. Pushdown + pruning through the custom format are
    * pinned in PlanSpec; this row proves values survive the face.
    */
  private val srcV2Scan: Q = (s, d) =>
    s.read.format("graft").option("dir", d).option("table", "customer").load()
      .where(col("c_acctbal") > 1000)
      .select("c_custkey", "c_name", "c_acctbal")

  /** Two-phase SALTED aggregation — the skew-proof form of a grouped
    * sum. A direct groupBy on a heavy-hitter key funnels that key's
    * whole partition through one reducer; salting the key with a
    * deterministic shard (order key mod [[SkewAggSalt]]) first spreads
    * each group over 64 reducers, and the second, tiny aggregate merges
    * the per-shard partials. Both phases are associative integer sums,
    * so the result is bit-identical to the direct aggregate the oracle
    * runs — this is the shape to reach for when one group holds 10% of
    * 100 TB. (Spark's map-side partial aggregation already de-skews
    * pure sums; the explicit salt stage is the pattern for the cases it
    * cannot — e.g. collect-style or distinct aggregates.) */
  private val a3SkewAgg: Q = (s, d) => {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(SkewAggSalt)).as("__salt"))
      .agg(sum(cents).as("c"), count(lit(1)).as("m"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("c")).as("price_cents"), sum(col("m")).as("n_items"))
  }

  /** Bloom-filter semi-join reduction ([[graft.operators.BloomPrune]]) —
    * the EXPLICIT form of the runtime filter Spark's `InjectRuntimeFilter`
    * builds automatically (that automatic form is pinned in PlanSpec).
    * The selective dim (customers with acctbal > 9500, ~5%) builds a
    * compact bloom in one partial-agg pass; the fact scan drops
    * non-joining rows inside whole-stage codegen BEFORE any shuffle. The
    * bloom admits false positives only, and the real join follows, so the
    * result is value-identical to the plain join the oracle runs — at
    * 100 TB the bloom is the difference between shuffling the full fact
    * table and shuffling ~5% of it, for dim key sets too large to
    * broadcast as an exact hash relation. */
  private val qBloomPrune: Q = (s, d) => {
    val dim = Tables.customer(s, d)
      .where(col("c_acctbal") > 9500)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val pruned = graft.operators.BloomPrune.filterBy(
      Tables.orders(s, d), col("o_custkey"), dim, col("c_custkey"),
      expectedKeys = 1L << 16)
    pruned.join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("bal_cents"))
  }

  /** Bucketed co-located join — the pay-the-shuffle-ONCE layout for keys
    * joined repeatedly at 100 TB. Both sides are written `bucketBy` the
    * join key into the same bucket count (with an in-bucket sort), so
    * every later join on that key is exchange-free: the scan itself
    * reports hash-clustered output and the sort-merge join consumes it
    * with no shuffle on either side (BucketingSpec pins zero
    * ShuffleExchange below the join in the EXECUTED plan; the residual
    * partition-local Sort over the sortBy-ordered runs is the modern
    * default — spark.sql.legacy.bucketedTableScan.outputOrdering elides
    * it too). The bucket-file write repartitions by the bucket hash
    * first so each bucket lands in one file instead of tasks × buckets
    * fragments — the small-files failure mode of naive bucketed writes. */
  private val srcBucketed: Q = (s, d) => {
    val nb = 8
    val suffix = Integer.toHexString(d.hashCode)
    val out = roundTripDir(s, "bucketed", d)
    def writeBucketed(df: DataFrame, key: String, table: String): String = {
      val name = s"graft_${table}_$suffix"
      s.sql(s"DROP TABLE IF EXISTS $name")
      df.repartition(nb, col(key))
        .write.bucketBy(nb, key).sortBy(key)
        .option("path", s"$out/$table").mode("overwrite").saveAsTable(name)
      name
    }
    val o = writeBucketed(
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents")),
      "o_custkey", "orders_b")
    val c = writeBucketed(
      Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
      "c_custkey", "cust_b")
    s.table(o).hint("merge")
      .join(s.table(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("sum_cents"))
  }

  /** Mergeable HLL distinct-count sketches (Apache DataSketches via
    * Spark's `hll_sketch_agg` family) — the 100 TB answer to COUNT
    * DISTINCT dashboards: sketch each shard once (here: per order
    * priority), persist the ~KB sketches, and answer any union of shards
    * later by merging sketches instead of re-scanning the data — the
    * ALL row here is `hll_union_agg` over the five per-priority
    * sketches, never a second pass over the table.
    *
    * Oracle contract: the sketch is APPROXIMATE by design, and above
    * ~12k distincts lgK=14 leaves its sparse-exact mode (sf0.1 exposed
    * this — the earlier value-for-value oracle only held while sparse).
    * So the gated columns are the EXACT count plus a PROPERTY of the
    * estimate: |est − exact| ≤ 3% · exact (3σ for lgK=14's 0.81%
    * standard error; the sketch is deterministic, so this is a stable
    * bound, not a flaky tolerance). The oracle asserts the property by
    * emitting literal TRUE — a violated bound flips the engine's boolean
    * and fails the hash compare at ANY SF. SketchSpec additionally pins
    * merge-consistency and the dense-mode error at adversarial
    * cardinality. */
  private val qHll: Q = (s, d) => {
    val ords = Tables.orders(s, d)
    val shard = ords
      .groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"),
        countDistinct(col("o_custkey")).as("n_custs"))
    def within(est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      abs(est.cast("double") - exact.cast("double")) <= exact.cast("double") * 0.03
    val per = shard.select(col("o_orderpriority"), col("n_custs"),
      within(expr("hll_sketch_estimate(sk)"), col("n_custs")).as("hll_within_3pct"))
    val all = shard.agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .crossJoin(ords.agg(countDistinct(col("o_custkey")).as("n_custs")))
      .select(lit("ALL").as("o_orderpriority"), col("n_custs"),
        within(col("est"), col("n_custs")).as("hll_within_3pct"))
    per.unionByName(all)
  }

  /** KLL sketch parameter and the rank-error slack the oracle gate uses:
    * k=200 publishes ε≈1.33% normalized rank error at 99% confidence;
    * 0.05 is ~4× slack so the (randomized-compaction) sketch cannot
    * flake the gate at any SF, while still being a real error assertion.
    */
  val KllK = 200
  val KllRankEps = 0.05

  /** THE tied-value-sound KLL rank gate, shared by q_kll_quantiles and
    * tx_curriculum_kll: a probed estimate's exact rank interval
    * [lo/n, hi/n] (strict-below / inclusive counts) must intersect
    * [p − [[KllRankEps]], p + [[KllRankEps]]] — gating on the inclusive
    * endpoint alone would false-fail a perfect sketch whenever one tied
    * value carries more than ε of the mass at the probed rank. */
  def kllRankOk(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column, p: Double): org.apache.spark.sql.Column =
    lo.cast("double") / n.cast("double") <= lit(p + KllRankEps) &&
      hi.cast("double") / n.cast("double") >= lit(p - KllRankEps)

  /** Mergeable KLL quantile sketches — completes the sketch family
    * (HLL distinct ✓, count-min ✓, quantiles here). The dashboard/
    * data-quality shape at 100 TB: sketch each delivery shard once,
    * persist the ~KB sketches, answer p50/p95/p99 over any union of
    * shards later by MERGING sketches ([[graft.functions.KllMergeAgg]])
    * instead of re-sorting the data; `percentile`'s exact answer needs a
    * full shuffle per question asked.
    *
    * Oracle contract (the q_hll_distinct discipline): KLL compaction is
    * randomized, so the gated columns are the EXACT percentiles plus a
    * PROPERTY of each estimate — its true INCLUSIVE rank (fraction of
    * values ≤ estimate, recomputed exactly against the data) within
    * [[KllRankEps]] of the probed rank. The oracle emits literal TRUE;
    * a violated bound flips the engine boolean and fails the hash
    * compare at any SF.
    */
  private val qKllQuantiles: Q = (s, d) => {
    import graft.functions.KllSketch._
    val base = Tables.lineitem(s, d).select(col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast("long").cast("double").as("v"),
      col("l_orderkey"))
    // Per-shard sketches (the per-delivery axis), merged cell-wise per
    // group — exercising the persist-then-merge path, not just one agg.
    val merged = base.withColumn("shard", pmod(col("l_orderkey"), lit(8)))
      .groupBy(col("l_returnflag"), col("shard"))
      .agg(kll_sketch_agg(col("v"), KllK).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(kll_merge_agg(col("sk"), KllK).as("sk"))
      .select(col("l_returnflag"),
        kll_quantiles(col("sk"), Seq(0.5, 0.95, 0.99)).as("q"))
      .select(col("l_returnflag"), col("q")(0).as("e50"),
        col("q")(1).as("e95"), col("q")(2).as("e99"))
    // Exact rank INTERVAL of each estimate against the data itself. Under
    // tied values a single item occupies the whole rank run
    // [count(<v)/n, count(<=v)/n]; KLL guarantees the SELECTION rank is
    // within ε of p, so the sound property is that the interval
    // intersects [p−ε, p+ε] — gating on the inclusive endpoint alone
    // would false-fail a perfect sketch whenever one value carries more
    // than ε of a group's mass at the probed rank.
    val ranks = base.join(broadcast(merged), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("e50"), 1L).otherwise(0L)).as("lo50"),
        sum(when(col("v") <= col("e50"), 1L).otherwise(0L)).as("hi50"),
        sum(when(col("v") < col("e95"), 1L).otherwise(0L)).as("lo95"),
        sum(when(col("v") <= col("e95"), 1L).otherwise(0L)).as("hi95"),
        sum(when(col("v") < col("e99"), 1L).otherwise(0L)).as("lo99"),
        sum(when(col("v") <= col("e99"), 1L).otherwise(0L)).as("hi99"))
    def ok(lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
        p: Double) = Relational.kllRankOk(lo, hi, col("n"), p)
    // Exact percentiles via the INTEGER closed form of linear
    // interpolation, not `percentile`: values are integral cents and
    // p = k/100, so the interpolated value at exact rational position
    // (n−1)·k/100 is milli = lo·1000 + (hi−lo)·rem·10 with
    // rem = ((n−1)·k) mod 100 — every term a BIGINT. Both engines
    // (`percentile` here, `quantile_cont` in DuckDB) linearly
    // interpolate in FLOAT, where a one-ulp interpolation-order
    // difference can flip round(x·1000) at a .5 boundary; the closed
    // form removes the float from both sides of the compare.
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("c"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
    val ranked = base
      .select(col("l_returnflag"), col("v").cast("long").as("c"))
      .withColumn("rn", row_number().over(wRank).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(wAll))
    def pAggs(k: Int) = Seq(
      min(when(col("rn") === expr(s"((n-1)*$k) div 100"), col("c")))
        .as(s"lo$k"),
      min(when(col("rn") === expr(s"((n-1)*$k) div 100 + " +
        s"(CASE WHEN ((n-1)*$k) % 100 > 0 THEN 1 ELSE 0 END)"), col("c")))
        .as(s"hi$k"),
      max(expr(s"((n-1)*$k) % 100")).as(s"rem$k"))
    def pMilli(k: Int) =
      (col(s"lo$k") * 1000 + (col(s"hi$k") - col(s"lo$k")) * col(s"rem$k") * 10)
        .as(s"p${k}_milli")
    val pCols = Seq(50, 95, 99).flatMap(pAggs)
    val exact = ranked.groupBy(col("l_returnflag"))
      .agg(pCols.head, pCols.tail: _*)
      .select(col("l_returnflag"), pMilli(50), pMilli(95), pMilli(99))
    exact.join(ranks, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("p50_milli"), col("p95_milli"),
        col("p99_milli"),
        ok(col("lo50"), col("hi50"), 0.5).as("kll_p50_within_eps"),
        ok(col("lo95"), col("hi95"), 0.95).as("kll_p95_within_eps"),
        ok(col("lo99"), col("hi99"), 0.99).as("kll_p99_within_eps"))
  }

  /** K for [[qKmvSetOps]]: unsaturated (EXACT estimates) at sf0.001's
    * ~130 distinct customers per priority, saturated (real estimation)
    * from sf0.01 up — both code paths oracle-gated across the SFs. */
  val KmvK: Int = graft.functions.KmvSketch.DefaultK

  /** KMV (theta-style) distinct SET-OPERATION sketches — the member of
    * the sketch family HLL cannot provide: per-segment sketches that
    * answer UNION and INTERSECTION distinct counts for any segment pair
    * from the persisted sketches alone. Per order priority, the K
    * smallest md5-64 hashes of the customer set
    * ([[graft.functions.KmvSketchAgg]], mergeable — built through the
    * partial/final path over 32 partitions); every pair of priorities
    * then reports est/exact distinct counts for A, B, A∪B, A∩B. The
    * hash and the K-minimum selection are DETERMINISTIC, so unlike the
    * q_hll/q_kll property gates the oracle reproduces the estimate
    * VALUES exactly (integer ⌊·⌋ arithmetic end to end, milli-scaled).
    *
    * Shapes: one map-side-combinable sketch aggregate over the corpus
    * (K longs per group); the pair frame is nlist²-sized metadata (a
    * deliberate bounded non-equi join); the exact columns cost one
    * distinct + one self-join on custkey — the cross-check a real
    * pipeline runs once to validate the sketches it then trusts. At
    * 100 TB only the sketch aggregate and the exact cross-check touch
    * data; segment-pair analytics (audience overlap, contamination
    * between corpus slices) then run entirely on sketch rows.
    */
  private val qKmvSetOps: Q = (s, d) => {
    import graft.functions.KmvSketch._
    val h = Tables.orders(s, d).select(col("o_orderpriority").as("p"),
      col("o_custkey"),
      graft.functions.GraftFunctions.md5_64(col("o_custkey").cast("string"))
        .as("h"))
    // Per-shard sketches merged cell-wise (the q_kll persist-then-merge
    // path — KMV merge is deterministic AND lossless, so this equals the
    // direct build bit-for-bit; SketchSpec pins it). 5-row frame, cut:
    // the pair join consumes it twice.
    val sk = graft.core.Lineage.cut(
      h.withColumn("shard", pmod(col("o_custkey"), lit(8)))
        .groupBy(col("p"), col("shard"))
        .agg(kmv_sketch_agg(col("h"), KmvK).as("sk"))
        .groupBy(col("p"))
        .agg(kmv_merge_agg(col("sk"), KmvK).as("sk")))
    val est = sk.select(col("p").as("pa"), col("sk").as("sk_a"))
      .join(sk.select(col("p").as("pb"), col("sk").as("sk_b")),
        col("pa") < col("pb"))
      .select(col("pa"), col("pb"),
        kmv_est_milli(col("sk_a"), KmvK).as("est_a_milli"),
        kmv_est_milli(col("sk_b"), KmvK).as("est_b_milli"),
        kmv_union_milli(col("sk_a"), col("sk_b"), KmvK).as("est_union_milli"),
        kmv_inter_milli(col("sk_a"), col("sk_b"), KmvK).as("est_inter_milli"))
    val pc = graft.core.Lineage.cut(Tables.orders(s, d)
      .select(col("o_orderpriority").as("p"), col("o_custkey").as("c"))
      .distinct())
    val na = pc.groupBy(col("p")).agg(count(lit(1)).as("n"))
    val inter = pc.select(col("p").as("pa"), col("c"))
      .join(pc.select(col("p").as("pb"), col("c")), Seq("c"))
      .where(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("xi"))
    est
      .join(na.select(col("p").as("pa"), col("n").as("n_a")), Seq("pa"))
      .join(na.select(col("p").as("pb"), col("n").as("n_b")), Seq("pb"))
      .join(inter, Seq("pa", "pb"), "left")
      .select(col("pa"), col("pb"),
        col("est_a_milli"), col("est_b_milli"),
        col("est_union_milli"), col("est_inter_milli"),
        (col("n_a") + col("n_b") - coalesce(col("xi"), lit(0L)))
          .as("exact_union"),
        coalesce(col("xi"), lit(0L)).as("exact_inter"))
  }

  /** TPC-H Q4-shaped EXISTS: orders with at least one returned line,
    * counted by priority. The subquery is a LEFT SEMI join — each order
    * emits at most once regardless of how many lines match, and Spark
    * never materializes the match pairs. */
  private val q4Exists: Q = (s, d) => {
    val returned = Tables.lineitem(s, d)
      .where(col("l_returnflag") === "R").select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Modulus selecting the upsert delta: ~5% of keys, matching the
    * real-pipeline regime where the delta is a small fraction of the
    * base (that asymmetry is what justifies the broadcast below). */
  val UpsertDeltaMod = 20

  /** Incremental snapshot merge (SCD-1 upsert): a base snapshot merged
    * with a delta of changed rows (re-priced +$100), last-writer-wins.
    * The delta in a real pipeline is orders of magnitude smaller than
    * the base, so the scale-correct plan is the one used here:
    * BROADCAST the delta's keys, anti-join the base (map-side, zero
    * shuffle of the 100 TB side), and union the delta rows back — not a
    * windowed row_number over the union, which would shuffle and sort
    * the full base on every merge. */
  private val srcUpsert: Q = (s, d) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), cents.as("price_cents"), lit(0).as("version"))
    val delta = Tables.orders(s, d)
      .where(pmod(col("o_orderkey"), lit(UpsertDeltaMod)) === 0)
      .select(col("o_orderkey"), (cents + 10000).as("price_cents"),
        lit(1).as("version"))
    base.join(broadcast(delta.select(col("o_orderkey"))), Seq("o_orderkey"), "left_anti")
      .unionByName(delta)
  }

  /** Full CDC MERGE — [[srcUpsert]] completed with DELETE semantics:
    * the change batch carries an op per key (orderkey % 3 == 0 of the
    * delta keys → delete, else upsert), and the applied snapshot is
    * base MINUS touched keys UNION the upsert rows — exactly the
    * `MERGE WHEN MATCHED [AND op='D'] THEN DELETE / WHEN MATCHED THEN
    * UPDATE / WHEN NOT MATCHED THEN INSERT` contract a lakehouse runs
    * per change batch. Scale shape: the delta's KEYS broadcast into a
    * map-side anti join (the srcUpsert discipline — the 100 TB base
    * never shuffles; a window-sort merge would), and the upserts union
    * back. Deletes cost nothing beyond key membership. */
  private val srcMergeCdc: Q = (s, d) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), cents.as("price_cents"), lit(0).as("version"))
    val delta = Tables.orders(s, d)
      .where(pmod(col("o_orderkey"), lit(UpsertDeltaMod)) === 0)
      .select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(3)) === 0, "D").otherwise("U").as("op"),
        (cents + 10000).as("price_cents"))
    val upserts = delta.where(col("op") === "U")
      .select(col("o_orderkey"), col("price_cents"), lit(1).as("version"))
    base.join(broadcast(delta.select(col("o_orderkey"))),
        Seq("o_orderkey"), "left_anti")
      .unionByName(upserts)
  }

  /** SCD-2 history-preserving merge — [[srcUpsert]]'s sibling for when
    * the warehouse must keep EVERY version: changed keys get their
    * current row CLOSED (valid_to stamped, current=false) and a new
    * open row appended; unchanged keys pass through untouched. The
    * scale-correct plan is the same asymmetric shape as the SCD-1
    * merge: the delta (≪ base) broadcasts, the 100 TB base is touched
    * by one map-side semi/anti split — no window over the unioned
    * history, no shuffle of the base. Epoch sentinels (valid_to =
    * [[Scd2Open]] for open rows) keep every output column an exact
    * integer. */
  private val srcScd2: Q = (s, d) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), cents.as("price_cents"),
        lit(0L).as("valid_from"), lit(Scd2Open).as("valid_to"),
        lit(true).as("current"))
    val deltaKeys = Tables.orders(s, d)
      .where(pmod(col("o_orderkey"), lit(UpsertDeltaMod)) === 0)
      .select(col("o_orderkey"))
    val unchanged = base.join(broadcast(deltaKeys), Seq("o_orderkey"), "left_anti")
    val closed = base.join(broadcast(deltaKeys), Seq("o_orderkey"), "left_semi")
      .withColumn("valid_to", lit(1L))
      .withColumn("current", lit(false))
    val opened = Tables.orders(s, d)
      .join(broadcast(deltaKeys), Seq("o_orderkey"), "left_semi")
      .select(col("o_orderkey"), (cents + 10000).as("price_cents"),
        lit(1L).as("valid_from"), lit(Scd2Open).as("valid_to"),
        lit(true).as("current"))
    unchanged.unionByName(closed).unionByName(opened)
  }

  /** Open-row sentinel for [[srcScd2]] (integer "infinity" epoch). */
  val Scd2Open = 9999999999L

  /** Time travel over the SCD-2 history — the READ side that justifies
    * keeping versions at all: `AS OF t` is the pure filter
    * `valid_from <= t < valid_to` over the history (each key has exactly
    * one valid row per instant by construction), a map-side predicate
    * the scan pushes down when the history is stored partitioned or
    * sorted on the validity columns. Reconstructs BOTH epochs: as-of 0
    * mixes closed rows (changed keys' originals) with unchanged rows —
    * a nontrivial reconstruction — and as-of 1 is the current state.
    * The oracle recomputes each epoch DIRECTLY from the source table
    * (original prices at 0, delta applied at 1), independent of the
    * history SQL, so it proves the history + filter round-trips the
    * truth rather than merely agreeing with itself. */
  private val timeTravel: Q = (s, d) => {
    val hist = srcScd2(s, d)
    def asOf(t: Long) = hist
      .where(col("valid_from") <= t && col("valid_to") > t)
      .select(lit(t).as("as_of"), col("o_orderkey"), col("price_cents"))
    asOf(0L).unionByName(asOf(1L))
  }

  /** Window functions: ranking + running totals (window extension). */
  private val w1: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cents = round(col("o_totalprice") * 100).cast("long")
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), cents.as("price_cents"),
        row_number().over(byPrice).as("rn"),
        sum(cents).over(byDate).as("running_cents"))
      .filter(col("rn") <= 3)
  }

  /** q18 threshold: orders whose total quantity (exact cents) exceeds
    * this. */
  val Q18MinQtyCents = 20000L

  /** TPC-H q18 shape — HAVING on a grouped sum, then join the survivors.
    * The aggregate+filter runs BEFORE the joins, so only qualifying
    * order keys reach the orders/customer joins (at 100 TB the filtered
    * key set is small → AQE converts both joins to broadcasts). */
  private val q18: Q = (s, d) => {
    val qc = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
      .where(col("qty_cents") > Q18MinQtyCents)
    Tables.orders(s, d).join(qc, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("string").as("o_date"), col("qty_cents"))
  }

  /** TPC-H q16 shape — DISTINCT aggregate alongside a plain count.
    * Catalyst plans count(DISTINCT) as a two-phase expand/partial
    * aggregate: the distinct pairs (brand, suppkey) shrink map-side
    * before the exchange, no row set ever collects on one node. */
  private val q16: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).where(col("p_size") >= 20),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("l_suppkey")).as("supp_cnt"),
        count(lit(1)).as("n_lines"))

  /** TPC-H q21 shape — the "sole blamable supplier" EXISTS + NOT EXISTS
    * chain as semi/anti joins, order-scoped: a LATE line (shipped >30
    * days after the order date) in a MULTI-supplier order where no OTHER
    * supplier's line in that same order was late. Both subqueries are
    * id-only self semi/anti joins on the order key; no row data is
    * replicated through the shuffles. */
  private val q21: Q = (s, d) => {
    val l = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > date_add(col("o_orderdate"), 30)).as("late"))
    val o2 = l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"),
      col("late").as("late2"))
    val lateLines = l.where(col("late"))
    val multi = lateLines.join(o2,
      col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
      "left_semi")
    val soleLate = multi.join(o2.where(col("late2")),
      col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
      "left_anti")
    soleLate.join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n_late_lines"))
  }

  /** TPC-H q22 shape — compare each row against its GROUP's average
    * without any floating point: `bal·n > sum` (integer cross-multiply)
    * is exactly `bal > sum/n` with no division, so partial aggregation
    * order cannot flip a boundary row in either engine. The per-nation
    * aggregate is tiny → broadcast back to the row side. */
  private val q22: Q = (s, d) => {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val nav = c.groupBy(col("c_nationkey"))
      .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n"))
    c.join(broadcast(nav), Seq("c_nationkey"))
      .where(col("bal_cents") * col("n") > col("sum_cents"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_above"), sum(col("bal_cents")).as("above_cents"))
  }

  /** Range-bucket width for [[rangeLookup]] — power of two so `div`
    * compiles to a shift; spelled identically in the oracle comment's
    * derivation (the oracle itself needs no buckets). */
  val RangeBucket = 4096L

  /** PURE range-lookup join (no equi key) — the IP→geo / tier-table
    * shape: each fact point joins the ONE dimension range containing it.
    * Spark has no native band-join, so a naive `ON v BETWEEN lo AND hi`
    * plans a BroadcastNestedLoopJoin — O(facts × ranges) compares. The
    * scale technique is RANGE BUCKETING: explode each range into the
    * fixed-width buckets it overlaps (span/B rows — bounded, the dim is
    * small), key facts by `v div B`, and run an ordinary EQUI join on
    * the bucket followed by the exact BETWEEN residual — O(facts)
    * bucket-hash probes, broadcastable build side, no nested loop
    * (PlanSpec pins the absence of BNL/cartesian). Ranges here are
    * deliberately IRREGULAR — consecutive gaps between hashed supplier
    * keys — because uniform ranges would degenerate to pure division.
    * The dimension build uses one global lead() window over the ~|dim|
    * bounds: dims are small by definition (the fact side never sorts).
    * Oracle: DuckDB's native BETWEEN join (IEJoin) over the same
    * derived ranges — no bucketing to mirror, so the bucketing is
    * proven LOSSLESS, not just self-consistent.
    */
  /** The bucketing rewrite itself, reusable: `facts(v)` × `ranges(lo,
    * hi, owner)` → matched rows, as an EQUI join on the overlapped
    * bucket plus the exact BETWEEN residual. HighVolumeSpec drives it at
    * 5M facts against a closed form. */
  def rangeBucketJoin(facts: DataFrame, ranges: DataFrame,
      bucket: Long): DataFrame = {
    val exploded = ranges.select(col("lo"), col("hi"), col("owner"),
      explode(sequence(expr(s"lo div $bucket"), expr(s"hi div $bucket")))
        .as("bucket"))
    facts.withColumn("bucket", expr(s"v div $bucket"))
      .join(exploded, Seq("bucket"))
      .where(col("v").between(col("lo"), col("hi")))
  }

  private val rangeLookup: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val bounds = Tables.supplier(s, d)
      .select(((col("s_suppkey") * lit(2654435761L)) % lit(1000000L)).as("lo"),
        col("s_suppkey"))
      .groupBy("lo").agg(min(col("s_suppkey")).as("owner"))
    // Constant partition spec: the boundary axis is ≤1e6 rows by the
    // modulus — bounded by construction; explicit spec keeps the
    // WindowExec warning out of the log.
    val ranges = bounds
      .withColumn("hi",
        lead(col("lo"), 1).over(Window.partitionBy(lit(1)).orderBy("lo")) - 1)
      .where(col("hi").isNotNull)
    val facts = Tables.orders(s, d)
      .select((round(col("o_totalprice") * 100).cast("long") % lit(1000000L)).as("v"))
    rangeBucketJoin(facts, ranges, RangeBucket)
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n_orders"), sum(col("v")).as("sum_v"))
  }

  val queries: Map[String, Q] = Map(
    "q_range_lookup" -> rangeLookup,
    "q16_brand_suppliers" -> q16,
    "q18_big_orders" -> q18,
    "q21_supplier_chain" -> q21,
    "q22_above_nation_avg" -> q22,
    "s1_scan_project" -> s1,
    "s2_point_lookup" -> s2,
    "s3_fk_membership" -> s3,
    "s4_csv_roundtrip" -> s4,
    "f2_filter_pushdown" -> f2,
    "f3_primitivize_bool" -> f3,
    "f4_datetime_epoch" -> f4,
    "f5_rename" -> f5,
    "f6_dedup_distinct" -> f6,
    "f7_resume_antijoin" -> f7,
    "j2_dependency_semi" -> j2,
    "j3_idmap_remap" -> j3,
    "j4_outside_reference" -> j4,
    "j5_polymorphic_prefix" -> j5,
    "a1_counts" -> a1,
    "a2_idset_ops" -> a2,
    "t1_transform_chain" -> t1,
    "t7_canonical_id" -> t7,
    "q1_pricing_summary" -> q1,
    "q3_topk_revenue" -> q3,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q5_nation_revenue" -> q5,
    "q14_promo_share" -> q14,
    "q2_min_cost_supplier" -> q2MinCost,
    "q17_small_qty" -> q17SmallQty,
    "q13_customer_distribution" -> q13CustDist,
    "q15_top_supplier" -> q15TopSupplier,
    "q20_part_suppliers" -> q20PartSuppliers,
    "q6_forecast_revenue" -> q6Forecast,
    "q7_volume_shipping" -> q7Shipping,
    "q8_market_share" -> q8MktShare,
    "q9_product_profit" -> q9Profit,
    "q10_returned_items" -> q10Returned,
    "q11_important_stock" -> q11Stock,
    "q12_late_lines" -> q12Late,
    "q19_disjunctive_revenue" -> q19Disjunctive,
    "q_percentiles" -> qPercentiles,
    "s5_jsonl_roundtrip" -> s5Jsonl,
    "src_orc_roundtrip" -> srcOrc,
    "src_jsonl_ingest" -> srcJsonl,
    "src_schema_evolution" -> srcSchemaEvolution,
    "src_delta_diff" -> srcDeltaDiff,
    "src_partitioned_pruning" -> srcPartitioned,
    "q_pivot" -> qPivot,
    "q_grouping_sets" -> qGroupingSets,
    "q_histogram" -> qHistogram,
    "q_topk_agg" -> qTopkAgg,
    "q_corr" -> qCorr,
    "f8_fuzzy_match" -> f8FuzzyMatch,
    "w2_moving_window" -> w2,
    "w1_window_topn" -> w1,
    "w3_range_frame" -> w3,
    "a3_skew_agg" -> a3SkewAgg,
    "q4_priority_exists" -> q4Exists,
    "src_upsert_merge" -> srcUpsert,
    "src_merge_cdc" -> srcMergeCdc,
    "src_scd2_merge" -> srcScd2,
    "src_time_travel" -> timeTravel,
    "src_v2_scan" -> srcV2Scan,
    "src_sorted_skipping" -> srcSorted,
    "src_zorder_skipping" -> srcZorder,
    "q_dpp_prune" -> qDpp,
    "q_bloom_prune" -> qBloomPrune,
    "src_bucketed_join" -> srcBucketed,
    "q_hll_distinct" -> qHll,
    "q_kll_quantiles" -> qKllQuantiles,
    "q_kmv_set_ops" -> qKmvSetOps,
  )

  val oracle: Map[String, String] = Map(
    // Native BETWEEN join (IEJoin) over the same derived irregular
    // ranges — no bucketing to mirror, proving the engine's
    // range-bucketed equi join + residual is lossless.
    "q_range_lookup" ->
      """WITH b AS (SELECT (s_suppkey * 2654435761) % 1000000 AS lo,
        |    CAST(min(s_suppkey) AS BIGINT) AS owner
        |  FROM supplier GROUP BY 1),
        |r AS (SELECT lo, lead(lo) OVER (ORDER BY lo) - 1 AS hi, owner FROM b
        |      QUALIFY hi IS NOT NULL),
        |f AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 1000000 AS v
        |      FROM orders)
        |SELECT r.owner, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(f.v) AS BIGINT) AS sum_v
        |FROM f JOIN r ON f.v BETWEEN r.lo AND r.hi
        |GROUP BY 1""".stripMargin,
    "q16_brand_suppliers" ->
      """SELECT p_brand, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supp_cnt,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size >= 20 GROUP BY p_brand""".stripMargin,
    "q18_big_orders" ->
      s"""WITH qc AS (SELECT l_orderkey,
         |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
         |  FROM lineitem GROUP BY 1 HAVING qty_cents > $Q18MinQtyCents)
         |SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_date, qty_cents
         |FROM qc JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey""".stripMargin,
    "q21_supplier_chain" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS n_late_lines
        |FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM l l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name""".stripMargin,
    "q22_above_nation_avg" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer),
        |nav AS (SELECT c_nationkey, CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |    count(*) AS n FROM c GROUP BY 1)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_above,
        |  CAST(sum(bal_cents) AS BIGINT) AS above_cents
        |FROM c JOIN nav USING (c_nationkey) JOIN nation ON n_nationkey = c_nationkey
        |WHERE bal_cents * n > sum_cents
        |GROUP BY n_name""".stripMargin,
    "s1_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem",
    "s2_point_lookup" ->
      s"""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         |WHERE o_orderkey IN (${pointIds.mkString(",")})""".stripMargin,
    "s3_fk_membership" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "s4_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "f2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_discount FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_discount > 0.05""".stripMargin,
    "f3_primitivize_bool" ->
      s"""WITH s AS (SELECT o_orderkey, $synthBool AS synth FROM orders)
         |SELECT o_orderkey,
         |  CASE WHEN lower(synth) IN ('no','n','false','f','0','') THEN false
         |       WHEN lower(synth) IN ('yes','y','true','t','1') THEN true
         |       ELSE NULL END AS b
         |FROM s""".stripMargin,
    "f4_datetime_epoch" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%g+0000') AS iso_dt FROM orders",
    "f5_rename" ->
      """SELECT c_custkey AS "CustomerId", c_name AS "CustomerName", c_mktsegment AS "Segment" FROM customer""",
    "f6_dedup_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER) AS ship_year FROM lineitem",
    "f7_resume_antijoin" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 < 2)""".stripMargin,
    "j2_dependency_semi" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)""".stripMargin,
    "j3_idmap_remap" ->
      """WITH m AS (SELECT c_custkey AS old_id, c_custkey + 1000000 AS new_id
        |           FROM customer WHERE c_custkey % 3 = 0)
        |SELECT o_orderkey, coalesce(m.new_id, o_custkey) AS remapped_custkey
        |FROM orders LEFT JOIN m ON o_custkey = m.old_id""".stripMargin,
    "j4_outside_reference" ->
      """WITH ext AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0.0)
        |SELECT o_orderkey,
        |  CASE WHEN ext.c_custkey IS NULL THEN NULL ELSE o_custkey END AS o_custkey_safe
        |FROM orders LEFT JOIN ext ON o_custkey = ext.c_custkey""".stripMargin,
    "j5_polymorphic_prefix" ->
      """WITH ids AS (
        |  SELECT '001' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS ref_id FROM orders
        |  UNION ALL
        |  SELECT '003' || lpad(CAST(c_custkey AS VARCHAR), 12, '0') FROM customer),
        |dim(prefix, target_table) AS (VALUES ('001','orders'),('003','customer'))
        |SELECT ref_id, target_table FROM ids JOIN dim ON substr(ref_id,1,3) = dim.prefix""".stripMargin,
    "a1_counts" ->
      Tables.names.map(t => s"SELECT '$t' AS tbl, count(*) AS n FROM $t")
        .mkString(" UNION ALL "),
    "a2_idset_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey AS id FROM orders),
        |     b AS (SELECT DISTINCT c_custkey AS id FROM customer WHERE c_acctbal < 0.0)
        |SELECT id, 'only_orders' AS tag FROM (SELECT id FROM a EXCEPT SELECT id FROM b)
        |UNION ALL
        |SELECT id, 'both' AS tag FROM (SELECT id FROM a INTERSECT SELECT id FROM b)
        |UNION ALL
        |SELECT id, 'only_negbal' AS tag FROM (SELECT id FROM b EXCEPT SELECT id FROM a)""".stripMargin,
    "t1_transform_chain" ->
      """SELECT c_custkey,
        |  lower(c_name) AS lower_name,
        |  upper(c_mktsegment) AS upper_seg,
        |  trim(c_name) AS trimmed,
        |  'cust-' || c_name AS prefixed,
        |  c_name || '-v1' AS suffixed,
        |  'x-' || lower(trim(c_name)) || '-y' AS chained
        |FROM customer""".stripMargin,
    "t7_canonical_id" ->
      s"""WITH s AS (SELECT c_custkey, $id15Sql AS id15 FROM customer)
         |SELECT c_custkey, id15, ${sfChecksumSql("id15")} AS id18 FROM s""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) AS sum_charge_e6,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_revenue" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE(1, 2)""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |JOIN lineitem ON l_suppkey = s_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "s5_jsonl_roundtrip" ->
      "SELECT doc_id, lang, n_chars, text FROM documents",
    "src_orc_roundtrip" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    // Closed form from the source table: equality proves the JSONL
    // export→PERMISSIVE-parse round-trip; the constant '_corrupt' row
    // proves the tolerance path quarantined exactly the planted lines.
    "src_jsonl_ingest" -> {
      // Escape single quotes so a future planted text containing an
      // apostrophe breaks neither the oracle SQL nor the compare
      // (ADVICE r11).
      val plantedSql = Relational.JsonlPlantedCorruptLang.map { t =>
        val esc = t.replace("'", "''")
        s"SELECT '_corrupt' AS lang, CAST(${t.length} AS BIGINT) AS n_chars, " +
          s"'$esc' AS text"
      }.mkString("\nUNION ALL\n")
      s"""WITH src AS (
         |  SELECT lang, n_chars, text FROM documents
         |  UNION ALL
         |$plantedSql
         |)
         |SELECT lang, FALSE AS quarantined, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
         |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
         |FROM src GROUP BY lang
         |UNION ALL
         |SELECT CAST(NULL AS VARCHAR), TRUE,
         |  CAST(${Relational.JsonlCorruptLines} AS BIGINT),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)""".stripMargin
    },
    // Same synthesized snapshots, same full-outer diff; ×2 is exact in
    // IEEE754 so the changed-row compare needs no tolerance.
    "src_delta_diff" ->
      """WITH v1 AS (SELECT c_custkey, c_acctbal AS old_acctbal
        |  FROM customer WHERE c_custkey % 10 <> 0),
        |v2 AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal * 2
        |         ELSE c_acctbal END AS new_acctbal
        |  FROM customer WHERE c_custkey % 10 <> 1)
        |SELECT coalesce(v1.c_custkey, v2.c_custkey) AS c_custkey,
        |  CASE WHEN v1.c_custkey IS NULL THEN 'added'
        |       WHEN v2.c_custkey IS NULL THEN 'removed'
        |       WHEN old_acctbal <> new_acctbal THEN 'changed' END AS change_type,
        |  old_acctbal, new_acctbal
        |FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
        |WHERE CASE WHEN v1.c_custkey IS NULL THEN 'added'
        |           WHEN v2.c_custkey IS NULL THEN 'removed'
        |           WHEN old_acctbal <> new_acctbal THEN 'changed' END IS NOT NULL""".stripMargin,
    // The merged view: old-delivery rows surface NULL for the column
    // that didn't exist yet.
    "src_schema_evolution" ->
      """SELECT c_custkey, c_name, c_nationkey, CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer WHERE c_custkey % 2 = 1
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin,
    "src_partitioned_pruning" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('en', 'fr')",
    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS open_cents,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS filled_cents,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS pending_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1""".stripMargin,
    "q_topk_agg" ->
      s"""SELECT l_suppkey, CAST(rn AS INT) AS rank, cents, line_id FROM (
         |  SELECT l_suppkey,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         |    CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS line_id,
         |    row_number() OVER (PARTITION BY l_suppkey
         |      ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
         |               CAST(l_orderkey * 10 + l_linenumber AS BIGINT)) AS rn
         |  FROM lineitem) t
         |WHERE rn <= $TopKAggK""".stripMargin,
    "q_corr" ->
      """WITH v AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM v GROUP BY 1),
        |f AS (SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) * sxy - sx * sy AS num,
        |    CAST(n AS DOUBLE) * sxx - sx * sx AS disc1,
        |    CAST(n AS DOUBLE) * syy - sy * sy AS disc2
        |  FROM m)
        |SELECT l_returnflag, n,
        |  CASE WHEN disc1 <= 0.0 OR disc2 <= 0.0 THEN NULL
        |       ELSE num / (sqrt(disc1) * sqrt(disc2)) END AS corr_qty_price
        |FROM f""".stripMargin,
    "f8_fuzzy_match" ->
      """WITH base AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |dirty AS (SELECT id AS dirty_id, substr(name, 1, 2) || substr(name, 4) AS dirty_name
        |          FROM base WHERE id % 3 = 0)
        |SELECT d.dirty_id, b.id AS matched_id,
        |  CAST(levenshtein(d.dirty_name, b.name) AS INT) AS distance
        |FROM dirty d JOIN base b ON right(d.dirty_name, 6) = right(b.name, 6)
        |WHERE levenshtein(d.dirty_name, b.name) <= 1""".stripMargin,
    "w2_moving_window" ->
      """WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey, cents AS price_cents,
        |  lag(cents, 1) OVER w AS prev_cents,
        |  CAST(sum(cents) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov4_cents,
        |  CAST(count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov4_n,
        |  CAST(sum(cents) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov4_avg
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "w3_range_frame" ->
      """WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(count(*) OVER w AS BIGINT) AS n_7d,
        |  CAST(sum(cents) OVER w AS BIGINT) AS rev_7d_cents
        |FROM c
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_percentiles" ->
      """WITH c AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |           FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(round(quantile_cont(cents, 0.5) * 1000) AS BIGINT) AS p50_milli,
        |  CAST(round(quantile_cont(cents, 0.9) * 1000) AS BIGINT) AS p90_milli,
        |  CAST(round(quantile_cont(cents, 0.99) * 1000) AS BIGINT) AS p99_milli
        |FROM c GROUP BY l_returnflag""".stripMargin,
    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS rev, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00')
        |SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END) AS BIGINT) AS promo_e4,
        |  CAST(sum(rev) AS BIGINT) AS total_e4,
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(rev) AS DOUBLE) AS promo_share
        |FROM j""".stripMargin,
    // Shared verbatim with the Spark side (both dialects parse the same
    // text): the gate compares Catalyst's decorrelation against DuckDB's.
    "q2_min_cost_supplier" -> Q2Sql,
    "q17_small_qty" -> Q17Sql,
    "q13_customer_distribution" -> Q13Sql,
    "q15_top_supplier" -> Q15Sql,
    "q20_part_suppliers" -> Q20Sql,
    "q6_forecast_revenue" -> Q6Sql,
    "q7_volume_shipping" -> Q7Sql,
    "q8_market_share" -> Q8Sql,
    "q9_product_profit" -> Q9Sql,
    "q10_returned_items" -> Q10Sql,
    "q11_important_stock" -> Q11Sql,
    "q12_late_lines" -> Q12Sql,
    "q19_disjunctive_revenue" -> Q19Sql,
    "w1_window_topn" ->
      """WITH r AS (SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders)
        |SELECT o_custkey, o_orderkey, price_cents, rn, running_cents FROM r WHERE rn <= 3""".stripMargin,
    // The oracle is the DIRECT aggregate — the salted two-phase plan must
    // be value-identical to it (associative integer sums).
    "a3_skew_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,
    "src_merge_cdc" ->
      s"""WITH base AS (SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, 0 AS version
         |  FROM orders),
         |delta AS (SELECT o_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
         |    CAST(round(o_totalprice * 100) AS BIGINT) + 10000 AS price_cents
         |  FROM orders WHERE o_orderkey % $UpsertDeltaMod = 0)
         |SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
         |UNION ALL
         |SELECT o_orderkey, price_cents, 1 AS version FROM delta WHERE op = 'U'""".stripMargin,
    "src_upsert_merge" ->
      s"""WITH base AS (SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, 0 AS version
         |  FROM orders),
         |delta AS (SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) + 10000 AS price_cents, 1 AS version
         |  FROM orders WHERE o_orderkey % $UpsertDeltaMod = 0)
         |SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
         |UNION ALL SELECT * FROM delta""".stripMargin,
    "src_v2_scan" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_acctbal > 1000""".stripMargin,
    "src_scd2_merge" ->
      s"""WITH base AS (SELECT o_orderkey,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders),
         |delta AS (SELECT o_orderkey FROM orders WHERE o_orderkey % $UpsertDeltaMod = 0)
         |SELECT o_orderkey, price_cents, CAST(0 AS BIGINT) AS valid_from,
         |  CAST($Scd2Open AS BIGINT) AS valid_to, true AS current
         |FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
         |UNION ALL
         |SELECT o_orderkey, price_cents, CAST(0 AS BIGINT), CAST(1 AS BIGINT), false
         |FROM base WHERE o_orderkey IN (SELECT o_orderkey FROM delta)
         |UNION ALL
         |SELECT o_orderkey, price_cents + 10000, CAST(1 AS BIGINT),
         |  CAST($Scd2Open AS BIGINT), true
         |FROM base WHERE o_orderkey IN (SELECT o_orderkey FROM delta)""".stripMargin,
    // Direct truth per epoch (no history CTE): the engine reconstructs
    // through the SCD-2 filter, the oracle states each epoch from the
    // source — equality proves history + as-of filter round-trip.
    "src_time_travel" ->
      s"""SELECT CAST(0 AS BIGINT) AS as_of, o_orderkey,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         |FROM orders
         |UNION ALL
         |SELECT CAST(1 AS BIGINT), o_orderkey,
         |  CAST(round(o_totalprice * 100) AS BIGINT)
         |  + CASE WHEN o_orderkey % $UpsertDeltaMod = 0 THEN 10000 ELSE 0 END
         |FROM orders""".stripMargin,
    "src_sorted_skipping" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-03-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1995-06-01'""".stripMargin,
    "src_zorder_skipping" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-03-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1995-09-01'
        |  AND o_custkey <= 400""".stripMargin,
    "q_dpp_prune" ->
      """WITH dim(lang, grp) AS (VALUES ('en', 1), ('fr', 1), ('de', 2), ('ja', 2))
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents d JOIN dim ON d.lang = dim.lang
        |WHERE dim.grp = 1 GROUP BY 1""".stripMargin,
    // The bloom only prunes; the join supplies exactness — so the oracle
    // is the PLAIN join, and any bloom false-negative (impossible) or
    // mishandled false-positive would hash-mismatch here.
    "q_bloom_prune" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9500""".stripMargin,
    "src_bucketed_join" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // Sketch estimates are exact at oracle cardinality (sparse-mode HLL);
    // the oracle pins them against true COUNT(DISTINCT). SketchSpec covers
    // the approximate regime the oracle can't.
    // Exact counts + asserted estimate property (see qHll's contract
    // note): TRUE here means "the engine's sketch estimate must land
    // within the 3% bound" — a violation flips the engine-side boolean.
    "q_hll_distinct" ->
      """SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  TRUE AS hll_within_3pct
        |FROM orders GROUP BY 1
        |UNION ALL
        |SELECT 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE FROM orders""".stripMargin,
    // KMV is DETERMINISTIC (md5 hash + K-minimum selection), so the
    // oracle reproduces the estimate VALUES themselves — the same sorted
    // retained-hash convention (theta = K-th smallest or 2^64; live =
    // entries strictly below), the same integer floor arithmetic.
    "q_kmv_set_ops" -> {
      val K = KmvK
      val M64 = "18446744073709551616::HUGEINT"
      val hu = DedupOps.foldSql("CAST(o_custkey AS VARCHAR)")
      s"""WITH h AS (SELECT DISTINCT o_orderpriority AS p, $hu AS hu FROM orders),
         |r AS (SELECT p, hu, row_number() OVER (PARTITION BY p ORDER BY hu) AS rk,
         |        count(*) OVER (PARTITION BY p) AS n
         |      FROM h),
         |th AS (SELECT p,
         |         CAST(CASE WHEN max(n) >= $K THEN max(CASE WHEN rk = $K THEN hu END)
         |              ELSE $M64 END AS HUGEINT) AS theta
         |       FROM r GROUP BY p),
         |live AS (SELECT r.p, r.hu FROM r JOIN th ON th.p = r.p
         |         WHERE r.rk <= $K AND r.hu < th.theta),
         |est AS (SELECT th.p, th.theta,
         |          CAST((SELECT CAST(count(*) AS HUGEINT) FROM live
         |                WHERE live.p = th.p) * 1000 * $M64 // th.theta AS BIGINT)
         |            AS est_milli
         |        FROM th),
         |pairs AS (SELECT a.p AS pa, b.p AS pb,
         |            a.est_milli AS est_a_milli, b.est_milli AS est_b_milli,
         |            least(a.theta, b.theta) AS theta
         |          FROM est a JOIN est b ON a.p < b.p),
         |com AS (SELECT pr.pa, pr.pb, CAST(count(*) AS HUGEINT) AS c
         |        FROM pairs pr
         |        JOIN live la ON la.p = pr.pa AND la.hu < pr.theta
         |        JOIN live lb ON lb.p = pr.pb AND lb.hu = la.hu
         |        GROUP BY pr.pa, pr.pb),
         |um AS (SELECT pr.pa, pr.pb, l.hu, pr.theta
         |       FROM pairs pr
         |       JOIN live l ON (l.p = pr.pa OR l.p = pr.pb) AND l.hu < pr.theta
         |       GROUP BY pr.pa, pr.pb, l.hu, pr.theta),
         |ur AS (SELECT pa, pb, hu, theta,
         |         row_number() OVER (PARTITION BY pa, pb ORDER BY hu) AS rk,
         |         count(*) OVER (PARTITION BY pa, pb) AS n
         |       FROM um),
         |uth AS (SELECT pa, pb,
         |          CAST(CASE WHEN max(n) >= $K THEN max(CASE WHEN rk = $K THEN hu END)
         |               ELSE max(theta) END AS HUGEINT) AS theta_u,
         |          CAST(CASE WHEN max(n) >= $K THEN ${K - 1} ELSE max(n) END
         |            AS HUGEINT) AS live_u
         |        FROM ur GROUP BY pa, pb),
         |pc AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders),
         |na AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM pc GROUP BY p),
         |xi AS (SELECT x.p AS pa, y.p AS pb, CAST(count(*) AS BIGINT) AS xi
         |       FROM pc x JOIN pc y ON x.c = y.c AND x.p < y.p GROUP BY 1, 2)
         |SELECT pr.pa, pr.pb, pr.est_a_milli, pr.est_b_milli,
         |  CAST(coalesce(u.live_u * 1000 * $M64 // u.theta_u, 0) AS BIGINT)
         |    AS est_union_milli,
         |  CAST(coalesce(cm.c, 0::HUGEINT) * 1000 * $M64 // pr.theta AS BIGINT)
         |    AS est_inter_milli,
         |  CAST(la.n + lb.n - coalesce(xi.xi, 0) AS BIGINT) AS exact_union,
         |  CAST(coalesce(xi.xi, 0) AS BIGINT) AS exact_inter
         |FROM pairs pr
         |LEFT JOIN uth u ON u.pa = pr.pa AND u.pb = pr.pb
         |LEFT JOIN com cm ON cm.pa = pr.pa AND cm.pb = pr.pb
         |JOIN na la ON la.p = pr.pa
         |JOIN na lb ON lb.p = pr.pb
         |LEFT JOIN xi ON xi.pa = pr.pa AND xi.pb = pr.pb""".stripMargin
    },
    // Exact percentiles + literal-TRUE rank-property booleans (the
    // q_hll_distinct discipline for the randomized KLL estimates). The
    // percentile is the SAME integer closed form of linear interpolation
    // as the engine side (milli = lo·1000 + (hi−lo)·rem·10 at exact
    // rational position (n−1)·k/100) — quantile_cont's float
    // interpolation could diverge from Spark's by one ulp at a
    // round-half boundary.
    "q_kll_quantiles" ->
      """WITH c AS (SELECT l_returnflag,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |           FROM lineitem),
        |r AS (SELECT l_returnflag, c,
        |        CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY c) - 1
        |          AS BIGINT) AS rn,
        |        CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |      FROM c),
        |g AS (SELECT l_returnflag,
        |        min(CASE WHEN rn = ((n-1)*50)//100 THEN c END) AS lo50,
        |        min(CASE WHEN rn = ((n-1)*50)//100
        |          + (CASE WHEN ((n-1)*50)%100 > 0 THEN 1 ELSE 0 END)
        |          THEN c END) AS hi50,
        |        max(((n-1)*50)%100) AS rem50,
        |        min(CASE WHEN rn = ((n-1)*95)//100 THEN c END) AS lo95,
        |        min(CASE WHEN rn = ((n-1)*95)//100
        |          + (CASE WHEN ((n-1)*95)%100 > 0 THEN 1 ELSE 0 END)
        |          THEN c END) AS hi95,
        |        max(((n-1)*95)%100) AS rem95,
        |        min(CASE WHEN rn = ((n-1)*99)//100 THEN c END) AS lo99,
        |        min(CASE WHEN rn = ((n-1)*99)//100
        |          + (CASE WHEN ((n-1)*99)%100 > 0 THEN 1 ELSE 0 END)
        |          THEN c END) AS hi99,
        |        max(((n-1)*99)%100) AS rem99
        |      FROM r GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  CAST(lo50*1000 + (hi50-lo50)*rem50*10 AS BIGINT) AS p50_milli,
        |  CAST(lo95*1000 + (hi95-lo95)*rem95*10 AS BIGINT) AS p95_milli,
        |  CAST(lo99*1000 + (hi99-lo99)*rem99*10 AS BIGINT) AS p99_milli,
        |  TRUE AS kll_p50_within_eps,
        |  TRUE AS kll_p95_within_eps,
        |  TRUE AS kll_p99_within_eps
        |FROM g""".stripMargin,
  )
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators._
import graft.sources.InMemoryTableStore

/** The reference's high-volume anchor (BASELINE.md: 100,000 rows loaded
  * then extracted, exact count asserted —
  * test/test_org/test_integration_high_volume.py:36-68).
  */
class HighVolumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val catalog = new Catalog(Seq(
    TableSchema("Lead", Seq(
      FieldMeta("Id", "id", "tns:ID"),
      FieldMeta("LastName", "string", "xsd:string"),
      FieldMeta("Company", "string", "xsd:string")),
      keyPrefix = "00Q", salesforceIds = true)))

  test("100k rows load then extract with exact count (high_volume.py:36-68)") {
    import spark.implicits._
    val n = 100000
    val input = spark.range(n).select(
      concat(lit("00Q"), lpad(col("id").cast("string"), 12, "0"), lit("AAA")).as("Id"),
      concat(lit("Lead "), col("id")).as("LastName"),
      lit("[not provided]").as("Company"))

    val target = new InMemoryTableStore(spark, catalog.byName)
    val load = new LoadOperation(target, catalog,
      Seq(LoadStepSpec("Lead", Seq("Id", "LastName", "Company"))),
      Map("Lead" -> input))
    assert(load.execute() == 0)
    assert(load.idMap.count() == n)
    assert(target.scan("Lead").count() == n)

    val extract = new ExtractOperation(target, catalog,
      Seq(ExtractStep("Lead", ExtractionScope.AllRecords, Seq("Id", "LastName", "Company"))))
    assert(extract.execute() == 0)
    assert(extract.result("Lead").count() == n)
    // Round trip preserved values (spot-check the multiset via a hash agg).
    val h1 = input.agg(expr("bit_xor(xxhash64(LastName, Company))")).head.getLong(0)
    val h2 = extract.result("Lead").agg(expr("bit_xor(xxhash64(LastName, Company))")).head.getLong(0)
    assert(h1 == h2)
  }

  /** The merge as-of at volume: 2M probes × 200k references, verified
    * against a closed-form expected aggregate (no driver-side row
    * collection). Per key k∈[0,1000): probe times 0..1999, reference
    * times 0,10,…,1990 → every probe matches rt = t − t%10, so
    * Σ rt = 1000 · (Σt − Σ(t%10)) = 1000 · (1999000 − 9000). The merge's
    * O(1)-per-partition state is what makes this volume trivially cheap —
    * nothing is buffered per key.
    */
  test("merge as-of joins 2M x 200k rows; salted form agrees at volume") {
    // `div`, not `/`: Spark's / on longs is DOUBLE division, and
    // ((id/1000)*10).cast(long) would smear floor(key/100) into the
    // reference times, breaking the closed form.
    val probes = spark.range(2000000).select(
      (col("id") % 1000).as("key"), expr("id div 1000").as("t"))
    val refs = spark.range(200000).select(
      (col("id") % 1000).as("key"), expr("(id div 1000) * 10").as("rt"))
    val expectedSum = 1000L * (1999000L - 9000L)
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), count(col("rt")), sum(col("rt"))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val merged = graft.plans.AsOfJoin.asof(
      probes, refs, "key", "t", "rt", Seq("rt"), Some("shuffle"))
    assert(checksum(merged) == ((2000000L, 2000000L, expectedSum)))
    // Salted variant with every key hot (threshold 1000 < 2000 rows/key,
    // 4 salts): identical aggregate at full replication pressure.
    val salted = graft.plans.AsOfJoin.asofSkewAware(
      probes, refs, "key", "t", "rt", Seq("rt"),
      hotRowThreshold = 1000, salts = 4)
    assert(checksum(salted) == ((2000000L, 2000000L, expectedSum)))
  }

  test("BPE trainer at volume: 1.2M-doc corpus, 100k-word table, closed-form merges") {
    // Four disjoint-alphabet head words with strictly ordered
    // frequencies give a CLOSED-FORM merge sequence; a 100k-distinct
    // "w<id>" tail pushes real volume through the word table and the
    // per-round pair aggregate. The tail cannot perturb the head: its
    // most frequent pair is ('w', leading-digit-1) = 11,111 occurrences
    // (ids 1, 10-19, 100-199, ..., 10000-19999), far under the rarest
    // head pair's 100,000.
    val head = spark.range(1100000).select(
      when(col("id") < 500000, "ab")
        .when(col("id") < 800000, "cd")
        .when(col("id") < 1000000, "ef")
        .otherwise("gh").as("text"))
    val tail = spark.range(100000)
      .select(concat(lit("w"), col("id")).as("text"))
    val docs = head.unionByName(tail)
    val got = graft.queries.BpeOps.train(docs, 4)
    assert(got == Seq(
      graft.queries.BpeOps.Merge(1, "a", "b", 500000L),
      graft.queries.BpeOps.Merge(2, "c", "d", 300000L),
      graft.queries.BpeOps.Merge(3, "e", "f", 200000L),
      graft.queries.BpeOps.Merge(4, "g", "h", 100000L)), got.toString)
  }
}

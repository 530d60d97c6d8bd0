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

  test("LSH embedding dedup at volume: 200k dim-64 vectors, exactly the " +
       "500 planted identical pairs survive") {
    // Noise vectors are deterministic pseudo-random dim-64 floats; at
    // threshold 0.95 a noise pair needs a ~7.6-sigma cosine (sigma ≈
    // 1/sqrt(64)), so the ONLY qualifying pairs are the 500 planted
    // identical copies (cosine exactly 1, same label → same band keys in
    // every band → guaranteed candidates). 1000 labels keep band buckets
    // ~12 rows, so the candidate path processes millions of pairs
    // without blowing up — the shape 100 TB banding relies on.
    import spark.implicits._
    val n = 200000L
    val noise = spark.range(n).select(
      col("id").as("vec_id"), (col("id") % 1000).cast("int").as("label"),
      expr("""transform(sequence(1, 64),
             |  i -> cast((hash(id * 64 + i) % 1000) as float) / 1000.0f)"""
        .stripMargin).as("embedding"))
    // Copies of vec 0..499, same label, fresh ids above the noise range.
    val copies = spark.range(500).select(
      (col("id") + lit(n)).as("vec_id"), (col("id") % 1000).cast("int").as("label"),
      expr("""transform(sequence(1, 64),
             |  i -> cast((hash(id * 64 + i) % 1000) as float) / 1000.0f)"""
        .stripMargin).as("embedding"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lsh_vol").toString
    noise.unionByName(copies).write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val pairs = graft.queries.DedupOps.embeddingPairsLsh(spark, tmp, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 500L).map(i => (i, i + n)).toSet
    assert(pairs == expected,
      s"got ${pairs.size} pairs; missing ${(expected -- pairs).take(3)}; " +
      s"extra ${(pairs -- expected).take(3)}")
  }

  test("range-bucket join at volume: 5M facts x 1000 ranges, closed-form " +
       "per-owner counts, no nested loop") {
    // Uniform ranges [k*1000, k*1000+999] (owner k) make every per-owner
    // aggregate a closed form: 5M points v = id % 1000000 hit each owner
    // exactly 5000 times, and each owner's v-sum is 5000 per residue ×
    // Σ residues. The degenerate-uniform geometry is fine HERE — this
    // test is about candidate volume through the equi join, not about
    // irregularity (q_range_lookup's oracle covers that).
    import org.apache.spark.sql.functions.{count => fcount}
    val ranges = spark.range(1000).select(
      (col("id") * 1000).as("lo"), (col("id") * 1000 + 999).as("hi"),
      col("id").as("owner"))
    val facts = spark.range(5000000).select((col("id") % 1000000).as("v"))
    val out = graft.queries.Relational.rangeBucketJoin(facts, ranges, 4096L)
      .groupBy(col("owner"))
      .agg(fcount(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 1000)
    // Each owner k: 5 hits per v in [k*1000, k*1000+999] → n = 5000,
    // sum = 5 * Σ_{j=0}^{999} (k*1000 + j) = 5*(k*1000000 + 499500).
    (0L until 1000L).foreach { k =>
      assert(out(k) == ((5000L, 5L * (k * 1000000L + 499500L))), s"owner $k: ${out(k)}")
    }
  }

  test("length batching at volume: 5M docs across 320 streams, closed-form " +
       "token conservation, sorted pad beats naive") {
    // The 100 TB lever is the shard count: 5 langs x 64 shards = 320
    // independent window partitions (the registered query uses 16).
    // Token counts follow id^2 mod 997 so lengths vary within streams.
    val docs = spark.range(5000000).select(
      col("id").as("doc_id"),
      concat(lit("l"), pmod(col("id"), lit(5))).as("lang"),
      pmod(col("id"), lit(64)).as("shard"),
      ((col("id") * col("id")) % 997L).as("n_tokens"))
    val out = graft.queries.PipelineOps.lengthBatchesOf(docs)
    val agg = out.agg(
      sum(col("n_docs")), sum(col("sum_tokens")),
      sum(col("pad_tokens")), sum(col("pad_naive_tokens")),
      count(lit(1))).head
    assert(agg.getLong(0) == 5000000L, "docs conserved")
    val expectedTokens = (0L until 5000000L).iterator
      .map(i => (i * i) % 997L).sum
    assert(agg.getLong(1) == expectedTokens, "tokens conserved")
    assert(agg.getLong(2) < agg.getLong(3),
      s"sorted pad ${agg.getLong(2)} must beat naive ${agg.getLong(3)}")
    // 5M docs / 8 per batch spread over 320 streams: every stream has
    // ceil(docs/8) batches; totals must tile exactly.
    assert(agg.getLong(4) == out.groupBy("lang", "shard")
      .count().agg(sum(col("count"))).head.getLong(0))
  }

  test("shard shuffle at volume: 5M docs, balanced nibble assignment, " +
       "order fingerprint independent of parallelism") {
    import graft.queries.PipelineOps.{shardNibble, shardPosKey}
    import org.apache.spark.sql.expressions.Window
    val n = 5000000L
    val assigned = spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"), shardNibble(col("doc_id")).as("shard"),
        shardPosKey(col("doc_id")).as("pos_key"))
    // Balance: md5 uniformity puts every shard within a fraction of a
    // percent of n/16 at this volume; 2% catches a broken nibble.
    val counts = assigned.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 16).toSet)
    assert(counts.values.sum == n)
    val mean = n.toDouble / 16
    counts.foreach { case (sh, c) =>
      assert(math.abs(c - mean) / mean < 0.02, s"shard $sh count $c skewed")
    }
    // Byte-reproducibility, the claim that matters at 1000 executors:
    // the pos_key-ordered doc sequence per shard is a pure function of
    // the ids — an order-sensitive fingerprint (rank-weighted modular
    // hash sum; terms < 1e9 so the BIGINT sum can't overflow ANSI mode)
    // must be identical under different input partitionings.
    def fp(parallelism: Int): Map[Int, Long] = {
      val w = Window.partitionBy("shard").orderBy("pos_key")
      val p = lit(1000000007L)
      assigned.repartition(parallelism)
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy("shard")
        .agg(sum(pmod(col("rn") * pmod(xxhash64(col("doc_id")), p), p)).as("fp"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    assert(fp(32) == fp(7), "shard order must not depend on parallelism")
  }

  test("span scrub at volume: 1M docs with planted boilerplate, exactly " +
       "the shared run excised from every carrier") {
    // Every doc carries unique filler; every 10th doc embeds the SAME
    // 8-token boilerplate run, which is the only corpus-duplicated
    // window. Closed form: carriers lose exactly W tokens, others none.
    val W = graft.queries.DedupOps.SpanWindow
    val boiler = (1 to W).map(i => s"boiler$i").mkString(" ")
    val docs = spark.range(1000000).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) === 0,
        concat(lit("u"), col("id"), lit("a u"), col("id"), lit("b "),
          lit(boiler), lit(" u"), col("id"), lit("c")))
        .otherwise(concat(lit("u"), col("id"), lit("a u"), col("id"),
          lit("b u"), col("id"), lit("c"))).as("text"))
    val out = graft.queries.DedupOps.spanScrubOf(docs)
    val agg = out.agg(
      sum(when(col("n_removed") === W, 1L).otherwise(0L)),
      sum(when(col("n_removed") === 0L, 1L).otherwise(0L)),
      count(lit(1))).head
    assert(agg.getLong(2) == 1000000L)
    assert(agg.getLong(0) == 100000L, "every carrier loses exactly W tokens")
    assert(agg.getLong(1) == 900000L, "non-carriers untouched")
  }

  test("KLL quantile sketches at volume: 10M values across 32 shard " +
       "sketches, merged estimates hold the rank bound") {
    import graft.functions.KllSketch._
    val n = 10000000L
    // Non-uniform value distribution (id^2 mod a prime) so the quantile
    // surface isn't trivially linear; closed-form inclusive rank check
    // via recount on the same frame.
    val data = spark.range(n).select(
      ((col("id") * col("id")) % 1000003L).cast("double").as("v"),
      pmod(col("id"), lit(32)).as("shard"))
    val merged = data.groupBy(col("shard"))
      .agg(kll_sketch_agg(col("v")).as("sk"))
      .agg(kll_merge_agg(col("sk")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5, 0.99)).as("q"))
      .head.getSeq[Double](0)
    val Seq(e50, e99) = merged.toList
    val r = data.agg(
      sum(when(col("v") <= e50, 1L).otherwise(0L)),
      sum(when(col("v") <= e99, 1L).otherwise(0L))).head
    val (r50, r99) = (r.getLong(0).toDouble / n, r.getLong(1).toDouble / n)
    // k=200 publishes ~1.33% at 99% confidence; 3% absorbs any run.
    assert(math.abs(r50 - 0.5) <= 0.03, s"p50 rank $r50")
    assert(math.abs(r99 - 0.99) <= 0.03, s"p99 rank $r99")
  }

  test("two-phase prefix sum at volume: 5M-doc length frame, closed-form " +
       "offsets at sampled ids, distributed output") {
    // d21's offsets stage at 50x the sf0.1 doc count: n_i cycles through
    // the residues of a prime (97), so the exclusive prefix sum has a
    // closed form — (full cycles) x (0+..+96 + 97) + a 97-entry partial
    // table — checkable at any id without a sequential pass.
    val n = 5000000L
    val c = 2654435761L
    val lens = spark.range(n).select(col("id").as("doc_id"),
      pmod(col("id") * c, lit(97L)).as("n"))
    val offs = graft.queries.SuffixOps.prefixOffsets(lens)
    assert(offs.rdd.getNumPartitions > 1, "offsets must stay distributed")
    val cycle = (0 until 97).map(i => (BigInt(i) * c % 97).toLong + 1L)
    val cyclePrefix = cycle.scanLeft(0L)(_ + _) // exclusive, 98 entries
    val perCycle = cyclePrefix.last // 4656 + 97
    def expected(k: Long): Long = (k / 97) * perCycle + cyclePrefix((k % 97).toInt)
    val probes = Seq(0L, 1L, 96L, 97L, 98L, 12345L, 2499999L, n - 1)
    val got = offs.where(col("doc_id").isInCollection(probes))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    probes.foreach { k =>
      assert(got(k) == expected(k), s"doc $k: off=${got(k)}, want ${expected(k)}")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupOps, PipelineOps}

/** Value-level coverage for the pipeline operators (contamination,
  * repetition, packing). The DuckDB oracle proves cross-engine equality;
  * these prove the values mean what they claim, on both synthetic frames
  * and the real sf0.001 tables.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def q(name: String) =
    SparkEntry.queries(name)(spark, SparkTestBase.sf)

  test("contamination: benchmark docs excluded, fractions in [0,1]") {
    val rows = q("tx_contamination").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[String]("source") == PipelineOps.BenchmarkSource))
    rows.foreach { r =>
      val c = r.getAs[Double]("contamination")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Int]("n_grams").toLong)
    }
  }

  test("contamination: doc sharing an 8-gram with the benchmark is flagged") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, s"$passage tail words here", PipelineOps.BenchmarkSource),
      (2L, s"lead in words $passage", "srcX"),
      (3L, "nothing shared with the benchmark at all in this one", "srcX"))
      .toDF("doc_id", "text", "source")
    val out = PipelineOps.contaminationOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(out(2L) == 1L, "candidate sharing the passage must hit exactly once")
    assert(out(3L) == 0L, "unrelated candidate must not hit")
  }

  test("repetition: repeated doc scores high, distinct doc scores zero") {
    import spark.implicits._
    val repeated = Seq.fill(10)("spam ham").mkString(" ")
    val distinctDoc = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, repeated), (2L, distinctDoc)).toDF("doc_id", "text")
    val out = PipelineOps.repetitionOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup2_frac"), r.getAs[Double]("top_tok_frac"))).toMap
    // 20 tokens → 19 bigrams, only 2 distinct ("spam ham", "ham spam").
    assert(out(1L)._1 > 0.85, s"repeated doc dup2=${out(1L)._1}")
    assert(out(1L)._2 == 0.5, "each of the 2 tokens is half the doc")
    assert(out(2L)._1 == 0.0)
    assert(out(2L)._2 == 0.05, "every token unique → top share = 1/20")
  }

  test("repetition on sf0.001: fractions well-formed") {
    val rows = q("tx_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("dup2_frac", "dup3_frac", "top_tok_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
      assert(r.getAs[Double]("top_tok_frac") > 0.0)
    }
  }

  test("pack: offsets are gap-free within each (lang, shard) stream") {
    val rows = q("tx_pack").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("start_off"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_off")))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, stream) =>
      val ordered = stream.sortBy(_._3)
      var expected = 0L
      ordered.foreach { case (_, _, _, nTok, startOff, chunkId, chunkOff) =>
        assert(startOff == expected, "stream must be gap-free")
        assert(chunkId == startOff / PipelineOps.ChunkTokens)
        assert(chunkOff == startOff % PipelineOps.ChunkTokens)
        expected += nTok
      }
    }
  }

  test("pack: deterministic across runs") {
    val a = q("tx_pack").collect().map(_.toString).sorted
    val b = q("tx_pack").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("pii scrub: redacts adversarial hand-written strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("two mails first.last+tag@sub.domain.org and x@y.io here",
        "two mails <EMAIL> and <EMAIL> here"),
      ("call +1-800-1234 or +1-555-0000 now", "call <PHONE> or <PHONE> now"),
      ("srv at 192.168.1.250 and 8.8.8.8", "srv at <IP> and <IP>"),
      ("not pii: 1.2.3 or user@nodot or +1-55-0000", "not pii: 1.2.3 or user@nodot or +1-55-0000"),
      ("mixed a@b.co 10.0.0.1 +1-555-9999", "mixed <EMAIL> <IP> <PHONE>"))
    val out = cases.map(_._1).toDF("s")
      .select(queries.TextOps.scrubPii(col("s")).as("r"))
      .collect().map(_.getString(0))
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got '$got', want '$want'")
    }
  }

  test("html strip: extracts adversarial hand-written markup") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script/style/comment CONTENT must vanish, not just the tags.
      ("<p>a</p><script>if (x < 9) alert('<b>')</script><p>b</p>", "a b"),
      ("<style>h1 > p { x: y }</style>text", "text"),
      ("before<!-- <p>hidden</p>\nstill hidden -->after", "before after"),
      // Attributes, self-closing and void tags, multi-line tags.
      ("<a href=\"/x?a=1&b=2\" title='t'>link</a><br/><img src=x>", "link"),
      ("<div\n  class=\"wide\"\n>in</div>", "in"),
      // Entities: &amp;lt; is a LITERAL "&lt;", never double-decoded to <.
      ("1 &lt; 2 &amp; 3 &gt; 2", "1 < 2 & 3 > 2"),
      ("&amp;lt;not-a-tag&amp;gt;", "&lt;not-a-tag&gt;"),
      ("say &quot;hi&quot; it&#39;s fine", "say \"hi\" it's fine"),
      // Whitespace collapse across removed block boundaries.
      ("  <p>\n\ta b\f</p>  ", "a b"))
    val out = cases.map(_._1).toDF("s")
      .select(queries.TextOps.stripHtml(col("s")).as("r"))
      .collect().map(_.getString(0))
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got '$got', want '$want'")
    }
  }

  test("pii scrub on sf0.001: every injected row found and scrubbed") {
    val rows = q("tx_pii_scrub").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_emails") >= 1)
      assert(r.getAs[Int]("n_phones") >= 1)
      assert(r.getAs[Int]("n_ips") >= 1)
    }
  }

  test("line dedup: planted cross-document chunk removed, unique text kept") {
    import spark.implicits._
    // Chunks are non-overlapping 8-token windows: docs 1 and 2 share their
    // FIRST chunk exactly; their second chunks differ.
    val boiler = "all rights reserved terms of service apply here"
    val d = Seq(
      (1L, s"$boiler unique one content tail"),
      (2L, s"$boiler different second chunk in this doc"),
      (3L, "a fully unique document with no shared chunks at all"))
      .toDF("doc_id", "text")
    val out = PipelineOps.lineDedupOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("cleaned_hash"))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1, "doc 1 loses its boilerplate chunk")
    assert(out(2L)._1 == 2 && out(2L)._2 == 1)
    assert(out(3L)._1 == 2 && out(3L)._2 == 2, "unique doc keeps everything")
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L)._3 == md5Hex("unique one content tail"),
      "doc 1 reassembles to exactly its surviving chunk")
    assert(out(3L)._3 == md5Hex("a fully unique document with no shared chunks at all"))
  }

  test("line dedup: doc that is all boilerplate ends empty") {
    import spark.implicits._
    val shared = "one two three four five six seven eight"
    val d = Seq((1L, shared), (2L, shared), (3L, s"$shared but with a unique tail"))
      .toDF("doc_id", "text")
    val out = PipelineOps.lineDedupOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("cleaned_hash"))).toMap
    assert(out(1L)._1 == 0)
    assert(out(1L)._2 == "d41d8cd98f00b204e9800998ecf8427e", "md5 of empty string")
    assert(out(3L)._1 == 1, "doc 3's tail chunk differs → survives")
  }

  test("lm score: rare tokens counted, commonness reflects corpus counts") {
    import spark.implicits._
    // Corpus: 'common' appears 200×, 'rare' once → share 1/201 < 1/100.
    val filler = Seq.fill(199)("common").mkString(" ")
    val d = Seq((1L, s"common $filler"), (2L, "rare")).toDF("doc_id", "text")
    val out = PipelineOps.lmScoreOf(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("common_sum"),
          r.getAs[Long]("rare_cnt"), r.getAs[Double]("mean_commonness"))).toMap
    assert(out(1L) == ((200L, 200L * 200L, 0L, 200.0)))
    assert(out(2L) == ((1L, 1L, 1L, 1.0)), "the rare token is its doc's whole mass")
  }

  test("keywords: tf desc, df asc, token ordering") {
    import spark.implicits._
    // doc 1: 'zz' tf=3; 'yy' and 'bb' tf=2 each. 'bb' also appears in
    // doc 2 (df=2) while 'yy' is unique to doc 1 (df=1) — the rarer 'yy'
    // outranks 'bb' even though 'bb' sorts first alphabetically, proving
    // the df tie-break (not token order) decides. 'cc' tf=1 is cut.
    val d = Seq(
      (1L, "zz zz zz yy yy bb bb cc"),
      (2L, "bb dd dd")).toDF("doc_id", "text")
    val out = PipelineOps.keywordsOf(d).collect()
      .filter(_.getAs[Long]("doc_id") == 1L)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Int]("rank")))
    assert(out.toSeq == Seq(("zz", 3L, 1L, 1), ("yy", 2L, 1L, 2), ("bb", 2L, 2L, 3)))
  }

  test("data checks: every check fires on a planted-violation corpus " +
       "and reads zero on the clean fixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // Clean fixture: all violation counts are zero (that IS the report).
    val clean = graft.queries.PipelineOps.queries("pipe_data_checks")(
      spark, SparkTestBase.sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(clean.size == 7 && clean.values.forall(_ == 0L), s"clean: $clean")

    // Planted corpus: one violation of each kind.
    val tmp = java.nio.file.Files.createTempDirectory("graft_checks").toString
    Seq(
      (1L, "hello world", "en", "s", 11L),
      (1L, "dup id", "en", "s", 6L),            // doc_id_unique
      (2L, "short", "en", "s", 999L),           // doc_text_consistent
      (3L, "ok text", "xx", "s", 7L))           // doc_lang_domain
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    Seq(
      (1L, ts(1), 10L, "view", 1.0, "{}"),
      (2L, ts(2), 10L, "teleport", 1.0, "{}"),  // event_type_domain
      (3L, ts(3), 10L, "click", -5.0, "{}"),    // event_value_range
      (4L, java.sql.Timestamp.valueOf("1999-01-01 00:00:00"),
        10L, "view", 1.0, "{}"),                // event_ts_range
      (5L, ts(4), 999999L, "view", 1.0, "{}"))  // event_user_ref (orphan)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Seq((10L, "Cust", 1L, 0.0, "SEG")).toDF(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val planted = graft.queries.PipelineOps.queries("pipe_data_checks")(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(planted.forall(_._2 == 1L),
      s"each planted check must report exactly one violation: $planted")
  }

  test("weighted sample: engine selection == local A-ES model; heavy " +
       "weights dominate the sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{length => flen, lit => flit}
    // 500 light docs (weight 10) + 20 heavy docs (weight 100000): under
    // exponential keys the heavy block has ~1000x the light block's
    // total weight, so essentially the whole sample is heavy docs.
    val docs = (0 until 500).map(i => (i.toLong, 10L)) ++
      (1000 until 1020).map(i => (i.toLong, 100000L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_wsample").toString
    docs.toDF("doc_id", "n_chars")
      .withColumn("text", flit("x")).withColumn("lang", flit("en"))
      .withColumn("source", flit("s"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.TextOps.queries("tx_weighted_sample")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    // Local model: same md5-hex uniform, same key, same micro-rounding.
    def key(id: Long, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val v = java.lang.Long.parseLong(hex.take(13), 16)
      math.floor(1e12 * (-math.log((v + 1.0) / 4503599627370497.0) / w)).toLong
    }
    val model = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (k, id) }.take(100)
      .zipWithIndex.map { case ((id, k), i) => (id, k, i + 1) }
    assert(out.sortBy(_._3).toSeq == model.toSeq,
      "engine sample must equal the local A-ES model exactly")
    // All 20 heavy docs must be in the sample (P(miss) is astronomically
    // small and the draw is deterministic — this pins the weighting).
    val sampledIds = out.map(_._1).toSet
    assert((1000L until 1020L).forall(sampledIds.contains),
      s"heavy docs missing from sample: ${(1000L until 1020L).filterNot(sampledIds.contains)}")
  }

  test("winnowing: match guarantee (shared >= w+k-1 substring shares a " +
       "selected fingerprint) and density bound vs a local model") {
    import spark.implicits._
    import graft.queries.TextOps.{WinnowK => k, WinnowW => w}
    // Local reference model of Schleimer et al.'s algorithm over md5-hex
    // gram hashes: window min, rightmost tie.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def model(text: String): Set[(String, Int)] = {
      val grams = (0 to text.length - k).map(i => md5hex(text.substring(i, i + k)))
      (0 to grams.length - w).flatMap { p =>
        val win = (p until p + w).map(j => (grams(j), -(j + 1)))
        Seq(win.min match { case (h, nj) => (h, -nj) })
      }.toSet
    }
    val rnd = new scala.util.Random(7)
    def randText(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randText(k + w - 1) // exactly the guarantee length
    val docs = Seq(
      (1L, randText(60) + shared + randText(60)),
      (2L, randText(80) + shared + randText(40)),
      (3L, randText(200)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_winnow").toString
    docs.toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.queries.TextOps.queries("tx_winnow")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    docs.foreach { case (id, text) =>
      val m = model(text)
      val (nGrams, nSel, minSel, maxSel) = out(id)
      assert(nGrams == text.length - k + 1)
      assert(nSel == m.size, s"doc $id: engine $nSel vs model ${m.size}")
      assert(minSel == m.map(_._1).min && maxSel == m.map(_._1).max)
      // Density: winnowing selects at most one new fingerprint per
      // window start and at least one per w consecutive windows.
      assert(nSel <= nGrams - w + 1 && nSel >= (nGrams - w + 1) / w.toLong)
    }
    // The match GUARANTEE: docs 1 and 2 share a w+k-1-char substring, so
    // they must share at least one selected fingerprint hash.
    val m1 = model(docs(0)._2).map(_._1)
    val m2 = model(docs(1)._2).map(_._1)
    assert((m1 & m2).nonEmpty, "guarantee violated: no shared fingerprint")
  }

  test("pipe_split_leakage is exactly the cross-split subset of the " +
       "near-dup pair graph, splits reported faithfully") {
    val sf = SparkTestBase.sf
    val splits = SparkEntry.queries("tx_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = SparkEntry.queries("d2_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("pipe_split_leakage")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getString(2), r.getString(3))))
    val expected = pairs.filter { case (a, b) => splits(a) != splits(b) }
    assert(got.map(_._1).toSet == expected,
      s"leaked set mismatch: got ${got.length}, expected ${expected.size}")
    got.foreach { case ((a, b), (sa, sb)) =>
      assert(sa == splits(a) && sb == splits(b), s"split labels wrong for ($a,$b)")
    }
  }

  test("pipe_embed_contamination: flag consistent with the reported max, " +
       "benchmark docs excluded, max verified against a local model") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestBase.sf
    val rows = SparkEntry.queries("pipe_embed_contamination")(spark, sf).collect()
    assert(rows.nonEmpty)
    val benchIds = Tables.documents(spark, sf)
      .where(col("source") === graft.queries.PipelineOps.BenchmarkSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), "benchmark doc in candidate output")
      if (!r.isNullAt(1))
        assert(r.getBoolean(2) ==
          (r.getDouble(1) >= graft.queries.PipelineOps.EmbedContamTau))
    }
    // Local-model check on a handful of candidates: max cosine recomputed
    // in plain Scala from the raw vectors.
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val benchVs = benchIds.toSeq.sorted.flatMap(vecs.get)
    rows.take(20).foreach { r =>
      val id = r.getLong(0)
      val expect = benchVs.map(bv => cos(vecs(id), bv)).max
      assert(math.abs(r.getDouble(1) - expect) < 1e-9,
        s"doc $id: reported ${r.getDouble(1)} vs model $expect")
    }
  }

  test("temperature quotas: conserve the budget exactly, follow sqrt " +
       "monotonicity, upweight small sources vs proportional") {
    import spark.implicits._
    // Heavily skewed source sizes — the regime temperature mixing exists
    // for. √c weights: 100, 31, 10, 3, 1 (1000 → 31: non-square, the
    // self-correcting isqrt path).
    val counts = Seq(("big", 10000L), ("mid", 1000L), ("small", 100L),
      ("tiny", 10L), ("one", 1L)).toDF("source", "c")
    val n = 97L // deliberately not divisible: exercises the remainders
    val q = PipelineOps.temperatureQuotas(counts, n).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q.values.sum == n, s"quotas must conserve the budget: $q")
    // Monotone in c.
    assert(q("big") >= q("mid") && q("mid") >= q("small") &&
      q("small") >= q("tiny") && q("tiny") >= q("one"), q.toString)
    // The point of α < 1: small sources get MORE than their proportional
    // share, the big source less. Proportional share of "big" would be
    // 97·10000/11111 ≈ 87; √-weighted it is 97·100/145 ≈ 66.
    val totalDocs = 11111.0
    assert(q("big") < 97.0 * 10000.0 / totalDocs)
    // Proportional would give "tiny" 97·10/11111 ≈ 0.09 → nothing;
    // √-weighted it gets a real allocation (97·3/145 ≈ 2).
    assert(q("tiny") >= 2, s"small source must be upweighted: $q")
    // Deterministic.
    val q2 = PipelineOps.temperatureQuotas(counts, n).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q2 == q)
  }

  test("pipe_corpus_release: the released plan reads only the shared stage " +
       "artifacts — zero corpus scans — and the card conserves the cleaned " +
       "doc count") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val sf = SparkTestBase.sf
    val df = q("pipe_corpus_release")
    val rows = df.collect()
    assert(rows.nonEmpty)
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case qs: QueryStageExec => expand(qs.plan)
      case o => o +: o.children.flatMap(expand)
    }
    val scans = expand(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "release must read the materialized stage artifacts")
    // THE pin: every stage (clean frame, d2 pair graph) is a session-
    // materialized artifact, so the release never re-scans the corpus —
    // the Materialize.once discipline made load-bearing.
    val corpusScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(sf)))
    assert(corpusScans.isEmpty,
      "release plan re-scans the corpus:\n" +
        corpusScans.flatMap(_.relation.location.rootPaths).mkString("\n"))
    // Conservation: released docs + leakage drops == the cleaned count.
    val cleanedCount = q("pipe_clean_corpus").count()
    val (released, dropped) = rows.foldLeft((0L, 0L)) { case ((a, b), r) =>
      (a + r.getAs[Long]("n_docs"), b + r.getAs[Long]("n_leak_dropped"))
    }
    // Dropped docs in fully-dropped (split, lang) cells don't appear in
    // the card, so released + dropped can undercount only if a whole
    // cell vanished — compare against the drop-id set directly instead.
    assert(released + dropped <= cleanedCount)
    assert(released <= cleanedCount && released > 0)
  }

  test("tx_temperature_mix: per-source selections equal min(quota, available)") {
    import org.apache.spark.sql.functions.col
    val out = q("tx_temperature_mix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    val bynSrc = out.groupBy(_._2)
    val avail = Tables.documents(spark, SparkTestBase.sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bynSrc.foreach { case (src, rows) =>
      val quota = rows.head._3
      assert(rows.map(_._3).distinct.size == 1, s"$src: quota must be constant")
      assert(rows.size.toLong == math.min(quota, avail(src)),
        s"$src: selected ${rows.size}, quota $quota, available ${avail(src)}")
    }
    assert(out.map(_._1).distinct.length == out.length, "no doc selected twice")
  }

  test("tx_length_batching: batches conserve tokens and docs, and length " +
       "sorting never pads more than naive order stream-wide") {
    import org.apache.spark.sql.functions._
    val rows = q("tx_length_batching").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    // Conservation: every stream's batches tile its docs and tokens.
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val nTok = when(trim(col("text")) === "", 0)
      .otherwise(size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")))
    val byStream = docs.select(col("lang"),
        pmod(col("doc_id"),
          lit(graft.queries.PipelineOps.PackShards)).as("shard"),
        nTok.cast("long").as("n"))
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("docs"), sum("n").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    rows.groupBy(t => (t._1, t._2)).foreach { case (k, bs) =>
      val (nd, nt) = byStream(k)
      assert(bs.map(_._4).sum == nd, s"$k: docs")
      assert(bs.map(_._6).sum == nt, s"$k: tokens")
      assert(bs.forall(b => b._7 == b._4 * b._5 - b._6), s"$k: pad identity")
      assert(bs.count(_._4 < graft.queries.PipelineOps.BatchDocs.toLong) <= 1,
        s"$k: at most one partial batch")
    }
    // Descending length order wins corpus-wide (it is NOT a per-stream
    // theorem — a stream whose naive order happens to group equal
    // lengths can tie or beat it — but across many streams the sorted
    // total must come out ahead on any length-varied corpus).
    assert(rows.map(_._7).sum < rows.map(_._8).sum)
  }

  test("quality classifier: bit-exact local model, learning curve, determinism") {
    import PipelineOps.{QcLr, QcRounds}
    val feats = PipelineOps.qcFeaturesOf(Tables.documents(spark, SparkTestBase.sf))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = feats.length
    def rnd(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    val w = Array(0L, 0L, 0L)
    val model = (1 to QcRounds).map { r =>
      var nc = 0L
      val g = Array(0L, 0L, 0L)
      feats.foreach { case (y, x0, x1, x2) =>
        val z = w(0) * x0 + w(1) * x1 + w(2) * x2
        if ((if (z >= 0L) 1L else 0L) == y) nc += 1L
        val p = 1.0d / (1.0d + math.exp(-(z.toDouble / 1e12)))
        val gm = rnd((y.toDouble - p) * 1e6)
        g(0) += gm * x0; g(1) += gm * x1; g(2) += gm * x2
      }
      (0 to 2).foreach(j =>
        w(j) += rnd((QcLr * g(j)).toDouble / n.toDouble / 1e6))
      (r, w(0), w(1), w(2), nc)
    }.toSet
    def run() = q("pipe_quality_classifier").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val got = run()
    assert(got == model, "trainer diverges from the local fixed-point model")
    assert(got == run(), "training must be deterministic")
    // The filter actually learns: from the all-positive base rate at
    // round 1 to a real separator by the last round.
    val byRound = got.toSeq.sortBy(_._1).map(_._5)
    assert(byRound.last > byRound.head, "accuracy must improve over training")
    assert(byRound.last * 4 >= n * 3, s"final accuracy ${byRound.last}/$n too low")
  }

  test("quality filter: serves the trained weights integer-exactly and splits the corpus") {
    val rounds = q("pipe_quality_classifier").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (w0, w1, w2) = rounds(PipelineOps.QcRounds)
    val feats = PipelineOps.qcFeaturesOf(Tables.documents(spark, SparkTestBase.sf))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val out = q("pipe_quality_filter").collect()
    assert(out.length == feats.size, "every document scored exactly once")
    out.foreach { r =>
      val (x0, x1, x2) = feats(r.getLong(0))
      val z = w0 * x0 + w1 * x1 + w2 * x2
      assert(r.getLong(1) == z, s"doc ${r.getLong(0)}: margin mismatch")
      assert(r.getBoolean(2) == (z >= 0L), "keep contract")
    }
    assert(out.exists(_.getBoolean(2)) && out.exists(!_.getBoolean(2)),
      "the trained filter must actually split the corpus")
  }

  test("k-anonymity: conservation, flag contract, planted singleton flagged") {
    val rows = q("pipe_k_anonymity").collect()
    assert(rows.map(_.getAs[Long]("group_n")).sum ==
      Tables.documents(spark, SparkTestBase.sf).count(),
      "cells must tile the corpus")
    rows.foreach(r => assert(r.getAs[Boolean]("at_risk") ==
      (r.getAs[Long]("group_n") < PipelineOps.KAnonK), "flag contract"))
    import spark.implicits._
    val d = (Seq.fill(6)(("en", "srcA", 150L)) :+ (("zz", "srcB", 920L)))
      .zipWithIndex.map { case ((l, s, n), i) => (i.toLong, l, s, n) }
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = PipelineOps.kAnonymityOf(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("en", "srcA", 1L)) == ((6L, false)),
      "populated cell must pass")
    assert(out(("zz", "srcB", 9L)) == ((1L, true)),
      "singleton cell must be flagged re-identifiable")
  }

  test("drift psi: invariants + conservation on sf0.001") {
    val rows = q("pipe_drift_psi").collect()
    val langs = Tables.documents(spark, SparkTestBase.sf)
      .select("lang").distinct().count()
    assert(rows.length == langs, "one row per lang slice")
    rows.foreach { r =>
      assert(r.getAs[Long]("psi_micro") >= 0L,
        "every PSI term has matching factor signs, so PSI >= 0")
      val tvd = r.getAs[Long]("tvd_micro")
      assert(tvd >= 0L && tvd <= 1000000L, "TVD is a probability distance")
    }
    val byLang = Tables.documents(spark, SparkTestBase.sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("ref_n") + r.getAs[Long]("cur_n")
        == byLang(r.getAs[String]("lang")), "phase split tiles the slice")
    }
  }

  test("drift psi: identical distributions score zero, a displaced one spikes") {
    import spark.implicits._
    def doc(id: Long, nTok: Int, lang: String, src: String) =
      (id, Seq.fill(nTok)("w").mkString(" "), lang, src)
    val same = // ref and cur identical in count AND shape -> p_ref == p_cur
      (0L to 3L).map(i => doc(i, 20, "sm", "srcA")) ++
        (4L to 7L).map(i => doc(i, 40, "sm", "srcA")) ++
        (8L to 11L).map(i => doc(i, 20, "sm", DedupOps.IncomingSource)) ++
        (12L to 15L).map(i => doc(i, 40, "sm", DedupOps.IncomingSource))
    val moved = // cur mass entirely displaced to the top bin
      (16L to 23L).map(i => doc(i, 20, "mv", "srcA")) ++
        (24L to 31L).map(i => doc(i, 120, "mv", DedupOps.IncomingSource))
    val d = (same ++ moved).toDF("doc_id", "text", "lang", "source")
    val out = PipelineOps.driftPsiOf(d).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("psi_micro"), r.getAs[Long]("tvd_micro"))).toMap
    assert(out("sm") == (0L, 0L),
      "equal smoothed distributions must score exactly zero")
    assert(out("mv")._1 > 1000000L, s"displaced slice PSI=${out("mv")._1}")
    assert(out("mv")._2 > out("sm")._2)
  }

  test("drift psi: micro values equal a local fixed-order model bit-exactly") {
    import graft.queries.PipelineOps.{DriftBinWidth, DriftNBins}
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .select("lang", "source", "text").collect()
    val counts = scala.collection.mutable.Map
      .empty[(String, String, Int), Long].withDefaultValue(0L)
    docs.foreach { r =>
      val t = r.getAs[String]("text").trim
      val n = if (t.isEmpty) 0 else t.split("[ \\t\\n\\x0B\\f\\r]+").length
      val bin = math.min(n / DriftBinWidth, DriftNBins - 1)
      val ph = if (r.getAs[String]("source") == DedupOps.IncomingSource) "cur"
        else "ref"
      counts((r.getAs[String]("lang"), ph, bin)) += 1L
    }
    val langs = docs.map(_.getAs[String]("lang")).distinct
    val model = langs.map { l =>
      val refN = (0 until DriftNBins).map(b => counts((l, "ref", b))).sum
      val curN = (0 until DriftNBins).map(b => counts((l, "cur", b))).sum
      var psi = 0.0d; var tvd = 0.0d
      (0 until DriftNBins).foreach { b => // FIXED bin order, like the query
        val pr = (counts((l, "ref", b)) + 1L).toDouble / (refN + DriftNBins).toDouble
        val pc = (counts((l, "cur", b)) + 1L).toDouble / (curN + DriftNBins).toDouble
        psi += (pc - pr) * math.log(pc / pr)
        tvd += math.abs(pc - pr)
      }
      l -> (math.round(psi * 1e6), math.round(tvd * 0.5 * 1e6))
    }.toMap
    q("pipe_drift_psi").collect().foreach { r =>
      assert(model(r.getAs[String]("lang")) ==
        (r.getAs[Long]("psi_micro"), r.getAs[Long]("tvd_micro")),
        s"lang ${r.getAs[String]("lang")} diverges from the local model")
    }
  }

  test("pipe_ingest_gate: verdicts agree with every individual screen " +
       "under the stated precedence") {
    import org.apache.spark.sql.functions.col
    import graft.queries.DedupOps
    val gate = q("pipe_ingest_gate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          if (r.isNullAt(r.fieldIndex("dup_of"))) None
          else Some(r.getAs[Long]("dup_of")))).toMap
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val batchIds = docs.where(col("source") === DedupOps.IncomingSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gate.keySet == batchIds, "one verdict per arriving doc")
    // Recompute each screen from its registered query.
    val blocked = q("tx_blocklist").collect()
      .filter(r => !r.getAs[Boolean]("clean"))
      .map(_.getAs[Long]("doc_id")).toSet
    val exact = q("d7_incremental_dedup").collect()
      .filter(_.getAs[Boolean]("is_dup"))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = q("d14_incremental_minhash").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val ndOf = (pairs ++ pairs.map(_.swap))
      .filter { case (id, p) =>
        srcOf(p) != DedupOps.IncomingSource || p < id }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).min }
    val keep = q("pipe_quality_filter").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    batchIds.foreach { id =>
      val expect =
        if (blocked(id)) ("blocked", None)
        else if (exact.contains(id)) ("exact_dup", Some(exact(id)))
        else if (ndOf.contains(id)) ("near_dup", Some(ndOf(id)))
        else if (!keep(id)) ("low_quality", None)
        else ("admitted", None)
      assert(gate(id) == expect, s"doc $id: gate ${gate(id)} != $expect")
    }
  }

  test("tx_code_detect: planted code flags, prose passes, counts exact") {
    import spark.implicits._
    val code =
      """def main(args) {
        |  x = [1; 2; 3];
        |  return args;
        |}""".stripMargin
    val prose = "This is a perfectly ordinary paragraph of prose with " +
      "no structural characters at all, just words and words and words."
    val d = Seq((1L, code, code.length.toLong), (2L, prose, prose.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val out = graft.queries.TextOps.codeDetectOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    // code structural chars: { } on their lines (2), the x-assignment
    // line's = [ ; ; ] ; (6), the return line's ; (1) = 9 (parens are
    // NOT counted); keywords: 'def ', 'return '; indented lines: 2.
    assert(out(1L)._1 == 9, s"struct count: ${out(1L)}")
    assert(out(1L)._2 == 2 && out(1L)._3 == 2)
    assert(out(1L)._4 == 9 * 2 + 2 * 3 + 2)
    assert(out(1L)._5, "planted code must flag")
    assert(out(2L)._1 == 0 && out(2L)._2 == 0 && !out(2L)._5,
      s"prose must pass: ${out(2L)}")
  }

  test("tx_code_detect: density gate calibration — a long prose doc with " +
       "one stray '=' must NOT flag; dense short code must") {
    import spark.implicits._
    // Before the score*100 calibration, score*1000 flagged any <2000-char
    // prose doc containing a single marker char (one '=' -> score 2 ->
    // 2000 >= n_chars). Pin the fixed split on both sides of the gate.
    val stray = ("word " * 398) + "a = b" // 1995 chars, one '='
    assert(stray.length == 1995)
    val dense = "x=1;y=2;{z=[3];}" // 16 chars, struct count 10
    val d = Seq((1L, stray, stray.length.toLong),
      (2L, dense, dense.length.toLong)).toDF("doc_id", "text", "n_chars")
    val out = graft.queries.TextOps.codeDetectOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(out(1L)._1 == 2 && !out(1L)._2,
      s"stray '=' in prose must not flag: ${out(1L)}")
    assert(out(2L)._2, s"dense code must flag: ${out(2L)}")
  }

  test("tx_langid_eval: confusion matrix conserves the corpus, stays in " +
       "the classifier's label domain, and matches tx_langid directly") {
    import org.apache.spark.sql.functions.col
    val cells = q("tx_langid_eval").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("correct"))).toMap
    val corpusN = Tables.documents(spark, SparkTestBase.sf).count()
    assert(cells.values.map(_._1).sum == corpusN)
    val domain = Set("en", "es", "de", "fr", "und")
    cells.foreach { case ((lang, pred), (n, correct)) =>
      assert(domain.contains(pred), s"prediction outside the classifier: $pred")
      assert(correct == (lang == pred))
      assert(n > 0)
    }
    // Cross-check against the classifier's own output.
    val direct = q("tx_langid").select(col("doc_id"), col("lang_pred"))
      .join(Tables.documents(spark, SparkTestBase.sf)
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang", "lang_pred").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count")).toMap
    assert(direct == cells.map { case (k, (n, _)) => k -> n })
  }

  test("tx_bigram_lm: fluent (repeated-phrase) docs outscore gibberish; " +
       "totals are exact integer sums") {
    import spark.implicits._
    // Three fluent docs repeat the same phrase (their bigrams are
    // corpus-common); the gibberish doc's bigrams are singletons.
    val phrase = "the quick brown fox jumps over the lazy dog"
    val d = Seq(
      1L -> s"$phrase and $phrase",
      2L -> s"again $phrase here $phrase",
      3L -> phrase,
      4L -> "zq1 xv2 kj3 wp4 mn5 bt6 gh7 rd8 lc9",
      5L -> "loner", // <2 tokens: no bigrams -> absent row, not a
      6L -> "")      // degenerate one-token score (ADVICE round 8)
      .toDF("doc_id", "text")
    val out = PipelineOps.bigramLmOf(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L),
      s"sub-bigram docs must be absent: ${out.keySet}")
    out.foreach { case (id, (n, tot, avg)) =>
      assert(n > 0 && tot < 0, s"doc $id: log-probs must be negative")
      assert(avg == math.floor(tot.toDouble / n).toLong, s"doc $id arithmetic")
    }
    // The quality signal: every phrase-carrying doc outscores gibberish.
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._3 > out(4L)._3,
        s"fluent doc $id must outscore gibberish: ${out(id)._3} vs ${out(4L)._3}")
    }
  }

  test("tx_curriculum_buckets: equal-population phases ordered by " +
       "quality, keep mass concentrated early") {
    import graft.queries.PipelineOps.CurriculumPhases
    val rows = q("tx_curriculum_buckets").collect()
      .map(r => (r.getAs[Int]("phase"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("z_min"), r.getAs[Long]("z_max"),
        r.getAs[Long]("n_keep"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to CurriculumPhases))
    // ntile: populations differ by at most one, conserve the corpus.
    val total = Tables.documents(spark, SparkTestBase.sf).count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // Phases descend in quality: phase p's floor >= phase p+1's ceiling
    // (ties can touch, never invert).
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._4, s"phase ${a._1} floor below phase ${b._1} ceiling")
    }
    // The keep decision is z >= 0, so kept docs pack into the earliest
    // phases: n_keep is non-increasing across phases.
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 >= b._5, s"keep mass must not grow later")
    }
    assert(rows.head._5 > 0, "phase 1 must hold kept docs")
  }

  test("tx_curriculum_kll: the 100 TB curriculum sibling — sketch cuts " +
       "honor the exact rank bound, totals match, and the plan carries " +
       "NO window at all") {
    val df = q("tx_curriculum_kll")
    val rows = df.collect().map(r => (r.getAs[Long]("cut_pct"),
      r.getAs[Boolean]("rank_ok"), r.getAs[Boolean]("mono_ok"),
      r.getAs[Boolean]("conserve_ok"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_keep")))
    assert(rows.map(_._1).sorted.toSeq == Seq(25L, 50L, 75L))
    rows.foreach { r =>
      assert(r._2, s"KLL rank bound violated at cut ${r._1}")
      assert(r._3, "cut points must be monotone")
      assert(r._4, "phase populations must conserve the corpus")
    }
    val total = Tables.documents(spark, SparkTestBase.sf).count()
    assert(rows.forall(_._5 == total), "n_docs must be the corpus size")
    assert(rows.forall(r => r._6 > 0 && r._6 < total),
      "keep count must be a proper subset at this SF")
    // The scale contract the sibling exists for: phase assignment is
    // sketch + broadcast thresholds — the executed plan must contain no
    // Window operator of any kind (the exact arm's unpartitioned ntile
    // is precisely what this path removes).
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n${plan.take(800)}")
  }

  test("pipe_dp_card: noisy counts track the true cells within Laplace " +
       "tails, are deterministic under the fixed seed, and move under a " +
       "different seed") {
    import org.apache.spark.sql.functions.col
    val noisy = q("pipe_dp_card").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("noisy_count_micro"))
      .toMap
    val truth = q("pipe_clean_corpus").groupBy(col("lang"), col("split"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count")).toMap
    assert(noisy.keySet == truth.keySet, "one noisy row per occupied cell")
    noisy.foreach { case (cell, nm) =>
      val err = math.abs(nm / 1e6 - truth(cell))
      // Laplace(b=1): P(|noise| > 14) = e^-14 ≈ 8e-7 — across 15 cells a
      // violation means the mechanism, not luck.
      assert(err <= 14.0, s"cell $cell noise $err implausible for b=1")
      assert(nm != truth(cell) * 1000000L, s"cell $cell published exactly")
    }
    // Replayable under the fixed seed…
    assert(q("pipe_dp_card").collect().map(
      r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("noisy_count_micro"))
      .toMap == noisy)
    // …and genuinely seed-dependent (the privacy lives in the seed).
    spark.conf.set("spark.graft.dp.seed", "spec-other-seed")
    try {
      val other = q("pipe_dp_card").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("noisy_count_micro"))
        .toMap
      assert(other != noisy, "noise must move with the seed")
    } finally spark.conf.unset("spark.graft.dp.seed")
  }

  test("tx_shard_shuffle: assignment conserves the corpus, mixes sources, " +
       "and elects a deterministic first doc") {
    import org.apache.spark.sql.functions.col
    val rows = q("tx_shard_shuffle").collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"), r.getAs[Long]("max_source_share_micro"),
        r.getAs[Long]("first_doc")))
    val docs = Tables.documents(spark, SparkTestBase.sf)
    assert(rows.map(_._2).sum == docs.count(), "shards must conserve the corpus")
    assert(rows.map(_._1).distinct.length == rows.length)
    // Mixing: every populated shard draws from several sources, and no
    // single source dominates a shard (content-independent md5 spread).
    val nSources = docs.select(col("source")).distinct().count()
    rows.filter(_._2 >= 10).foreach { case (sh, n, ns, share, _) =>
      assert(ns >= 2, s"shard $sh with $n docs drew a single source")
      assert(share < 1000000L, s"shard $sh fully single-source")
      assert(ns <= nSources)
    }
    // Determinism: same session, same corpus → identical report
    // (assignment and first-doc election are pure md5 arithmetic).
    val again = q("tx_shard_shuffle").collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sources"), r.getAs[Long]("max_source_share_micro"),
        r.getAs[Long]("first_doc")))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("ann_hybrid_rrf: fusion equals the local RRF model over the two " +
       "arm rankings, integer-exact") {
    import graft.queries.PipelineOps.{Bm25TopK, HybridTopK, RrfK}
    // Recompute both arms through the registered queries, fuse locally
    // with exact integer arithmetic, and demand the fused ranking match.
    val lex = q("tx_bm25").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    assert(lex.size == Bm25TopK)
    val vec = q("ann_brute_topk").collect().zipWithIndex
      .map { case (r, i) => r.getAs[Long]("vec_id") -> (i + 1) }.toMap
    val model = (lex.keySet ++ vec.keySet).toSeq.map { id =>
      val s = lex.get(id).map(r => 1000000000L / (RrfK + r)).getOrElse(0L) +
        vec.get(id).map(r => 1000000000L / (RrfK + r)).getOrElse(0L)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(HybridTopK)
    val got = q("ann_hybrid_rrf").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("fused_rank"),
        r.getAs[Long]("rrf_nano")))
      .sortBy(_._2)
    assert(got.length == model.length)
    got.zip(model).foreach { case ((gid, _, gs), (mid, ms)) =>
      assert(gid == mid && gs == ms,
        s"fused row ($gid, $gs) != local model ($mid, $ms)")
    }
    // The fusion property RRF exists for: a doc ranked by BOTH arms must
    // outscore a doc holding the same rank in only one arm.
    val both = got.filter(r => lex.contains(r._1) && vec.contains(r._1))
    val single = got.filter(r => lex.contains(r._1) ^ vec.contains(r._1))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._3).max > single.map(_._3).min)
  }

  test("pipe_drop_reasons: attribution agrees with the clean pipeline and " +
       "reads only the shared scoring artifact") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = q("pipe_drop_reasons")
    val rows = df.collect()
    // Total coverage: every corpus doc gets exactly one verdict.
    val corpusN = Tables.documents(spark, SparkTestBase.sf).count()
    assert(rows.length.toLong == corpusN)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    // The load-bearing claim: docs attributed `kept` are EXACTLY the clean
    // pipeline's survivors — attribution cannot disagree with the pipeline
    // it explains.
    val kept = rows.filter(_.getAs[String]("reason") == "kept")
      .map(_.getAs[Long]("doc_id")).toSet
    val cleaned = q("pipe_clean_corpus").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept == cleaned, "kept set diverges from pipe_clean_corpus")
    // dup_of discipline: present iff exact_dup, and always a kept doc.
    rows.foreach { r =>
      val dup = if (r.isNullAt(r.fieldIndex("dup_of"))) None
        else Some(r.getAs[Long]("dup_of"))
      if (r.getAs[String]("reason") == "exact_dup") {
        assert(dup.nonEmpty && kept.contains(dup.get),
          s"exact_dup ${r.getAs[Long]("doc_id")} must point at a kept keeper")
      } else assert(dup.isEmpty, s"dup_of set on ${r.getAs[String]("reason")}")
    }
    // Plan pin: the attribution reads the session-materialized scoring
    // artifact (pipe_scored), never the corpus — the shared-artifact
    // discipline means the corpus text pass ran once for both faces.
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case qs: QueryStageExec => expand(qs.plan)
      case o => o +: o.children.flatMap(expand)
    }
    val scans = expand(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val corpusScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(SparkTestBase.sf)))
    assert(corpusScans.isEmpty,
      "drop attribution re-scans the corpus:\n" +
        corpusScans.flatMap(_.relation.location.rootPaths).mkString("\n"))
  }
}

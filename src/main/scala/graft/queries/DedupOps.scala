package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection for the training-data pipeline: MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup. All pipelines
  * are banded/blocked (candidate generation via equality join on a bucket
  * key, never an all-pairs cross join), so they scale: the shuffle key is
  * the band/bucket, per-bucket fan-out is bounded, and verification runs
  * only on candidates.
  *
  * MinHash/SimHash use Spark's codegen'd xxhash64 inside higher-order
  * functions — hashing is graft-specific, so those two are rows-only for
  * the oracle (value-level specs live in DedupSpec); Jaccard and cosine
  * are pure arithmetic and fully oracle-checked.
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  val NumPerms = 32 // minhash permutations
  val BandRows = 4  // rows per LSH band → 8 bands
  val NumBands: Int = NumPerms / BandRows

  /** Word-3-gram shingles of the document text. */
  private def shingles(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3)))))
  }

  /** doc_id + minhash signature array (NumPerms mins of seeded xxhash64). */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = shingles(col("text"))
    val sig = array((0 until NumPerms).map { p =>
      array_min(transform(sh, x => xxhash64(x, lit(p))))
    }: _*)
    docs.select(col("doc_id"), sh.as("shingles"), sig.as("sig"))
  }

  /** MinHash+LSH near-dup pairs: shingle → minhash → band → bucket join →
    * exact-Jaccard verification on candidates (threshold 0.5).
    */
  private val minhashPairs: Q = (s, d) => {
    val sigs = minhashSignatures(Tables.documents(s, d))
    val banded = sigs.select(
      col("doc_id"), col("shingles"),
      explode(array((0 until NumBands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(Seq(lit(b)) ++ (0 until BandRows).map(r =>
            col("sig")(b * BandRows + r)): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** doc_id + 64-bit SimHash from token xxhash64s (sign of per-bit votes). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ 3, banded on 16-bit
    * chunks (pigeonhole: ≤3 flipped bits leave ≥1 of 4 chunks equal).
    */
  private val simhashPairs: Q = (s, d) => {
    val sh = simhash(Tables.documents(s, d)).localCheckpoint(true)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { j =>
        struct(lit(j).as("chunk_idx"),
          shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk_idx"), col("c.chunk"))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .where(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")))
      .where(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram (char-3-gram) Jaccard near-dup pairs, blocked by lang.
    * Pure set arithmetic → fully oracle-checked against DuckDB lists.
    */
  private val ngramJaccard: Q = (s, d) => {
    val gramsCol = array_distinct(transform(
      sequence(lit(1), length(col("text")) - 2),
      i => col("text").substr(i, lit(3))))
    val g = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), gramsCol.as("grams"))
    val a = g.select(col("lang"), col("doc_id").as("doc_a"), col("grams").as("g_a"))
    val b = g.select(col("lang"), col("doc_id").as("doc_b"), col("grams").as("g_b"))
    a.join(b, Seq("lang"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .where(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("lang"))
  }

  /** Embedding-cosine near-dup pairs, blocked by label; the dot product is
    * an ordered left fold (functions.aggregate) so DuckDB's list_reduce
    * reproduces it bit-for-bit.
    */
  private val embeddingNearDup: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("v_b"))
    val dot = aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(col("v_a"), lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(col("v_b"), lit(0.0d), (acc, x) => acc + x * x))
    a.join(b, Seq("label"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", dot / (na * nb))
      .where(col("cosine") >= 0.3)
      .select(col("id_a"), col("id_b"), col("label"))
  }

  val queries: Map[String, Q] = Map(
    "d2_minhash_lsh" -> minhashPairs,
    "d3_simhash" -> simhashPairs,
    "d4_ngram_jaccard" -> ngramJaccard,
    "d5_embedding_neardup" -> embeddingNearDup,
  )

  private def gramsSql(t: String) =
    s"list_distinct(list_transform(generate_series(1, len($t)-2), i -> substr($t, CAST(i AS INT), 3)))"

  val oracle: Map[String, String] = Map(
    "d4_ngram_jaccard" ->
      s"""WITH g AS (SELECT doc_id, lang, ${gramsSql("text")} AS grams FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang
         |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |      / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.6""".stripMargin,
    "d5_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_reduce(list_transform(generate_series(1, len(a.v)),
        |        i -> a.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]), (x, y) -> x + y)
        |      / (sqrt(list_reduce(list_transform(generate_series(1, len(a.v)),
        |            i -> a.v[CAST(i AS INT)] * a.v[CAST(i AS INT)]), (x, y) -> x + y))
        |         * sqrt(list_reduce(list_transform(generate_series(1, len(b.v)),
        |            i -> b.v[CAST(i AS INT)] * b.v[CAST(i AS INT)]), (x, y) -> x + y)))
        |      >= 0.3""".stripMargin,
  )

  val rowsOnly: Set[String] = Set("d2_minhash_lsh", "d3_simhash")
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Opaque binary payload with typed feature row (multimodal column model:
  * binary content + typed metadata).
  */
final case class MmFeature(
    doc_id: Long,
    n_bytes: Int,
    sha256: String,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing: treat content as an opaque `binary` column
  * and run per-partition batch feature extraction over it with a typed
  * Dataset pipeline (the Scala analogue of mapInPandas: one iterator per
  * partition, streaming, no driver involvement).
  *
  * The DECODE step is a STUB — image/audio codecs are not in this
  * container — producing deterministic pseudo-dimensions from the byte
  * length. The Spark-side plumbing (binary column, partition-batched
  * iteration, typed schema out, content hashing) is real and
  * oracle-checked via sha256/octet_length arithmetic.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** STUB decoder: deterministic fake dimensions/format from byte length.
    * A real deployment swaps this body for an actual codec call; the
    * signature (bytes in, typed feature out) and the partition-batched
    * execution shape are what matter.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MmFeature = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val n = payload.length
    MmFeature(
      doc_id = docId,
      n_bytes = n,
      sha256 = hex,
      width = 64 + n % 512,
      // Long arithmetic: n*7 overflows Int past ~306 MB payloads and Java's
      // % would go negative, diverging from the oracle's unbounded math.
      height = 64 + ((n.toLong * 7) % 512).toInt,
      format = (n % 3) match { case 0 => "rgb"; case 1 => "rgba"; case _ => "gray" })
  }

  /** Binary payloads → per-partition feature extraction → typed rows. */
  private val features: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
  }

  /** One frame-sample row (video/audio frame-extraction shape). */
  final case class MmFrame(doc_id: Long, frame_idx: Int, frame_bytes: Int, byte_sum: Long)

  /** STUB frame sampler: payload → up to 8 pseudo-frames of 256 bytes with
    * per-frame byte sums — the one-to-many (flatMap) decode shape a real
    * video frame-sampler has, with deterministic stub features.
    */
  def sampleFrames(docId: Long, payload: Array[Byte]): Iterator[MmFrame] = {
    val n = payload.length
    val nFrames = math.min(8, (n + 255) / 256)
    (0 until nFrames).iterator.map { f =>
      val start = f * 256
      val end = math.min(n, start + 256)
      var sum = 0L
      var i = start
      while (i < end) { sum += payload(i) & 0xff; i += 1 }
      MmFrame(docId, f, end - start, sum)
    }
  }

  /** Binary payloads → per-partition frame sampling (flatMap). */
  private val frames: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => sampleFrames(id, bytes) })
      .toDF()
  }

  val queries: Map[String, Q] = Map(
    "mm_features" -> features,
    "mm_frames" -> frames)

  val oracle: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
        |  sha256(text) AS sha256,
        |  CAST(64 + octet_length(text::BLOB) % 512 AS INT) AS width,
        |  CAST(64 + (octet_length(text::BLOB) * 7) % 512 AS INT) AS height,
        |  CASE octet_length(text::BLOB) % 3 WHEN 0 THEN 'rgb' WHEN 1 THEN 'rgba' ELSE 'gray' END AS format
        |FROM documents""".stripMargin,
    // Text is ASCII in the testdata (byte == codepoint), so the oracle can
    // recompute byte sums with ord(); the Spark side works on raw bytes.
    "mm_frames" ->
      """SELECT d.doc_id, CAST(g.f AS INT) AS frame_idx,
        |  CAST(least(octet_length(d.text::BLOB) - g.f * 256, 256) AS INT) AS frame_bytes,
        |  CAST(list_reduce(list_transform(
        |      generate_series(g.f * 256 + 1, least(octet_length(d.text::BLOB), g.f * 256 + 256)),
        |      i -> ord(substr(d.text, CAST(i AS INT), 1))), (x, y) -> x + y) AS BIGINT) AS byte_sum
        |FROM documents d, range(0, 8) g(f)
        |WHERE g.f < least(8, (octet_length(d.text::BLOB) + 255) // 256)""".stripMargin,
  )
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multimodal stub has two execution shapes — codegen'd built-ins
  * (registered queries) and the typed mapPartitions codec pipeline — and
  * they must stay value-identical: a deployment that swaps the stub for a
  * real codec relies on the codec path computing exactly what the
  * registered (oracle-checked) path computes.
  */
class MultimodalParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("mm_features: built-ins plan == mapPartitions codec plan") {
    val expr = rows(SparkEntry.queries("mm_features")(spark, sf))
    val codec = rows(graft.queries.MultimodalOps.featuresViaCodec(spark, sf))
    assert(expr == codec)
    assert(expr.nonEmpty)
  }

  test("mm_frames: built-ins plan == mapPartitions codec plan") {
    val expr = rows(SparkEntry.queries("mm_frames")(spark, sf))
    val codec = rows(graft.queries.MultimodalOps.framesViaCodec(spark, sf))
    assert(expr == codec)
    assert(expr.nonEmpty)
  }

  test("mm_features registered plan stays whole-stage codegen (no codec shuffle shapes)") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      SparkEntry.queries("mm_features")(spark, sf).explain("formatted")
    }
    val p = out.toString
    assert(p.contains("[codegen id :"), p.take(400))
    assert(!p.contains("DeserializeToObject"),
      "registered mm query must not pay typed-object serialization")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN: IVF scale-path results vs the brute-force baseline. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("ivf top-k: deterministic, k results, subset quality vs brute force") {
    val brute = SparkEntry.queries("ann_brute_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0)).toSet
    val ivf1 = SparkEntry.queries("ann_ivf_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0)).toSeq
    val ivf2 = SparkEntry.queries("ann_ivf_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf1 == ivf2, "IVF result must be deterministic")
    assert(ivf1.size == 10)
    // probing 3/10 cells: recall against exact top-10 should be non-trivial
    val recall = ivf1.toSet.intersect(brute).size / 10.0
    assert(recall >= 0.2, s"IVF recall $recall too low")
  }

  test("brute-force top-k is ordered by cosine desc") {
    val rows = SparkEntry.queries("ann_brute_topk")(spark, SparkTestBase.sf)
      .collect().map(_.getDouble(1))
    assert(rows.sameElements(rows.sortBy(-_)))
  }
}

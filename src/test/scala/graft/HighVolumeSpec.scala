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
}

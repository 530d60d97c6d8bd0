package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftDataSource

/** The `format("graft")` DSv2 provider: FileTableStore's resolution rules
  * (parquet shadows csv; reference all-string CSV wire model) behind
  * Spark's native file-table planning. Plan-level pushdown assertions
  * live in PlanSpec; this spec covers resolution + values.
  */
class GraftDataSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("parquet table resolves and matches the direct read") {
    val viaFace = spark.read.format("graft")
      .option("dir", sf).option("table", "nation").load()
    val direct = spark.read.parquet(s"$sf/nation.parquet")
    assert(viaFace.schema == direct.schema)
    assert(viaFace.count() == direct.count())
    assert(viaFace.orderBy("n_nationkey").collect().toSeq ==
      direct.orderBy("n_nationkey").collect().toSeq)
  }

  test("csv fallback reads the all-string wire model; parquet shadows csv") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2").toString
    graft.core.Fs.deleteOnExit(dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/acct.csv"),
      "Id,Name,Amount\n001,\"Li, Wei\",10\n002,B,20\n".getBytes("UTF-8"))
    val csv = spark.read.format("graft")
      .option("dir", dir).option("table", "acct").load()
    // Strings all the way down (SURVEY §1.2), RFC 4180 embedded comma kept.
    assert(csv.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    assert(csv.where(col("Id") === "001").select("Name").head().getString(0)
      == "Li, Wei")
    // A parquet write of the same table name takes over on next resolve
    // (FileTableStore.persist() writes parquet; leftover seed csv must
    // not shadow it).
    spark.range(3).selectExpr("CAST(id AS STRING) AS Id")
      .write.mode("overwrite").parquet(s"$dir/acct.parquet")
    val shadowed = spark.read.format("graft")
      .option("dir", dir).option("table", "acct").load()
    assert(shadowed.columns.toSeq == Seq("Id") && shadowed.count() == 3)
  }

  test("missing table and missing options fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("dir", sf).option("table", "no_such_table").load()
    }
    assert(e1.getMessage.contains("no_such_table"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("table", "nation").load()
    }
    assert(e2.getMessage.contains("dir"))
  }

  test("resolution helper: parquet-first order, None when absent") {
    assert(GraftDataSource.resolve(sf, "nation").map(_._2).contains("parquet"))
    assert(GraftDataSource.resolve(sf, "zzz_absent").isEmpty)
  }

  test("direct .load(path) mode: parquet default, csv via format option") {
    val direct = spark.read.format("graft").load(s"$sf/region.parquet")
    assert(direct.count() == spark.read.parquet(s"$sf/region.parquet").count())
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_path").toString
    graft.core.Fs.deleteOnExit(dir)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/w.csv"),
      "Id,V\n1,a\n2,b\n".getBytes("UTF-8"))
    val csv = spark.read.format("graft").option("format", "csv")
      .load(s"$dir/w.csv")
    assert(csv.columns.toSeq == Seq("Id", "V") && csv.count() == 2)
    val bad = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("format", "orc").load(s"$dir/w.csv")
    }
    assert(bad.getMessage.contains("unsupported format"))
  }
}

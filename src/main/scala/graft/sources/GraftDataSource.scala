package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face over the [[FileTableStore]] layout:
  *
  * {{{
  *   spark.read.format("graft").option("dir", dir).option("table", "customer").load()
  * }}}
  *
  * resolves `table` against `dir` exactly like [[FileTableStore.scan]]
  * (`<dir>/<table>.parquet` first, `<dir>/<table>.csv` fallback with the
  * reference's all-string wire model) and delegates scan planning to
  * Spark's own file tables — so filter pushdown, column pruning,
  * partition pruning and vectorized reads are the NATIVE ones, asserted
  * in `PlanSpec`. This is the reference's connector seam
  * (amaxa/api.py:140-165 `bulk_api_query`) expressed as a real Spark
  * extension point rather than only a Scala trait: a live connector
  * would swap the delegate `Table` for one speaking the wire protocol
  * while every query above keeps the same `format("graft")` text.
  *
  * Extends the same `FileDataSourceV2` surface Spark's own built-in file
  * sources and the Avro external module use, which keeps this a thin
  * naming layer: zero custom read paths to maintain.
  */
final class GraftDataSource extends FileDataSourceV2 {

  override def fallbackFileFormat: Class[_ <: FileFormat] = classOf[ParquetFileFormat]

  override def shortName(): String = "graft"

  override def getTable(options: CaseInsensitiveStringMap): Table =
    makeTable(options, None)

  override def getTable(
      options: CaseInsensitiveStringMap, schema: StructType): Table =
    makeTable(options, Some(schema))

  private def makeTable(
      options: CaseInsensitiveStringMap, schema: Option[StructType]): Table = {
    val (path, format) = GraftDataSource.resolveOptions(options)
    format match {
      case "parquet" =>
        ParquetTable(s"graft:$path", sparkSession,
          GraftDataSource.withoutReserved(options), Seq(path), schema,
          classOf[ParquetFileFormat])
      case "csv" =>
        CSVTable(s"graft:$path", sparkSession,
          GraftDataSource.csvOptions(options), Seq(path), schema,
          classOf[CSVFileFormat])
    }
  }
}

object GraftDataSource {
  /** Option keys consumed by the provider itself (not the file reader). */
  private val Reserved = Set("table", "dir", "path", "paths")

  /** `<dir>/<table>` → (path, format), parquet shadowing csv — the same
    * resolution order as [[FileTableStore.scan]] (persist() writes
    * parquet, so after a mutating run the parquet IS the table).
    */
  def resolve(dir: String, table: String): Option[(String, String)] = {
    val pq = new java.io.File(s"$dir/$table.parquet")
    val csv = new java.io.File(s"$dir/$table.csv")
    if (pq.exists()) Some((pq.getPath, "parquet"))
    else if (csv.exists()) Some((csv.getPath, "csv"))
    else None
  }

  private def resolveOptions(options: CaseInsensitiveStringMap): (String, String) = {
    val table = options.get("table")
    val dir = options.get("dir")
    if (table == null || dir == null)
      throw new IllegalArgumentException(
        "graft source requires .option(\"dir\", …) and .option(\"table\", …)")
    resolve(dir, table).getOrElse(throw new IllegalArgumentException(
      s"graft source: no $dir/$table.parquet or .csv"))
  }

  private def withoutReserved(options: CaseInsensitiveStringMap): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(
      options.asCaseSensitiveMap().asScala.view
        .filterKeys(k => !Reserved(k.toLowerCase(java.util.Locale.ROOT)))
        .toMap.asJava)

  /** CSV wire-model options, mirroring [[FileTableStore.scan]]: header
    * row, strings all the way down (SURVEY §1.2), RFC 4180 quoting.
    */
  private def csvOptions(options: CaseInsensitiveStringMap): CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(
      (withoutReserved(options).asCaseSensitiveMap().asScala.toMap ++ Map(
        "header" -> "true",
        "inferSchema" -> "false",
        "multiLine" -> "true",
        "escape" -> "\"")).asJava)
}

package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Per-field metadata, the subset of the Salesforce "describe" the engine
  * consumes (reference /root/reference/amaxa/amaxa.py:185-232 and
  * loader/core.py:199-248): `name`, `type`, `soapType`, `referenceTo`,
  * `createable`, `updateable`.
  */
final case class FieldMeta(
    name: String,
    ftype: String,
    soapType: String,
    referenceTo: Seq[String] = Nil,
    createable: Boolean = true,
    updateable: Boolean = true) {
  def isReference: Boolean = ftype == "reference" && referenceTo.nonEmpty
}

/** Table ("sObject") schema. `idField` names the primary-key column —
  * "Id" for Salesforce-shaped tables, the `*_key` column for the TPC-H
  * testdata adapters. `salesforceIds` enables 15→18 canonicalization.
  */
final case class TableSchema(
    name: String,
    fields: Seq[FieldMeta],
    keyPrefix: String = "",
    idField: String = "Id",
    salesforceIds: Boolean = false) {
  val fieldMap: Map[String, FieldMeta] = fields.map(f => f.name -> f).toMap
  def field(n: String): FieldMeta = fieldMap(n)
}

/** The lookup classification the reference computes per step
  * (/root/reference/amaxa/amaxa.py:177-232): which FK fields are
  * self-lookups, descendent lookups (target earlier in the operation),
  * and dependent lookups (target later in the operation). A polymorphic
  * field can be several of these at once.
  */
final case class LookupSets(
    all: Set[String],
    self: Set[String],
    descendent: Set[String],
    dependent: Set[String])

/** Runtime schema registry (the reference's describe cache,
  * /root/reference/amaxa/api.py:45-70).
  */
final class Catalog(val tables: Seq[TableSchema]) {
  val byName: Map[String, TableSchema] = tables.map(t => t.name -> t).toMap
  def apply(name: String): TableSchema = byName(name)

  /** 3-char key prefix → table name (reference api.py:63-70). */
  val tableForPrefix: Map[String, String] =
    tables.filter(_.keyPrefix.nonEmpty).map(t => t.keyPrefix -> t.name).toMap

  /** Port of Step.initialize (/root/reference/amaxa/amaxa.py:177-232):
    * pure function of (operation table order, field metadata).
    */
  def classifyLookups(sobjectList: Seq[String], table: String,
      fieldScope: Seq[String]): LookupSets = {
    val idx = sobjectList.zipWithIndex.toMap
    val self = idx(table)
    val fm = byName(table).fieldMap
    val all = fieldScope.filter { f =>
      fm.get(f).exists(m => m.isReference && m.referenceTo.exists(idx.contains))
    }.toSet
    LookupSets(
      all = all,
      self = all.filter(f => fm(f).referenceTo.contains(table)),
      descendent = all.filter(f =>
        fm(f).referenceTo.exists(r => idx.get(r).exists(_ < self))),
      dependent = all.filter(f =>
        fm(f).referenceTo.exists(r => idx.get(r).exists(_ > self))))
  }
}

object Catalog {
  private val mapper = new ObjectMapper()

  /** Parse one Salesforce describe JSON document (the format of the
    * reference's golden fixtures, /root/reference/assets/test_describes/).
    */
  def tableFromDescribeJson(json: String): TableSchema = {
    val root = mapper.readTree(json)
    val fields = root.get("fields").elements().asScala.map { f: JsonNode =>
      FieldMeta(
        name = f.get("name").asText(),
        ftype = f.get("type").asText(),
        soapType = f.get("soapType").asText(),
        referenceTo = Option(f.get("referenceTo"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
        createable = Option(f.get("createable")).forall(_.asBoolean()),
        updateable = Option(f.get("updateable")).forall(_.asBoolean()))
    }.toSeq
    TableSchema(
      name = root.get("name").asText(),
      fields = fields,
      keyPrefix = Option(root.get("keyPrefix")).map(_.asText("")).getOrElse(""),
      idField = "Id",
      salesforceIds = true)
  }

  def fromDescribeDir(dir: java.io.File): Catalog = {
    val files = Option(
      dir.listFiles((_, n) => n.endsWith(".json") && n != "sobjects.json"))
      .getOrElse(throw new IllegalArgumentException(
        s"Describe directory ${dir.getPath} does not exist or is not readable"))
    new Catalog(files.toSeq.map(f => tableFromDescribeJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath)))))
  }
}

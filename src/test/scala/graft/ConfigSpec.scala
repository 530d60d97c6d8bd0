package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.core.TransformSpec
import graft.operators._

/** Config parsing + the validation pipeline (reference loader/schemas.py +
  * core.py; SURVEY O5/A3).
  */
class ConfigSpec extends AnyFunSuite {
  val yaml =
    """version: 1
      |operation:
      |  - sobject: Account
      |    field-group: smart
      |    extract:
      |      all: True
      |  - sobject: Contact
      |    fields:
      |      - LastName
      |      - field: AccountId
      |        outside-lookup-behavior: drop-field
      |      - field: LastName2
      |        column: Surname
      |        transforms: [strip, lowercase]
      |    extract:
      |      descendents: True
      |""".stripMargin

  test("parses version, steps, scopes, field specs") {
    val cfg = OperationConfig.parse(yaml).toOption.get
    assert(cfg.version == 1)
    assert(cfg.steps.map(_.sobject) == Seq("Account", "Contact"))
    assert(cfg.steps(0).fieldGroup.contains("smart"))
    assert(cfg.steps(0).extract.contains(("all", true)))
    assert(cfg.steps(1).extract.exists(_._1 == "descendents"))
    val f = cfg.steps(1).fields.get
    assert(f(1).outsideLookupBehavior.contains("drop-field"))
    assert(f(2).column.contains("Surname"))
    assert(f(2).transforms == Seq(TransformSpec("strip"), TransformSpec("lowercase")))
    assert(cfg.steps(0).fileName == "Account.csv")
    assert(cfg.steps(0).resultFileName == "Account-results.csv")
  }

  test("invalid YAML / missing keys / bad enums error out") {
    assert(OperationConfig.parse(": no").isLeft)
    assert(OperationConfig.parse("operation: []").swap.toOption.get
      .exists(_.contains("version")))
    val bad = OperationConfig.parse(
      """version: 1
        |operation:
        |  - sobject: A
        |    fields: [X]
        |    extract: {all: true}
        |    self-lookup-behavior: bogus
        |""".stripMargin)
    assert(bad.swap.toOption.get.exists(_.contains("invalid self-lookup-behavior")))
  }

  test("duplicate fields and columns are flagged (A3)") {
    val errs = OperationConfig.parse(
      """version: 1
        |operation:
        |  - sobject: A
        |    fields:
        |      - Name
        |      - Name
        |      - {field: F1, column: C}
        |      - {field: F2, column: C}
        |    extract: {all: true}
        |""".stripMargin).swap.toOption.get
    assert(errs.exists(_.contains("fields is specified multiple times: Name")))
    assert(errs.exists(_.contains("columns is specified multiple times: C")))
  }

  test("field scope expansion: groups, unknown fields, unsupported types") {
    import scala.collection.mutable
    val errs = mutable.Buffer.empty[String]
    val cfg = OperationConfig.parse(yaml).toOption.get
    val scope = OperationConfig.fieldScope(Fixture.catalog, cfg.steps(0), load = false, errs)
    assert(scope.head == "Id")
    assert(scope.contains("Name") && scope.contains("ParentId"))
    assert(errs.isEmpty)

    val badStep = StepConfig("Account", fields = Some(Seq(FieldSpec("Nope"))))
    OperationConfig.fieldScope(Fixture.catalog, badStep, load = false, errs)
    assert(errs.exists(_.contains("Account.Nope does not exist")))
  }

  test("toExtractSteps builds engine steps with per-field behaviors") {
    val cfg = OperationConfig.parse(yaml).toOption.get
    // LastName2 isn't in the fixture catalog — restrict to valid fields.
    val cfg2 = cfg.copy(steps = Seq(
      cfg.steps(0),
      cfg.steps(1).copy(fields = Some(cfg.steps(1).fields.get.take(2)))))
    val steps = OperationConfig.toExtractSteps(Fixture.catalog, cfg2).toOption.get
    assert(steps(0).scope == ExtractionScope.AllRecords)
    assert(steps(1).scope == ExtractionScope.Descendents)
    assert(steps(1).outsideBehavior("AccountId") == OutsideLookupBehavior.DropField)
  }

  test("v2 transforms with options parse ({name, options} form)") {
    val cfg = OperationConfig.parse(
      """version: 2
        |operation:
        |  - sobject: Account
        |    fields:
        |      - field: Name
        |        transforms:
        |          - uppercase
        |          - name: suffix
        |            options:
        |              suffix: "-CLIENT"
        |    extract: {all: true}
        |""".stripMargin).toOption.get
    val t = cfg.steps.head.fields.get.head.transforms
    assert(t == Seq(TransformSpec("uppercase"),
      TransformSpec("suffix", Map("suffix" -> "-CLIENT"))))
  }

  test("input column validation modes (load_operation.py:151-208)") {
    val step = StepConfig("Contact",
      fields = Some(Seq(FieldSpec("LastName"), FieldSpec("AccountId"))))
    val scope = Seq("Id", "LastName", "AccountId")
    // exact match ok
    assert(OperationConfig.validateInputColumns(Fixture.catalog, step, scope,
      Seq("Id", "LastName", "AccountId")).isEmpty)
    // missing column fails explicit-fields mode
    assert(OperationConfig.validateInputColumns(Fixture.catalog, step, scope,
      Seq("Id", "LastName")).nonEmpty)
    // none mode skips
    assert(OperationConfig.validateInputColumns(Fixture.catalog,
      step.copy(inputValidation = "none"), scope, Seq("Id")).isEmpty)
    // field-group default tolerates missing but not excess
    val groupStep = StepConfig("Contact", fieldGroup = Some("smart"))
    assert(OperationConfig.validateInputColumns(Fixture.catalog, groupStep,
      scope, Seq("Id", "LastName")).isEmpty)
    assert(OperationConfig.validateInputColumns(Fixture.catalog, groupStep,
      scope, Seq("Id", "Bogus")).nonEmpty)
  }

  test("unknown keys are rejected at every level (Cerberus parity, core.py:56-70)") {
    val errs = OperationConfig.parse(
      """version: 1
        |plugin-modules: [foo]
        |operation:
        |  - sobject: A
        |    typo-key: x
        |    fields:
        |      - {field: Name, outside-lookup-behaviour: error}
        |    extract: {all: true, bogus: 1}
        |""".stripMargin).swap.toOption.get
    assert(errs.exists(_.contains("Unrecognized key(s) in operation definition: plugin-modules")))
    assert(errs.exists(_.contains("A: unrecognized key(s): typo-key")))
    assert(errs.exists(_.contains("unrecognized field-entry key(s): outside-lookup-behaviour")))
    assert(errs.exists(_.contains("unrecognized extract key(s): bogus")))
  }

  test("exclude-fields: v2 subtracts from the scope; v1 rejects the key") {
    val cfg = OperationConfig.parse(
      """version: 2
        |operation:
        |  - sobject: Contact
        |    field-group: readable
        |    exclude-fields: [IsEmailBounced, ReportsToId]
        |    extract: {all: true}
        |""".stripMargin).toOption.get
    val errs = scala.collection.mutable.Buffer.empty[String]
    val scope = OperationConfig.fieldScope(Fixture.catalog, cfg.steps.head, load = false, errs)
    assert(errs.isEmpty)
    assert(scope.head == "Id")
    assert(!scope.contains("IsEmailBounced") && !scope.contains("ReportsToId"))
    assert(scope.contains("LastName") && scope.contains("AccountId"))

    val v1 = OperationConfig.parse(
      """version: 1
        |operation:
        |  - sobject: Contact
        |    field-group: readable
        |    exclude-fields: [IsEmailBounced]
        |    extract: {all: true}
        |""".stripMargin)
    assert(v1.swap.toOption.get.exists(_.contains("unrecognized key(s): exclude-fields")))
  }

  test("fields+field-group: v1 mutually exclusive, v2 unions (extract_operation.py:88-122)") {
    val step =
      """  - sobject: Contact
        |    field-group: writeable
        |    fields: [LastName]
        |    extract: {all: true}
        |""".stripMargin
    assert(OperationConfig.parse(s"version: 1\noperation:\n$step").swap.toOption.get
      .exists(_.contains("mutually exclusive")))
    val cfg = OperationConfig.parse(s"version: 2\noperation:\n$step").toOption.get
    val errs = scala.collection.mutable.Buffer.empty[String]
    val scope = OperationConfig.fieldScope(Fixture.catalog, cfg.steps.head, load = false, errs)
    assert(errs.isEmpty)
    assert(scope.contains("LastName") && scope.contains("AccountId"))
  }

  test("plugin-modules loads provider objects, classes, and bundles (schemas.py:377-380)") {
    val cfg = OperationConfig.parse(
      """version: 2
        |plugin-modules:
        |  - graft.testplugins.MultiplyTransform
        |  - graft.testplugins.PluginBundle
        |operation:
        |  - sobject: Account
        |    fields:
        |      - field: Name
        |        transforms:
        |          - name: multiply
        |            options: {count: 2}
        |          - reverse_text
        |    extract: {all: true}
        |""".stripMargin).toOption.get
    assert(cfg.pluginModules ==
      Seq("graft.testplugins.MultiplyTransform", "graft.testplugins.PluginBundle"))
    // Both transforms resolve from the registry post-parse.
    val chain = graft.core.Transforms.chain(cfg.steps.head.fields.get.head.transforms,
      graft.core.FieldContext("Name", "xsd:string"))
    val spark = SparkTestBase.spark; import spark.implicits._
    val out = Seq("ab").toDF("Name").select(chain(org.apache.spark.sql.functions.col("Name")))
      .collect().head.getString(0)
    assert(out == "baba") // repeat ×2 then reverse

    val bad = OperationConfig.parse(
      """version: 2
        |plugin-modules: [no.such.Cls]
        |operation:
        |  - sobject: A
        |    fields: [Name]
        |    extract: {all: true}
        |""".stripMargin)
    assert(bad.swap.toOption.get.exists(_.contains("Unable to load plugin module no.such.Cls")))
  }

  test("v2 options: parse + per-step override merge (reference OPERATION_OPTIONS_SCHEMA)") {
    val cfg = OperationConfig.parse(
      """version: 2
        |options:
        |  api-version: '55.0'
        |  bulk-api-batch-size: 5000
        |  bulk-api-mode: Serial
        |operation:
        |  - sobject: Account
        |    fields: [Name]
        |    extract: {all: true}
        |    options:
        |      bulk-api-batch-size: 200
        |  - sobject: Contact
        |    fields: [LastName]
        |    extract: {all: true}
        |""".stripMargin).toOption.get
    assert(cfg.options ==
      OperationOptions("55.0", 5000, 1200, 5, "Serial", bulkBatchSizeExplicit = true))
    // Step options override operation options; unset keys inherit
    // (reference load_operation.py:34-35 step_opts.update()).
    val eff = cfg.steps.head.effectiveOptions(cfg.options)
    assert(eff.bulkBatchSize == 200 && eff.serial && eff.apiVersion == "55.0")
    assert(cfg.steps(1).effectiveOptions(cfg.options).bulkBatchSize == 5000)
    // Defaults match the reference's constants.py:4-10.
    assert(OperationOptions() ==
      OperationOptions("52.0", 10000, 1200, 5, "Parallel"))
  }

  test("v2 options validation: ranges, enums, unknown keys, api-version format") {
    def errsOf(opts: String): Seq[String] =
      OperationConfig.parse(
        s"""version: 2
           |options:
           |$opts
           |operation:
           |  - {sobject: A, fields: [N], extract: {all: true}}
           |""".stripMargin).swap.getOrElse(Nil)
    assert(errsOf("  bulk-api-batch-size: 20000").exists(_.contains("between 0 and 10000")))
    assert(errsOf("  bulk-api-batch-size: many").exists(_.contains("must be an integer")))
    assert(errsOf("  bulk-api-poll-interval: 61").exists(_.contains("between 0 and 60")))
    assert(errsOf("  bulk-api-mode: Sideways").exists(_.contains("Serial or Parallel")))
    assert(errsOf("  api-version: '5.50'").exists(_.contains("not valid")))
    assert(errsOf("  api-version: 'XX.0'").exists(_.contains("not valid")))
    assert(errsOf("  api-version: '55.0'").isEmpty)
    assert(errsOf("  bogus-option: 1").exists(_.contains("unrecognized option")))
    // api-version is operation-level only (SOBJECT_OPTIONS_SCHEMA omits it).
    val stepLevel = OperationConfig.parse(
      """version: 2
        |operation:
        |  - sobject: A
        |    fields: [N]
        |    extract: {all: true}
        |    options: {api-version: '55.0'}
        |""".stripMargin)
    assert(stepLevel.swap.getOrElse(Nil).exists(e =>
      e.contains("A:") && e.contains("unrecognized option")))
    // options is a v2 schema addition — v1 rejects it at both levels.
    val v1 = OperationConfig.parse(
      """version: 1
        |options: {bulk-api-batch-size: 100}
        |operation:
        |  - {sobject: A, fields: [N], extract: {all: true}}
        |""".stripMargin)
    assert(v1.swap.getOrElse(Nil).exists(_.contains("Unrecognized key")))
  }

  test("describe-JSON catalog parsing (FIXTURES A.1 format)") {
    val json =
      """{"name": "Widget", "keyPrefix": "w01", "fields": [
        |  {"name": "Id", "type": "id", "soapType": "tns:ID", "referenceTo": [], "createable": false, "updateable": false},
        |  {"name": "OwnerId", "type": "reference", "soapType": "tns:ID", "referenceTo": ["User"], "createable": true, "updateable": true},
        |  {"name": "Blob", "type": "base64", "soapType": "xsd:base64Binary", "referenceTo": [], "createable": true, "updateable": true}
        |]}""".stripMargin
    val t = graft.core.Catalog.tableFromDescribeJson(json)
    assert(t.name == "Widget" && t.keyPrefix == "w01" && t.salesforceIds)
    assert(t.field("OwnerId").referenceTo == Seq("User"))
    assert(t.field("Blob").ftype == "base64")
  }
}

package graft.config

import org.yaml.snakeyaml.Yaml

import graft.core.{Catalog, TransformSpec}
import graft.operators._

import scala.jdk.CollectionConverters._

/** One field entry: bare name or {field, column, transforms, behaviors}
  * (reference schemas.py fields schema).
  */
final case class FieldSpec(
    field: String,
    column: Option[String] = None,
    transforms: Seq[TransformSpec] = Nil,
    selfLookupBehavior: Option[String] = None,
    outsideLookupBehavior: Option[String] = None)

/** One operation entry (extract or load step, reference schemas.py). */
final case class StepConfig(
    sobject: String,
    fields: Option[Seq[FieldSpec]] = None,
    fieldGroup: Option[String] = None,
    excludeFields: Seq[String] = Nil,
    extract: Option[(String, Any)] = None, // (all|descendents|query|ids, payload)
    selfLookupBehavior: String = "trace-all",
    outsideLookupBehavior: String = "include",
    inputValidation: String = "default",
    file: Option[String] = None,
    resultFile: Option[String] = None,
    options: Map[String, Any] = Map.empty) {
  def fileName: String = file.getOrElse(sobject + ".csv")
  def resultFileName: String = resultFile.getOrElse(sobject + "-results.csv")
  /** Step-effective options: operation-level values overridden by this
    * step's `options` block (reference extract_operation.py:65-66 /
    * load_operation.py:34-35 `step_opts.update(...)`). */
  def effectiveOptions(op: OperationOptions): OperationOptions =
    OperationOptions.merged(op, options)
}

/** Operation execution options (reference v2 `OPERATION_OPTIONS_SCHEMA`,
  * loader/schemas.py:71-113; defaults constants.py:4-10). The reference's
  * bulk-api-* knobs shape Bulk API DML batches; their local counterparts
  * act on the DML parquet sink: batch-size caps rows per output file
  * (`maxRecordsPerFile`, each file ≈ one batch), Serial mode writes with
  * a single task the way Serial batches run one at a time. api-version
  * gates the preflight check (reference `amaxa/__main__.py:60-76`) and
  * exists only at operation level.
  */
final case class OperationOptions(
    apiVersion: String = "52.0",
    bulkBatchSize: Int = 10000,
    bulkTimeout: Int = 1200,
    bulkPollInterval: Int = 5,
    bulkMode: String = "Parallel",
    // True only when the user supplied bulk-api-batch-size: the sink caps
    // rows-per-file ONLY then, so the 10000 default never silently
    // fragments large table writes (files split by partition, fully
    // parallel, when no options block asked for batching).
    bulkBatchSizeExplicit: Boolean = false) {
  def serial: Boolean = bulkMode == "Serial"
}

object OperationOptions {
  /** True iff `v` is a well-formed API version — a 4-char `NN.0` string
    * (reference `amaxa/__main__.py:64-71` preflight + schema regex
    * `\d{2}\.0`, loader/schemas.py:107-111). */
  def validApiVersion(v: Any): Boolean = v match {
    case s: String =>
      s.length == 4 && s.endsWith(".0") && s.take(2).forall(_.isDigit)
    case _ => false
  }

  /** Validate one options mapping (operation- or sobject-level) against
    * the reference schema's types/ranges; returns the validated raw map.
    * Unknown keys error (Cerberus parity); `api-version` is only legal
    * when `allowApiVersion` (operation level). */
  def validate(raw: Map[String, Any], ctx: String, allowApiVersion: Boolean,
      errors: scala.collection.mutable.Buffer[String]): Map[String, Any] = {
    val intRanges = Map(
      "bulk-api-batch-size" -> (0, 10000),
      "bulk-api-timeout" -> (0, Int.MaxValue),
      "bulk-api-poll-interval" -> (0, 60))
    val allowed = intRanges.keySet + "bulk-api-mode" ++
      (if (allowApiVersion) Set("api-version") else Set.empty)
    val unknown = raw.keySet.filterNot(allowed)
    if (unknown.nonEmpty)
      errors += s"$ctx: unrecognized option(s): ${unknown.toSeq.sorted.mkString(", ")}"
    raw.filter(kv => allowed(kv._1)).foreach {
      case (k, v: Integer) if intRanges.contains(k) =>
        val (lo, hi) = intRanges(k)
        if (v < lo || v > hi)
          errors += s"$ctx: $k must be between $lo and $hi"
      case (k, v) if intRanges.contains(k) =>
        errors += s"$ctx: $k must be an integer (got $v)"
      case ("bulk-api-mode", v) if v != "Serial" && v != "Parallel" =>
        errors += s"$ctx: bulk-api-mode must be Serial or Parallel (got $v)"
      case ("api-version", v) if !validApiVersion(v) =>
        errors += s"$ctx: API version $v is not valid."
      case _ => ()
    }
    raw
  }

  /** Apply a validated raw mapping over a base (defaults or the
    * operation-level options). */
  def merged(base: OperationOptions, raw: Map[String, Any]): OperationOptions = {
    var o = base
    raw.foreach {
      case ("api-version", v: String) => o = o.copy(apiVersion = v)
      case ("bulk-api-batch-size", v: Integer) =>
        o = o.copy(bulkBatchSize = v, bulkBatchSizeExplicit = true)
      case ("bulk-api-timeout", v: Integer) => o = o.copy(bulkTimeout = v)
      case ("bulk-api-poll-interval", v: Integer) => o = o.copy(bulkPollInterval = v)
      case ("bulk-api-mode", v: String) => o = o.copy(bulkMode = v)
      case _ => ()
    }
    o
  }
}

final case class OperationConfig(version: Int, steps: Seq[StepConfig],
    pluginModules: Seq[String] = Nil,
    options: OperationOptions = OperationOptions())

/** YAML operation-definition loader + the 6-phase validation pipeline
  * (reference loader/core.py:56-70 + schemas.py). Errors accumulate;
  * any error aborts the build (first-phase-with-errors semantics).
  */
object OperationConfig {
  private val UnsupportedTypes = Set("location", "address", "base64")
  private val SelfBehaviors = Map(
    "trace-all" -> SelfLookupBehavior.TraceAll,
    "trace-none" -> SelfLookupBehavior.TraceNone)
  private val OutsideBehaviors = Map(
    "include" -> OutsideLookupBehavior.Include,
    "drop-field" -> OutsideLookupBehavior.DropField,
    "error" -> OutsideLookupBehavior.Error)

  /** Phase 1-2: parse YAML + schema-shape validation. Unknown keys are
    * rejected at every level (Cerberus parity, reference loader/core.py:
    * 56-70) — a typo'd `outside-lookup-behaviour` must error, not silently
    * fall back to defaults.
    */
  def parse(yamlText: String): Either[Seq[String], OperationConfig] = {
    val errors = scala.collection.mutable.Buffer.empty[String]
    val root =
      try new Yaml().load[java.util.Map[String, Any]](yamlText)
      catch { case e: Exception => return Left(Seq(s"Invalid YAML: ${e.getMessage}")) }
    if (root == null) return Left(Seq("Empty configuration"))
    val m = root.asScala
    val version = m.get("version") match {
      case Some(v: Integer) if v == 1 || v == 2 => v.toInt
      case Some(v) => errors += s"Unsupported version $v"; 0
      case None => errors += "Missing required key version"; 0
    }
    // plugin-modules and options are v2 schema additions (reference
    // schemas.py:375-380); under v1 they fall out as unknown keys like any
    // other.
    val topAllowed = Set("version", "operation") ++
      (if (version == 2) Set("plugin-modules", "options") else Set.empty)
    val unknownTop = m.keySet.filterNot(topAllowed)
    if (unknownTop.nonEmpty)
      errors += s"Unrecognized key(s) in operation definition: ${unknownTop.toSeq.sorted.mkString(", ")}"
    // Providers are RESOLVED here (so load failures become config errors)
    // but REGISTERED only after the whole config validates — a rejected
    // config must not leave transforms behind in the global registry.
    // LinkageError covers NoClassDefFoundError / ExceptionInInitializerError,
    // which plain `case e: Exception` would let crash the parse.
    val pendingProviders = scala.collection.mutable.Buffer.empty[graft.core.TransformProvider]
    val plugins = m.get("plugin-modules") match {
      case Some(l: java.util.List[_]) if version == 2 =>
        val names = l.asScala.toSeq.map(_.toString)
        names.foreach { n =>
          try pendingProviders ++= loadPluginModule(n)
          catch {
            case e @ (_: Exception | _: LinkageError) =>
              errors += s"Unable to load plugin module $n (${e.getClass.getSimpleName})"
          }
        }
        names
      case Some(_) if version == 2 => errors += "plugin-modules must be a list"; Nil
      case _ => Nil
    }
    // Operation-level options (v2; reference OPERATION_OPTIONS_SCHEMA).
    val opOptions = m.get("options") match {
      case Some(om: java.util.Map[_, _]) if version == 2 =>
        val raw = om.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        OperationOptions.merged(OperationOptions(),
          OperationOptions.validate(raw, "options", allowApiVersion = true, errors))
      case Some(_) if version == 2 =>
        errors += "options must be a mapping"; OperationOptions()
      case _ => OperationOptions()
    }
    val steps = m.get("operation") match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.zipWithIndex.flatMap {
          case (e: java.util.Map[_, _], i) =>
            parseStep(e.asInstanceOf[java.util.Map[String, Any]].asScala.toMap, i, version, errors)
          case (_, i) =>
            errors += s"operation[$i] is not a mapping"; None
        }
      case _ => errors += "Missing required key operation"; Nil
    }
    if (errors.nonEmpty) Left(errors.toSeq)
    else {
      pendingProviders.foreach(graft.core.Transforms.register)
      Right(OperationConfig(version, steps, plugins, opOptions))
    }
  }

  /** Reflectively resolve a plugin class/object name to its providers —
    * the JVM analogue of the reference's importlib.import_module check
    * (loader/schemas.py:37-43). Accepts a Scala `object` or a no-arg
    * class, implementing either TransformProvider (one transform) or
    * TransformProviderModule (several).
    */
  private def loadPluginModule(name: String): Seq[graft.core.TransformProvider] = {
    val instance =
      try Class.forName(name + "$").getField("MODULE$").get(null)
      catch {
        case _: ClassNotFoundException | _: NoSuchFieldException =>
          Class.forName(name).getDeclaredConstructor().newInstance()
      }
    instance match {
      case p: graft.core.TransformProvider => Seq(p)
      case mod: graft.core.TransformProviderModule => mod.providers
      case other => throw new IllegalArgumentException(
        s"${other.getClass.getName} implements neither TransformProvider nor TransformProviderModule")
    }
  }

  private val StepKeys = Set("sobject", "fields", "field-group", "extract",
    "self-lookup-behavior", "outside-lookup-behavior", "input-validation",
    "file", "result-file")
  private val FieldKeys = Set("field", "column", "transforms",
    "self-lookup-behavior", "outside-lookup-behavior")

  private def parseStep(e: Map[String, Any], i: Int, version: Int,
      errors: scala.collection.mutable.Buffer[String]): Option[StepConfig] = {
    val sobject = e.get("sobject") match {
      case Some(s: String) => s
      case _ => errors += s"operation[$i]: missing sobject"; return None
    }
    // exclude-fields and options are v2-only (reference v2 schema,
    // schemas.py:386-387,474).
    val stepAllowed = StepKeys ++
      (if (version == 2) Set("exclude-fields", "options") else Set.empty)
    val unknown = e.keySet.filterNot(stepAllowed)
    if (unknown.nonEmpty)
      errors += s"$sobject: unrecognized key(s): ${unknown.toSeq.sorted.mkString(", ")}"
    val fieldGroup = e.get("field-group").map(_.toString) match {
      case Some(g) if !Set("readable", "writeable", "smart").contains(g) =>
        errors += s"$sobject: invalid field-group $g"; None
      case g => g
    }
    val fields = e.get("fields").map {
      case l: java.util.List[_] => l.asScala.toSeq.map {
        case s: String => FieldSpec(s)
        case fm: java.util.Map[_, _] =>
          val f = fm.asInstanceOf[java.util.Map[String, Any]].asScala
          val unknownF = f.keySet.filterNot(FieldKeys)
          if (unknownF.nonEmpty)
            errors += s"$sobject: unrecognized field-entry key(s): ${unknownF.toSeq.sorted.mkString(", ")}"
          FieldSpec(
            field = f.getOrElse("field", { errors += s"$sobject: field entry missing 'field'"; "" }).toString,
            column = f.get("column").map(_.toString),
            // Bare name or {name, options} (docs/transforms.rst, v2 schema).
            transforms = f.get("transforms").map {
              case tl: java.util.List[_] => tl.asScala.toSeq.map {
                case s: String => TransformSpec(s)
                case tm: java.util.Map[_, _] =>
                  val t = tm.asInstanceOf[java.util.Map[String, Any]].asScala
                  val unknownT = t.keySet.filterNot(Set("name", "options"))
                  if (unknownT.nonEmpty)
                    errors += s"$sobject: unrecognized transform key(s): ${unknownT.toSeq.sorted.mkString(", ")}"
                  TransformSpec(
                    t.getOrElse("name", { errors += s"$sobject: transform missing 'name'"; "" }).toString,
                    t.get("options").map {
                      case om: java.util.Map[_, _] =>
                        om.asInstanceOf[java.util.Map[String, Any]].asScala
                          .map { case (k, v) => k -> v.toString }.toMap
                      case _ => Map.empty[String, String]
                    }.getOrElse(Map.empty))
                case other =>
                  errors += s"$sobject: invalid transform entry $other"; TransformSpec("")
              }
              case _ => Nil
            }.getOrElse(Nil),
            selfLookupBehavior = f.get("self-lookup-behavior").map(_.toString),
            outsideLookupBehavior = f.get("outside-lookup-behavior").map(_.toString))
        case other =>
          errors += s"$sobject: invalid field entry $other"; FieldSpec("")
      }
      case _ => errors += s"$sobject: fields must be a list"; Nil
    }
    // v1 schema: `excludes` between fields and field-group; the v2 schema
    // drops the exclusion and the scopes UNION (reference
    // extract_operation.py:88-122 builds field-group ∪ fields, then
    // discards exclude-fields).
    if (version == 1 && fields.isDefined && fieldGroup.isDefined)
      errors += s"$sobject: fields and field-group are mutually exclusive"
    val excludeFields = e.get("exclude-fields") match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case Some(_) => errors += s"$sobject: exclude-fields must be a list"; Nil
      case None => Nil
    }

    // Duplicate detection (reference core.py:93-131 / SURVEY A3).
    fields.foreach { fs =>
      val dupF = fs.groupBy(_.field).collect { case (f, v) if v.size > 1 => f }
      if (dupF.nonEmpty)
        errors += s"$sobject: One or more fields is specified multiple times: ${dupF.toSeq.sorted.mkString(", ")}"
      val dupC = fs.flatMap(_.column).groupBy(identity).collect { case (c, v) if v.size > 1 => c }
      if (dupC.nonEmpty)
        errors += s"$sobject: One or more columns is specified multiple times: ${dupC.toSeq.sorted.mkString(", ")}"
    }

    val extract = e.get("extract").map {
      case em: java.util.Map[_, _] =>
        val ex = em.asInstanceOf[java.util.Map[String, Any]].asScala
        val known = Set("all", "descendents", "query", "ids")
        val unknownX = ex.keySet.filterNot(known)
        if (unknownX.nonEmpty)
          errors += s"$sobject: unrecognized extract key(s): ${unknownX.toSeq.sorted.mkString(", ")}"
        val keys = ex.keySet.intersect(known)
        if (keys.size != 1) {
          errors += s"$sobject: extract must have exactly one of all/descendents/query/ids"
          ("all", true: Any)
        } else (keys.head, ex(keys.head))
      case _ => errors += s"$sobject: extract must be a mapping"; ("all", true: Any)
    }

    def behavior(key: String, allowed: Set[String], default: String): String =
      e.get(key).map(_.toString) match {
        case Some(b) if allowed(b) => b
        case Some(b) => errors += s"$sobject: invalid $key $b"; default
        case None => default
      }

    // Per-sobject options (v2; reference SOBJECT_OPTIONS_SCHEMA — the
    // bulk-api-* subset only, api-version is operation-level).
    val stepOptions = e.get("options") match {
      case Some(om: java.util.Map[_, _]) if version == 2 =>
        OperationOptions.validate(
          om.asInstanceOf[java.util.Map[String, Any]].asScala.toMap,
          sobject, allowApiVersion = false, errors)
      case Some(_) if version == 2 =>
        errors += s"$sobject: options must be a mapping"; Map.empty[String, Any]
      case _ => Map.empty[String, Any]
    }

    Some(StepConfig(
      sobject = sobject,
      fields = fields,
      fieldGroup = fieldGroup,
      excludeFields = excludeFields,
      extract = extract,
      selfLookupBehavior = behavior("self-lookup-behavior", SelfBehaviors.keySet, "trace-all"),
      outsideLookupBehavior = behavior("outside-lookup-behavior", OutsideBehaviors.keySet, "include"),
      inputValidation = behavior("input-validation", Set("none", "default", "strict"), "default"),
      file = e.get("file").map(_.toString),
      resultFile = e.get("result-file").map(_.toString),
      options = stepOptions))
  }

  /** Field scope for a step against the catalog (reference
    * extract_operation.py:89-123): explicit list, or field-group expansion
    * (readable = all supported; writeable = createable/updateable;
    * smart = readable on extract, writeable on load), id always included.
    * Unsupported types error when explicit, silently excluded in groups.
    */
  def fieldScope(catalog: Catalog, step: StepConfig, load: Boolean,
      errors: scala.collection.mutable.Buffer[String]): Seq[String] = {
    val sch = catalog.byName.getOrElse(step.sobject, {
      errors += s"sObject ${step.sobject} does not exist in the catalog"
      return Nil
    })
    def explicitScope(fs: Seq[FieldSpec]): Seq[String] =
      fs.map(_.field).map { f =>
        sch.fieldMap.get(f) match {
          case None =>
            errors += s"Field ${step.sobject}.$f does not exist or is not visible."; f
          case Some(fm) if UnsupportedTypes(fm.ftype) =>
            errors += s"Field ${step.sobject}.$f is of an unsupported type (${fm.ftype})"; f
          case _ => f
        }
      }
    def groupScope(group: String): Seq[String] = {
      val wantWriteable = group == "writeable" || (group == "smart" && load)
      sch.fields
        .filterNot(f => UnsupportedTypes(f.ftype))
        .filter(f => !wantWriteable || f.createable || f.updateable)
        .map(_.name)
    }
    val scope = (step.fields, step.fieldGroup) match {
      case (Some(fs), None) => explicitScope(fs)
      case (None, Some(group)) => groupScope(group)
      // v2 union (reference extract_operation.py:88-117; v1 already errored
      // on the combination at parse time).
      case (Some(fs), Some(group)) => (explicitScope(fs) ++ groupScope(group)).distinct
      case (None, None) =>
        errors += s"${step.sobject}: either fields or field-group is required"; Nil
    }
    // exclude-fields discards from the derived scope (reference
    // extract_operation.py:119-121); the id field is never excludable.
    val excluded = scope.filterNot(step.excludeFields.toSet)
    (Seq(sch.idField) ++ excluded.filterNot(_ == sch.idField)).distinct
  }

  /** Per-step DataMapper from column renames + transforms.
    * Extract direction: field→column (reference extract_operation.py:30);
    * load direction: column→field (load_operation.py:28).
    */
  def mapper(step: StepConfig, load: Boolean): Option[DataMapper] = {
    val fs = step.fields.getOrElse(return None)
    val renames = fs.flatMap(f => f.column.map(c => if (load) c -> f.field else f.field -> c)).toMap
    val transforms = fs.filter(_.transforms.nonEmpty).map { f =>
      val key = if (load) f.column.getOrElse(f.field) else f.field
      key -> f.transforms
    }.toMap
    if (renames.isEmpty && transforms.isEmpty) None
    else Some(DataMapper(renames, transforms))
  }

  /** Validate each field's transform chain (type gates + required
    * options) at config time — the reference does this in its Cerberus
    * phase (loader/core.py:163-170), not at execution.
    */
  private def validateTransforms(catalog: Catalog, sc: StepConfig,
      errors: scala.collection.mutable.Buffer[String]): Unit =
    for {
      sch <- catalog.byName.get(sc.sobject).toSeq
      f <- sc.fields.getOrElse(Nil) if f.transforms.nonEmpty
    } try graft.core.Transforms.chain(f.transforms,
      graft.core.FieldContext(f.field,
        sch.fieldMap.get(f.field).map(_.soapType).getOrElse("xsd:string")))
    catch {
      case e: graft.core.TransformException =>
        errors += s"${sc.sobject}.${f.field}: ${e.getMessage}"
    }

  /** Build engine ExtractSteps (reference extract_operation.py:20-81). */
  def toExtractSteps(catalog: Catalog, cfg: OperationConfig)
      : Either[Seq[String], Seq[ExtractStep]] = {
    val errors = scala.collection.mutable.Buffer.empty[String]
    val steps = cfg.steps.map { sc =>
      val scope = fieldScope(catalog, sc, load = false, errors)
      validateTransforms(catalog, sc, errors)
      val scopeScope = sc.extract match {
        case Some(("all", _)) => ExtractionScope.AllRecords
        case Some(("query", q)) => ExtractionScope.Query(q.toString)
        case Some(("descendents", _)) => ExtractionScope.Descendents
        case Some(("ids", ids: java.util.List[_])) =>
          val idSeq = ids.asScala.toSeq.map(_.toString)
          // Shape-validate ids at config time for Salesforce-id tables —
          // a bad length would otherwise throw mid-extraction.
          if (catalog.byName.get(sc.sobject).exists(_.salesforceIds))
            idSeq.filter(graft.core.SalesforceId.canonicalOrNull(_) == null)
              .foreach(bad => errors += s"${sc.sobject}: invalid id '$bad' " +
                "(Salesforce Ids must be 15 or 18 characters)")
          ExtractionScope.SelectedRecords(idSeq)
        case Some(("ids", other)) =>
          errors += s"${sc.sobject}: 'ids' must be a list, got $other"
          ExtractionScope.AllRecords
        case _ =>
          errors += s"${sc.sobject}: extract clause is required"; ExtractionScope.AllRecords
      }
      val perFieldSelf = sc.fields.getOrElse(Nil)
        .flatMap(f => f.selfLookupBehavior.map(b => f.field -> SelfBehaviors(b))).toMap
      val perFieldOutside = sc.fields.getOrElse(Nil)
        .flatMap(f => f.outsideLookupBehavior.map(b => f.field -> OutsideBehaviors(b))).toMap
      ExtractStep(sc.sobject, scopeScope, scope,
        SelfBehaviors(sc.selfLookupBehavior), OutsideBehaviors(sc.outsideLookupBehavior),
        perFieldSelf, perFieldOutside)
    }
    if (errors.nonEmpty) Left(errors.toSeq) else Right(steps)
  }

  /** Build engine LoadStepSpecs with dependent-updateability validation
    * (reference load_operation.py:139-149). */
  def toLoadSteps(catalog: Catalog, cfg: OperationConfig)
      : Either[Seq[String], Seq[LoadStepSpec]] = {
    val errors = scala.collection.mutable.Buffer.empty[String]
    val order = cfg.steps.map(_.sobject)
    val steps = cfg.steps.map { sc =>
      val scope = fieldScope(catalog, sc, load = true, errors)
      validateTransforms(catalog, sc, errors)
      if (errors.isEmpty) {
        val ls = catalog.classifyLookups(order, sc.sobject, scope)
        (ls.dependent ++ ls.self).toSeq.sorted.foreach { f =>
          if (!catalog(sc.sobject).fieldMap(f).updateable)
            errors += s"Field ${sc.sobject}.$f is a dependent lookup, but is not updateable."
        }
      }
      val perFieldOutside = sc.fields.getOrElse(Nil)
        .flatMap(f => f.outsideLookupBehavior.map(b => f.field -> OutsideBehaviors(b))).toMap
      LoadStepSpec(sc.sobject, scope, OutsideBehaviors(sc.outsideLookupBehavior), perFieldOutside,
        inputValidation = sc.inputValidation)
    }
    if (errors.nonEmpty) Left(errors.toSeq) else Right(steps)
  }

  /** Input-file column validation (reference load_operation.py:151-208):
    * none → skip; field-group default → no excess columns; explicit fields
    * or strict → exact match with the field scope (id excluded).
    */
  def validateInputColumns(catalog: Catalog, step: StepConfig,
      scope: Seq[String], columns: Seq[String], load: Boolean = true): Seq[String] = {
    if (step.inputValidation == "none") return Nil
    val sch = catalog(step.sobject)
    val mapped = mapper(step, load).map(m =>
      columns.map(m.transformKey)).getOrElse(columns)
    val fileSet = mapped.toSet - sch.idField
    val scopeSet = scope.toSet - sch.idField
    if (step.fieldGroup.isDefined && step.inputValidation == "default") {
      val comparand =
        if (step.fieldGroup.contains("smart"))
          sch.fields.filterNot(f => UnsupportedTypes(f.ftype)).map(_.name).toSet
        else scopeSet
      val excess = fileSet -- comparand
      if (excess.nonEmpty)
        Seq(s"Input file for sObject ${step.sobject} contains excess columns over " +
          s"field group '${step.fieldGroup.get}': ${excess.toSeq.sorted.mkString(", ")}")
      else Nil
    } else if (fileSet != scopeSet) {
      Seq(s"Input file for sObject ${step.sobject} does not match specified field scope.\n" +
        s"Scope: ${scopeSet.toSeq.sorted.mkString(", ")}\n" +
        s"File Columns: ${fileSet.toSeq.sorted.mkString(", ")}\n")
    } else Nil
  }
}

package graft.operators

/** Operation vocabulary, mirroring the reference enums
  * (/root/reference/amaxa/amaxa.py:21-41).
  */
sealed trait ExtractionScope
object ExtractionScope {
  case object AllRecords extends ExtractionScope
  final case class Query(where: String) extends ExtractionScope
  case object Descendents extends ExtractionScope
  final case class SelectedRecords(ids: Seq[String]) extends ExtractionScope
}

sealed trait SelfLookupBehavior
object SelfLookupBehavior {
  case object TraceAll extends SelfLookupBehavior
  case object TraceNone extends SelfLookupBehavior
}

sealed trait OutsideLookupBehavior
object OutsideLookupBehavior {
  case object Include extends OutsideLookupBehavior
  case object DropField extends OutsideLookupBehavior
  case object Error extends OutsideLookupBehavior
}

/** One extraction step (reference ExtractionStep ctor,
  * amaxa/amaxa.py:624-649). `fieldScope` must include the table's id field.
  */
final case class ExtractStep(
    sobject: String,
    scope: ExtractionScope,
    fieldScope: Seq[String],
    selfLookupBehavior: SelfLookupBehavior = SelfLookupBehavior.TraceAll,
    outsideLookupBehavior: OutsideLookupBehavior = OutsideLookupBehavior.Include,
    selfBehaviors: Map[String, SelfLookupBehavior] = Map.empty,
    outsideBehaviors: Map[String, OutsideLookupBehavior] = Map.empty) {
  def selfBehavior(f: String): SelfLookupBehavior =
    selfBehaviors.getOrElse(f, selfLookupBehavior)
  def outsideBehavior(f: String): OutsideLookupBehavior =
    outsideBehaviors.getOrElse(f, outsideLookupBehavior)
}

/** One load step (reference LoadStep ctor, amaxa/amaxa.py:297-311).
  * `inputValidation` mirrors the reference's per-sObject `input-validation`
  * key (docs/validation.rst:6-15): "none" additionally disables the
  * duplicate-input-id detection aggregate in the insert stage.
  */
final case class LoadStepSpec(
    sobject: String,
    fieldScope: Seq[String],
    outsideLookupBehavior: OutsideLookupBehavior = OutsideLookupBehavior.Include,
    outsideBehaviors: Map[String, OutsideLookupBehavior] = Map.empty,
    inputValidation: String = "default") {
  def outsideBehavior(f: String): OutsideLookupBehavior =
    outsideBehaviors.getOrElse(f, outsideLookupBehavior)
}

/** Field-rename + per-field transform pipeline (reference DataMapper,
  * amaxa/amaxa.py:848-861).
  */
final case class DataMapper(
    fieldNameMapping: Map[String, String] = Map.empty,
    fieldTransforms: Map[String, Seq[graft.core.TransformSpec]] = Map.empty) {
  def transformKey(k: String): String = fieldNameMapping.getOrElse(k, k)
}

package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field metadata handed to a transform (reference "field_context":
  * /root/reference/amaxa/transforms.py:34-47). */
final case class FieldContext(name: String, soapType: String)

class TransformException(msg: String) extends RuntimeException(msg)

/** Scalar-transform plugin API, mirroring the reference's TransformProvider
  * (/root/reference/amaxa/transforms.py:30-49): a named, type-gated factory
  * producing a column transformation. Built-ins compile to native Catalyst
  * expressions (no UDFs), so they stay inside whole-stage codegen.
  */
trait TransformProvider {
  def name: String
  /** Empty = allowed on all types (reference `allowed_types = []`). */
  def allowedTypes: Set[String] = Set.empty
  def requiredOptions: Set[String] = Set.empty
  protected def build(field: FieldContext, options: Map[String, String]): Column => Column

  final def get(field: FieldContext, options: Map[String, String] = Map.empty): Column => Column = {
    if (allowedTypes.nonEmpty && !allowedTypes.contains(field.soapType))
      throw new TransformException(
        s"Transform $name is not available for fields of type ${field.soapType}.")
    val missing = requiredOptions -- options.keySet
    if (missing.nonEmpty)
      throw new TransformException(
        s"Transform $name requires options: ${missing.mkString(", ")}.")
    build(field, options)
  }
}

/** A plugin module exposing several providers at once — the analogue of a
  * reference plugin-modules Python module defining multiple
  * TransformProvider subclasses (loader/schemas.py:377-380 names modules,
  * and importing one registers everything it defines).
  */
trait TransformProviderModule {
  def providers: Seq[TransformProvider]
}

/** One step of a per-field transform pipeline. */
final case class TransformSpec(name: String, options: Map[String, String] = Map.empty)

/** Registry + composition, mirroring reference transform discovery
  * (/root/reference/amaxa/transforms.py:11-27) and left-to-right composition
  * (/root/reference/amaxa/amaxa.py:860-861).
  */
object Transforms {
  private val StringOnly = Set("xsd:string")

  private object Lowercase extends TransformProvider {
    val name = "lowercase"; override val allowedTypes = StringOnly
    def build(f: FieldContext, o: Map[String, String]) = lower(_)
  }
  private object Uppercase extends TransformProvider {
    val name = "uppercase"; override val allowedTypes = StringOnly
    def build(f: FieldContext, o: Map[String, String]) = upper(_)
  }
  private object Strip extends TransformProvider {
    val name = "strip"; override val allowedTypes = StringOnly
    def build(f: FieldContext, o: Map[String, String]) = trim(_)
  }
  private object Prefix extends TransformProvider {
    val name = "prefix"; override val allowedTypes = StringOnly
    override val requiredOptions = Set("prefix")
    def build(f: FieldContext, o: Map[String, String]) =
      c => concat(lit(o("prefix")), c)
  }
  private object Suffix extends TransformProvider {
    val name = "suffix"; override val allowedTypes = StringOnly
    override val requiredOptions = Set("suffix")
    def build(f: FieldContext, o: Map[String, String]) =
      c => concat(c, lit(o("suffix")))
  }

  @volatile private var registry: Map[String, TransformProvider] =
    Seq(Lowercase, Uppercase, Strip, Prefix, Suffix).map(t => t.name -> t).toMap

  /** Plugin registration (reference plugin-modules mechanism,
    * /root/reference/amaxa/loader/schemas.py:37-43). */
  def register(p: TransformProvider): Unit = synchronized {
    registry += (p.name -> p)
  }

  def apply(name: String): TransformProvider =
    registry.getOrElse(name,
      throw new TransformException(s"Unknown transform $name"))

  /** Compose an ordered transform pipeline into one Column function
    * (reference functools.reduce at amaxa/amaxa.py:860-861). */
  def chain(specs: Seq[TransformSpec], field: FieldContext): Column => Column =
    specs.foldLeft(identity[Column] _) { (acc, spec) =>
      acc.andThen(apply(spec.name).get(field, spec.options))
    }
}

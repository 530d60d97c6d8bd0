package graft.testplugins

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{FieldContext, TransformProvider, TransformProviderModule}

/** Test plugin fixtures mirroring the reference's example plugin module
  * (/root/reference/assets/test_data_transforms/example_transforms.py):
  * a string-repeat transform with a required integer option, exposed both
  * as a standalone provider object and via a multi-provider bundle.
  */
object MultiplyTransform extends TransformProvider {
  val name = "multiply"
  override val allowedTypes: Set[String] = Set("xsd:string")
  override val requiredOptions: Set[String] = Set("count")
  protected def build(field: FieldContext, options: Map[String, String]): Column => Column =
    c => repeat(c, options("count").toInt)
}

/** Class (non-object) form — loaded via no-arg constructor. */
class ReverseTransform extends TransformProvider {
  val name = "reverse_text"
  override val allowedTypes: Set[String] = Set("xsd:string")
  protected def build(field: FieldContext, options: Map[String, String]): Column => Column =
    c => reverse(c)
}

/** Module form: one config entry registering several providers. */
object PluginBundle extends TransformProviderModule {
  val providers: Seq[TransformProvider] = Seq(new ReverseTransform)
}

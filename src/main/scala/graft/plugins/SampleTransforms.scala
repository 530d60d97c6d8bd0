package graft.plugins

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.{FieldContext, TransformProvider}

/** Shipped example plugin (the analogue of the reference's
  * assets/test_data_transforms/example_transforms.py): a string-reverse
  * transform, loadable by name from a v2 config's `plugin-modules` list.
  * Compiles to a native Catalyst expression like the built-ins.
  */
object ReverseText extends TransformProvider {
  val name = "reverse_text"
  override val allowedTypes: Set[String] = Set("xsd:string")
  protected def build(field: FieldContext, options: Map[String, String]): Column => Column =
    c => reverse(c)
}

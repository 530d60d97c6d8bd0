package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.CanonicalId

/** canonical_id is idempotent (an 18-char canonical form maps to itself,
  * an invalid inner value yields null which the outer propagates), so
  * nested applications collapse to one. The nesting arises naturally when
  * loading previously-extracted data: extraction canonicalizes id columns
  * at ingest and the load path canonicalizes its input again
  * (ExtractEngine.scanScoped + LoadEngine.transformInput), so without this
  * rule a round-trip pays the checksum twice per id cell.
  */
object CanonicalIdIdempotence extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CanonicalId(inner @ CanonicalId(_)) => inner
    }
}

/** Session extension injector: `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` (or .withExtensions at build time)
  * registers graft's optimizer rules in a fresh session; tests on a shared
  * session use spark.experimental.extraOptimizations instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CanonicalIdIdempotence)
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.CanonicalId

/** canonical_id is idempotent (an 18-char canonical form maps to itself,
  * an invalid inner value yields null which the outer propagates), so
  * nested applications collapse to one. The engine itself never nests the
  * expression in a single plan (extract output is materialized before load
  * re-canonicalizes, and the load path guards the inner expression behind
  * a CASE) — the rule targets USER-authored queries that compose
  * GraftFunctions.canonical_id over helpers which already canonicalize,
  * and it documents the library's extension-point wiring.
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
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL-text faces of the custom expressions (canonical_id, the
    // dedup hash family, dot_fold, …) — one definition shared with the
    // direct registerAll route.
    graft.functions.GraftFunctionRegistry.installInto(ext)
  }
}

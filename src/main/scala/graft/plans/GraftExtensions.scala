package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeMap, Expression, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer extension: push filters below inference projections.
  *
  * SURVEY.md §4: "a Rule collapsing filter-after-llm-udf to skip inference on
  * pre-filtered rows is a cheap later win". Inference UDFs are registered
  * non-deterministic (an LLM call isn't a pure function), which blocks
  * Catalyst's own PushPredicateThroughNonJoin — so a row that's about to be
  * filtered out still pays for a model call. This rule restores the push
  * when it is provably safe: the predicate is deterministic and references
  * only columns that pass through the projection unchanged (or via
  * deterministic non-inference aliases).
  *
  * At scale this is the difference between "inference on the corpus" and
  * "inference on the survivors" — usually orders of magnitude.
  */
object PushFilterBelowInference extends Rule[LogicalPlan] {

  private def isInferenceUdf(e: Expression): Boolean = e.exists {
    case u: ScalaUDF => u.udfName.exists(_.startsWith("graft_infer"))
    case _           => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, p @ Project(projList, child))
        if cond.deterministic && projList.exists(isInferenceUdf) =>
      // aliases the predicate may be rewritten through: deterministic,
      // inference-free projections only
      val safeAliases = AttributeMap(projList.collect {
        case a: Alias if a.child.deterministic && !isInferenceUdf(a.child) =>
          (a.toAttribute, a.child)
      })
      val passThrough = projList.collect { case a: Attribute => a }.toSet
      val substitutable = cond.references.forall(r =>
        passThrough.contains(r) || safeAliases.contains(r))
      if (substitutable) {
        val pushed = cond.transform {
          case a: Attribute if safeAliases.contains(a) => safeAliases(a)
        }
        Project(projList, Filter(pushed, child))
      } else f
  }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => PushFilterBelowInference)
}

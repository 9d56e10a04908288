package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the natural built-in form of a literal
  * set-membership count —
  *
  *   `size(filter(toks, t -> t IN ('the', 'a', ...)))`
  *
  * — into the codegen'd [[TextExpressions.CountInSet]] kernel. The
  * built-in form is correct but CodegenFallback: an interpreted lambda
  * dispatch plus a linear predicate walk per array element, repeated per
  * stopword list in a language-ID scan. Users writing the idiomatic
  * DataFrame/SQL shape get the kernel automatically when the rule is
  * injected (`GraftExtensions`) or added via
  * `spark.experimental.extraOptimizations`.
  *
  * Semantics are identical BY CONSTRUCTION of CountInSet (null elements
  * don't count, null array -> null): the rewrite therefore requires
  * `legacySizeOfNull = false` (the Spark 3+ default) — under the legacy
  * flag `size(null)` is -1 while CountInSet propagates null.
  * Both `In` and its optimized `InSet` form are matched (OptimizeIn may
  * run before or after an extended rule's batch).
  */
object RewriteCountInSet extends Rule[LogicalPlan] {

  private def stringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def literalWords(list: Seq[Expression]): Option[Seq[String]] =
    if (list.forall(e => e.isInstanceOf[Literal] && e.dataType == StringType &&
        e.asInstanceOf[Literal].value != null))
      Some(list.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayFilter(arr, LambdaFunction(pred, Seq(v: NamedLambdaVariable), _)), false)
        if stringArray(arr) =>
      val words = pred match {
        case In(e: NamedLambdaVariable, list) if e.exprId == v.exprId => literalWords(list)
        // A null in the IN-list can't make the predicate TRUE (only null,
        // which filter drops, same as a miss) — dropping it preserves
        // the count. Any non-string member bails out of the rewrite.
        case InSet(e: NamedLambdaVariable, set) if e.exprId == v.exprId &&
            set.forall(x => x == null || x.isInstanceOf[UTF8String]) =>
          Some(set.toSeq.collect { case u: UTF8String => u.toString }.sorted)
        case _ => None
      }
      words match {
        case Some(ws) => TextExpressions.CountInSet(arr, ws)
        case None => s
      }
  }
}

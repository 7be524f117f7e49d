package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule: rewrite the portable whitespace-tokenizer idiom
  * `filter(split(text, " ", -1), x -> length(x) > 0)` to the native
  * [[TokensExpr]] byte scan.
  *
  * The HOF form is what the portable API ([[graft.ops.TextAnalysis.tokens]])
  * and user-written SQL produce; matching it HERE means every tokenizing
  * query in an extensions-enabled session gets the native expression —
  * including queries the engine's own session-aware call sites never see.
  * Rewrite safety: identical output values (Poly64Spec pins the scan
  * against a driver-side golden), same dataType (`array<string>` without
  * null elements), same nullability (input-null → null), and both forms
  * preserve token order and duplicates. Matched conservatively: only the
  * exact literal `" "` separator with the default -1 limit and the exact
  * `length(x) > 0` lambda over the filter's own variable. */
object TokenizeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayFilter(
          StringSplit(text, Literal(sep, StringType), Literal(-1, _)),
          LambdaFunction(
            GreaterThan(Length(lv1: NamedLambdaVariable), Literal(0, _)),
            Seq(lv2: NamedLambdaVariable), false))
        if sep != null && sep.toString == " " && lv1.exprId == lv2.exprId =>
      TokensExpr(text)
  }
}

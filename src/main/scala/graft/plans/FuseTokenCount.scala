package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayRemove, Cast, Expression, GetStructField, Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.TextStats

/** Optimizer rule (injected via GraftExtensions, alongside
  * [[FuseSetJaccard]]): rewrite the whitespace token-count idiom
  * {{{
  *   size(array_remove(split(text, ' '), ''))   -- Column API or SQL
  * }}}
  * into `cast(graft_text_stats(text).n_tokens as int)` — the
  * single-pass [[TextStats]] kernel. The composable form materializes
  * the full token ARRAY (one string per token) and then a second
  * dedup-removed copy, only to count it and throw both away; the
  * kernel counts token runs in one scan of the text bytes with no
  * allocation. Every `Text.tokenCountWs` site — and any SQL user
  * writing the idiom by hand — gets the kernel with no code change.
  *
  * Guards: the split pattern must be the literal single space with the
  * default -1 limit (the regex " " matches exactly one space, so split
  * + remove-empties ≡ the kernel's maximal-run tokenization), the
  * removed element must be the empty string, and `legacySizeOfNull`
  * must be false (the legacy flag maps size(null) to −1; the kernel's
  * null-propagating form deliberately matches only the modern Size).
  * The cast back to int preserves Size's exact output type; null in →
  * null out on both forms. Only the size(...) composition is touched —
  * uses of the token ARRAY itself (explode, filter, joins) are left
  * for Catalyst to plan as before.
  */
object FuseTokenCount extends Rule[LogicalPlan] {

  private def litString(e: Expression, want: String): Boolean = e match {
    case Literal(v, StringType) => v != null && v.toString == want
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayRemove(StringSplit(text, pat, Literal(-1, IntegerType)), empty), false)
        if litString(pat, " ") && litString(empty, "") =>
      Cast(GetStructField(TextStats(text), 0, Some("n_tokens")), IntegerType)
  }
}

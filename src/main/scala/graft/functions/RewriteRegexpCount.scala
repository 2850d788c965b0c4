package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: rewrite `size(regexp_extract_all(subject, pattern[, idx]))`
 * into graft's native RegexpCountExpr.
 *
 * Spark's own `regexp_count` desugars TO the size/extract-all form, so any
 * query counting regex matches — including ones written against the
 * built-in — materializes an array of every match per row just to take its
 * length. The rewrite is exact: extract-all emits one element per match
 * regardless of group index, so the count is the match count for any VALID
 * idx; null subjects map to null on both sides (guarded off under
 * legacySizeOfNull, where size(null) = -1).
 *
 * Vanilla Spark raises an error for an invalid group index (negative, or
 * greater than the pattern's group count) — a rewrite that dropped idx
 * unconditionally would silently return the match count instead of failing.
 * So the rule fires only when BOTH pattern and idx are foldable and idx is
 * provably within [0, groupCount] for the compiled pattern; anything else
 * keeps the built-in (and its error behavior) untouched.
 *
 * Activation: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide)
 * or `GraftExtensions.register(spark)` (live session, via
 * experimental.extraOptimizations).
 */
object RewriteRegexpCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject, regexp, idx), legacySizeOfNull)
          if !legacySizeOfNull && idxProvablyValid(regexp, idx) =>
        RegexpCountExpr(subject, regexp)
    }

  /** True iff pattern and idx fold to constants and idx is a valid group
    * index for the compiled pattern — the only case where dropping idx
    * cannot change semantics. */
  private def idxProvablyValid(regexp: Expression, idx: Expression): Boolean =
    regexp.foldable && idx.foldable && {
      try {
        val p = regexp.eval(null)
        val i = idx.eval(null)
        p != null && i != null && {
          val groups = Pattern.compile(p.toString).matcher("").groupCount()
          val iv = i.asInstanceOf[Number].intValue()
          iv >= 0 && iv <= groups
        }
      } catch { case _: Exception => false }
    }
}

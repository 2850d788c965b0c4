package graft.functions

import org.apache.spark.sql.catalyst.expressions.{RegExpExtractAll, Size}
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
 * regardless of group index, so the count is the match count for any idx;
 * null subjects map to null on both sides (guarded off under
 * legacySizeOfNull, where size(null) = -1).
 *
 * Activation: `spark.sql.extensions=graft.GraftExtensions` (cluster-wide)
 * or `GraftExtensions.register(spark)` (live session, via
 * experimental.extraOptimizations).
 */
object RewriteRegexpCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(RegExpExtractAll(subject, regexp, _), legacySizeOfNull)
          if !legacySizeOfNull =>
        RegexpCountExpr(subject, regexp)
    }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-grain aggregation: ROLLUP hierarchies and fixed-schema PIVOT.
 *
 * Both are single-shuffle shapes: Spark expands rollup grouping sets with
 * one Expand node feeding ONE hash aggregate (partial + final), so the
 * subtotal levels cost one extra map-side row per input row per level, not
 * one extra pass over the data — the right plan at 100 TB versus unioning
 * per-level aggregates (which would scan the fact table L times).
 *
 * Pivot uses an explicit value list: with values enumerated, Spark plans a
 * single aggregate of `count/sum(CASE WHEN pivot = v)` columns — no
 * distinct-values discovery job, and a deterministic output schema (an
 * unenumerated pivot triggers a collect of distinct values on the driver
 * and makes the schema data-dependent; never do that on a 100 TB column).
 */
object Rollup {

  /** ROLLUP over `keys` (all prefixes + grand total) with the given
    * aggregates; emits `grouping_id` to disambiguate a genuine NULL key
    * value from a rolled-up level. */
  def rollupAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.rollup(keys.map(col): _*)
      .agg(grouping_id().as("grouping_id"), aggs: _*)

  /** CUBE over `keys` (every key subset, 2^k grouping sets); same
    * single-Expand single-aggregate plan as rollup, with 2^k map-side rows
    * per input row — keep `keys` short (2-3) at scale. */
  def cubeAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.cube(keys.map(col): _*)
      .agg(grouping_id().as("grouping_id"), aggs: _*)

  /** Explicit GROUPING SETS: only the named subsets are expanded, so the
    * map-side blow-up is |sets|, not 2^k — the right call when a cube's
    * cross-grains are never read. */
  def groupingSetsAgg(df: DataFrame, sets: Seq[Seq[String]],
                      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupingSets(sets.map(_.map(col)), keys.map(col): _*)
      .agg(grouping_id().as("grouping_id"), aggs: _*)

  /** Fixed-value-list pivot: one output column per (pivot value) holding
    * `agg` over the matching rows. */
  def pivotAgg(df: DataFrame, groupKey: String, pivotCol: String,
               values: Seq[String], agg: Column): DataFrame =
    df.groupBy(col(groupKey)).pivot(pivotCol, values).agg(agg)

  /** UNPIVOT (melt): wide measure columns -> long (name, value) rows —
    * the inverse reshaping of [[pivotAgg]], e.g. one row per (order line,
    * measure) for a metrics table feeding a generic anomaly screen. Narrow
    * (an Expand node, rows × measures, no shuffle); values are cast to a
    * common type by Spark's unpivot contract. */
  def unpivotMeasures(df: DataFrame, ids: Seq[String], measures: Seq[String],
                      nameCol: String = "measure",
                      valueCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, measures.map(col).toArray,
      nameCol, valueCol)
}

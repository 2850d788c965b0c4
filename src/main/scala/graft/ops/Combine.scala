package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Joins and unions across window granularities (SURVEY §2.4 J1, §2.8 U1).
 */
object Combine {

  /** J1: inner equi-join of two windowed aggregates on (key, window_start).
    * Both inputs are already aggregated and share the grouping shuffle key,
    * so when both sides are partitioned by the join key Catalyst reuses the
    * exchange; at 100 TB the small side (coarser windows) is typically
    * broadcastable — AQE converts to broadcast join at runtime.
    * Reference: spark_stream_processor.py:216-222. */
  def joinOnWindowStart(fine: DataFrame, coarse: DataFrame,
                        key: String): DataFrame =
    fine.join(coarse, Seq(key, "window_start"), "inner")

  /** U1 (faithful): the reference's positional 3-way UNION ALL — each branch
    * tagged with window_type, coarser branches null-padded, and columns
    * aligned BY POSITION under the 15-minute branch's names (so the 5-minute
    * metrics land under *_15m column names — a documented reference quirk,
    * SURVEY §8/U1). Reference: airflow analytics processor:206-215. */
  def unionTaggedPositional(branches: Seq[(String, DataFrame)]): DataFrame = {
    require(branches.nonEmpty)
    branches.map { case (tag, df) => df.withColumn("window_type", lit(tag)) }
      .reduce(_ union _)
  }

  /** U1 (clean variant): name-aligned union for the long-format schema —
    * what you actually want at scale; unionByName fails fast on drift
    * instead of silently mis-aligning. */
  def unionLong(branches: Seq[(String, DataFrame)]): DataFrame = {
    require(branches.nonEmpty)
    branches.map { case (tag, df) => df.withColumn("window_type", lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Full set-comparison of two same-schema relations in one result: rows
    * tagged by which side they belong to, under both SET semantics
    * (intersect/except — SQL INTERSECT/EXCEPT, duplicates collapsed) and
    * MULTISET semantics (intersectAll/exceptAll — INTERSECT ALL/EXCEPT ALL,
    * per-row multiplicity preserved). Spark plans each leg as an aggregate
    * or a left-semi/anti join on all columns — one shuffle per leg on the
    * full row, partial-aggregated; nothing is collected or crossed. */
  def setCompare(a: DataFrame, b: DataFrame,
                 tagCol: String = "set_op"): DataFrame =
    Seq(
      "intersect" -> a.intersect(b),
      "only_a" -> a.except(b),
      "only_b" -> b.except(a),
      "intersect_all" -> a.intersectAll(b),
      "only_a_all" -> a.exceptAll(b),
      "only_b_all" -> b.exceptAll(a))
      .map { case (tag, df) => df.withColumn(tagCol, lit(tag)) }
      .reduce(_ union _)

  /** Keyed reconciliation of two aggregate tables — the full-outer "recon
    * report" run between two systems that should agree (yesterday's load
    * vs today's, engine A vs engine B, billing vs usage): every key from
    * EITHER side, its measure on each, a presence tag, and the exact
    * delta (missing = 0). Inputs must be pre-aggregated (≤1 row per key)
    * and their keys non-null — presence is read off key nullness after
    * the join, which a NULL source key would mislabel.
    *
    * Scale shape: one full-outer sort-merge join on the keys — both
    * sides shuffle once on the same key (or the small side broadcasts…
    * except Spark correctly refuses broadcast for full-outer, so this is
    * the one join shape that always co-partitions; pre-bucketing both
    * sides by the key makes it exchange-free). `measure` must be an
    * exact (integral/decimal) column so the delta is exact. */
  def reconcile(a: DataFrame, b: DataFrame, keys: Seq[String],
                measure: String): DataFrame = {
    val aKey = col(s"__ka_${keys.head}")
    val bKey = col(s"__kb_${keys.head}")
    val aa = a.select(keys.map(col) ++ Seq(
      col(measure).as(s"a_$measure"), col(keys.head).as(s"__ka_${keys.head}")): _*)
    val bb = b.select(keys.map(col) ++ Seq(
      col(measure).as(s"b_$measure"), col(keys.head).as(s"__kb_${keys.head}")): _*)
    aa.join(bb, keys, "full_outer")
      .select((keys.map(col) ++ Seq(
        col(s"a_$measure"), col(s"b_$measure"),
        when(aKey.isNotNull && bKey.isNotNull, "both")
          .when(aKey.isNotNull, "a_only").otherwise("b_only").as("presence"),
        (coalesce(col(s"a_$measure"), lit(0L))
          - coalesce(col(s"b_$measure"), lit(0L))).as("delta"))): _*)
  }
}

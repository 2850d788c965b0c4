package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-resistant aggregation via key salting (SURVEY §7.4 scale posture).
 *
 * A hash aggregate over a skewed key (one symbol = 40% of all ticks) puts
 * the hot key's entire partial state on one reducer. Salting splits each
 * key into `salt` shards for the first (map-heavy) aggregation, then
 * combines the shards in a second, tiny aggregation. Only decomposable
 * aggregates (sum/count/min/max — and avg as sum/count) survive the
 * two-phase split; that is exactly the set the reference uses.
 *
 * AQE's skew-join handling covers joins; this covers group-bys, which AQE
 * does not rebalance when a single key dominates.
 */
object Skew {

  /** Two-phase salted aggregate: per (keys) compute count, sum/min/max of
    * `value` and avg derived as sum/count-of-non-null (SQL AVG semantics).
    * Result is identical to the direct groupBy — salting is invisible in
    * the output. The salt is a ROW-level counter (monotonically increasing
    * id mod salt), so a hot key spreads across shards even when the value
    * column is constant — salting on a data column would keep all equal
    * values on one shard and change nothing. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], value: String,
                      salt: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val phase1 = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salt)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        count(lit(1)).as("__n"),
        count(col(value)).as("__nv"),
        sum(col(value)).as("__sum"),
        min(col(value)).as("__min"),
        max(col(value)).as("__max"))
    phase1.groupBy(keyCols: _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__nv")).as("n_values"),
        sum(col("__sum")).as("value_sum"),
        min(col("__min")).as("value_min"),
        max(col("__max")).as("value_max"))
      .withColumn("value_avg", col("value_sum") / col("n_values"))
  }

  /** Salted broadcast-free join for a skewed key: the FACT side gets a
    * row-level shard (uniform, data-independent — salting on a data column
    * would leave a constant-valued hot key on one shard), the DIM side is
    * exploded into `salt` copies, and the join keys on (key, shard). The
    * hot key's rows now spread over `salt` reducers instead of one. Output
    * is row-identical to the plain join (each fact row still matches its
    * dim row exactly once — on its own shard).
    *
    * Cost model: dim-side rows × salt extra shuffle volume. Use when the
    * dim is too big to broadcast but small next to the fact (the gap AQE
    * skew-join doesn't cover: AQE splits oversized PARTITIONS, but a
    * single monster key hashed to one partition still serializes through
    * one task pair without salting when stats mislead it). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val f = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}

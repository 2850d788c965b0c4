package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, replayable sampling for training-data pipelines.
 *
 * `df.sample(fraction)` draws per-partition pseudo-random rows: the sample
 * changes with partitioning, retries, and Spark version — useless for a
 * replayable corpus split. Key-based sampling decides membership from the
 * ROW's own key, so the same row lands in the same split on any cluster,
 * any day: this is how train/held-out splits, audit subsamples, and
 * cross-pipeline consistent samples are actually cut at 100 TB. Pure
 * narrow filter: no shuffle, pushes down to the scan where the source
 * supports predicate pushdown.
 */
object Sampling {

  /** Keep rows where key ≡ r (mod k) — an exact 1/k systematic sample for
    * dense integer keys (ids). Deterministic and portable across engines. */
  def modSample(df: DataFrame, key: String, k: Int, r: Int = 0): DataFrame =
    df.filter(pmod(col(key), lit(k)) === lit(r))

  /** Hash-based Bernoulli sample at `fraction`, uniform even when keys are
    * sparse, clustered, or non-numeric: membership = bucket(xxhash64(key))
    * below the fraction. Deterministic per (key, seed); the hash family is
    * engine-specific, so cross-engine replays must share the Spark-side
    * function (or use [[modSample]] on a portable key). */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
                 seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0, 1]")
    val bucket = pmod(xxhash64(key, lit(seed)), lit(1000000L))
    df.filter(bucket < lit((fraction * 1000000L).toLong))
  }

  /** Per-stratum fixed-size sample: the k smallest-keyed rows of each
    * stratum (deterministic; one shuffle on the stratum keys via the
    * window, k-bounded buffers — see TopK.topKPerGroup). */
  def stratifiedFixed(df: DataFrame, strata: Seq[String], key: String,
                      k: Int): DataFrame =
    TopK.topKPerGroup(df, strata, Seq(col(key).asc), k, rankCol = "__rank")
      .drop("__rank")

  /** Systematic probability-proportional-to-size sample of ~`n` rows:
    * order the population by (md5(key‖seed), key) — a deterministic
    * pseudo-random permutation — and select every row whose cumulative
    * weight span crosses a multiple of W/n. Selection probability is
    * proportional to weight, exactly n boundary crossings happen
    * (rows heavier than W/n are selected once but absorb several
    * boundaries), and the whole draw replays bit-for-bit anywhere —
    * all arithmetic is integer.
    *
    * Scale shape: the cumulative weight is the banded two-pass pattern
    * (Curate.globalSortIndex): per-band totals (256 rows) broadcast as
    * offsets, in-band cumulative windows — no global single-partition
    * pass ever sees the data. Rows with weight <= 0 are excluded.
    *
    * Int64 envelope: cum·n must fit — fine to W·n ~ 9e18 (e.g. 1e14
    * total weight at n = 10k); shard by stratum beyond that.
    *
    * Output: input columns + `bucket` (the 0-based W/n stratum the row's
    * span entered). */
  def ppsSystematic(df: DataFrame, key: Column, weight: Column, n: Int,
                    seed: String = ""): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    val withH = df
      .filter(weight > 0)
      .withColumn("__w", weight.cast("long"))
      .withColumn("__h", md5(concat(key.cast("string"), lit(seed))))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy("__b").agg(sum(col("__w")).as("__bw"))
      .withColumn("__off",
        coalesce(sum(col("__bw")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
            .rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              -1)), lit(0L)))
      .drop("__bw")
    val tot = withH.agg(sum(col("__w")).as("__tot"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h"), key)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    withH.join(broadcast(offsets), "__b")
      .withColumn("__cum", col("__off") + sum(col("__w")).over(wb))
      .crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"((__cum - __w) * $n) div __tot"))
      .filter(col("bucket") < expr(s"(__cum * $n) div __tot"))
      .drop("__w", "__h", "__b", "__off", "__cum", "__tot")
  }
}

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
}

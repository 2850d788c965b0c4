package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over right-censored durations — the
  * time-to-event view of behavioral data (how long do sessions last,
  * how long until a user returns), where rows still "alive" at the
  * observation horizon must count as at-risk without counting as
  * events; dropping them (the naive duration histogram) biases every
  * duration estimate short.
  *
  * Numeric discipline: the estimator is a cumulative PRODUCT
  * Π (1 − dᵢ/nᵢ), which SQL lacks — it runs as exp(Σ ln((nᵢ−dᵢ)/nᵢ))
  * where each term is one ln of a ratio of exact int64 counts and the
  * cumulative sum is taken in the fixed duration order, so there is no
  * summation-order freedom for engines to disagree on. A time where
  * everyone at risk dies (d = n) would need ln 0 — engines disagree on
  * ln(0) (NULL vs −inf), so that state is tracked with an integer flag
  * and survival pins to exactly 0.0 from there on.
  *
  * Scale shape: rows collapse to the distinct-(group, duration) frame
  * in one shuffle; every window after that runs over at most |distinct
  * durations| rows per group (durations are near-always quantized —
  * minutes, days; quantize upstream if not). */
object Survival {

  /** One row per (group, distinct duration t): n_risk (at risk at t⁻),
    * d (events at t), c (censored at t), and the KM survival S(t).
    * `observed` is true when the event happened at `duration`, false
    * when the row was censored there (still alive at the horizon). NULL
    * durations are dropped; NULL observed means censored. */
  def kaplanMeier(df: DataFrame, keys: Seq[String], duration: String,
                  observed: Column): DataFrame = {
    val k = keys.map(col)
    val g = df.filter(col(duration).isNotNull)
      .groupBy((k :+ col(duration).as("t")): _*)
      .agg(sum(when(coalesce(observed, lit(false)), 1L).otherwise(0L)).as("d"),
        sum(when(coalesce(observed, lit(false)), 0L).otherwise(1L)).as("c"))
    val tot = g.groupBy(k: _*).agg(sum(col("d") + col("c")).as("__tot"))
    val wBefore = Window.partitionBy(k: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(k: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(tot, keys)
      .withColumn("n_risk", col("__tot") -
        coalesce(sum(col("d") + col("c")).over(wBefore), lit(0L)))
      .withColumn("__term",
        when(col("d") === col("n_risk"), lit(0.0))
          .otherwise(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk").cast("double"))))
      .withColumn("__dead",
        sum(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("survival",
        when(col("__dead") > 0L, lit(0.0))
          .otherwise(round(exp(sum(col("__term")).over(wCum)), 6)))
      .select((k ++ Seq(col("t"), col("n_risk"), col("d"), col("c"),
        col("survival"))): _*)
  }
}

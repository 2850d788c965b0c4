package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Grouped statistics beyond plain moments: bivariate association and
 * robust (quantile-fence) outlier detection.
 *
 * Everything here is a declarative aggregate — corr/covar/regr_* carry
 * constant-width partial states (sums of products) through map-side
 * combine, and the quantile pass uses Spark's exact interpolating
 * `percentile`, so each operator is one or two shuffles on the group keys
 * at any scale.
 */
object Stats {

  /** Per-group bivariate association of y on x: Pearson correlation,
    * sample covariance, OLS slope/intercept, n. One aggregation pass;
    * every function is partial-aggregable (no per-group buffering). */
  def bivariate(df: DataFrame, keys: Seq[String], x: String, y: String,
                round6: Boolean = true): DataFrame = {
    val r = (c: org.apache.spark.sql.Column) =>
      if (round6) round(c, 6) else c
    df.groupBy(keys.map(col): _*).agg(
      r(corr(col(y), col(x))).as("corr_yx"),
      r(covar_samp(col(y), col(x))).as("covar_yx"),
      r(expr(s"regr_slope($y, $x)")).as("slope"),
      r(expr(s"regr_intercept($y, $x)")).as("intercept"),
      count(lit(1)).as("n"))
  }

  /** Tukey-fence outliers per group: values outside
    * [p25 - k·IQR, p75 + k·IQR]. Two passes — fences per group (exact
    * interpolated quantiles), then a broadcast join back to count
    * violations; the data is scanned twice but shuffled only by the
    * (low-cardinality) group keys. Fences are rounded to 6 dp BEFORE the
    * comparison so the boundary decision is identical on any engine
    * computing the same rounded fence (an unrounded fence can differ in
    * the last ulp across quantile implementations and flip rows that sit
    * exactly on it). */
  def iqrOutliers(df: DataFrame, keys: Seq[String], value: String,
                  k: Double = 1.5): DataFrame = {
    val v = col(value)
    val fences = df.groupBy(keys.map(col): _*).agg(
        expr(s"percentile($value, 0.25)").as("__p25"),
        expr(s"percentile($value, 0.75)").as("__p75"),
        count(lit(1)).as("n"))
      .withColumn("p25", round(col("__p25"), 6))
      .withColumn("p75", round(col("__p75"), 6))
      .withColumn("lo",
        round(col("__p25") - lit(k) * (col("__p75") - col("__p25")), 6))
      .withColumn("hi",
        round(col("__p75") + lit(k) * (col("__p75") - col("__p25")), 6))
      .drop("__p25", "__p75")
    val outliers = df.join(broadcast(fences), keys)
      .filter(v < col("lo") || v > col("hi"))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_outliers"))
    fences.join(outliers, keys, "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .select((keys.map(col) ++ Seq(col("p25"), col("p75"), col("lo"),
        col("hi"), col("n"), col("n_outliers"))): _*)
  }
}

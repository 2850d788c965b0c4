package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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
    // nanToNull: Spark evaluates zero-variance corr/slope as NaN (0/0)
    // where ANSI engines return NULL — normalize like Clean does for
    // window stddev
    val r = (c: org.apache.spark.sql.Column) =>
      Clean.nanToNull(if (round6) round(c, 6) else c)
    df.groupBy(keys.map(col): _*).agg(
      r(corr(col(y), col(x))).as("corr_yx"),
      r(covar_samp(col(y), col(x))).as("covar_yx"),
      r(expr(s"regr_slope($y, $x)")).as("slope"),
      r(expr(s"regr_intercept($y, $x)")).as("intercept"),
      count(lit(1)).as("n"))
  }

  /** Cross-series correlation over aligned time buckets — the
    * pairs-trading / co-movement screen: bucket each series to a common
    * grid (epoch-floor, engine-portable), then correlate every key pair
    * over the buckets both populated. Pairs below `minOverlap` shared
    * buckets are dropped (a correlation over 3 points is noise). The
    * self-join fans out k series per bucket into k²/2 pair rows — fine for
    * thousands of keys; at millions, pre-filter candidate pairs (sector
    * blocking, an LSH over coarse return sketches) before this exact pass,
    * exactly like the dedup family's block-then-verify shape. Bucket
    * values are rounded r6 BEFORE the correlation so both engines
    * correlate bit-identical series. */
  def alignedSeriesCorr(df: DataFrame, key: String, ts: String,
                        value: String, bucketSeconds: Long,
                        minOverlap: Long): DataFrame = {
    val bucket = (floor(unix_timestamp(col(ts)) / lit(bucketSeconds))
      .cast("long") * bucketSeconds).as("bucket")
    // tie-immune bucket average: round the sum (no rounding boundary is
    // reachable for 2-decimal-true data) then divide — round(avg, 6) ties
    // whenever a bucket holds 32*odd rows and the engines' rounding rules
    // disagree (see SparkEntry.exactAvg)
    val series = df.groupBy(col(key), bucket)
      .agg((round(sum(col(value)), 4) / count(col(value))).as("v"))
    val a = series.select(col(key).as("key1"), col("bucket"),
      col("v").as("v1"))
    val b = series.select(col(key).as("key2"), col("bucket"),
      col("v").as("v2"))
    a.join(b, Seq("bucket"))
      .filter(col("key1") < col("key2"))
      .groupBy("key1", "key2")
      .agg(Clean.nanToNull(round(corr(col("v1"), col("v2")), 6))
        .as("corr_v"), count(lit(1)).as("n_buckets"))
      .filter(col("n_buckets") >= minOverlap)
  }

  /** Column profile — the data-quality report a pipeline runs before
    * trusting a new drop: per column, row/null/distinct counts plus
    * numeric min/max. ONE aggregation pass over the table computes every
    * metric (the per-column rows are unpivoted from a single agg row), so
    * profiling a 100 TB table costs one scan, not one scan per column.
    * Distinct counts are exact; swap in approx_count_distinct when the
    * profile itself must stay sketch-sized. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val numeric = cols.filter(c => df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }).toSet
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        count(lit(1)).as(s"__rows_$c"),
        countDistinct(col(c)).as(s"__d_$c")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
        else
          Seq(lit(null).cast("double").as(s"__min_$c"),
            lit(null).cast("double").as(s"__max_$c")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val metricRows = cols.map(c => struct(
      lit(c).as("column_name"),
      (col(s"__rows_$c") - col(s"__n_$c")).as("n_null"),
      col(s"__d_$c").as("n_distinct"),
      col(s"__min_$c").as("min_num"),
      col(s"__max_$c").as("max_num")))
    one.select(col(s"__rows_${cols.head}").as("n_rows"),
        explode(array(metricRows: _*)).as("m"))
      .select(col("m.column_name").as("column_name"), col("n_rows"),
        col("m.n_null").as("n_null"), col("m.n_distinct").as("n_distinct"),
        col("m.min_num").as("min_num"), col("m.max_num").as("max_num"))
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

  /** MAD (median-absolute-deviation) robust outliers per group — the
    * quartile-free twin of [[iqrOutliers]] for heavy-tailed values where
    * the IQR itself is inflated by the outliers. Two grouped exact-median
    * passes (value, then |value − median|) shuffled only by the group
    * keys, with the per-group fences broadcast back. The 1.4826 normal
    * consistency factor is deliberately folded into `k` (pass
    * k = 3 × 1.4826 if you want "3 sigmas") so both engines compare
    * against the same single-literal multiple. Medians and fences are
    * 6dp-rounded BEFORE the comparison, same boundary discipline as
    * iqrOutliers. */
  def madOutliers(df: DataFrame, keys: Seq[String], value: String,
                  k: Double = 3.0): DataFrame = {
    val v = col(value)
    val med = df.groupBy(keys.map(col): _*)
      .agg(round(expr(s"percentile($value, 0.5)"), 6).as("med"),
        count(lit(1)).as("n"))
    val mad = df.join(broadcast(med), keys)
      .withColumn("__ad", abs(v - col("med")))
      .groupBy(keys.map(col): _*)
      .agg(round(expr("percentile(__ad, 0.5)"), 6).as("mad"))
    val fences = med.join(mad, keys)
      .withColumn("lo", round(col("med") - lit(k) * col("mad"), 6))
      .withColumn("hi", round(col("med") + lit(k) * col("mad"), 6))
    val outliers = df.join(broadcast(fences), keys)
      .filter(v < col("lo") || v > col("hi"))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_outliers"))
    fences.join(outliers, keys, "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .select((keys.map(col) ++ Seq(col("med"), col("mad"), col("lo"),
        col("hi"), col("n"), col("n_outliers"))): _*)
  }

  /** Shannon entropy (nats) of a categorical column's distribution per
    * group — the corpus-diversity / label-balance monitor: entropy of
    * `source` per language tells you when one crawl starts dominating a
    * slice. Two partial-combined aggregates — (keys, cat) counts, then
    * per-key Σ −p·ln p — shuffle key spaces |keys×cats| and |keys|, both
    * tiny regardless of row count. Each term is an exact-long IEEE
    * divide + ln; the cross-category sum is r6-rounded (same discipline
    * as [[psi]]: float addition order across categories is the only
    * engine-dependent bit). Also emits the category count and the
    * r6-rounded normalized entropy H/ln(k) (0 for k=1). */
  def entropy(df: DataFrame, keys: Seq[String], cat: String): DataFrame = {
    val counts = df.groupBy((keys.map(col) :+ col(cat)): _*)
      .agg(count(lit(1)).as("__n"))
    counts.groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("__t"), count(lit(1)).as("n_cats"),
        sum(col("__n").cast("double") * log(col("__n").cast("double")))
          .as("__snln"))
      // H = ln(T) − (Σ n·ln n)/T: one r6 at the end, algebraically equal
      // to −Σ p·ln p but with a single division (fewer float paths to
      // disagree on)
      .withColumn("entropy",
        round(log(col("__t").cast("double"))
          - col("__snln") / col("__t").cast("double"), 6))
      .withColumn("entropy_norm",
        when(col("n_cats") === 1, lit(0.0)).otherwise(
          round((log(col("__t").cast("double"))
            - col("__snln") / col("__t").cast("double"))
            / log(col("n_cats").cast("double")), 6)))
      .select((keys.map(col) ++ Seq(col("n_cats"),
        col("__t").as("n_rows"), col("entropy"), col("entropy_norm"))): _*)
  }

  /** Exact linearly-interpolated percentiles per group, one row per
    * (group, q) — SQL's percentile_cont. Spark's exact `percentile`
    * aggregate holds a per-group value-count map, so memory is
    * O(groups × distinct values): the right tool for bounded value domains
    * (prices, scores, durations); for unbounded high-cardinality domains
    * at 100 TB use the approx_percentile path (Frequency.quantiles /
    * approxQuantileBounds), which this op deliberately complements. */
  def exactPercentiles(df: DataFrame, keys: Seq[String], value: String,
                       qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1]: $qs")
    val qArray = qs.map(q => s"${q}D").mkString("array(", ", ", ")")
    // an all-NULL group yields a NULL percentile array; posexplode(NULL)
    // would emit nothing and silently DROP the group — substitute an
    // array of null values so the group survives with value_q = NULL
    val nullPs = array(qs.map(_ => lit(null).cast(DoubleType)): _*)
    df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($value, $qArray)").as("__ps"),
        count(lit(1)).as("n"))
      .select(keys.map(col) ++ Seq(col("n"),
        posexplode(coalesce(col("__ps"), nullPs))
          .as(Seq("__i", "value_q"))): _*)
      .withColumn("q", element_at(typedlit(qs), col("__i") + 1))
      .withColumn("value_q", round(col("value_q"), 6))
      .drop("__i")
      .select(keys.map(col) ++ Seq(col("q"), col("value_q"), col("n")): _*)
  }

  /** Fixed-range equal-width histogram per group: bin index, count, and bin
    * bounds. Bounds are CALLER-provided (no extra min/max scan) and rows
    * outside [lo, hi) clamp into the edge bins, so the result is one
    * partial-aggregated groupBy over (keys, bin) — a single shuffle whose
    * key space is |groups| × nbins regardless of input size. Pick lo/hi/
    * nbins so the bin width is a dyadic-friendly double (e.g. (100-0)/20)
    * and the floor() bin decision is bit-identical on any engine. */
  def histogram(df: DataFrame, keys: Seq[String], value: String,
                lo: Double, hi: Double, nbins: Int): DataFrame = {
    require(nbins > 0 && hi > lo, s"need hi > lo and nbins > 0")
    val width = (hi - lo) / nbins
    val v = col(value)
    df.filter(v.isNotNull)
      .withColumn("bin", binColumn(v, lo, hi, nbins))
      .groupBy((keys.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", round(lit(lo) + col("bin") * lit(width), 6))
      .withColumn("bin_hi", round(lit(lo) + (col("bin") + 1) * lit(width), 6))
  }

  /** THE clamped fixed-range bin expression — every grid in the repo
    * (histogram, PSI/JSD/KS, AUC bands, calibration, distribution
    * matching, the streaming windowed histogram) derives from this one
    * definition so the grids can never drift apart. Clamp on the DOUBLE
    * before floor/cast: an extreme outlier would overflow the int cast
    * (ANSI throws) if clamped only afterwards. (Clamp-then-floor and
    * floor-then-clamp agree on every input — floor is monotone and the
    * clamp bounds are integers — this form is canonical, not special.) */
  def binColumn(v: Column, lo: Double, hi: Double, nbins: Int): Column = {
    require(nbins > 0 && hi > lo, s"need hi > lo and nbins > 0")
    val width = (hi - lo) / nbins
    floor(least(lit((nbins - 1).toDouble),
      greatest(lit(0.0), (v - lit(lo)) / lit(width)))).cast("int")
  }

  /** Population Stability Index between two snapshots of a numeric column,
    * per group — the drift monitor retraining pipelines alert on
    * (rule of thumb: < 0.1 stable, > 0.25 major shift). Both snapshots
    * bin through the SAME clamped fixed-range grid as [[histogram]];
    * shares are Laplace-smoothed, p_i = (n_i + 1) / (N + nbins), so empty
    * bins never divide by zero and the shares are exact rationals of
    * integer counts — both engines form identical doubles before the
    * (p−q)·ln(p/q) terms. Cost: two histogram aggregates + a bin-grain
    * join — key space |groups| × nbins regardless of row counts. */
  def psi(a: DataFrame, b: DataFrame, keys: Seq[String], value: String,
          lo: Double, hi: Double, nbins: Int): DataFrame = {
    // the FULL bin grid per group, not just bins seen in a snapshot: with
    // Laplace smoothing a bin empty in BOTH snapshots still contributes
    // (1/(Na+k) − 1/(Nb+k))·ln(...) whenever the totals differ — dropping
    // those terms understates drift between different-sized snapshots
    smoothedPsiAgg(smoothedBinGrid(a, b, keys, value, lo, hi, nbins),
      keys, nbins)
  }

  /** [[psi]] over PRE-BINNED counts: `cur` carries (keys..., bin, n)
    * rows (e.g. a streaming windowed histogram, keyed by the window),
    * `ref` a fixed (bin, n) reference — every `cur` group scores
    * against the same reference. Same full-grid Laplace smoothing;
    * the reference is broadcast (nbins rows). This is the batch side
    * of streaming drift monitoring: the stream maintains the cheap
    * histogram state, PSI prices each window as it closes. */
  def psiFromBinned(cur: DataFrame, ref: DataFrame, keys: Seq[String],
                    nbins: Int): DataFrame = {
    val k = keys.map(col)
    val c = cur.select((k :+ col("bin") :+ col("n").as("__na")): _*)
    val r = broadcast(ref.select(col("bin"), col("n").as("__nb")))
    val ta = c.groupBy(k: _*).agg(sum(col("__na")).as("__ta"))
    val tb = r.agg(coalesce(sum(col("__nb")), lit(0L)).as("__tb"))
    val grid = ta.crossJoin(broadcast(tb))
      .withColumn("bin", explode(sequence(lit(0), lit(nbins - 1))))
    val joined = grid
      .join(c, keys :+ "bin", "left")
      .join(r, Seq("bin"), "left")
      .na.fill(0L, Seq("__na", "__nb"))
    smoothedPsiAgg(joined, keys, nbins)
  }

  private def smoothedPsiAgg(joined: DataFrame, keys: Seq[String],
                             nbins: Int): DataFrame = {
    val p = (col("__na") + lit(1.0)) / (col("__ta") + lit(nbins.toDouble))
    val q = (col("__nb") + lit(1.0)) / (col("__tb") + lit(nbins.toDouble))
    joined
      .withColumn("__term", (p - q) * log(p / q))
      .groupBy(keys.map(col): _*)
      .agg(round(sum(col("__term")), 6).as("psi"),
        sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
  }

  /** Jensen-Shannon divergence between two snapshots — PSI's bounded,
    * symmetric sibling (PSI is unbounded and explodes when a bin's
    * share → 0; JSD stays in [0, ln 2], so thresholds transfer across
    * features). Same clamped grid, full bin enumeration and Laplace
    * smoothing as [[psi]]:
    *   JSD = ½ Σ p·ln(2p/(p+q)) + q·ln(2q/(p+q))
    * with `jsd_norm` = JSD / ln 2 in [0, 1]. Identical cost shape:
    * two histogram aggregates + a |groups| × nbins join. */
  def jsDivergence(a: DataFrame, b: DataFrame, keys: Seq[String],
                   value: String, lo: Double, hi: Double,
                   nbins: Int): DataFrame = {
    val joined = smoothedBinGrid(a, b, keys, value, lo, hi, nbins)
    val p = (col("__na") + lit(1.0)) / (col("__ta") + lit(nbins.toDouble))
    val q = (col("__nb") + lit(1.0)) / (col("__tb") + lit(nbins.toDouble))
    val term = p * log(lit(2.0) * p / (p + q)) +
      q * log(lit(2.0) * q / (p + q))
    joined
      .withColumn("__term", term)
      .groupBy(keys.map(col): _*)
      .agg(round(sum(col("__term")) * lit(0.5), 6).as("jsd"),
        round(sum(col("__term")) * lit(0.5) / lit(math.log(2.0)), 6)
          .as("jsd_norm"),
        sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between two snapshots over
    * the binned grid: max over bin edges of |CDF_a − CDF_b| (exact for
    * the binned distributions — the caller's bin width sets the
    * resolution, same contract as [[histogram]]). Unsmoothed: each CDF
    * is a single divide of exact int64 cumulative counts, so the max
    * is over bit-identical doubles. The cumulative window runs over at
    * most `nbins` rows per group — never over the data. A side with no
    * rows has no CDF: ks is NULL there. */
  def ksStatistic(a: DataFrame, b: DataFrame, keys: Seq[String],
                  value: String, lo: Double, hi: Double,
                  nbins: Int): DataFrame = {
    val joined = smoothedBinGrid(a, b, keys, value, lo, hi, nbins)
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    joined
      .withColumn("__ca", sum(col("__na")).over(wCum))
      .withColumn("__cb", sum(col("__nb")).over(wCum))
      .withColumn("__d",
        abs(col("__ca").cast("double") / col("__ta").cast("double")
          - col("__cb").cast("double") / col("__tb").cast("double")))
      .groupBy(keys.map(col): _*)
      .agg(
        when(max(col("__ta")) === 0L || max(col("__tb")) === 0L, lit(null))
          .otherwise(round(max(col("__d")), 6)).as("ks"),
        sum(col("__na")).as("n_a"), sum(col("__nb")).as("n_b"))
  }

  /** Shared drift-grid builder: both snapshots histogrammed on the same
    * clamped fixed-range grid, full bin enumeration per group (bins
    * empty in both snapshots included — see psi's smoothing note),
    * missing counts zero-filled. Columns: keys, bin, __na, __nb, __ta,
    * __tb. */
  private def smoothedBinGrid(a: DataFrame, b: DataFrame, keys: Seq[String],
                              value: String, lo: Double, hi: Double,
                              nbins: Int): DataFrame = {
    val ha = histogram(a, keys, value, lo, hi, nbins)
      .select((keys.map(col) :+ col("bin") :+ col("n").as("__na")): _*)
    val hb = histogram(b, keys, value, lo, hi, nbins)
      .select((keys.map(col) :+ col("bin") :+ col("n").as("__nb")): _*)
    val totals = ha.groupBy(keys.map(col): _*)
      .agg(sum(col("__na")).as("__ta"))
      .join(hb.groupBy(keys.map(col): _*).agg(sum(col("__nb")).as("__tb")),
        keys, "full_outer")
      .na.fill(0L, Seq("__ta", "__tb"))
    totals.withColumn("bin", explode(sequence(lit(0), lit(nbins - 1))))
      .join(ha, keys :+ "bin", "left").join(hb, keys :+ "bin", "left")
      .na.fill(0L, Seq("__na", "__nb"))
  }

  /** Winsorization: clip `value` to its per-group [pLo, pHi] exact
    * percentile fences — the outlier treatment that keeps rows (unlike the
    * Tukey drop in iqrOutliers) while bounding tail influence. Fences are
    * rounded to 6 dp BEFORE clamping (same discipline as iqrOutliers) so
    * the clip decision is engine-independent; one small fence aggregate
    * broadcast back over the data, no second shuffle of the corpus. */
  def winsorize(df: DataFrame, keys: Seq[String], value: String,
                pLo: Double = 0.01, pHi: Double = 0.99,
                out: String = "value_w"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad bounds [$pLo, $pHi]")
    val fences = df.groupBy(keys.map(col): _*).agg(
        round(expr(s"percentile($value, ${pLo}D)"), 6).as("fence_lo"),
        round(expr(s"percentile($value, ${pHi}D)"), 6).as("fence_hi"))
    df.join(broadcast(fences), keys)
      // least/greatest SKIP nulls, so a bare clip would fabricate the low
      // fence for a NULL measurement — preserve NULL explicitly
      .withColumn(out,
        when(col(value).isNull, lit(null).cast(DoubleType))
          .otherwise(least(greatest(col(value), col("fence_lo")),
            col("fence_hi"))))
  }

  /** Per-group two-feature OLS (y ~ b0 + b1·x1 + b2·x2) in closed form:
    * ONE partial-combined aggregate collects the nine normal-equation sums
    * (all cast to double first so both engines sum the same type; each sum
    * 4dp-rounded so partial-aggregation order can't flip a bit), then
    * Cramer's rule combines those identical doubles with a fixed
    * expression tree — distributed regression as pure aggregation, no
    * iterations, no driver math, parallelism = |groups|. Rows with any
    * NULL input drop; singular groups (det 0, e.g. collinear features)
    * yield NULL coefficients. */
  def olsTwoFeature(df: DataFrame, keys: Seq[String], y: String,
                    x1: String, x2: String): DataFrame = {
    val (cy, c1, c2) = (col(y).cast(DoubleType), col(x1).cast(DoubleType),
      col(x2).cast(DoubleType))
    val s = df
      .filter(cy.isNotNull && c1.isNotNull && c2.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(c1), 4).as("sx1"), round(sum(c2), 4).as("sx2"),
        round(sum(cy), 4).as("sy"), round(sum(cy * cy), 4).as("syy"),
        round(sum(c1 * c1), 4).as("sx11"), round(sum(c2 * c2), 4).as("sx22"),
        round(sum(c1 * c2), 4).as("sx12"),
        round(sum(c1 * cy), 4).as("sx1y"), round(sum(c2 * cy), 4).as("sx2y"))
    val (n, sx1, sx2, sy) = (col("n"), col("sx1"), col("sx2"), col("sy"))
    val (sx11, sx22, sx12) = (col("sx11"), col("sx22"), col("sx12"))
    val (sx1y, sx2y, syy) = (col("sx1y"), col("sx2y"), col("syy"))
    val det = n * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val b0n = sy * (sx11 * sx22 - sx12 * sx12) -
      sx1 * (sx1y * sx22 - sx12 * sx2y) + sx2 * (sx1y * sx12 - sx11 * sx2y)
    val b1n = n * (sx1y * sx22 - sx12 * sx2y) -
      sy * (sx1 * sx22 - sx12 * sx2) + sx2 * (sx1 * sx2y - sx1y * sx2)
    val b2n = n * (sx11 * sx2y - sx1y * sx12) -
      sx1 * (sx1 * sx2y - sx1y * sx2) + sy * (sx1 * sx12 - sx11 * sx2)
    val d = nullif(det, lit(0.0))
    // fitted-OLS identities on the same sums: SSE = Syy − b·[Sy Sx1y Sx2y],
    // SST = Syy − Sy²/n, R² = 1 − SSE/SST (NULL for constant y)
    val (b0, b1, b2) = (b0n / d, b1n / d, b2n / d)
    val sse = syy - b0 * sy - b1 * sx1y - b2 * sx2y
    val sst = nullif(syy - sy * sy / n, lit(0.0))
    s.select(keys.map(col) ++ Seq(n.as("n"),
      round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
      round(lit(1.0) - sse / sst, 6).as("r2")): _*)
  }

  /** Per-group z-score standardization — the feature-scaling pass before
    * training. Group mean/stddev are computed once (4dp-rounded sum /
    * non-null count, 6dp-rounded stddev — the cross-engine discipline used
    * everywhere in this repo) and broadcast back; z = (x − mean) / stddev
    * combines those already-identical doubles, so the standardized column
    * is bit-identical across engines. Zero-variance groups yield NULL z
    * (division by nullif(0)); NULL inputs stay NULL. One small aggregate +
    * one narrow join — the corpus shuffles zero times. */
  def standardize(df: DataFrame, keys: Seq[String], value: String,
                  out: String = "z"): DataFrame = {
    val stats = df.groupBy(keys.map(col): _*).agg(
      (round(sum(col(value)), 4) / nullif(count(col(value)), lit(0L)))
        .as("__mean"),
      round(Clean.nanToNull(stddev_samp(col(value))), 6).as("__sd"))
    df.join(broadcast(stats), keys)
      .withColumn(out, (col(value) - col("__mean"))
        / nullif(col("__sd"), lit(0.0)))
      .drop("__mean", "__sd")
  }

  /** Key-skew audit per group: the "will this key explode my shuffle?"
    * diagnostic a 100 TB join/aggregation plan needs BEFORE it runs —
    * per-key row counts summarized as max/top-share/exact percentiles
    * plus the Gini coefficient of the count distribution (0 = uniform
    * keys, → 1 = one key owns everything; > ~0.6 is the "salt this
    * join" signal).
    *
    * Gini uses the sorted identity G = 2·Σ i·c_(i) / (n·Σc) − (n+1)/n
    * with ascending ranks i. The rank is the banded two-pass pattern
    * (same as [[Eval.binaryAuc]]'s cumulative): counts band by
    * length(bin(c)) — an exact integer log2 both engines compute
    * identically — band totals cumulate over ≤ 64 rows per group, and
    * the in-band window only ever sees one band's keys, so a group
    * with a billion distinct keys still splits across 64 tasks. Σ i·c
    * and every percentile cut are exact int64; the three ratios are
    * single IEEE divides. Ties in c rank arbitrarily inside a band —
    * Σ i·c over a tied block and rank-threshold percentile cuts are
    * both tie-order invariant, so outputs stay deterministic.
    *
    * Int64 envelope: Σ i·c ≤ n_keys·n_rows — past ~10⁹ keys × 10⁹ rows
    * shard the audit by key-hash fold. */
  def keySkew(df: DataFrame, keys: Seq[String], key: String): DataFrame = {
    val k = keys.map(col)
    val counts = df.groupBy((k :+ col(key).as("__k")): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__band", length(bin(col("__c"))))
    val bandTotals = counts.groupBy((k :+ col("__band")): _*)
      .agg(count(lit(1)).as("__bn"))
    val wOff = Window.partitionBy(k: _*).orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("__off", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
      .drop("__bn")
    val wIn = Window.partitionBy((k :+ col("__band")): _*)
      .orderBy(col("__c"), col("__k").cast("string"))
    val ranked = counts.join(broadcast(offsets), keys :+ "__band")
      .withColumn("__i", col("__off") + row_number().over(wIn))
    val totals = counts.groupBy(k: _*)
      .agg(count(lit(1)).as("n_keys"), sum(col("__c")).as("n_rows"),
        max(col("__c")).as("max_key_rows"))
    // ceil(p·n) on positive ints: (p_num·n + p_den − 1) DIV p_den
    def cutAt(num: Int, den: Int): Column =
      min(when(col("__i") >=
        expr(s"($num * n_keys + ${den - 1}) DIV $den"), col("__c")))
    ranked.join(broadcast(totals), keys.toSeq)
      .groupBy((k ++ Seq(col("n_keys"), col("n_rows"),
        col("max_key_rows"))): _*)
      .agg(
        sum(col("__i") * col("__c")).as("__sic"),
        cutAt(1, 2).as("p50_rows"),
        cutAt(9, 10).as("p90_rows"),
        cutAt(99, 100).as("p99_rows"))
      .withColumn("mean_key_rows",
        col("n_rows").cast("double") / col("n_keys").cast("double"))
      .withColumn("top1_share",
        col("max_key_rows").cast("double") / col("n_rows").cast("double"))
      .withColumn("gini",
        when(col("n_keys") === 1L, lit(0.0)).otherwise(
          (lit(2L) * col("__sic")).cast("double")
            / (col("n_keys") * col("n_rows")).cast("double")
            - (col("n_keys") + lit(1L)).cast("double")
              / col("n_keys").cast("double")))
      .drop("__sic")
  }

  /** ABC / Pareto classification per group: rank each key by its measure
    * total (descending) and class it by the cumulative share INCLUDING
    * itself — A while cum ≤ aPct%, B while cum ≤ bPct%, else C. The
    * warehouse "which 20% of parts carry 80% of revenue" rollup, as a
    * distributed classification instead of a report.
    *
    * The descending cumulative is the banded two-pass pattern
    * ([[keySkew]] / Eval.binaryAuc): per-key totals band by
    * length(bin(m)) — an exact integer log2 — band measure-totals
    * cumulate over ≤ 64 rows per group, and the in-band running sum only
    * ever sees one band's keys, so a group with a billion keys never
    * funnels through one unpartitioned window. `measure` must be an
    * exact NON-NEGATIVE integer column (cents discipline): the class
    * decision is then the all-integer compare cum·100 ≤ pct·total — no
    * float share, no rounding boundary, bit-identical on any engine.
    * A key whose measures are all NULL totals to 0 (coalesce), so every
    * input key appears in the output — classed C unless the whole group
    * totals 0 (then cum·100 ≤ 0·pct holds and everything is A); without
    * the coalesce a NULL total would NULL its band and the inner band
    * join would silently drop the key.
    * Ties (equal totals) order by the key value ascending, a total order
    * after the per-key rollup. Int64 envelope: cum·100 needs total <
    * 9.2e16 measure units — shift to coarser units past that. */
  def abcClassify(df: DataFrame, keys: Seq[String], key: String,
                  measure: Column, aPct: Int = 80, bPct: Int = 95)
      : DataFrame = {
    val k = keys.map(col)
    val totals = df.groupBy((k :+ col(key)): _*)
      .agg(coalesce(sum(measure), lit(0L)).as("measure_sum"))
      .withColumn("__band", length(bin(col("measure_sum"))))
    val bandTotals = totals.groupBy((k :+ col("__band")): _*)
      .agg(sum(col("measure_sum")).as("__bm"))
    val wOff = Window.partitionBy(k: _*).orderBy(col("__band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandTotals
      .withColumn("__off", coalesce(sum(col("__bm")).over(wOff), lit(0L)))
      .drop("__bm")
    val wIn = Window.partitionBy((k :+ col("__band")): _*)
      .orderBy(col("measure_sum").desc, col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grand = totals.groupBy(k: _*)
      .agg(sum(col("measure_sum")).as("__tot"))
    val joined =
      if (keys.isEmpty)
        totals.join(broadcast(offsets), Seq("__band"))
          .crossJoin(broadcast(grand))
      else
        totals.join(broadcast(offsets), keys :+ "__band")
          .join(broadcast(grand), keys.toSeq)
    joined
      .withColumn("cum_sum",
        col("__off") + sum(col("measure_sum")).over(wIn))
      .withColumn("abc_class",
        when(col("cum_sum") * 100 <= col("__tot") * aPct, "A")
          .when(col("cum_sum") * 100 <= col("__tot") * bPct, "B")
          .otherwise("C"))
      .drop("__band", "__off", "__tot")
  }

  /** Per-group categorical mode with a deterministic tie rule (highest
    * count, then smallest value). Two aggregations — (keys, value) counts,
    * then max_by over a (count, -value) struct — both partial-aggregated
    * map-side; no window, no sort, parallelism independent of group count. */
  def modePerGroup(df: DataFrame, keys: Seq[String],
                   value: String): DataFrame = {
    val counts = df.groupBy((keys :+ value).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // min_by over (-count, value): negation happens on the COUNT (always
    // numeric), so the value column itself only needs to be orderable —
    // strings and dates work; negating the value would throw under ANSI
    counts.groupBy(keys.map(col): _*)
      .agg(
        min_by(col(value), struct((-col("__n")).as("a"), col(value).as("b")))
          .as("mode_value"),
        max(col("__n")).as("mode_n"),
        count(lit(1)).as("n_distinct"))
  }

  /** Autocorrelation function at lags 1..`maxLag` of a fixed-point series
    * per key: Pearson r between (x_t, x_{t+k}) pairs — the seasonality /
    * persistence diagnostic behind lag-feature selection (which lags of a
    * metric are worth feeding a model) and sampling-interval choice.
    *
    * Determinism: the series is integer (`cents`), so the five sufficient
    * statistics per (key, lag) — Σx, Σy, Σxy, Σx², Σy² over the lag-k
    * pair set — are EXACT int64s; r is one fixed IEEE tree over them
    * (n·Σxy − Σx·Σy) / √((n·Σx²−Σx²)·(n·Σy²−Σy²)), zero-variance → NULL
    * via nullif. No float accumulates across rows anywhere.
    *
    * Scale shape: ONE window pass per key (maxLag lead columns computed
    * under the same sort), posexplode to (lag, pair) rows, then a
    * map-side-partial groupBy on (key, lag) — key-partitioned
    * throughout, never a global sort. Int64 envelope: Σx·y ≤ 9.2e18
    * caps |cents|·√(rows-per-key) at ~3e9 — centuries of headroom for
    * 2-decimal metrics. */
  def autocorrelation(df: DataFrame, key: String, order: Seq[Column],
                      cents: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"maxLag out of range: $maxLag")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(order: _*)
    val leads = (1 to maxLag).map(k =>
      lead(col("__x"), k).over(w).as(s"__y$k"))
    val stacked = df
      .filter(cents.isNotNull)
      .select((col(key) +: order :+ cents.as("__x")): _*)
      // window exprs can't sit inside a generator: one select computes all
      // maxLag leads under a single window sort, the next explodes them
      .select((Seq(col(key), col("__x")) ++ leads): _*)
      .select(col(key), col("__x"),
        posexplode(array((1 to maxLag).map(k => col(s"__y$k")): _*))
          .as(Seq("__p", "__y")))
      .filter(col("__y").isNotNull)
    stacked
      .groupBy(col(key), (col("__p") + 1).cast("int").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .select(col(key), col("lag"), col("n_pairs"),
        round((col("n_pairs").cast("double") * col("__sxy")
            - col("__sx").cast("double") * col("__sy"))
          / nullif(sqrt((col("n_pairs").cast("double") * col("__sxx")
              - col("__sx").cast("double") * col("__sx"))
            * (col("n_pairs").cast("double") * col("__syy")
              - col("__sy").cast("double") * col("__sy"))), lit(0.0)),
          6).as("acf"))
  }

  /** Cross-correlation (lead-lag) between two keyed series: Pearson r of
    * (A at bucket t, B at bucket t+k·Δ) for every lag k in −maxLag..maxLag
    * — positive-lag peaks mean A LEADS B by k buckets (the "which metric
    * moves first" diagnostic; lag 0 is plain contemporaneous correlation).
    *
    * Series construction is division-free: each series value is the EXACT
    * int64 bucket sum of `cents`; only aligned bucket pairs (both series
    * present) enter, so gaps shrink n_pairs instead of fabricating zeros.
    * Same determinism contract as [[autocorrelation]]: exact int64
    * sufficient statistics per lag, r as one IEEE tree, zero-variance →
    * NULL.
    *
    * Scale shape: two bucket aggregations (input-sized, map-side
    * partial), then the B series — already bucket-count-sized —
    * replicates (2·maxLag+1)× via posexplode and equi-joins A on the
    * shifted bucket. The join is bucket-count-sized on BOTH sides; the
    * raw input is never pair-joined. */
  def crossCorrelation(df: DataFrame, key: String, ts: String,
                       cents: Column, bucketSeconds: Long,
                       keyA: String, keyB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 512, s"maxLag out of range: $maxLag")
    val bucket = (floor(unix_timestamp(col(ts)) / lit(bucketSeconds))
      .cast("long") * bucketSeconds).as("bucket")
    def series(k: String) = df
      .filter(col(key) === k && cents.isNotNull)
      .groupBy(bucket).agg(sum(cents).as("__v"))
    val a = series(keyA).select(col("bucket"), col("__v").as("__x"))
    val lags = (-maxLag to maxLag).map(k => lit(k))
    val bShift = series(keyB)
      .select(col("bucket"), col("__v").as("__y"),
        explode(array(lags: _*)).as("lag"))
      .select((col("bucket") - col("lag") * bucketSeconds).as("bucket"),
        col("__y"), col("lag"))
    a.join(bShift, "bucket")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .select(col("lag"), col("n_pairs"),
        round((col("n_pairs").cast("double") * col("__sxy")
            - col("__sx").cast("double") * col("__sy"))
          / nullif(sqrt((col("n_pairs").cast("double") * col("__sxx")
              - col("__sx").cast("double") * col("__sx"))
            * (col("n_pairs").cast("double") * col("__syy")
              - col("__sy").cast("double") * col("__sy"))), lit(0.0)),
          6).as("xcorr"))
  }

  /** Chi-square contingency audit of two categorical columns: per-cell
    * observed count, independence expectation e = (row·col)/N, and the
    * cell's chi-square contribution (o − e)²/e. Per-CELL output by
    * design: the summed statistic would accumulate doubles in engine
    * order (non-deterministic); the consumer sums the 6-decimal terms
    * (or reads off the fat cells directly — the usual use).
    *
    * Exact-count arithmetic: o, row, col, N are int64s off ONE
    * contingency aggregation (cell-sized thereafter); e and the term are
    * a single IEEE tree per cell. */
  def chiSquare(df: DataFrame, rowKey: Column, colKey: Column): DataFrame = {
    val cells = df.groupBy(rowKey.as("row_key"), colKey.as("col_key"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("row_key").agg(sum(col("o")).as("__rt"))
    val colTot = cells.groupBy("col_key").agg(sum(col("o")).as("__ct"))
    val tot = cells.agg(sum(col("o")).as("__n"))
    val e = col("__rt").cast("double") * col("__ct") / col("__n")
    cells.join(broadcast(rowTot), "row_key")
      .join(broadcast(colTot), "col_key")
      .crossJoin(broadcast(tot))
      .select(col("row_key"), col("col_key"), col("o"),
        round(e, 6).as("expected"),
        round((col("o") - e) * (col("o") - e) / e, 6).as("chi2_term"))
  }

  /** Exact weighted quantiles per group — the lower weighted quantile:
    * the smallest value v whose cumulative weight reaches q·W (e.g. the
    * volume-weighted median price: the price at which the middle shipped
    * unit traded). Quantiles arrive as PERMILLE integers (500 = median),
    * so the threshold test is exact int64 arithmetic — cum·1000 ≥ pm·W —
    * with no float boundary anywhere; the whole answer replays
    * bit-for-bit on any engine.
    *
    * Scale shape: weights first collapse onto DISTINCT values (one
    * input-sized map-side-partial shuffle). The cumulative weight over
    * distinct values is then the banded two-pass pattern ([[keySkew]] /
    * [[abcClassify]]): for continuous values |distinct| ≈ |rows|, so a
    * per-group running-sum window would funnel each group through ONE
    * sorting task — instead values band into 4096 uniform cells over the
    * group's exact (min, max) (order-preserving by construction; unlike
    * length(bin(·)) it bands doubles and negatives), band totals cumulate
    * over ≤ 4096 rows per group, and the in-band running sum only ever
    * sees one cell's values. Band PLACEMENT never touches the answer:
    * __cum is the same exact int64 for every order-preserving banding —
    * but the banding must be CONSISTENT across its two uses (offsets and
    * in-band sums), and Catalyst may evaluate the band subtree twice with
    * differently-pruned plans, so it is built ONLY from merge-order-
    * invariant aggregates (min/max/sum) and exact arithmetic: every
    * re-evaluation reproduces it bit-identically (an approx_percentile
    * banding, balanced under any skew, fails exactly this way — two
    * sketch evaluations disagree and the band join silently drops rows).
    * Values concentrated in ≪ (max−min)/4096 of the range degrade toward
    * one hot cell (the range-outlier pathology) — the documented limit of
    * data-independent cuts. Non-numeric value columns keep the
    * single-window path.
    *
    * Candidate-band pruning: each permille's answer lives in exactly ONE
    * band — the first whose cumulative END weight crosses q·W (cumulative
    * weight is monotone across bands, so earlier bands can't reach the
    * threshold and later bands only hold larger values that min() would
    * discard). The crossing band is found on the BAND TOTALS (≤ 4096 rows
    * per group), and only rows of crossing bands — ≤ |permille| bands per
    * group, ~|distinct|/4096 rows each — enter the in-band running-sum
    * window or meet a permille row. The second pass thus shrinks from
    * |distinct|·|permille| exploded rows to |candidate bands|·band-width,
    * and the big band join becomes a broadcast of a permille-sized list.
    * Int64 envelope: W·1000 ≤ 9.2e18 → total group weight ≤ 9.2e15. */
  def weightedQuantiles(df: DataFrame, keys: Seq[String], value: Column,
                        weight: Column, permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 1 && p <= 1000),
      s"permille quantiles must be in [1,1000]: $permille")
    val grpCols = keys.map(col)
    val dv = df
      .filter(weight > 0 && value.isNotNull)
      .groupBy((grpCols :+ value.as("__v")): _*)
      .agg(sum(weight.cast("long")).as("__w"))
    val numericValue = dv.schema("__v").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    if (numericValue) {
        val nBands = 4096
        val vType = dv.schema("__v").dataType
        val isFloat = vType == DoubleType ||
          vType == org.apache.spark.sql.types.FloatType
        // NaN sorts greatest in Spark: keep it out of the bounds (max
        // would poison the whole group's range to NaN) and pin it to the
        // last band so the in-band __v ordering still places it last
        val vClean =
          if (isFloat) when(isnan(col("__v")), lit(null)).otherwise(col("__v"))
          else col("__v")
        val bounds = dv.groupBy(grpCols: _*)
          .agg(sum(col("__w")).as("__tot"),
            min(vClean).cast(DoubleType).as("__lo"),
            max(vClean).cast(DoubleType).as("__hi"))
        // unhinted keyed join: an explicit broadcast() would collect one
        // row PER GROUP to the driver regardless of cardinality — a
        // high-cardinality key (per-user quantiles) would OOM or hit the
        // broadcast cap on inputs the windowed path handled. AQE
        // broadcasts when bounds is actually small; the grouped (un-keyed
        // is one row — that crossJoin-broadcast stays) case shuffles
        // correctly otherwise.
        val withBounds =
          if (keys.isEmpty) dv.crossJoin(broadcast(bounds))
          else dv.join(bounds, keys)
        // every step weakly monotone in __v (double cast, subtract/divide
        // by a positive constant under IEEE round-to-nearest, ×2^12 exact,
        // floor), so the banding is order-preserving
        val vd = col("__v").cast(DoubleType)
        val rangeCell = least(lit(nBands - 1),
          floor((vd - col("__lo")) / (col("__hi") - col("__lo")) * nBands))
          .cast("int")
        val cell = when(col("__hi") <= col("__lo"), lit(0)).otherwise(rangeCell)
        val bandExpr =
          if (isFloat) when(isnan(col("__v")), lit(nBands - 1)).otherwise(cell)
          else cell
        val banded = withBounds.withColumn("__band", bandExpr)
          .drop("__lo", "__hi")
        val bandTotals = banded.groupBy((grpCols :+ col("__band")): _*)
          .agg(sum(col("__w")).as("__bw"), min(col("__tot")).as("__bt"))
        val wOff = Window.partitionBy(grpCols: _*).orderBy(col("__band"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val withOff = bandTotals
          .withColumn("__off", coalesce(sum(col("__bw")).over(wOff), lit(0L)))
        // crossing band per permille: the unique band with
        // __off·1000 < pm·W ≤ (__off+__bw)·1000 (occupied bands only, so
        // __bw > 0 and exactly one band satisfies the half-open interval;
        // pm ≤ 1000 guarantees the last band catches pm·W = 1000·W). The
        // explode multiplies ≤ 4096 band rows per group, never values.
        val cands = withOff
          .select((grpCols ++ Seq(col("__band"), col("__off"), col("__bw"),
            col("__bt"),
            explode(array(permille.map(lit): _*)).as("permille"))): _*)
          .filter(col("permille") * col("__bt") > col("__off") * 1000L &&
            col("permille") * col("__bt") <=
              (col("__off") + col("__bw")) * 1000L)
        val candBands = cands
          .select((grpCols ++ Seq(col("__band"), col("__off"))): _*)
          .distinct()
        val joinKeys = (keys :+ "__band").toSeq
        // unhinted joins: candBands/cands are |groups|·|permille|-sized —
        // AQE broadcasts them when small, but an explicit broadcast()
        // would collect rows per GROUP to the driver, which a
        // high-cardinality key (per-user quantiles) must not do. The
        // in-band window only ever sees crossing-band rows.
        val wIn = Window.partitionBy((grpCols :+ col("__band")): _*)
          .orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val inBand = banded.join(candBands, joinKeys)
          .withColumn("__cum", col("__off") + sum(col("__w")).over(wIn))
        inBand
          .join(cands.select((grpCols ++ Seq(col("__band"),
            col("permille"))): _*), joinKeys)
          .filter(col("__cum") * 1000L >= col("permille") * col("__tot"))
          .groupBy((grpCols :+ col("permille")): _*)
          .agg(min(col("__v")).as("value_q"),
            min(col("__tot")).as("total_weight"))
      } else {
        val wCum = Window.partitionBy(grpCols: _*).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wTot = Window.partitionBy(grpCols: _*)
        dv.withColumn("__cum", sum(col("__w")).over(wCum))
          .withColumn("__tot", sum(col("__w")).over(wTot))
          .select((grpCols ++ Seq(col("__v"), col("__cum"), col("__tot"),
            explode(array(permille.map(lit): _*)).as("permille"))): _*)
          .filter(col("__cum") * 1000L >= col("permille") * col("__tot"))
          .groupBy((grpCols :+ col("permille")): _*)
          .agg(min(col("__v")).as("value_q"),
            min(col("__tot")).as("total_weight"))
      }
  }

  /** Referential-integrity audit: for each declared (child, fkCol) →
    * (parent, pkCol) relation, the child row count, the count of rows
    * whose FK value has NO parent (orphans), and the NULL-FK count — the
    * one-page data-contract report a pipeline runs before trusting a new
    * drop. NULL FKs are reported separately, not as orphans (SQL
    * semantics: NULL never matches, but it's a different defect).
    *
    * Scale shape: per relation, orphans = one left_anti join of the
    * child's DISTINCT FK values against the parent's DISTINCT keys
    * (both sides collapse to key-cardinality before the join), then the
    * orphan VALUES map back to child counts via one more distinct-sized
    * join. The child table is scanned once per relation, aggregated
    * immediately — nothing row-level ever crosses a join. */
  def fkAudit(relations: Seq[(String, DataFrame, String, String, DataFrame,
    String)]): DataFrame = {
    require(relations.nonEmpty, "no relations declared")
    relations.map { case (name, child, fkCol, pkName, parent, pkCol) =>
      val counts = child.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(fkCol).isNull, 1L).otherwise(0L)).as("n_null_fk"))
      val fkCounts = child.filter(col(fkCol).isNotNull)
        .groupBy(col(fkCol).as("__fk")).agg(count(lit(1)).as("__n"))
      val orphans = fkCounts
        .join(parent.select(col(pkCol).as("__fk")).distinct(),
          Seq("__fk"), "left_anti")
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_orphans"),
          count(lit(1)).as("n_orphan_values"))
      counts.crossJoin(orphans)
        .select(lit(name).as("relation"), lit(pkName).as("parent"),
          col("n_rows"), col("n_null_fk"), col("n_orphans"),
          col("n_orphan_values"))
    }.reduce(_ unionAll _)
  }

  /** Ratio-to-parent rollup: child aggregate, its parent total, and the
    * child's share — the "nation's % of region revenue" contribution
    * report. ONE grouped aggregation on (parent, child) then a window
    * sum partitioned by the parent keys (parent-group-count-sized state,
    * no second shuffle of raw data); with an exact integral `measure`
    * the share is a single IEEE divide of exact longs — deterministic
    * unrounded. */
  def shareOfParent(df: DataFrame, parentKeys: Seq[String],
                    childKeys: Seq[String], measure: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(parentKeys.map(col): _*)
    df.groupBy((parentKeys ++ childKeys).map(col): _*)
      .agg(sum(measure).as("m"))
      .withColumn("parent_m", sum(col("m")).over(w))
      .withColumn("share",
        col("m").cast("double") / col("parent_m").cast("double"))
  }

  /** Benford first-digit audit of a positive fixed-point measure: observed
    * leading-digit distribution vs Benford's log10(1 + 1/d) expectation,
    * with the per-digit chi-square contribution (n_d − N·p_d)² / (N·p_d).
    * Fabricated or truncated numeric columns jump out as a fat chi2_term.
    *
    * `cents` must be a positive integer column (fixed-point the measure
    * first — integer leading-digit extraction via the decimal string is
    * engine-exact, where float log10-based extraction is not). One
    * 9-row aggregate: map-side partial on 9 digit groups, no skew.
    * log10 appears only in the expectation (both engines' libm agree to
    * well under the r6 cut). */
  def benford(df: DataFrame, cents: Column): DataFrame = {
    val digits = df
      .filter(cents > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("__tot"))
    // (n − t)·(n − t)/t with t = N·p_d spelled as explicit multiplication —
    // pow(x, 2) is not guaranteed to equal x·x in the last ulp cross-libm
    val pB = log10(lit(1.0) + lit(1.0) / col("digit"))
    val t = col("__tot") * pB
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("__tot"), 6).as("p_obs"),
        round(pB, 6).as("p_benford"),
        round((col("n") - t) * (col("n") - t) / t, 6).as("chi2_term"))
  }
}

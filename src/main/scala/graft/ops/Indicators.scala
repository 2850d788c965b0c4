package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructField, StructType}

/**
 * Technical-indicator analytics over per-key ordered series — the domain
 * layer the reference's stock pipeline declares but never ships (its
 * warehouse DDL and dashboards stop at MA/volatility; reference:
 * src/airflow/dags/scripts/stock_analytics_processor.py:126-137 computes
 * only moving averages and rolling stddev). Bollinger bands, RSI, VWAP,
 * OBV, stochastic oscillator, drawdown are all single-Window-node frames
 * over the same per-key sort; EMA/MACD is the one genuinely recursive
 * indicator and runs as a sorted per-partition scan (secondary sort).
 *
 * Scale notes:
 *  - Every windowed indicator here shares ONE shuffle (partition by key) and
 *    ONE in-partition sort; adding indicator columns is free once the series
 *    is sorted. Key cardinality is the parallelism lever (symbols, not a
 *    constant).
 *  - Cross-engine float discipline: derived quantities are built from
 *    already-exact or already-rounded components (sums rounded at 4dp before
 *    dividing, stddev rounded at 6dp before band math), so an oracle engine
 *    computing the same expression tree gets bit-identical doubles.
 */
object Indicators {

  private def cum(w: org.apache.spark.sql.expressions.WindowSpec) =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Exact cross-engine frame mean: round the sum at 4dp, then divide by the
    * non-null count (same trick as SparkEntry.exactAvg, windowed). */
  private def frameAvg(c: Column, w: org.apache.spark.sql.expressions.WindowSpec)
      : Column =
    round(sum(c).over(w), 4) / nullif(count(c).over(w), lit(0L))

  /** Bollinger bands over a trailing `n`-row frame per key: mid = frame mean,
    * upper/lower = mid ± k·stddev, %B = position of the price inside the
    * band. stddev is rounded at 6dp BEFORE the band arithmetic so both
    * engines combine identical doubles; 1-row frames give NULL bands (sample
    * stddev undefined), zero-width bands give NULL %B. */
  def bollinger(df: DataFrame, key: String, order: Seq[String], value: String,
                n: Int = 20, k: Double = 2.0): DataFrame = {
    val w = WindowAnalytics.keyFrame(key, order)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.select(col("*"),
        frameAvg(col(value), w).as("bb_ma"),
        round(Clean.nanToNull(stddev_samp(col(value)).over(w)), 6).as("_sd"))
      .select(col("*"),
        (col("bb_ma") + lit(k) * col("_sd")).as("bb_upper"),
        (col("bb_ma") - lit(k) * col("_sd")).as("bb_lower"))
      .withColumn("pct_b",
        (col(value) - col("bb_lower"))
          / nullif(col("bb_upper") - col("bb_lower"), lit(0.0)))
      .drop("_sd")
  }

  /** Cutler's RSI (SMA-smoothed relative strength) over a trailing `n`-row
    * frame: gain/loss split of the 1-step price diff, frame means of each,
    * RSI = 100·gain/(gain+loss). The first row per key has no diff and is
    * excluded from both frame means (NULL-skipping count); an all-flat frame
    * (gain+loss = 0) yields NULL rather than the 0/0 convention. Wilder's
    * recursive smoothing is deliberately NOT used here — see withEmaMacd for
    * the recursive machinery. */
  def rsi(df: DataFrame, key: String, order: Seq[String], value: String,
          n: Int = 14): DataFrame = {
    val wOrd = WindowAnalytics.keyFrame(key, order)
    val frame = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    // greatest() ignores NULLs in Spark but not in every oracle engine:
    // guard the first-row NULL diff explicitly so semantics are portable
    df.select(col("*"),
        (col(value) - lag(col(value), 1).over(wOrd)).as("_d"))
      .select(col("*"),
        when(col("_d").isNotNull, greatest(col("_d"), lit(0.0))).as("_gain"),
        when(col("_d").isNotNull, greatest(-col("_d"), lit(0.0))).as("_loss"))
      .select(col("*"),
        frameAvg(col("_gain"), frame).as("_ag"),
        frameAvg(col("_loss"), frame).as("_al"))
      .withColumn(s"rsi_$n",
        lit(100.0) * col("_ag") / nullif(col("_ag") + col("_al"), lit(0.0)))
      .drop("_d", "_gain", "_loss", "_ag", "_al")
  }

  /** Intraday VWAP (cumulative within each (key, trading day)) plus OBV
    * (on-balance volume: cumulative signed volume per key). VWAP divides a
    * 4dp-rounded cumulative notional by the EXACT integer cumulative volume;
    * OBV is pure integer arithmetic (sign·volume cumsum), so both are
    * engine-exact. The first row per key has no diff → contributes nothing
    * to OBV (coalesced to 0). */
  def vwapObv(df: DataFrame, key: String, ts: String, order: Seq[String],
              value: String, volume: Column): DataFrame = {
    val wOrd = WindowAnalytics.keyFrame(key, order)
    val wDay = cum(Window.partitionBy(col(key), to_date(col(ts)))
      .orderBy(order.map(col): _*))
    val wKey = cum(wOrd)
    df.select(col("*"),
        (col(value) - lag(col(value), 1).over(wOrd)).as("_d"))
      .select(col("*"),
        (round(sum(col(value) * volume).over(wDay), 4)
          / nullif(sum(volume).over(wDay), lit(0L))).as("vwap"),
        coalesce(
          sum(signum(col("_d")).cast("long") * volume).over(wKey),
          lit(0L)).as("obv"))
      .drop("_d")
  }

  /** Stochastic oscillator: %K = position of the price inside the trailing
    * `n`-row Donchian channel (min/max — exact, no float accumulation),
    * %D = `d`-row frame mean of %K. Zero-width channels yield NULL %K and
    * are skipped by %D's NULL-skipping mean. Emits don_lo/don_hi too (the
    * Donchian channel is an indicator in its own right). */
  def stochastic(df: DataFrame, key: String, order: Seq[String], value: String,
                 n: Int = 14, d: Int = 3): DataFrame = {
    val wOrd = WindowAnalytics.keyFrame(key, order)
    val wN = wOrd.rowsBetween(-(n - 1), Window.currentRow)
    val wD = wOrd.rowsBetween(-(d - 1), Window.currentRow)
    df.select(col("*"),
        min(col(value)).over(wN).as("don_lo"),
        max(col(value)).over(wN).as("don_hi"))
      .withColumn("pct_k",
        lit(100.0) * (col(value) - col("don_lo"))
          / nullif(col("don_hi") - col("don_lo"), lit(0.0)))
      .select(col("*"), frameAvg(col("pct_k"), wD).as("pct_d"))
  }

  /** Running-peak drawdown and cumulative return per key: run_max is the
    * cumulative max (exact), drawdown = value/run_max − 1, cum_return =
    * value/first(value) − 1. first() over a cumulative frame on a TOTAL
    * order is deterministic (the `order` columns must include a unique
    * tiebreaker — same contract as every frame in this file). */
  def drawdown(df: DataFrame, key: String, order: Seq[String], value: String)
      : DataFrame = {
    val wCum = cum(WindowAnalytics.keyFrame(key, order))
    df.select(col("*"),
        max(col(value)).over(wCum).as("run_max"),
        first(col(value)).over(wCum).as("_first"))
      .select(col("*"),
        (col(value) / nullif(col("run_max"), lit(0.0)) - lit(1.0))
          .as("drawdown"),
        (col(value) / nullif(col("_first"), lit(0.0)) - lit(1.0))
          .as("cum_return"))
      .drop("_first")
  }

  /** Classical seasonal decomposition (the moving-average form of
    * STL's ancestor): value = trend + seasonal + residual per key, for
    * a known integer `period` (24 for hourly data with daily shape,
    * 7 for daily data with weekly shape).
    *
    *  - trend: centered moving average over one full period — for even
    *    periods the textbook half-weight-ends form
    *    (x_{t−h}/2 + Σ x_{t−h+1..t+h−1} + x_{t+h}/2)/period, h = p/2,
    *    so the window always spans exactly one seasonal cycle; NULL at
    *    the h-row series edges (no full cycle to average).
    *  - seasonal: mean of (value − trend) per position-in-period,
    *    centered to sum ≈ 0 across positions (a constant shift belongs
    *    to the trend, not the season).
    *  - residual: value − trend − seasonal — the de-seasonalized
    *    anomaly signal drift monitors should alarm on instead of raw
    *    values when the metric has a daily/weekly pulse.
    *
    * Float discipline: the frame sum and every cross-row mean are
    * rounded at 6dp before their single divide (frameAvg's windowed
    * sibling), and trend/seasonal/residual derive from those rounded
    * components with per-row arithmetic only — both engines cut
    * identical doubles. Scale shape: ONE shuffle on the key, one
    * in-partition sort shared by the position index and the trend
    * frame; the seasonal table is |keys|×period rows, broadcast back.
    * The position index is row_number over the key's total `order` —
    * series are per-key, so a key's rows must fit a task (the same
    * contract as every recurrence in this file). */
  def seasonalDecompose(df: DataFrame, key: String, order: Seq[String],
                        value: String, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    val w = WindowAnalytics.keyFrame(key, order)
    val h = period / 2
    val odd = period % 2 == 1
    val frame = w.rowsBetween(-h, h)
    val v = col(value)
    val full = count(v).over(frame) === lit(2 * h + 1)
    val trendExpr =
      if (odd)
        when(full, round(sum(v).over(frame), 6) / lit(period.toDouble))
      else
        when(full &&
            lag(v, h).over(w).isNotNull && lead(v, h).over(w).isNotNull,
          (round(sum(v).over(frame), 6)
            - lit(0.5) * (lag(v, h).over(w) + lead(v, h).over(w)))
            / lit(period.toDouble))
    val base = df.filter(v.isNotNull)
      .select(col("*"),
        ((row_number().over(w) - lit(1)) % lit(period)).as("period_pos"),
        round(trendExpr, 6).as("trend"))
      .withColumn("__detr", v - col("trend"))
    val seasonalRaw = base.filter(col("__detr").isNotNull)
      .groupBy(col(key), col("period_pos"))
      .agg((round(sum(col("__detr")), 6)
        / count(lit(1)).cast("double")).as("__sraw"))
    val centered = seasonalRaw
      .withColumn("__smean",
        round(sum(col("__sraw")).over(
          Window.partitionBy(col(key))), 6)
          / count(lit(1)).over(Window.partitionBy(col(key)))
            .cast("double"))
      .select(col(key), col("period_pos"),
        round(col("__sraw") - col("__smean"), 6).as("seasonal"))
    base.join(broadcast(centered), Seq(key, "period_pos"), "left")
      .withColumn("residual", col("__detr") - col("seasonal"))
      .drop("__detr")
  }

  /** The shared secondary-sort recurrence harness: one shuffle on the
    * key, one in-partition sort on (key, order...), then a single
    * streaming pass where `fold` (fresh instance per partition) carries
    * O(1) state per key — rows of a key are contiguous after the sort, so
    * the harness resets the fold at key boundaries and memory never
    * depends on series length. This is the per-partition imperative shape
    * mapPartitions exists for: a Window cannot host an order-dependent
    * recurrence, and collect_list per key would be O(series) memory.
    * Every recurrence indicator (EMA/MACD, EWM, CUSUM) plugs its fold
    * into THIS scaffold so the ordering/reset discipline lives once. */
  private[ops] abstract class SeriesFold extends Serializable {
    /** Called at every key boundary, before the key's first row. */
    def reset(): Unit
    /** Per-row output suffix; mutate internal state as needed. */
    def apply(row: Row): Seq[Any]
  }

  private[ops] def keyedSeriesScan(df: DataFrame, key: String,
                                   order: Seq[String],
                                   outFields: Seq[StructField])
                                  (fold: () => SeriesFold): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ outFields)
    val keyIdx = inSchema.fieldIndex(key)
    df.repartition(col(key))
      .sortWithinPartitions((key +: order).map(col): _*)
      .mapPartitions { rows =>
        val f = fold()
        var curKey: Any = null
        rows.map { row =>
          val k = row.get(keyIdx)
          if (!java.util.Objects.equals(k, curKey)) {
            curKey = k; f.reset()
          }
          Row.fromSeq(row.toSeq ++ f(row))
        }
      }(Encoders.row(outSchema))
  }

  /** Exponentially-weighted mean + variance (RiskMetrics-style EWMA
    * volatility) via West's recurrence:
    *   delta = x − m;  incr = α·delta;  m' = m + incr;
    *   v' = (1−α)·(v + delta·incr)
    * Same secondary-sort harness as withEmaMacd (one shuffle on the key,
    * O(1) state, NULL passthrough leaves state untouched; seed: m := first
    * value, v := 0). Each step is a fixed IEEE expression tree, so a
    * recursive-CTE oracle replays it bit-identically (q_ewm). */
  def withEwm(df: DataFrame, key: String, order: Seq[String], value: String,
              span: Int = 20): DataFrame = {
    val a = 2.0 / (span + 1)
    val valIdx = df.schema.fieldIndex(value)
    keyedSeriesScan(df, key, order, Seq(
      StructField("ewm_mean", DoubleType),
      StructField("ewm_var", DoubleType))) { () =>
      new SeriesFold {
        private var seeded = false
        private var m = 0.0; private var v = 0.0
        def reset(): Unit = seeded = false
        def apply(row: Row): Seq[Any] =
          if (row.isNullAt(valIdx)) Seq(null, null)
          else {
            val x = row.getDouble(valIdx)
            if (!seeded) { seeded = true; m = x; v = 0.0 }
            else {
              val delta = x - m
              val incr = a * delta
              m = m + incr
              v = (1.0 - a) * (v + delta * incr)
            }
            Seq(m, v)
          }
      }
    }
  }

  /** Two-sided tabular CUSUM change-point monitor:
    *   S⁺_t = max(0, S⁺_{t−1} + x_t − μ − k),
    *   S⁻_t = max(0, S⁻_{t−1} + μ − x_t − k),  alarm when either > h
    * with μ the per-key mean (exactAvg form: 4dp-rounded sum / non-null
    * count), σ the 6dp-rounded sample stddev, k = kSigma·σ (slack) and
    * h = hSigma·σ (decision interval) — the standard drift detector for
    * data-quality monitoring between pipeline runs; catches slow mean
    * drift that threshold alerts on single values miss.
    *
    * μ/σ come from `reference` — the in-control period (SPC practice:
    * calibrate on data known good, monitor the rest). The default
    * (reference = df itself) turns the op into a HOMOGENEITY check: any
    * sustained regime change makes both halves drift from the pooled
    * mean and alarm — correct for "did this series shift at all", while
    * an explicit reference gives classic "alarm only after the change"
    * monitoring.
    *
    * Two passes: a |keys|-row stats aggregate LEFT-joined back (broadcast)
    * — keys absent from an explicit reference keep their rows and emit
    * NULL statistics, same as σ-NULL singleton series: a drift monitor
    * must surface novel series, not silently drop them — then the shared
    * [[keyedSeriesScan]] harness (one shuffle on the key, O(1) state,
    * NULL values pass through with NULL outputs and leave state
    * untouched). Each step is a fixed IEEE expression tree over
    * engine-identical μ/σ, so a recursive-CTE oracle replays it
    * bit-identically. */
  def withCusum(df: DataFrame, key: String, order: Seq[String],
                value: String, kSigma: Double = 0.5,
                hSigma: Double = 4.0,
                reference: Option[DataFrame] = None): DataFrame = {
    val stats = reference.getOrElse(df).groupBy(col(key))
      .agg((round(sum(col(value)), 4) / count(col(value))).as("__mu"),
        round(stddev_samp(col(value)), 6).as("__sd"))
    val joined = df.join(broadcast(stats), Seq(key), "left_outer")
    val valIdx = joined.schema.fieldIndex(value)
    val muIdx = joined.schema.fieldIndex("__mu")
    val sdIdx = joined.schema.fieldIndex("__sd")
    keyedSeriesScan(joined, key, order, Seq(
      StructField("cusum_pos", DoubleType),
      StructField("cusum_neg", DoubleType),
      StructField("cusum_alarm", BooleanType))) { () =>
      new SeriesFold {
        private var sp = 0.0; private var sn = 0.0
        def reset(): Unit = { sp = 0.0; sn = 0.0 }
        def apply(row: Row): Seq[Any] =
          if (row.isNullAt(valIdx) || row.isNullAt(sdIdx)) Seq(null, null, null)
          else {
            val x = row.getDouble(valIdx)
            val mu = row.getDouble(muIdx)
            val sd = row.getDouble(sdIdx)
            val kk = kSigma * sd
            val h = hSigma * sd
            sp = math.max(0.0, sp + x - mu - kk)
            sn = math.max(0.0, sn + mu - x - kk)
            Seq(sp, sn, sp > h || sn > h)
          }
      }
    }.drop("__mu", "__sd")
  }

  /** Holt double exponential smoothing (level + linear trend) with the
    * one-step-ahead forecast and its residual — the simplest honest
    * forecaster for trending series, and the residual is the
    * anomaly-score companion to [[withCusum]]:
    *   forecast_t = l_{t−1} + b_{t−1}                 (before seeing x_t)
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * Seed: l := first value, b := 0, forecast NULL (nothing to predict
    * from). Defaults α=0.5, β=0.25 are DYADIC so every smoothing
    * multiply is an exact power-of-two scale; pass only dyadic values if
    * you change them, and the recursive-CTE oracle replays the identical
    * tree. NULL values pass through with NULL outputs, state untouched.
    * Runs on the shared [[keyedSeriesScan]] harness. */
  def withHoltLinear(df: DataFrame, key: String, order: Seq[String],
                     value: String, alpha: Double = 0.5,
                     beta: Double = 0.25): DataFrame = {
    val valIdx = df.schema.fieldIndex(value)
    keyedSeriesScan(df, key, order, Seq(
      StructField("holt_level", DoubleType),
      StructField("holt_trend", DoubleType),
      StructField("holt_forecast", DoubleType),
      StructField("holt_residual", DoubleType))) { () =>
      new SeriesFold {
        private var seeded = false
        private var l = 0.0; private var b = 0.0
        def reset(): Unit = seeded = false
        def apply(row: Row): Seq[Any] =
          if (row.isNullAt(valIdx)) Seq(null, null, null, null)
          else {
            val x = row.getDouble(valIdx)
            if (!seeded) {
              seeded = true; l = x; b = 0.0
              Seq(l, b, null, null)
            } else {
              val f = l + b
              val lNew = alpha * x + (1.0 - alpha) * (l + b)
              b = beta * (lNew - l) + (1.0 - beta) * b
              l = lNew
              Seq(l, b, f, x - f)
            }
          }
      }
    }
  }

  /** EMA fast/slow + MACD + signal + histogram — the one genuinely
    * RECURSIVE indicator family (EMA_t = α·x_t + (1−α)·EMA_{t−1} has no
    * closed windowed form that is float-exact); runs on the shared
    * [[keyedSeriesScan]] harness. Seeding: EMA := first value;
    * MACD/signal/histogram := 0 on the seed row. NULL values pass through
    * with NULL outputs and leave state (and seeding) untouched. Float
    * contract: each step is exactly α·x + (1−α)·state in IEEE double, so
    * an oracle replaying the same recurrence (a recursive CTE)
    * reproduces bit-identical values. */
  def withEmaMacd(df: DataFrame, key: String, order: Seq[String],
                  value: String, fast: Int = 12, slow: Int = 26,
                  signalSpan: Int = 9): DataFrame = {
    val aF = 2.0 / (fast + 1); val aS = 2.0 / (slow + 1)
    val aG = 2.0 / (signalSpan + 1)
    val valIdx = df.schema.fieldIndex(value)
    keyedSeriesScan(df, key, order, Seq(
      StructField("ema_fast", DoubleType), StructField("ema_slow", DoubleType),
      StructField("macd", DoubleType), StructField("signal", DoubleType),
      StructField("histogram", DoubleType))) { () =>
      new SeriesFold {
        private var seeded = false
        private var emaF = 0.0; private var emaS = 0.0; private var sig = 0.0
        def reset(): Unit = seeded = false
        def apply(row: Row): Seq[Any] =
          if (row.isNullAt(valIdx)) Seq(null, null, null, null, null)
          else {
            val x = row.getDouble(valIdx)
            if (!seeded) {
              seeded = true; emaF = x; emaS = x; sig = 0.0
              Seq(emaF, emaS, 0.0, 0.0, 0.0)
            } else {
              emaF = aF * x + (1.0 - aF) * emaF
              emaS = aS * x + (1.0 - aS) * emaS
              val macd = emaF - emaS
              sig = aG * macd + (1.0 - aG) * sig
              Seq(emaF, emaS, macd, sig, macd - sig)
            }
          }
      }
    }
  }
}

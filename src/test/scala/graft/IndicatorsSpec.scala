package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.Indicators

/** Unit semantics for the technical-indicator family (ops/Indicators) —
  * hand-computable fixtures pinning the NULL/seed/boundary contracts the
  * DuckDB oracles then replay at scale. */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vs: (String, Long, java.lang.Double)*) =
    vs.toDF("k", "id", "value")

  test("bollinger: 1-row frames give NULL bands; constant frames give NULL pct_b") {
    val df = series(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0))
    val out = Indicators.bollinger(df, "k", Seq("id"), "value", n = 2)
      .orderBy("id").collect()
    // row 1: single-row frame -> stddev_samp undefined -> NULL bands
    assert(out(0).getAs[Double]("bb_ma") == 10.0)
    assert(out(0).isNullAt(out(0).fieldIndex("bb_upper")))
    // rows 2,3: constant 2-row frame -> sd = 0 -> zero-width band -> NULL %B
    assert(out(1).getAs[Double]("bb_upper") == 10.0)
    assert(out(1).getAs[Double]("bb_lower") == 10.0)
    assert(out(1).isNullAt(out(1).fieldIndex("pct_b")))
  }

  test("bollinger: hand-checked band on a 2-row frame") {
    // values 10, 20: mean 15, stddev_samp = sqrt(50) rounded at 6dp
    val df = series(("a", 1L, 10.0), ("a", 2L, 20.0))
    val r = Indicators.bollinger(df, "k", Seq("id"), "value", n = 2, k = 2.0)
      .orderBy("id").collect()(1)
    val sd = BigDecimal(math.sqrt(50.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("bb_ma") == 15.0)
    assert(r.getAs[Double]("bb_upper") == 15.0 + 2.0 * sd)
    assert(r.getAs[Double]("bb_lower") == 15.0 - 2.0 * sd)
    // %B of the top value in a symmetric band: (20 - lo) / (hi - lo)
    val hi = 15.0 + 2.0 * sd; val lo = 15.0 - 2.0 * sd
    assert(r.getAs[Double]("pct_b") == (20.0 - lo) / (hi - lo))
  }

  test("rsi: monotone up -> 100, monotone down -> 0, flat -> NULL, first row NULL") {
    val up = Indicators.rsi(series(("a", 1L, 1.0), ("a", 2L, 2.0),
      ("a", 3L, 3.0)), "k", Seq("id"), "value", n = 2).orderBy("id").collect()
    assert(up(0).isNullAt(up(0).fieldIndex("rsi_2")))  // no diff yet
    assert(up(1).getAs[Double]("rsi_2") == 100.0)
    assert(up(2).getAs[Double]("rsi_2") == 100.0)
    val down = Indicators.rsi(series(("a", 1L, 3.0), ("a", 2L, 2.0),
      ("a", 3L, 1.0)), "k", Seq("id"), "value", n = 2).orderBy("id").collect()
    assert(down(1).getAs[Double]("rsi_2") == 0.0)
    val flat = Indicators.rsi(series(("a", 1L, 5.0), ("a", 2L, 5.0)),
      "k", Seq("id"), "value", n = 2).orderBy("id").collect()
    assert(flat(1).isNullAt(flat(1).fieldIndex("rsi_2"))) // 0/0 -> NULL
  }

  test("vwapObv: vwap resets per day, obv accumulates signed volume per key") {
    val df = Seq(
      ("a", "2024-01-01 10:00:00", 1L, 10.0, 100L),
      ("a", "2024-01-01 11:00:00", 2L, 20.0, 300L),
      ("a", "2024-01-02 09:00:00", 3L, 5.0, 100L))
      .toDF("k", "ts", "id", "value", "vol")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Indicators.vwapObv(df, "k", "ts", Seq("id"), "value", col("vol"))
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("vwap") == 10.0)
    // day 1 cumulative: (10*100 + 20*300) / 400 = 17.5
    assert(out(1).getAs[Double]("vwap") == 17.5)
    // day 2 resets: 5.0
    assert(out(2).getAs[Double]("vwap") == 5.0)
    // OBV: first row contributes 0; +300 on the up-tick; -100 on the down
    assert(out(0).getAs[Long]("obv") == 0L)
    assert(out(1).getAs[Long]("obv") == 300L)
    assert(out(2).getAs[Long]("obv") == 200L)
  }

  test("stochastic: %K at channel extremes; constant channel -> NULL %K skipped by %D") {
    val df = series(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 15.0))
    val out = Indicators.stochastic(df, "k", Seq("id"), "value", n = 2, d = 2)
      .orderBy("id").collect()
    // row 1: channel [10,10] zero-width -> NULL %K
    assert(out(0).isNullAt(out(0).fieldIndex("pct_k")))
    // row 2: at channel top -> 100; %D = mean of {100} (NULL skipped)
    assert(out(1).getAs[Double]("pct_k") == 100.0)
    assert(out(1).getAs[Double]("pct_d") == 100.0)
    // row 3: channel [15,20], value 15 -> 0; %D = (100 + 0) / 2
    assert(out(2).getAs[Double]("pct_k") == 0.0)
    assert(out(2).getAs[Double]("pct_d") == 50.0)
    assert(out(2).getAs[Double]("don_lo") == 15.0)
    assert(out(2).getAs[Double]("don_hi") == 20.0)
  }

  test("drawdown: zero at new peaks, negative below peak, cum_return vs first") {
    val df = series(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 15.0))
    val out = Indicators.drawdown(df, "k", Seq("id"), "value")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("drawdown") == 0.0)
    assert(out(1).getAs[Double]("drawdown") == 0.0)       // new peak
    assert(out(1).getAs[Double]("run_max") == 20.0)
    assert(out(2).getAs[Double]("drawdown") == 15.0 / 20.0 - 1.0)
    assert(out(2).getAs[Double]("cum_return") == 0.5)     // 15/10 - 1
  }

  test("withEmaMacd: seed row, exact recurrence, NULL passthrough, key reset") {
    val df = Seq(
      ("a", 1L, java.lang.Double.valueOf(10.0)),
      ("a", 2L, null.asInstanceOf[java.lang.Double]),   // state untouched
      ("a", 3L, java.lang.Double.valueOf(16.0)),
      ("b", 1L, java.lang.Double.valueOf(10.0)))        // fresh seed per key
      .toDF("k", "id", "value")
    val out = Indicators.withEmaMacd(df, "k", Seq("id"), "value",
        fast = 2, slow = 4, signalSpan = 3)
      .orderBy("k", "id").collect()
    val aF = 2.0 / 3; val aS = 2.0 / 5; val aG = 2.0 / 4
    // a/1: seed -> ema = x, macd/signal/histogram = 0
    assert(out(0).getAs[Double]("ema_fast") == 10.0)
    assert(out(0).getAs[Double]("macd") == 0.0)
    // a/2: NULL value -> all NULL outputs
    assert(out(1).isNullAt(out(1).fieldIndex("ema_fast")))
    // a/3: one recurrence step from the a/1 state (NULL row left it alone)
    val ef = aF * 16.0 + (1.0 - aF) * 10.0
    val es = aS * 16.0 + (1.0 - aS) * 10.0
    val macd = ef - es
    val sig = aG * macd + (1.0 - aG) * 0.0
    assert(out(2).getAs[Double]("ema_fast") == ef)
    assert(out(2).getAs[Double]("ema_slow") == es)
    assert(out(2).getAs[Double]("macd") == macd)
    assert(out(2).getAs[Double]("signal") == sig)
    assert(out(2).getAs[Double]("histogram") == macd - sig)
    // b/1: independent seed — key boundary reset state
    assert(out(3).getAs[Double]("ema_fast") == 10.0)
    assert(out(3).getAs[Double]("macd") == 0.0)
  }

  test("withEwm: West's recurrence, seed var 0, NULL passthrough") {
    val df = Seq(
      ("a", 1L, java.lang.Double.valueOf(10.0)),
      ("a", 2L, null.asInstanceOf[java.lang.Double]),
      ("a", 3L, java.lang.Double.valueOf(16.0)))
      .toDF("k", "id", "value")
    val out = Indicators.withEwm(df, "k", Seq("id"), "value", span = 20)
      .orderBy("id").collect()
    val a = 2.0 / 21
    assert(out(0).getAs[Double]("ewm_mean") == 10.0)
    assert(out(0).getAs[Double]("ewm_var") == 0.0)
    assert(out(1).isNullAt(out(1).fieldIndex("ewm_mean")))
    val delta = 16.0 - 10.0; val incr = a * delta
    assert(out(2).getAs[Double]("ewm_mean") == 10.0 + incr)
    assert(out(2).getAs[Double]("ewm_var") == (1.0 - a) * (0.0 + delta * incr))
  }

  test("withCusum: no alarm on stable series, alarm after planted mean shift") {
    // calibrate on the stable first half (reference period), monitor the
    // whole series: the in-control half must never alarm, the +8 shift
    // must cross the 4*sd decision interval
    val vals = Seq.fill(20)(10.0) ++ Seq.fill(20)(18.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("k", i.toLong, v + (i % 3) * 0.1) }.toDF("k", "id", "value")
    val out = Indicators.withCusum(df, "k", Seq("id"), "value",
        reference = Some(df.filter($"id" < 20)))
      .orderBy("id").collect()
    val alarms = out.map(_.getAs[Boolean]("cusum_alarm"))
    assert(!alarms.take(20).exists(identity), "stable half must not alarm")
    assert(alarms.drop(20).exists(identity), "shift must trigger an alarm")
    // self-referenced (homogeneity mode): the shift still registers
    val self = Indicators.withCusum(df, "k", Seq("id"), "value")
      .orderBy("id").collect()
    assert(self.map(_.getAs[Boolean]("cusum_alarm")).exists(identity))
    // positive-side statistic grows through the shift; both sides >= 0
    assert(out.forall(r => r.getAs[Double]("cusum_pos") >= 0.0 &&
      r.getAs[Double]("cusum_neg") >= 0.0))
    // NULL passthrough leaves state untouched
    val withNull = Seq(("k", 1L, java.lang.Double.valueOf(10.0)),
      ("k", 2L, null.asInstanceOf[java.lang.Double]),
      ("k", 3L, java.lang.Double.valueOf(10.0)))
      .toDF("k", "id", "value")
    val on = Indicators.withCusum(withNull, "k", Seq("id"), "value")
      .orderBy("id").collect()
    assert(on(1).isNullAt(on(1).fieldIndex("cusum_pos")))
    assert(!on(2).isNullAt(on(2).fieldIndex("cusum_pos")))
    // a key ABSENT from an explicit reference must keep its rows with
    // NULL statistics (novel series surface, never silently vanish)
    val novel = Seq(("old", 1L, 10.0), ("new", 1L, 99.0))
      .toDF("k", "id", "value")
    val ref = Seq(("old", 1L, 10.0), ("old", 2L, 10.2))
      .toDF("k", "id", "value")
    val nr = Indicators.withCusum(novel, "k", Seq("id"), "value",
        reference = Some(ref))
      .select("k", "cusum_pos").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(nr("old") == false && nr("new") == true)
  }

  test("withHoltLinear: hand-checked recurrence, seed forecast NULL") {
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 12.0), ("k", 3L, 14.0))
      .toDF("k", "id", "value")
    val out = Indicators.withHoltLinear(df, "k", Seq("id"), "value")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("holt_level") == 10.0 &&
      out(0).getAs[Double]("holt_trend") == 0.0 &&
      out(0).isNullAt(out(0).fieldIndex("holt_forecast")))
    assert(out(1).getAs[Double]("holt_forecast") == 10.0 &&
      out(1).getAs[Double]("holt_level") == 11.0 &&
      out(1).getAs[Double]("holt_trend") == 0.25 &&
      out(1).getAs[Double]("holt_residual") == 2.0)
    assert(out(2).getAs[Double]("holt_forecast") == 11.25 &&
      out(2).getAs[Double]("holt_level") == 12.625 &&
      out(2).getAs[Double]("holt_trend") == 0.59375 &&
      out(2).getAs[Double]("holt_residual") == 2.75)
  }

  test("plan shape: every windowed indicator costs exactly ONE shuffle") {
    // All frames share the per-key partitioning, so adding indicator
    // columns must never add an Exchange — the property that keeps the
    // family one-pass at 100 TB (shuffle once per key, sort in partition,
    // evaluate every frame in the same Window stage chain).
    val df = series(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 5.0))
    val plans = Seq(
      "bollinger" -> Indicators.bollinger(df, "k", Seq("id"), "value"),
      "rsi" -> Indicators.rsi(df, "k", Seq("id"), "value"),
      "stochastic" -> Indicators.stochastic(df, "k", Seq("id"), "value"),
      "drawdown" -> Indicators.drawdown(df, "k", Seq("id"), "value"))
    for ((name, out) <- plans) {
      val plan = out.queryExecution.executedPlan.toString
      val n = plan.split("Exchange").length - 1
      assert(n == 1, s"$name: expected 1 shuffle, got $n:\n$plan")
    }
    // vwapObv windows over BOTH (key, day) and (key) — but
    // HashPartitioning(key) satisfies ClusteredDistribution(key, day)
    // (same key -> same partition implies same (key, day) -> same
    // partition), so the day-grain window reuses the key exchange with
    // only an in-partition re-sort: still ONE shuffle, asserted with
    // per-row varying days so constant folding can't fake it.
    val vwap = Indicators.vwapObv(
      df.withColumn("ts",
        to_timestamp(concat(lit("2024-01-0"), col("id"), lit(" 10:00:00")))),
      "k", "ts", Seq("id"), "value", col("id"))
    val nV = vwap.queryExecution.executedPlan.toString
      .split("Exchange").length - 1
    assert(nV == 1, s"vwapObv: expected 1 shuffle, got $nV")
  }

  test("seasonalDecompose: planted linear trend + period-4 season " +
      "recovered; residual ~ 0; edges NULL") {
    // value = 2·i + s[i mod 4], planted season sums to 0 over a cycle
    val season = Seq(3.0, -1.0, -2.0, 0.0)
    val rows = (0 until 40).map(i =>
      ("k", i.toLong, 2.0 * i + season(i % 4)))
    val out = Indicators.seasonalDecompose(
        rows.toDF("k", "id", "value"), "k", Seq("id"), "value", period = 4)
      .orderBy("id").collect()
    out.foreach { r =>
      val i = r.getAs[Long]("id").toInt
      assert(r.getAs[Int]("period_pos") == i % 4)
      if (i < 2 || i >= 38) {
        // no full centered cycle at the edges
        assert(r.isNullAt(r.fieldIndex("trend")), s"edge $i has trend")
        assert(r.isNullAt(r.fieldIndex("residual")))
      } else {
        // centered MA of linear+periodic over one cycle = the line
        assert(math.abs(r.getAs[Double]("trend") - 2.0 * i) < 1e-6,
          s"trend at $i")
        assert(math.abs(r.getAs[Double]("seasonal") - season(i % 4)) < 0.2,
          s"seasonal at $i")
        assert(math.abs(r.getAs[Double]("residual")) < 0.2,
          s"residual at $i")
      }
    }
    // seasonal components (centered) sum to ~0 across the cycle
    val sByPos = out.filter(!_.isNullAt(out.head.fieldIndex("seasonal")))
      .map(r => r.getAs[Int]("period_pos") -> r.getAs[Double]("seasonal"))
      .toMap
    assert(math.abs(sByPos.values.sum) < 1e-4)
  }
}

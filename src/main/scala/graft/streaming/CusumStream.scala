package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * Streaming twin of ops/Indicators.withCusum: two-sided tabular CUSUM
 * drift alarms on a live stream via transformWithState. Calibration (per-
 * key μ/σ) comes from a BATCH reference period — the in-control data —
 * and rides into the stream through a broadcast stream-static join, so
 * the stateful processor holds exactly one (S⁺, S⁻) pair per key:
 * constant-width state for an unbounded stream, the same recurrence
 *   S⁺ = max(0, S⁺ + x − μ − kσ),  S⁻ = max(0, S⁻ + μ − x − kσ)
 * as the batch operator, alarm when either side crosses hσ.
 *
 * Micro-batch determinism: each key's batch slice is sorted on
 * (ts, value) before folding (same discipline as RunningStats — one
 * in-place array per key per trigger; bound the trigger if a key can
 * receive millions of rows per batch). No time semantics beyond the
 * input order, so checkpoint replay is idempotent per batch. Requires
 * the RocksDB state store provider (transformWithState contract).
 */
object CusumStream {

  final case class CalTick(key: String, ts: Timestamp, value: Double,
      mu: Double, sd: Double)
  final case class CusumState(sp: Double, sn: Double)
  final case class Alarm(key: String, ts: Timestamp, value: Double,
      cusum_pos: Double, cusum_neg: Double, alarm: Boolean)

  private final class Processor(kSigma: Double, hSigma: Double)
      extends StatefulProcessor[String, CalTick, Alarm] {
    @transient private var state: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CalTick],
                                 tv: TimerValues): Iterator[Alarm] = {
      val init = if (state.exists()) state.get() else CusumState(0.0, 0.0)
      val sorted = rows.toArray
      scala.util.Sorting.stableSort(sorted,
        (a: CalTick, b: CalTick) => a.ts.getTime < b.ts.getTime ||
          (a.ts.getTime == b.ts.getTime && a.value < b.value))
      def step(s: CusumState, t: CalTick): CusumState = {
        val kk = kSigma * t.sd
        CusumState(math.max(0.0, s.sp + t.value - t.mu - kk),
          math.max(0.0, s.sn + t.mu - t.value - kk))
      }
      state.update(sorted.foldLeft(init)(step))
      var acc = init
      sorted.iterator.map { t =>
        acc = step(acc, t)
        val h = hSigma * t.sd
        Alarm(key, t.ts, t.value, acc.sp, acc.sn,
          acc.sp > h || acc.sn > h)
      }
    }
  }

  /** Enrich a (key, ts, value) stream with per-key reference μ/σ from a
    * BATCH in-control period (exactAvg / r6 discipline, matching the
    * batch operator). Keys absent from the reference are dropped — no
    * calibration, no monitoring (surface them separately if needed) —
    * and so are NULL-valued / NULL-ts ticks: the monitor must survive
    * exactly the malformed input it watches for, and CalTick's
    * non-nullable fields would otherwise fail deserialization and kill
    * the query (the batch twin emits NULL rows instead; a stream row
    * dropped here is still counted by upstream source metrics). */
  def calibrate(stream: DataFrame, reference: DataFrame, key: String,
                value: String): Dataset[CalTick] = {
    val stats = reference.groupBy(col(key))
      .agg((round(sum(col(value)), 4) / count(col(value))).as("mu"),
        round(stddev_samp(col(value)), 6).as("sd"))
      .filter(col("sd").isNotNull)
    implicit val enc: Encoder[CalTick] = Encoders.product[CalTick]
    stream.select(col(key).as("key"), col("ts"), col(value).as("value"))
      .filter(col("key").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .join(broadcast(stats.withColumnRenamed(key, "key")), "key")
      .as[CalTick]
  }

  /** One alarm row per input row with the post-update CUSUM statistics;
    * state is one constant-width record per key. */
  def drift(ticks: Dataset[CalTick], kSigma: Double = 0.5,
            hSigma: Double = 4.0): Dataset[Alarm] = {
    implicit val enc: Encoder[Alarm] = Encoders.product[Alarm]
    ticks.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor(kSigma, hSigma), TimeMode.None(),
        OutputMode.Append())
  }
}

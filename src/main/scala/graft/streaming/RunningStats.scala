package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/**
 * Running per-key cumulative features on a stream via transformWithState —
 * Spark 4's arbitrary-state API (successor to [map|flatMap]GroupsWithState):
 * typed state handles (ValueState/ListState/MapState), per-state TTL, and
 * timers, designed around the RocksDB state store (which is REQUIRED — the
 * HDFS-backed provider rejects this operator).
 *
 * State per key is one constant-width Running record no matter how many
 * events pass — the 100 TB/day posture: cumulative features over an
 * unbounded stream with O(keys) state, each key's record a few dozen
 * bytes in RocksDB, never on-heap in aggregate.
 *
 * Within a micro-batch, input order is not guaranteed; rows are processed
 * in (ts, value) order so the running outputs are deterministic.
 */
object RunningStats {

  final case class Tick(key: String, ts: Timestamp, value: Double)
  final case class Running(n: Long, sum: Double, mn: Double, mx: Double)
  final case class Out(key: String, ts: Timestamp, value: Double,
      run_n: Long, run_avg: Double, run_min: Double, run_max: Double)

  private final class Processor extends StatefulProcessor[String, Tick, Out] {
    @transient private var state: ValueState[Running] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Running]("running",
        Encoders.product[Running], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Tick],
                                 tv: TimerValues): Iterator[Out] = {
      var cur =
        if (state.exists()) state.get()
        else Running(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
      val out = rows.toSeq.sortBy(t => (t.ts.getTime, t.value)).map { t =>
        cur = Running(cur.n + 1, cur.sum + t.value,
          math.min(cur.mn, t.value), math.max(cur.mx, t.value))
        Out(key, t.ts, t.value, cur.n, cur.sum / cur.n, cur.mn, cur.mx)
      }
      state.update(cur)
      out.iterator
    }
  }

  /** One output row per input row carrying the post-update running
    * count/avg/min/max for its key. Append mode, no time semantics —
    * results depend only on the set of rows seen, so checkpoint replay
    * is idempotent per batch. */
  def runningFeatures(ticks: Dataset[Tick]): Dataset[Out] = {
    implicit val enc: Encoder[Out] = Encoders.product[Out]
    ticks.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}

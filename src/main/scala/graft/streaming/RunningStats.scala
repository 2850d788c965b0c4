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
 * STORED state per key is one constant-width Running record no matter how
 * many events pass — cumulative features over an unbounded stream with
 * O(keys) state, each key's record a few dozen bytes in RocksDB. Transient
 * per-batch memory is a different budget: the deterministic (ts, value)
 * ordering requires buffering one key's micro-batch slice once (a single
 * in-place-sorted array; outputs re-derive lazily) — bound the batch
 * (maxFilesPerTrigger / maxOffsetsPerTrigger) if a hot key can receive
 * millions of rows per trigger.
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

    private def step(r: Running, t: Tick): Running =
      Running(r.n + 1, r.sum + t.value,
        math.min(r.mn, t.value), math.max(r.mx, t.value))

    override def handleInputRows(key: String, rows: Iterator[Tick],
                                 tv: TimerValues): Iterator[Out] = {
      val init =
        if (state.exists()) state.get()
        else Running(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
      // the deterministic sort needs the batch in memory ONCE (an array,
      // sorted in place); the final state folds eagerly so the store is
      // updated before we return, but outputs re-derive lazily during
      // sink consumption — no second materialized copy of the batch
      val sorted = rows.toArray
      scala.util.Sorting.stableSort(sorted,
        (a: Tick, b: Tick) => a.ts.getTime < b.ts.getTime ||
          (a.ts.getTime == b.ts.getTime && a.value < b.value))
      state.update(sorted.foldLeft(init)(step))
      var acc = init
      sorted.iterator.map { t =>
        acc = step(acc, t)
        Out(key, t.ts, t.value, acc.n, acc.sum / acc.n, acc.mn, acc.mx)
      }
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

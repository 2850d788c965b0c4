package graft.streaming

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/**
 * Bounded streaming observability: a StreamingQueryListener that keeps the
 * last `maxEntries` per-batch progress snapshots (query, batch id, input
 * rows, input rows/s, trigger ms, watermark) in a fixed-size in-memory
 * ring — the driver-side health surface a production pipeline exports to
 * its metrics system. Bounded by construction: monitoring must never
 * become the memory leak it is watching for (the reference's log sink
 * collected every row; this collects ~200 bytes per BATCH, capped).
 */
final class StreamMonitor(maxEntries: Int = 256)
    extends StreamingQueryListener {
  // maxEntries <= 0 would make the trim loop below spin forever on the
  // listener-bus thread — monitoring must never become the outage
  require(maxEntries > 0, s"maxEntries must be positive: $maxEntries")

  final case class BatchStat(query: String, batchId: Long, inputRows: Long,
                             rowsPerSec: Double, triggerMs: Long,
                             watermark: String)

  private val ring = new ConcurrentLinkedDeque[BatchStat]()

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    ring.addLast(BatchStat(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows, p.inputRowsPerSecond,
      Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L),
      Option(p.eventTime.get("watermark")).getOrElse("")))
    while (ring.size() > maxEntries) ring.pollFirst()
  }

  /** Snapshot of the retained batch stats, oldest first. */
  def stats: Seq[BatchStat] = {
    val it = ring.iterator(); val b = Seq.newBuilder[BatchStat]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Total input rows across retained batches of `query` (or all). */
  def totalInputRows(query: Option[String] = None): Long =
    stats.filter(s => query.forall(_ == s.query)).map(_.inputRows).sum
}

object StreamMonitor {
  /** Attach a monitor to the session; returns it for inspection. */
  def attach(spark: SparkSession, maxEntries: Int = 256): StreamMonitor = {
    val m = new StreamMonitor(maxEntries)
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: StreamMonitor): Unit =
    spark.streams.removeListener(m)
}

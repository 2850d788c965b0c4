package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/**
 * Cross-table consistency primitives — the reference's DAG loads TWO
 * warehouse tables per cycle (spark_stream_processor.py writes both
 * aggregates; load_stream_to_snowflake.py:243-323 MERGEs each), and
 * per-table cursors leave a crash window where one table is synced and
 * the other is not: a reader sees a MIXED snapshot. Two pieces close
 * it:
 *
 *  - [[snapshot]]: a VERSION VECTOR capture — every table's committed
 *    version resolved together (with a stability re-read: if no table
 *    moved between two passes, the vector corresponds to a real
 *    quiescent instant). [[Snapshot.read]] then serves every table
 *    pinned at its captured version, however far the tables move —
 *    repeated queries inside one snapshot can never mix versions.
 *  - [[syncChangesMulti]]: the multi-table [[VersionedTable
 *    .syncChanges]] — ONE cursor file holds the whole vector and
 *    advances by ONE atomic rename only after the consumer's `apply`
 *    returns for ALL tables' feeds. A crash anywhere before the
 *    promote replays the ENTIRE cycle from the same bases
 *    (at-least-once for the vector, exactly like the single-table
 *    contract) — there is no state in which table A's cursor moved
 *    and table B's did not.
 *
 * Scale shape: identical to the single-table legs — each table's feed
 * is a touched-generation diff, the cursor is one tiny file, and the
 * vector capture is one commit-marker listing per table (no data I/O).
 */
object MultiSync {

  /** A captured version vector. Reads serve EXACTLY these versions. */
  case class Snapshot(versions: Seq[(String, Int)]) {
    private val byRoot = versions.toMap
    def version(root: String): Int = byRoot.getOrElse(root,
      throw new NoSuchElementException(
        s"$root is not part of this snapshot (${versions.map(_._1)})"))
    /** The table pinned at its captured version — time travel, so the
      * read stays valid until vacuum retires the version. */
    def read(spark: SparkSession, root: String): DataFrame =
      VersionedTable.read(spark, root, Some(version(root)))
  }

  /** Capture a version vector over `roots`. Up to `passes` re-reads: a
    * pass that matches the previous one proves NO table committed in
    * between — the vector is a true quiescent instant. Under constant
    * concurrent writes the last pass is returned (each entry is still a
    * real committed version; cross-table quiescence simply never
    * existed to capture). */
  def snapshot(spark: SparkSession, roots: Seq[String],
               passes: Int = 3): Snapshot = {
    require(roots.nonEmpty, "snapshot of zero tables")
    require(roots.distinct.length == roots.length,
      s"duplicate table in snapshot: ${roots.mkString(", ")}")
    def pass(): Seq[(String, Int)] = roots.map(r =>
      r -> VersionedTable.currentVersion(spark, r).getOrElse(
        throw new java.io.FileNotFoundException(
          s"no committed version at $r")))
    var prev = pass()
    var i = 1
    while (i < passes) {
      val next = pass()
      if (next == prev) return Snapshot(next)
      prev = next
      i += 1
    }
    Snapshot(prev)
  }

  private def header = "#graft-synccursor\t1"

  private def renderVector(v: Seq[(String, Int)]): String =
    v.sortBy(_._1).map { case (r, ver) =>
      s"${SpecFile.b64e(r)}\t$ver" }
      .mkString(header + "\n", "\n", "\n")

  private def parseVector(text: String, at: String): Map[String, Int] = {
    val lines = text.split("\n").filter(_.nonEmpty)
    require(lines.headOption.exists(_.startsWith(header)),
      s"unrecognized sync cursor at $at")
    lines.drop(1).map { l =>
      val Array(r, v) = l.split("\t", 2)
      SpecFile.b64d(r) -> v.trim.toInt
    }.toMap
  }

  /** One sync cycle over several tables with ONE atomically-advanced
    * cursor vector. `apply` receives every table's feed for this cycle
    * (initial load as `insert` rows on the first cycle, the recorded-
    * keys change feed afterwards); the cursor promotes in one rename
    * only after it returns. Returns the per-table (from, to) advances,
    * or None when every table is already synced. Call in a loop until
    * None to drain a `maxVersions`-capped catch-up. */
  def syncChangesMulti(spark: SparkSession,
                       tables: Seq[(String, Seq[String])],
                       cursorPath: String,
                       maxVersions: Int = Int.MaxValue)
                      (apply: Map[String, DataFrame] => Unit)
      : Option[Map[String, (Int, Int)]] = {
    require(tables.nonEmpty, "sync of zero tables")
    require(tables.map(_._1).distinct.length == tables.length,
      s"duplicate table in sync: ${tables.map(_._1).mkString(", ")}")
    require(maxVersions >= 1, s"maxVersions must be >= 1: $maxVersions")
    val fs = VersionedTable.fsFor(spark, cursorPath)
    val cp = new Path(cursorPath)
    val tmp = new Path(cursorPath + ".tmp")
    // crash recovery (shared discipline with the single-table leg): a
    // complete .tmp promotes; a TORN first-cycle tmp is deleted so the
    // idempotent cycle replays instead of wedging every later call.
    // "Complete" requires the parsed vector to cover EXACTLY this
    // call's table set — a tmp truncated at a line boundary parses as
    // a valid shorter vector, and promoting that prefix would wedge
    // every later call on the table-set-drift check below
    VersionedTable.recoverCursor(fs, cp, tmp, txt =>
      scala.util.Try(parseVector(txt, cursorPath)).toOption
        .exists(_.keySet == tables.map(_._1).toSet))
    val targetVec = snapshot(spark, tables.map(_._1))
    val last: Map[String, Int] =
      if (!fs.exists(cp)) Map.empty
      else parseVector(SpecFile.readText(spark, cp, cursorPath),
        cursorPath)
    // refuse a cursor whose table set drifted from the call's — a
    // silently-reused cursor of OTHER tables would serve their bases
    if (last.nonEmpty)
      require(last.keySet == tables.map(_._1).toSet,
        s"sync cursor at $cursorPath tracks ${last.keySet}, not " +
          s"${tables.map(_._1).toSet} — one cursor per table set")
    val advances = tables.flatMap { case (root, _) =>
      val cur = targetVec.version(root)
      val from = last.get(root)
      if (from.contains(cur)) None
      else {
        val to = from.map(f =>
          math.min(cur.toLong, f.toLong + maxVersions).toInt)
          .getOrElse(cur)
        Some(root -> ((from.getOrElse(-1), to)))
      }
    }.toMap
    if (advances.isEmpty) return None
    val feeds = tables.map { case (root, keys) =>
      root -> (advances.get(root) match {
        case None => // already synced: an EMPTY feed of the table's
          // change shape, so `apply` always sees every table
          VersionedTable.changeFeed(spark, root, keys,
            last(root), last(root))
        case Some((-1, to)) => // first cycle: initial load PINNED at
          // the version the cursor will record
          val t = VersionedTable.read(spark, root, Some(to))
          t.select(lit("insert").as("op") +: t.columns.map(col): _*)
        case Some((from, to)) =>
          VersionedTable.changeFeed(spark, root, keys, from, to)
      })
    }.toMap
    apply(feeds)
    // the new vector: advanced tables move to their `to`, already-
    // synced tables keep their recorded base
    val newVec = tables.map { case (root, _) =>
      root -> advances.get(root).map(_._2).getOrElse(last(root)) }
    // write-new-then-promote: ONE rename publishes the whole vector —
    // a crash at any earlier point leaves the old vector intact and
    // the next call replays the full cycle from the same bases
    fs.delete(tmp, false)
    val out = fs.create(tmp, false)
    try out.write(renderVector(newVec).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(cp, false)
    if (!fs.rename(tmp, cp))
      throw new java.io.IOException(s"cursor promote rename failed: $tmp")
    Some(advances)
  }
}

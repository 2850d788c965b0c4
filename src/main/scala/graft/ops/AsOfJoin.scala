package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — an operator Spark SQL lacks natively,
 * composed from built-ins rather than a custom physical operator
 * (preference (a) of the extension ladder): for each left row (key, t),
 * attach the latest right row of the same key with t' <= t.
 *
 * Composition: tag and union both sides on (key, ts), sort per key with
 * right rows ordered BEFORE left rows at equal timestamps (inclusive
 * as-of), carry the right payload forward with last(_, ignoreNulls), keep
 * the left rows. One shuffle on the key + one in-partition sort — the same
 * cost envelope as a sort-merge join, and it inherits Spark's shuffle
 * machinery unchanged, which is why the composition beats a bespoke
 * SparkPlan here.
 *
 * The inverse tool exists in DuckDB as native ASOF JOIN, which the driver
 * oracle uses as an independent implementation check (q_asof_join).
 */
object AsOfJoin {

  /** Precondition: (key, rightTs) should be unique on the right side —
    * with duplicate quote timestamps the carried value is whichever sorts
    * last under Spark's (stable but plan-dependent) tie order, exactly as
    * ambiguous as native ASOF implementations are for the same input.
    *
    * @param left      probe side (each row kept once)
    * @param right     quote side; its `payload` columns are carried forward
    * @param key       equality key column present on both sides
    * @param leftTs    left event-time column
    * @param rightTs   right event-time column
    * @param payload   right columns to attach (as-of values; null until the
    *                  first right row at or before the left row's time)
    * @param tiebreak  unique left column making the sort deterministic */
  def asOf(left: DataFrame, right: DataFrame, key: String, leftTs: String,
           rightTs: String, payload: Seq[String], tiebreak: String): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, payload, tiebreak,
      forward = false)

  /** Forward as-of: for each left row (key, t), attach the EARLIEST right
    * row of the same key with t' >= t (inclusive) — "what's the next
    * scheduled quote/calibration/deployment after this event". Identical
    * cost envelope to [[asOf]]: the union sorts DESCENDING and the same
    * carry runs, so right rows at the exact instant still match. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payload: Seq[String],
                  tiebreak: String): DataFrame =
    asOfImpl(left, right, key, leftTs, rightTs, payload, tiebreak,
      forward = true)

  /** Nearest as-of: attach whichever of the latest-at-or-before /
    * earliest-after right rows is CLOSER in time (µs distance, exact
    * int64; equidistant ties and exact-instant matches go backward) —
    * the sensor-alignment join. Output: left columns + `asof_<p>`
    * payload + `asof_dir` ('backward' | 'forward' | NULL when no match).
    *
    * Composition: both directional passes (each one shuffle + sort on
    * the key) then ONE equi-join on the unique `tiebreak` — 2× the
    * [[asOf]] cost, still never a pair join. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payload: Seq[String],
                  tiebreak: String): DataFrame = {
    val pAll = (rightTs +: payload).distinct
    val b = asOfImpl(left, right, key, leftTs, rightTs, pAll, tiebreak,
      forward = false)
    val slim = Seq(key, leftTs, tiebreak).distinct
    val f = asOfImpl(left.select(slim.map(col): _*), right, key, leftTs,
        rightTs, pAll, tiebreak, forward = true)
      .select((col(tiebreak) +:
        pAll.map(p => col(s"asof_$p").as(s"__f_$p"))): _*)
    val bt = col(s"asof_$rightTs")
    val ft = col(s"__f_$rightTs")
    val db = unix_micros(col(leftTs)) - unix_micros(bt)
    val dfw = unix_micros(ft) - unix_micros(col(leftTs))
    val useB = bt.isNotNull && (ft.isNull || db <= dfw)
    b.join(f, tiebreak)
      .select((left.columns.toSeq.map(col) ++
        payload.map(p =>
          when(useB, col(s"asof_$p")).otherwise(col(s"__f_$p"))
            .as(s"asof_$p")) :+
        when(useB, lit("backward"))
          .when(ft.isNotNull, lit("forward"))
          .otherwise(lit(null).cast("string")).as("asof_dir")): _*)
  }

  private def asOfImpl(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String, payload: Seq[String],
                       tiebreak: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns
    // carry the payload as ONE struct so the matched right row is attached
    // atomically — carrying columns independently with last(ignoreNulls)
    // would backfill a NULL field of the matched row from an OLDER row,
    // fabricating a combination that never existed
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)).map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = true)))
    val l = left
      .withColumn("__graft_t", col(leftTs))
      .withColumn("__graft_side", lit(1))
      .withColumn("__graft_tb", col(tiebreak))
      .withColumn("__graft_p", lit(null).cast(payloadType))
    // NULL-key or NULL-timestamp quotes can never legitimately match under
    // SQL equality / >= comparison, but Window.partitionBy groups NULL keys
    // together and a NULL __graft_t would sort first and leak into every
    // left row — drop them up front, matching native ASOF semantics
    val r = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("__graft_t"),
        struct(payload.map(col): _*).as("__graft_p"))
      .withColumn("__graft_side", lit(0))
      .withColumn("__graft_tb", lit(null).cast(l.schema(tiebreak).dataType))

    // unionByName null-fills the left-only columns on the right side
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at the same instant -> inclusive in
    // BOTH directions (forward just walks time descending)
    val w = Window.partitionBy(col(key))
      .orderBy(
        (if (forward) col("__graft_t").desc else col("__graft_t").asc),
        col("__graft_side"), col("__graft_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__graft_c",
      last(col("__graft_p"), ignoreNulls = true).over(w))
    carried.filter(col("__graft_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__graft_c").getField(p).as(s"asof_$p")): _*)
  }
}

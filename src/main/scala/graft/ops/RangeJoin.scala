package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval-containment range join without an equality key — the other
 * operator Spark SQL lacks a fast native form for (a bare
 * `p.t BETWEEN i.s AND i.e` join plans as BroadcastNestedLoopJoin: O(n*m)
 * comparisons and a broadcast requirement).
 *
 * Bucketed composition: pick a bucket width, explode each interval to the
 * buckets it covers, put each point in its single bucket, equi-join on the
 * bucket id, then apply the exact BETWEEN refinement. Each qualifying
 * (point, interval) pair meets in exactly one bucket (the point's), so no
 * dedup is needed. Cost: one shuffle on bucket id, fan-out bounded by
 * interval_length / bucket_width — linear-ish instead of quadratic, and it
 * keeps working when neither side fits in broadcast memory.
 */
object RangeJoin {

  /** @param points      side with an instant column `ptTs`
    * @param intervals   side with [startTs, endTs] (inclusive both ends)
    * @param bucketSeconds bucket width; choose ~ the typical interval
    *                      length so fan-out stays small */
  def pointInInterval(points: DataFrame, ptTs: String, intervals: DataFrame,
                      startTs: String, endTs: String,
                      bucketSeconds: Long): DataFrame = {
    // unix_micros requires TIMESTAMP (LTZ); parquet commonly yields
    // TIMESTAMP_NTZ -- cast is value-preserving under the UTC session TZ
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val p = points.withColumn("__graft_b",
      floor(micros(ptTs) / (bucketSeconds * 1000000L)))
    val i = intervals.withColumn("__graft_b",
      explode(sequence(
        floor(micros(startTs) / (bucketSeconds * 1000000L)),
        floor(micros(endTs) / (bucketSeconds * 1000000L)))))
    p.join(i, "__graft_b")
      .filter(col(ptTs) >= col(startTs) && col(ptTs) <= col(endTs))
      .drop("__graft_b")
  }
}

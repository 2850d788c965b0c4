package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Existence joins and the bloom-pruned variant for the 100 TB shape.
 *
 * At scale the expensive part of `fact SEMI JOIN dim` is shuffling the fact
 * table on the join key. When the dim side's key set fits a Bloom filter,
 * broadcasting the filter and pre-filtering the fact side BEFORE the
 * shuffle cuts the shuffled volume to (selectivity + fpp) of the fact — the
 * same mechanism as Spark's AQE runtime row-group filters, exposed as an
 * explicit operator for when the planner can't see the opportunity (dim
 * computed by a separate job, key set reused across queries, join hidden
 * behind a checkpoint). Bloom filters have no false negatives, and the
 * exact semi join downstream removes the false positives, so the result
 * EQUALS the plain semi join — oracle-checkable.
 *
 * The bloom machinery is Spark's own (catalyst BloomFilterAggregate /
 * BloomFilterMightContain, the pair used by InjectRuntimeFilter), driven
 * through the ColumnBridge: engine-grade split-block bloom, zero new sketch
 * code.
 */
object Joins {

  /** Rows of `left` with at least one key match in `right` (left semi). */
  def semiJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_semi")

  /** Rows of `left` with no key match in `right` (left anti). */
  def antiJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_anti")

  private def xxh(c: Column): Column =
    ColumnBridge.column(new XxHash64(Seq(ColumnBridge.expression(c))))

  /** Build a split-block Bloom filter over a key column; returns the
    * serialized filter bytes (null when the frame is empty). estItems sizes
    * the filter (~8 bits/item at the default ratio). */
  def buildBloom(df: DataFrame, key: String,
                 estItems: Long = 1000000L): Array[Byte] = {
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxh(col(key))),
        org.apache.spark.sql.catalyst.expressions.Literal(estItems),
        org.apache.spark.sql.catalyst.expressions.Literal(estItems * 8))
        .toAggregateExpression())
    val row = df.select(agg.as("bloom")).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Membership test of a key column against [[buildBloom]] bytes. The
    * filter rides into executors as a foldable literal (same transport as
    * the scalar-subquery result in Spark's own runtime filtering). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bloom)),
      ColumnBridge.expression(xxh(key))))

  /** Bloom-pruned exact semi join: pre-filter `large` with a Bloom filter
    * of `small`'s keys, then exact semi join. Result equals
    * [[semiJoin]](large, small) — the bloom only cuts the volume entering
    * the shuffle. `small` is scanned twice (filter build + exact join);
    * persist it (or pass a pre-built filter at 100 TB) when it is itself
    * expensive. */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, largeKey: String,
                    smallKey: String, estItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(small, smallKey, estItems)
    if (bloom == null) return large.limit(0) // empty small side: empty semi
    semiJoin(large.filter(mightContain(bloom, col(largeKey))),
      small, largeKey, smallKey)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

/**
 * ORDER BY ... LIMIT n (SURVEY §2.7 O1). Spark plans this as
 * TakeOrderedAndProject: each partition keeps its local top-k and the driver
 * merges k-sized heaps — no global sort, no full shuffle, scales to any
 * input size. Reference query surface: README.md:614-615, 636-637.
 */
object TopK {
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k rows per group: one shuffle on the group keys, then a per-group
    * sort + running row_number that stops materializing past k
    * (WindowGroupLimit pushes the limit into the sort at the exec level, so
    * a group never holds more than k rows in the window buffer). The `order`
    * columns must be a total order within each group or ties make the
    * selection nondeterministic — include a unique tiebreaker. */
  def topKPerGroup(df: DataFrame, groupKeys: Seq[String], order: Seq[Column],
                   k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}

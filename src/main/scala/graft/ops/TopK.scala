package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/**
 * ORDER BY ... LIMIT n (SURVEY §2.7 O1). Spark plans this as
 * TakeOrderedAndProject: each partition keeps its local top-k and the driver
 * merges k-sized heaps — no global sort, no full shuffle, scales to any
 * input size. Reference query surface: README.md:614-615, 636-637.
 */
object TopK {
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}

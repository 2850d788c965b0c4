package graft

import graft.ops.Ingest

class BucketSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero shuffle exchanges") {
    val facts = (1 to 1000).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val dims = (0 until 50).map(i => (i, s"d$i")).toDF("k", "name")
    Ingest.writeBucketed(facts, "b_facts", Seq("k"), 4)
    Ingest.writeBucketed(dims, "b_dims", Seq("k"), 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-eligible join so the exchange-free property is
      // attributable to bucketing, not to a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("aggregation on the bucket key is exchange-free") {
    val agg = spark.table("b_facts").groupBy("k").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(agg.count() == 50)
  }
}

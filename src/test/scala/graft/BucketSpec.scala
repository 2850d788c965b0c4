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

  test("partitioned layout: a partition-key predicate prunes at planning, not scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = (1 to 300).map(i => (i.toLong, s"t${i % 3}", i * 1.0))
      .toDF("id", "kind", "v")
    Ingest.writePartitioned(df, dir, Seq("kind"))
    val read = spark.read.parquet(dir).filter($"kind" === "t1")
    val scan = read.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory-level skip —
    // at 100 TB this is the difference between listing one partition and
    // scanning the lake), not survive as a post-scan data Filter — count
    // FilterExec NODES rather than string-matching the (format-unstable)
    // plan text
    assert(scan.contains("PartitionFilters: [isnotnull(kind"),
      s"partition filter not pushed:\n$scan")
    val residual = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residual.isEmpty, s"residual data filter:\n$scan")
    assert(read.count() == 100)
  }

  // ---- plan-shape pins for the curation/sketch operators: these are the
  // properties that make each op survive 100x, asserted so a refactor
  // cannot silently regress them.

  test("hashSplit / mixtureSample / chunkByTokens plan with zero exchanges") {
    import org.apache.spark.sql.functions._
    import graft.ops.Curate
    val docs = (1L to 100L).map(i => (i, s"src${i % 3}", i % 7 + 1))
      .toDF("doc_id", "source", "n_tokens")
    val split = Curate.hashSplit(docs, $"doc_id",
      Seq("a" -> 0.5, "b" -> 0.5))
    val mix = Curate.mixtureSample(docs, "source", $"doc_id",
      Map("src0" -> 0.5))
    val chunk = Curate.chunkByTokens(docs, "n_tokens", size = 4, overlap = 1)
    for ((df, name) <- Seq((split, "hashSplit"), (mix, "mixtureSample"),
        (chunk, "chunkByTokens"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name should be a narrow op but shuffles:\n$plan")
    }
  }

  test("tokenPack plans exactly one exchange (the partition-key window)") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 100L).map(i => (i, s"l${i % 3}", i % 7 + 1))
      .toDF("doc_id", "lang", "n_tokens")
    val packed = graft.ops.Curate.tokenPack(docs, Seq("lang"),
      Seq($"doc_id"), "n_tokens", budget = 16L)
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
    // and all window work shares ONE Window node
    assert(plan.split("Window").length - 1 == 1, plan)
  }

  test("heavyHitters: sketch partials + broadcast semi-join, no key shuffle of the corpus") {
    val df = (1L to 5000L).map(i => s"k${i % 7}").toDF("k")
    val hh = graft.ops.Frequency.heavyHitters(df, "k", k = 16,
      minFraction = 0.1)
    val plan = hh.queryExecution.executedPlan.toString
    // pass 1: ObjectHashAggregate partial/final pair around one exchange
    // carrying <= k-entry summaries
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("freq_items_mg"), plan)
    // pass 2: candidates (carrying the total) broadcast into the corpus
    // scan — the corpus side is never key-shuffled before the filter
    assert(plan.contains("BroadcastHashJoin"), plan)
    // and the whole operator is exactly two scans of the input
    assert(plan.split("Scan ").length - 1 == 2, plan)
  }
}

package graft

/** Physical-plan shape assertions for the TPC-H queries added in round 3
  * — the properties that make them scale (pushdown, pruning, top-k
  * without a global sort, hinted broadcasts) pinned so a refactor can't
  * silently regress them into full scans. */
class TpchPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_tpch_q6: all three predicates push to the parquet scan") {
    val p = plan("q_tpch_q6")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p.take(400))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(p.contains("LessThanOrEqual(l_discount,0.07)"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    // column pruning: untouched wide columns never reach the scan schema
    assert(!p.contains("l_comment") && !p.contains("l_tax"))
  }

  test("q_tpch_q10: top-20 plans as TakeOrderedAndProject, filters pushed") {
    val p = plan("q_tpch_q10")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("EqualTo(l_returnflag,R)"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("q_tpch_q2 / q_tpch_q20: hinted dimension broadcasts planned") {
    assert(plan("q_tpch_q2").contains("BroadcastExchange"))
    assert(plan("q_tpch_q20").contains("BroadcastExchange"))
  }

  test("q_tpch_q12: single-pass conditional agg (exactly one join node)") {
    // AQE hides children from executedPlan.collect — pin with it off
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val exec = SparkEntry.queries("q_tpch_q12")(spark, sf)
        .queryExecution.executedPlan
      val joins = exec.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.length == 1,
        s"the CASE split must not duplicate the join: ${joins.length}")
    } finally spark.conf.set(key, prev)
    assert(plan("q_tpch_q12").contains("GreaterThanOrEqual(l_shipdate"))
  }
}

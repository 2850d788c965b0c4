package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/**
 * Job-side observability: attach named aggregate metrics to a frame with
 * `Dataset.observe` — the metrics are computed by the SAME job that
 * produces the result, so a pipeline health check (rows in, nulls dropped,
 * quarantine count) costs zero extra scans, unlike the `.count()` probes
 * that double-read a 100 TB input. The returned Observation yields the
 * metric row once any action on the frame completes; in streaming the same
 * metrics surface per micro-batch via QueryProgressEvent.observedMetrics.
 */
object Observe {

  /** Attach metrics; read them with `observation.get` AFTER an action on
    * the returned frame. Metric expressions must be aggregates free of
    * distinct/filter clauses (Spark's observe contract). */
  def withMetrics(df: DataFrame, name: String,
                  metrics: Seq[(String, Column)]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "need at least one metric")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}

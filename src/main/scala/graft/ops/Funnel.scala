package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-sequence analytics over a (user, timestamp, event-type) stream —
 * the product-analytics layer every event pipeline grows: ordered funnel
 * conversion and cohort retention. The reference's events pipeline stops
 * at windowed rates; these are the next questions its dashboards would ask.
 *
 * Scale shape: each funnel stage is a filtered partial aggregate plus an
 * equi-join on the user key — per-stage cost is O(matching events) and the
 * join carries one row per REACHED user, so stage tables shrink
 * monotonically down the funnel. Retention is two grouped aggregates on
 * (user) then (cohort, offset): key spaces |users| and |cohorts × horizon|,
 * both partial-aggregated map-side. No windows over the full stream, no
 * per-user state accumulation.
 */
object Funnel {

  /** Ordered funnel: a user reaches stage k+1 with the earliest event of
    * that stage STRICTLY AFTER their stage-k reach time (first-touch
    * attribution; ties at identical timestamps do not advance). Emits one
    * row per stage: (stage_idx from 1, stage, n_users reached). */
  def funnelCounts(df: DataFrame, user: String, ts: String, stageCol: String,
                   stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    // fold: reached(k) = (user, t_k); join filters events of stage k+1
    val reached = stages.scanLeft(Option.empty[DataFrame]) {
      case (prev, stage) =>
        val evts = df.filter(col(stageCol) === lit(stage))
          .select(col(user), col(ts).as("__t"))
        val gated = prev match {
          case None => evts
          case Some(p) => evts.join(p, user).filter(col("__t") > col("__reach"))
        }
        Some(gated.groupBy(col(user)).agg(min(col("__t")).as("__reach")))
    }.flatten
    val counts = reached.zip(stages).zipWithIndex.map {
      case ((r, stage), i) =>
        r.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
            col("n_users"))
    }
    counts.reduce(_.union(_))
  }

  /** Per-user conversion lag between two funnel stages: whole seconds
    * from the user's FIRST `fromStage` event to their first `toStage`
    * event STRICTLY after it (same first-touch attribution as
    * [[funnelCounts]]; non-converting users emit no row). Lag is an
    * exact integer — µs difference DIV 1e6 — so downstream percentile
    * interpolation runs on small exact values, not 1e12-scale µs where
    * double interpolation picks up engine-visible ulps.
    *
    * Scale shape: two filtered per-user min-aggregations plus one
    * equi-join on the user key — the join carries one row per REACHED
    * user on the from side and only matching events on the to side. */
  def conversionLags(df: DataFrame, user: String, ts: String,
                     stageCol: String, fromStage: String,
                     toStage: String): DataFrame = {
    val t0 = df.filter(col(stageCol) === lit(fromStage))
      .groupBy(col(user)).agg(min(col(ts)).as("__t0"))
    df.filter(col(stageCol) === lit(toStage))
      .select(col(user), col(ts).as("__t1"))
      .join(t0, user)
      .filter(col("__t1") > col("__t0"))
      .groupBy(col(user))
      .agg((min(unix_micros(col("__t1"))) - min(unix_micros(col("__t0"))))
        .as("__us"))
      // integral seconds (µs DIV 1e6; the filter guarantees __us > 0)
      .select(col(user), expr("__us div 1000000L").as("lag_s"))
  }

  /** Inter-event gaps: each event annotated with the exact integral
    * seconds since the same user's PREVIOUS event (any type) — the
    * inter-arrival distribution behind session-gap threshold choice and
    * engagement scoring. First events per user emit no row. `order`
    * must totally order a user's events (pass a unique tiebreaker).
    * One window pass partitioned by user; µs difference DIV 1e6 keeps
    * downstream percentiles on small exact integers. */
  def interEventGaps(df: DataFrame, user: String, order: Seq[String],
                     ts: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(order.map(col): _*)
    df.withColumn("__prev", lag(unix_micros(col(ts)), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__us", unix_micros(col(ts)) - col("__prev"))
      .withColumn("gap_s", expr("__us div 1000000L"))
      .drop("__prev", "__us")
  }

  /** Rolling distinct actives (the WAU/rolling-actives metric): for each
    * key and each calendar day PRESENT in the data, the exact count of
    * distinct entities active in the trailing `windowDays`-day window.
    *
    * Exact distinct over sliding windows is normally the expensive one;
    * the day-grain trick makes it cheap: the raw stream collapses to
    * distinct (key, day, entity) rows FIRST (one input-sized shuffle),
    * then the trailing window is a day-range self-join of that
    * day-grain table — fan-out windowDays×, entity de-dup and count on
    * the join result. Raw events are never range-joined.
    *
    * Day boundaries are whole calendar days of `ts`; each anchor day is
    * a day with ≥1 event for that key (quiet days emit no row). */
  def rollingActive(df: DataFrame, keys: Seq[String], ts: String,
                    entity: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 3660,
      s"windowDays out of range: $windowDays")
    val k = keys.map(col)
    val daily = df
      .select((k :+ to_date(col(ts)).as("day") :+ col(entity).as("__e")): _*)
      .distinct()
    val anchors = daily.select((k :+ col("day")): _*).distinct()
      .select((keys.map(kc => col(kc).as(s"__a_$kc")) :+
        col("day").as("__aday")): _*)
    val cond = keys.map(kc => col(s"__a_$kc") === daily(kc)).reduce(_ && _) &&
      daily("day") > date_sub(col("__aday"), windowDays) &&
      daily("day") <= col("__aday")
    anchors.join(daily, cond)
      .select((keys.map(kc => col(s"__a_$kc").as(kc)) :+
        col("__aday").as("day") :+ col("__e")): _*)
      .distinct()
      .groupBy((k :+ col("day")): _*)
      .agg(count(lit(1)).as("n_active"))
  }

  /** Cohort lifetime value: users cohorted by first-seen day; per
    * (cohort_day, age_days) the exact cent revenue and its running
    * cumulative — the LTV curve. The cumulative window runs over
    * |cohorts × ages| aggregate rows, never raw events; all arithmetic
    * exact int64. */
  def cohortLtv(df: DataFrame, user: String, ts: String,
                cents: Column): DataFrame = {
    val firstSeen = df.groupBy(col(user))
      .agg(min(to_date(col(ts))).as("__cohort"))
    val rev = df
      .join(firstSeen, user)
      .groupBy(col("__cohort").as("cohort_day"),
        datediff(to_date(col(ts)), col("__cohort")).as("age_days"))
      .agg(sum(cents).as("rev_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("age_days"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    rev.withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
  }

  /** First-order Markov transition matrix over each user's ordered event
    * stream: one row per (from_type, to_type) with the transition count and
    * its row-normalized probability. The only full-data operation is ONE
    * window (lead over the per-user order) whose partition key is the user
    * — at 100 TB this is a single shuffle by user_id with no skew beyond
    * per-user activity, and the aggregate's key space is |types|² — tiny.
    * `order` must be a total order within a user (pass a unique tiebreaker
    * column; timestamp ties otherwise make `lead` engine-dependent). The
    * probability divides the count by its from-row total (two exact longs
    * → one IEEE divide, cross-engine deterministic). */
  def transitionMatrix(df: DataFrame, user: String, order: Seq[String],
                       stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(order.map(col): _*)
    val trans = df
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(stateCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type").as("__f"))
      .agg(sum(col("n")).as("__tot"))
    trans.join(broadcast(totals), col("from_type") === col("__f"))
      .withColumn("p", col("n").cast("double") / col("__tot").cast("double"))
      .select("from_type", "to_type", "n", "p")
  }

  /** Top user journeys: the k most common session-opening event paths —
    * each session's first `maxLen` event types joined with '>' (gap
    * sessionization, same break rule as Sessionize.byGap: strictly more
    * than `gapMinutes` since the previous event starts a new session).
    * The per-session path is built from array_sort over (rank, type)
    * structs, NOT raw collect_list order (which is partition-arrival
    * dependent) — deterministic on any engine. Cost shape: the two
    * session windows share one shuffle on the user key; the path
    * aggregate's key space is |sessions|, the final count |distinct
    * paths| ≤ |types|^maxLen, and top-k is TakeOrderedAndProject. */
  def topPaths(df: DataFrame, user: String, ts: String, tiebreak: String,
               stateCol: String, gapMinutes: Int = 30, maxLen: Int = 3,
               k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(col(ts), col(tiebreak))
    val gapMicros = gapMinutes * 60L * 1000000L
    val marked = df
      .withColumn("__brk",
        when(unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w)
          > gapMicros, 1).otherwise(0))
      .withColumn("__sess",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val ws = Window.partitionBy(col(user), col("__sess"))
      .orderBy(col(ts), col(tiebreak))
    marked
      .withColumn("__rn", row_number().over(ws))
      .filter(col("__rn") <= maxLen)
      .groupBy(col(user), col("__sess"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn").as("r"),
            col(stateCol).as("s")))),
          e => e.getField("s")),
        ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention: cohort = a user's first-seen date; one row per
    * (cohort_date, day offset) with the distinct users from that cohort
    * active that day. offset 0 row = cohort size. */
  def retentionCohorts(df: DataFrame, user: String, ts: String): DataFrame = {
    val days = df.select(col(user), to_date(col(ts)).as("__d")).distinct()
    val cohorts = days.groupBy(col(user)).agg(min(col("__d")).as("__c"))
    days.join(cohorts, user)
      .groupBy(col("__c").as("cohort_date"),
        datediff(col("__d"), col("__c")).as("day_offset"))
      .agg(countDistinct(col(user)).as("n_users"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.{Combine, Funnel, RangeJoin, Sampling, Skyline, Stats}

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- skyline

  test("skyline2D keeps exactly the non-dominated set, ties included") {
    // maximize x, minimize y
    val pts = Seq(
      (1L, 10L, 5L),  // frontier
      (2L, 10L, 5L),  // exact tie of 1 -> also frontier
      (3L, 10L, 6L),  // dominated by 1 (same x, worse y)
      (4L, 8L, 3L),   // frontier (worse x, better y)
      (5L, 7L, 3L),   // dominated by 4 (worse x, same y)
      (6L, 12L, 9L),  // frontier (best x)
      (7L, 6L, 2L)    // frontier (best y)
    ).toDF("id", "x", "y")
    val got = Skyline.skyline2D(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 6L, 7L))
  }

  test("skyline2D matches brute-force dominance on a pseudo-random set") {
    val rows = (1 to 200).map { i =>
      (i.toLong, (i * 7919 % 83).toLong, (i * 104729 % 97).toLong)
    }
    val got = Skyline.skyline2D(rows.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    val want = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }.map(_._1).toSet
    assert(got == want)
  }

  // ------------------------------------------------------------- benford

  test("benford: digit extraction, probabilities and chi2 on a known set") {
    val vals = Seq(100L, 123L, 190L, 25L, 277L, 3012L, 999L, 1L)
    val out = Stats.benford(vals.toDF("v"), col("v"))
      .orderBy("digit").collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq == Seq(1, 2, 3, 9))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(4L, 2L, 1L, 1L))
    val p1 = out(0).getAs[Double]("p_benford")
    assert(math.abs(p1 - 0.301030) < 1e-9) // log10(2) r6
    val t1 = 8 * math.log10(2.0)
    assert(math.abs(out(0).getAs[Double]("chi2_term")
      - BigDecimal((4 - t1) * (4 - t1) / t1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("benford drops nonpositive values") {
    val out = Stats.benford(Seq(-5L, 0L, 42L).toDF("v"), col("v")).collect()
    assert(out.length == 1 && out(0).getAs[Int]("digit") == 4)
  }

  // -------------------------------------------------- interval overlap

  test("intervalOverlapPairs counts unordered overlaps, duplicate-safe") {
    val iv = Seq(
      // key g1: [1,5] [4,8] [9,12] -> 1 overlapping pair
      ("g1", 1L, 5L), ("g1", 4L, 8L), ("g1", 9L, 12L),
      // key g2: three IDENTICAL intervals -> C(3,2)=3 pairs
      ("g2", 2L, 4L), ("g2", 2L, 4L), ("g2", 2L, 4L),
      // key g3: disjoint -> 0 pairs -> filtered out
      ("g3", 1L, 2L), ("g3", 5L, 6L),
      // key g4: touching endpoints overlap (inclusive): [1,3],[3,5]
      ("g4", 1L, 3L), ("g4", 3L, 5L)
    ).toDF("k", "s", "e")
    val got = RangeJoin.intervalOverlapPairs(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("n_intervals"), r.getAs[Long]("n_overlap_pairs")))
      .toSet
    assert(got == Set(("g1", 3L, 1L), ("g2", 3L, 3L), ("g4", 2L, 1L)))
    // every exact row carries overflow = false
    assert(RangeJoin.intervalOverlapPairs(iv, Seq("k"), "s", "e")
      .collect().forall(!_.getAs[Boolean]("overflow")))
  }

  test("intervalOverlapPairs: hot key overflows flagged, never quadratic") {
    // one pathological key with 50k identical intervals (2.5e9 ordered
    // pairs if self-joined) plus healthy keys; under a 1000 cap the hot
    // key must be EXCLUDED from the self-join — the probe completes in
    // join-input time, emits (n_intervals, NULL, true) for the hot key,
    // and the healthy keys stay exact
    val hot = (1 to 50000).map(_ => ("hot", 1L, 100L))
    val ok = Seq(("g1", 1L, 5L), ("g1", 4L, 8L), ("g1", 9L, 12L))
    val iv = (hot ++ ok).toDF("k", "s", "e").repartition(4)
    val t0 = System.nanoTime()
    val got = RangeJoin
      .intervalOverlapPairs(iv, Seq("k"), "s", "e", maxGroupSize = 1000)
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("n_intervals"),
        Option(r.get(r.fieldIndex("n_overlap_pairs"))),
        r.getAs[Boolean]("overflow"))).toSet
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got == Set(("hot", 50000L, None, true),
      ("g1", 3L, Some(1L), false)))
    // generous bound: the uncapped quadratic (2.5e9 pairs through a
    // count) would take minutes; the capped path is join-input-sized
    assert(sec < 60.0, s"capped overlap took ${sec}s — cap not effective")
  }

  // ------------------------------------------------------ PPS sampling

  test("ppsSystematic: ~n rows, buckets increase, heavy rows always in") {
    // heavy row = ~29% of total weight: it spans several W/n buckets, so
    // it MUST be drawn (selected once) and the draw stays ~n rows total
    val pop = (1 to 500).map(i => (i.toLong, 10L)) :+ (501L, 2000L)
    val df = pop.toDF("id", "w")
    val out = Sampling.ppsSystematic(df, col("id"), col("w"), n = 20)
      .orderBy("bucket").collect()
    assert(out.length <= 20 && out.length >= 10)
    assert(out.exists(_.getAs[Long]("id") == 501L))
    val buckets = out.map(_.getAs[Long]("bucket"))
    assert(buckets.toSeq == buckets.sorted.toSeq)
    assert(buckets.distinct.length == buckets.length)
  }

  // -------------------------------------------------- autocorrelation

  test("autocorrelation: alternating series has acf(1) = -1, acf(2) = +1") {
    val rows = (1 to 40).map(i => ("s", i.toLong, if (i % 2 == 0) 10L else 20L))
    val out = Stats.autocorrelation(rows.toDF("k", "t", "x"), "k",
        Seq(col("t")), col("x"), maxLag = 2)
      .orderBy("lag").collect()
    assert(out.map(_.getAs[Int]("lag")).toSeq == Seq(1, 2))
    assert(out.map(_.getAs[Long]("n_pairs")).toSeq == Seq(39L, 38L))
    assert(math.abs(out(0).getAs[Double]("acf") + 1.0) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("acf") - 1.0) < 1e-9)
  }

  test("autocorrelation: constant series (zero variance) yields NULL acf") {
    val out = Stats.autocorrelation(
        (1 to 10).map(i => ("s", i.toLong, 7L)).toDF("k", "t", "x"),
        "k", Seq(col("t")), col("x"), maxLag = 1).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("acf")))
  }

  test("autocorrelation matches a direct Pearson on lag-1 pairs") {
    val xs = (1 to 30).map(i => (i * 7919 % 23).toLong)
    val rows = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
    val got = Stats.autocorrelation(rows.toDF("k", "t", "x"), "k",
        Seq(col("t")), col("x"), maxLag = 1).collect()(0).getAs[Double]("acf")
    val (a, b) = (xs.dropRight(1).map(_.toDouble), xs.drop(1).map(_.toDouble))
    val n = a.length
    val (sx, sy) = (a.sum, b.sum)
    val sxy = a.zip(b).map { case (p, q) => p * q }.sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * a.map(v => v * v).sum - sx * sx)
        * (n * b.map(v => v * v).sum - sy * sy))
    assert(math.abs(got - BigDecimal(want)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  // ------------------------------------------------ cross-correlation

  test("crossCorrelation finds the planted lead at the right lag") {
    // B is an exact copy of A shifted 2 buckets later -> xcorr(+2) = 1
    val base = (0 until 50).map(i => (i * 7919 % 101 + 1).toLong)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(ts0.getTime + h * 3600000L)
    val rows =
      base.zipWithIndex.map { case (v, h) => ("a", at(h), v) } ++
        base.zipWithIndex.map { case (v, h) => ("b", at(h + 2), v) }
    val out = Stats.crossCorrelation(rows.toDF("k", "ts", "v"), "k", "ts",
        col("v"), 3600L, "a", "b", maxLag = 3)
      .collect().map(r => (r.getAs[Int]("lag"),
        r.getAs[Double]("xcorr"))).toMap
    assert(math.abs(out(2) - 1.0) < 1e-9)
    assert(out.keySet == (-3 to 3).toSet)
    assert((-3 to 3).filter(_ != 2).forall(k => out(k) < 0.999))
  }

  // ------------------------------------------------------ chi-square

  test("chiSquare: independent layout has zero terms, exact expectations") {
    // 2x2 with perfectly proportional counts -> e == o, chi2_term == 0
    val rows = Seq.fill(40)(("r1", "c1")) ++ Seq.fill(10)(("r1", "c2")) ++
      Seq.fill(80)(("r2", "c1")) ++ Seq.fill(20)(("r2", "c2"))
    val out = Stats.chiSquare(rows.toDF("r", "c"), col("r"), col("c"))
      .collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("chi2_term") == 0.0))
    val e = out.map(r => ((r.getAs[String]("row_key"),
      r.getAs[String]("col_key")), r.getAs[Double]("expected"))).toMap
    assert(e(("r1", "c1")) == 40.0 && e(("r2", "c2")) == 20.0)
  }

  test("chiSquare: dependent cell shows the textbook contribution") {
    // one-cell 2x2: o=10, row=10, col=10, N=20 -> e=5, term=(10-5)^2/5=5
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r2", "c2"))
    val out = Stats.chiSquare(rows.toDF("r", "c"), col("r"), col("c"))
      .collect().map(r => ((r.getAs[String]("row_key"),
        r.getAs[String]("col_key")), r.getAs[Double]("chi2_term"))).toMap
    assert(out(("r1", "c1")) == 5.0 && out(("r2", "c2")) == 5.0)
    assert(!out.contains(("r1", "c2"))) // empty cells emit no row
  }

  // -------------------------------------------------- conversion lag

  test("conversionLags: first-touch strict ordering, integral seconds") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // u1: view@10:00, purchase@10:30 and 11:00 -> lag 1800
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:30:00"), "purchase"),
      (1L, t("2024-01-01 11:00:00"), "purchase"),
      // u2: purchase BEFORE first view only -> no row
      (2L, t("2024-01-01 09:00:00"), "purchase"),
      (2L, t("2024-01-01 10:00:00"), "view"),
      // u3: purchase at the same instant as view -> strict, no row
      (3L, t("2024-01-01 08:00:00"), "view"),
      (3L, t("2024-01-01 08:00:00"), "purchase"),
      // u4: view only -> no row
      (4L, t("2024-01-01 07:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionLags(rows, "user_id", "ts", "event_type",
        "view", "purchase")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("lag_s")))
    assert(got.toSeq == Seq((1L, 1800L)))
  }

  // ----------------------------------------------- weighted quantiles

  test("weightedQuantiles: textbook lower weighted quantile, exact ties") {
    // values 10(w=1) 20(w=2) 30(w=3) 40(w=4): W=10
    // cum: 10->1, 20->3, 30->6, 40->10
    // p500 -> first cum*1000 >= 500*10 => 30; p100 -> 10; p300 -> 20 (3*1000=3000 >= 300*10=3000, tie hits exactly)
    val rows = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L),
      ("g", 40L, 4L)).toDF("k", "v", "w")
    val got = Stats.weightedQuantiles(rows, Seq("k"), col("v"), col("w"),
        Seq(100, 300, 500, 1000))
      .collect().map(r => (r.getAs[Int]("permille"),
        r.getAs[Long]("value_q"))).toMap
    assert(got == Map(100 -> 10L, 300 -> 20L, 500 -> 30L, 1000 -> 40L))
  }

  test("weightedQuantiles: continuous doubles band without a whole-group window") {
    // negative + fractional values: exactly the domain length(bin(·))
    // cannot band — the percentile-cut band must (a) keep the answer
    // exact and (b) keep every __v-ordered window partitioned by __band
    val rows = Seq(("g", -5.0, 2L), ("g", 1.5, 3L), ("g", 2.5, 5L))
      .toDF("k", "v", "w")
    val q = Stats.weightedQuantiles(rows, Seq("k"), col("v"), col("w"),
      Seq(200, 500, 1000))
    val got = q.collect().map(r => (r.getAs[Int]("permille"),
      r.getAs[Double]("value_q"))).toMap
    assert(got == Map(200 -> -5.0, 500 -> 1.5, 1000 -> 2.5))
    // plan pin: every window spec that sorts the value column must also
    // partition by the band — a spec ordering __v partitioned only by the
    // group keys is the single-task whole-group sort this operator avoids
    val specs = "windowspecdefinition\\([^)]*\\)".r
      .findAllIn(q.queryExecution.optimizedPlan.toString).toSeq
    val valueOrdered = specs.filter(_.contains("__v#"))
    assert(valueOrdered.nonEmpty, s"expected a __v-ordered window: $specs")
    valueOrdered.foreach(s =>
      assert(s.contains("__band"), s"unbanded __v window: $s"))
  }

  test("weightedQuantiles: non-numeric values keep the exact fallback path") {
    val rows = Seq(("g", "apple", 1L), ("g", "banana", 2L), ("g", "cherry", 7L))
      .toDF("k", "v", "w")
    val got = Stats.weightedQuantiles(rows, Seq("k"), col("v"), col("w"),
        Seq(100, 300, 1000))
      .collect().map(r => (r.getAs[Int]("permille"),
        r.getAs[String]("value_q"))).toMap
    assert(got == Map(100 -> "apple", 300 -> "banana", 1000 -> "cherry"))
  }

  test("weightedQuantiles: duplicate values pool their weight") {
    val rows = Seq(("g", 5L, 1L), ("g", 5L, 1L), ("g", 5L, 1L),
      ("g", 9L, 1L)).toDF("k", "v", "w")
    val got = Stats.weightedQuantiles(rows, Seq("k"), col("v"), col("w"),
        Seq(500, 1000))
      .collect().map(r => (r.getAs[Int]("permille"),
        r.getAs[Long]("value_q"))).toMap
    assert(got == Map(500 -> 5L, 1000 -> 9L))
  }

  // -------------------------------------------------- centroid eval

  test("nearestCentroidConfusion: separable clusters sit on the diagonal") {
    // label 0 around (+1, 0), label 1 around (0, +1); one planted
    // mislabeled point deep in the other cluster -> one off-diagonal cell
    val rows =
      (1 to 20).map(i => (i.toLong, Array(1.0f + i * 0.001f, 0.05f), 0)) ++
        (21 to 40).map(i => (i.toLong, Array(0.05f, 1.0f + i * 0.001f), 1)) ++
        Seq((41L, Array(0.02f, 1.2f), 0)) // labeled 0, lives in cluster 1
    val got = graft.sim.CentroidEval.nearestCentroidConfusion(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
      .collect().map(r => ((r.getAs[Int]("true_label"),
        r.getAs[Int]("pred_label")), r.getAs[Long]("n"))).toMap
    assert(got == Map((0, 0) -> 20L, (1, 1) -> 20L, (0, 1) -> 1L))
  }

  // -------------------------------------------------- inter-event gaps

  test("interEventGaps: per-user consecutive gaps, first event emits none") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (1L, 2L, t("2024-01-01 10:00:30")),
      (1L, 3L, t("2024-01-01 10:02:30")),
      (2L, 4L, t("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = Funnel.interEventGaps(rows, "user_id",
        Seq("ts", "event_id"), "ts")
      .collect().map(r => (r.getAs[Long]("event_id"),
        r.getAs[Long]("gap_s"))).toMap
    assert(got == Map(2L -> 30L, 3L -> 120L)) // events 1 and 4 are firsts
  }

  // ----------------------------------------------------- dedup stats

  test("dedupStats: cluster sizes, totals and savings from components") {
    // components: {1,2,3} (chain) and {10,11}; 99 unclustered
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val docs = Seq((1L, 100L), (2L, 40L), (3L, 60L), (10L, 7L), (11L, 9L),
      (99L, 555L)).toDF("doc_id", "n_chars")
    val got = graft.dedup.FuzzyDedup.dedupStats(docs, "doc_id", "n_chars",
        pairs)
      .collect().map(r => (r.getAs[Long]("cluster_size"),
        (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("chars_total"), r.getAs[Long]("chars_saved"))))
      .toMap
    // {1,2,3}: tot 200, kept = doc 1 (min id) = 100 -> saved 100
    // {10,11}: tot 16, kept = doc 10 = 7 -> saved 9
    assert(got == Map(3L -> (1L, 3L, 200L, 100L),
      2L -> (1L, 2L, 16L, 9L)))
  }

  // ----------------------------------------------------- fk audit

  test("fkAudit: orphans vs null FKs counted separately, per relation") {
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(99L)),
      (4L, None)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val out = graft.ops.Stats.fkAudit(Seq(
        ("child.fk", child, "fk", "parent", parent, "pk")))
      .collect()(0)
    assert(out.getAs[String]("relation") == "child.fk")
    assert(out.getAs[Long]("n_rows") == 4L)
    assert(out.getAs[Long]("n_null_fk") == 1L)
    assert(out.getAs[Long]("n_orphans") == 1L)       // row 3 (fk=99)
    assert(out.getAs[Long]("n_orphan_values") == 1L) // value 99
  }

  // ------------------------------------------------- rolling actives

  test("rollingActive: trailing-window exact distinct at day grain") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s + " 12:00:00")
    // k: u1 on d1, u1+u2 on d2, u3 on d9 (outside 7d of d1/d2)
    val rows = Seq(
      ("k", 1L, t("2024-01-01")), ("k", 1L, t("2024-01-01")), // dup event
      ("k", 1L, t("2024-01-02")), ("k", 2L, t("2024-01-02")),
      ("k", 3L, t("2024-01-09"))
    ).toDF("g", "u", "ts")
    val got = graft.ops.Funnel.rollingActive(rows, Seq("g"), "ts", "u", 7)
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_active"))).toMap
    // d1: {u1}; d2: {u1,u2}; d9 window [d3..d9]: {u3}
    assert(got == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-09" -> 1L))
  }

  test("cohortLtv: exact revenue by cohort age with running cumulative") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L), // cohort d1, age 0
      (1L, t("2024-01-03 10:00:00"), 50L),  // age 2
      (2L, t("2024-01-01 11:00:00"), 10L),  // cohort d1, age 0
      (3L, t("2024-01-02 09:00:00"), 7L)    // cohort d2, age 0
    ).toDF("user_id", "ts", "cents")
    val got = graft.ops.Funnel.cohortLtv(rows, "user_id", "ts", col("cents"))
      .collect().map(r => ((r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("age_days")),
        (r.getAs[Long]("rev_cents"), r.getAs[Long]("cum_rev_cents")))).toMap
    assert(got == Map(("2024-01-01", 0) -> (110L, 110L),
      ("2024-01-01", 2) -> (50L, 160L), ("2024-01-02", 0) -> (7L, 7L)))
  }

  // ------------------------------------------------- share of parent

  test("shareOfParent: exact child/parent sums and shares") {
    val rows = Seq(("r1", "a", 30L), ("r1", "a", 10L), ("r1", "b", 60L),
      ("r2", "c", 5L)).toDF("region", "nation", "cents")
    val got = Stats.shareOfParent(rows, Seq("region"), Seq("nation"),
        col("cents"))
      .collect().map(r => ((r.getAs[String]("region"),
        r.getAs[String]("nation")),
        (r.getAs[Long]("m"), r.getAs[Long]("parent_m"),
          r.getAs[Double]("share")))).toMap
    assert(got == Map(("r1", "a") -> (40L, 100L, 0.4),
      ("r1", "b") -> (60L, 100L, 0.6), ("r2", "c") -> (5L, 5L, 1.0)))
  }

  // ----------------------------------------------- signed projection

  test("signedProjection: exact hand-computed sketch, sign from md5 parity") {
    val df = Seq((1L, Array(1.0f, -0.5f)), (2L, Array(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.sim.Spectral.signedProjection(df, "vec_id", "embedding",
        k = 2)
      .collect().map(r => ((r.getAs[Long]("vec_id"), r.getAs[Int]("j")),
        r.getAs[Long]("y"))).toMap
    def sgn(pos: Int, j: Int): Long = {
      val h = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"proj${pos}_$j").substring(0, 1)
      if (java.lang.Long.parseLong(h, 16) % 2 == 0) 1L else -1L
    }
    def q(x: Double) = math.floor(x * 4096.0 + 0.5).toLong
    for (j <- 0 until 2) {
      assert(got((1L, j)) == sgn(0, j) * q(1.0) + sgn(1, j) * q(-0.5))
      assert(got((2L, j)) == sgn(0, j) * q(0.0) + sgn(1, j) * q(2.0))
    }
  }

  // --------------------------------------------------- feature hashing

  test("hashedFeatures: deterministic buckets, signed counts, no zeros") {
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.text.FeatureHash.hashedFeatures(docs, "doc_id", "text",
        k = 64)
      .collect().map(r => ((r.getAs[Long]("doc_id"),
        r.getAs[Int]("bucket")), r.getAs[Long]("w"))).toMap
    // same token -> same bucket on every doc; |w| reflects counts
    def bucketOf(t: String) = (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t).substring(0, 8),
      16) % 64).toInt
    def signOf(t: String) = if (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t).substring(8, 9),
      16) % 2 == 0) 1L else -1L
    val (ba, bb) = (bucketOf("a"), bucketOf("b"))
    assert(out((1L, ba)) == 2L * signOf("a"))
    assert(out((1L, bb)) == 1L * signOf("b"))
    assert(out((2L, ba)) == 1L * signOf("a"))
    assert(!out.keySet.exists(_._1 == 3L)) // empty doc -> no features
    assert(out.keySet.forall(_._2 >= 0) && out.values.forall(_ != 0L))
  }

  // ---------------------------------------------------- wilson bounds

  test("proportionWilson: small perfect segment ranks below a large one") {
    val rows = Seq.fill(3)(("small", true)) ++
      Seq.fill(970)(("big", true)) ++ Seq.fill(30)(("big", false))
    val out = graft.ops.Eval.proportionWilson(rows.toDF("seg", "ok"),
        Seq("seg"), col("ok"))
      .collect().map(r => (r.getAs[String]("seg"),
        (r.getAs[Long]("k"), r.getAs[Long]("n"),
          r.getAs[Double]("rate"), r.getAs[Double]("wilson_lo"),
          r.getAs[Double]("wilson_hi")))).toMap
    val (sk, sn, sr, slo, shi) = out("small")
    val (_, _, br, blo, _) = out("big")
    assert(sk == 3L && sn == 3L && sr == 1.0)
    assert(br == 0.97)
    assert(slo < blo) // 3/3 must NOT outrank 970/1000 by lower bound
    // closed-form check of the small segment: p=1, n=3, z=1.96
    val z2 = 1.96 * 1.96
    val denom = 1.0 + z2 / 3
    val center = (1.0 + z2 / 6) / denom
    val half = (1.96 / denom) * math.sqrt(0.0 + z2 / 36)
    def r6d(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(slo == r6d(center - half) && shi == r6d(center + half))
  }

  // ------------------------------------------------ as-of directions

  test("asOfForward attaches the earliest quote at-or-after, inclusive") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, "k", t("2024-01-01 10:00:00")), // exact instant -> inclusive
      (2L, "k", t("2024-01-01 10:30:00")), // between quotes -> 11:00
      (3L, "k", t("2024-01-01 12:30:00"))  // after last quote -> null
    ).toDF("event_id", "k", "ts")
    val right = Seq(("k", t("2024-01-01 10:00:00"), 100L),
      ("k", t("2024-01-01 11:00:00"), 200L),
      ("k", t("2024-01-01 12:00:00"), 300L)).toDF("k", "qts", "v")
    val got = graft.ops.AsOfJoin.asOfForward(left, right, "k", "ts", "qts",
        Seq("v"), "event_id")
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("asof_v")).map(_.toLong)))
      .toMap
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None))
  }

  test("asOfNearest picks the closer side, ties and exact hits backward") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, "k", t("2024-01-01 10:10:00")), // 10 min back vs 50 fwd -> back
      (2L, "k", t("2024-01-01 10:50:00")), // 50 back vs 10 fwd -> forward
      (3L, "k", t("2024-01-01 10:30:00")), // equidistant -> backward
      (4L, "k", t("2024-01-01 09:00:00"))  // before first -> forward only
    ).toDF("event_id", "k", "ts")
    val right = Seq(("k", t("2024-01-01 10:00:00"), 100L),
      ("k", t("2024-01-01 11:00:00"), 200L)).toDF("k", "qts", "v")
    val got = graft.ops.AsOfJoin.asOfNearest(left, right, "k", "ts", "qts",
        Seq("v"), "event_id")
      .collect().map(r => (r.getAs[Long]("event_id"),
        (r.getAs[Long]("asof_v"), r.getAs[String]("asof_dir")))).toMap
    assert(got == Map(1L -> (100L, "backward"), 2L -> (200L, "forward"),
      3L -> (100L, "backward"), 4L -> (100L, "forward")))
  }

  // ------------------------------------------------ label propagation

  test("labelPropagation separates a barbell graph deterministically") {
    // two triangles {1,2,3} and {10,11,12} bridged by 3-10; hand-traced
    // 3 synchronous min-tie rounds -> left community 1, right community 3
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L)).toDF("id1", "id2")
    val got = graft.ops.Graph.labelPropagation(pairs, iters = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("community")))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  // ------------------------------------------------------ plan shapes

  test("skyline2D plans a broadcast join back (no pair join, no cartesian)") {
    val pts = (1 to 100).map(i =>
      (i.toLong, (i * 13 % 17).toLong, (i * 7 % 19).toLong))
      .toDF("id", "x", "y")
    val p = Skyline.skyline2D(pts, "x", "y")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("CartesianProduct"))
  }

  test("intervalOverlapPairs plans equi-joins on the keys, never cartesian") {
    val iv = (1 to 100).map(i => (s"k${i % 5}", i.toLong, (i + 3).toLong))
      .toDF("k", "s", "e")
    val p = RangeJoin.intervalOverlapPairs(iv, Seq("k"), "s", "e")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("intervalOverlapPairs tie semantics on DATE bounds (inclusive " +
      "endpoints, zero-length, heavy value ties)") {
    // ties between an end and a start at the SAME value must count as
    // overlap (inclusive bounds) — exercised on the declared query's
    // actual column type (DateType) with many equal values and
    // zero-length intervals; added while probing (and rejecting) the
    // r12 sorted-rank rewrite, see intervalOverlapPairs' scaladoc
    def d(day: Int) = java.sql.Date.valueOf(f"2024-01-$day%02d")
    val iv = Seq(
      // [1,3],[3,5] touch -> overlap; [5,5] zero-length touches [3,5]
      ("a", d(1), d(3)), ("a", d(3), d(5)), ("a", d(5), d(5)),
      // strictly disjoint chain -> 0 pairs, filtered
      ("b", d(1), d(2)), ("b", d(3), d(4)), ("b", d(5), d(6)),
      // all-identical zero-length at one value -> C(4,2)=6
      ("c", d(7), d(7)), ("c", d(7), d(7)), ("c", d(7), d(7)),
      ("c", d(7), d(7))
    ).toDF("k", "s", "e")
    val got = RangeJoin.intervalOverlapPairs(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("n_intervals"), r.getAs[Long]("n_overlap_pairs")))
      .toSet
    assert(got == Set(("a", 3L, 2L), ("c", 4L, 6L)))
  }

  // ------------------------------------------------------- reconcile

  test("reconcile tags presence and computes exact deltas, full-outer") {
    val a = Seq((1L, 100L), (2L, 50L), (4L, 70L)).toDF("id", "m")
    val b = Seq((1L, 80L), (3L, 30L), (4L, 70L)).toDF("id", "m")
    val got = Combine.reconcile(a, b, Seq("id"), "m")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("presence"),
        r.getAs[Long]("delta"))).toSet
    assert(got == Set((1L, "both", 20L), (2L, "a_only", 50L),
      (3L, "b_only", -30L), (4L, "both", 0L)))
  }

  test("ppsSystematic is deterministic and excludes nonpositive weights") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 5L), (5L, 5L))
      .toDF("id", "w")
    val a = Sampling.ppsSystematic(df, col("id"), col("w"), n = 2)
      .select("id").as[Long].collect().toSet
    val b = Sampling.ppsSystematic(df, col("id"), col("w"), n = 2)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    assert(!a.contains(2L) && !a.contains(3L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** Eval operator invariants on planted fixtures: AUC endpoints and tie
  * handling against hand-computed Mann-Whitney values, banding
  * invariance (the band grid must never change the statistic), PR
  * confusion-count identities, and MI identities (MI(x,x) = H(x),
  * independence ⇒ MI 0). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def aucOf(rows: Seq[(Double, Boolean)], nbands: Int = 8): Option[Double] = {
    val df = rows.toDF("score", "pos").withColumn("g", lit(1))
    val out = Eval.binaryAuc(df, Seq("g"), col("score"), col("pos"),
      lo = 0.0, hi = 1.0, nbands = nbands).collect()
    assert(out.length == 1)
    Option(out.head.getAs[Any]("auc")).map(_.asInstanceOf[Double])
  }

  test("binaryAuc: perfect separation gives 1.0, inverted gives 0.0") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    assert(aucOf(perfect).contains(1.0))
    assert(aucOf(perfect.map { case (s, p) => (s, !p) }).contains(0.0))
  }

  test("binaryAuc: all-tied scores give exactly 0.5") {
    assert(aucOf(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)))
      .contains(0.5))
  }

  test("binaryAuc: tie-corrected value matches hand computation") {
    // scores: 0.1-, 0.3+, 0.3-, 0.7+  → ranks 1, 2.5, 2.5, 4
    // AUC = (2.5 + 4 − 2·3/2) / (2·2) = 3.5/4 = 0.875
    val rows = Seq((0.1, false), (0.3, true), (0.3, false), (0.7, true))
    assert(aucOf(rows).contains(0.875))
  }

  test("binaryAuc: invariant to the band grid and to clamped edges") {
    val rows = Seq((0.05, false), (0.15, false), (0.2, true), (0.35, false),
      (0.5, true), (0.55, true), (0.8, false), (0.95, true), (1.5, true),
      (-2.0, false)) // out-of-range rows clamp into edge bands
    val r1 = aucOf(rows, nbands = 1) // degenerate: single band
    val r7 = aucOf(rows, nbands = 7)
    val r64 = aucOf(rows, nbands = 64)
    assert(r1 == r7 && r7 == r64 && r1.isDefined)
  }

  test("binaryAuc: single-class group yields NULL, not 0/0") {
    assert(aucOf(Seq((0.2, true), (0.9, true))).isEmpty)
  }

  test("prAtThresholds: confusion counts partition every row") {
    val df = (1 to 100).map(i => (i / 100.0, i % 3 == 0))
      .toDF("score", "pos").withColumn("g", lit(1))
    val out = Eval.prAtThresholds(df, Seq("g"), col("score"), col("pos"),
      Seq(0.25, 0.5, 0.75)).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp")
        + r.getAs[Long]("fn") + r.getAs[Long]("tn") == 100L)
    }
    // threshold 0.5: predicted positive = scores 0.50..1.00 (51 rows)
    val t50 = out.find(_.getAs[Double]("threshold") == 0.5).get
    assert(t50.getAs[Long]("tp") + t50.getAs[Long]("fp") == 51L)
  }

  test("calibrationBins: bin accounting and rates on a planted grid") {
    // 10 rows per decile, i positives in decile i → pos_rate = i/10
    val rows = for { b <- 0 until 10; i <- 0 until 10 }
      yield (b / 10.0 + 0.05, i < b)
    val df = rows.toDF("score", "pos").withColumn("g", lit(1))
    val out = Eval.calibrationBins(df, Seq("g"), col("score"), col("pos"),
      lo = 0.0, hi = 1.0, nbins = 10).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val b = r.getAs[Int]("bin")
      assert(r.getAs[Long]("n") == 10L)
      assert(r.getAs[Double]("pos_rate") == b / 10.0)
      assert(math.abs(r.getAs[Double]("mean_score") - (b / 10.0 + 0.05))
        < 1e-9)
    }
  }

  test("zipfTail: recovers a planted power-law exponent") {
    // counts f_r = round(10^6 / r^2) for ranks 1..60: alpha ≈ 2
    val docs = (1 to 60).flatMap { r =>
      val f = math.max(1, math.round(1e6 / (r.toDouble * r)).toInt)
      Seq.fill(f)(s"w$r")
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val out = graft.text.TfIdf.zipfTail(docs, "doc_id", "text", k = 30)
      .collect().head
    // planted rank slope s = 2 → pdf exponent alpha = 1 + 1/s = 1.5
    val s = out.getAs[Double]("zipf_s")
    val alpha = out.getAs[Double]("alpha")
    assert(s > 1.7 && s < 2.2, s"Hill rank slope off: $s")
    assert(alpha > 1.4 && alpha < 1.65, s"pdf exponent off: $alpha")
    assert(out.getAs[Long]("k") == 30L)
  }

  test("kaplanMeier: textbook censored fixture and wipe-out pinning") {
    val df = Seq((1L, true), (2L, false), (3L, true), (4L, true),
      (5L, false)).toDF("t", "obs").withColumn("g", lit(1))
    val out = graft.ops.Survival.kaplanMeier(df, Seq("g"), "t", col("obs"))
      .orderBy("t").collect()
    val s = out.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
      r.getAs[Double]("survival")))
    assert(s(0) == ((1L, 5L, 0.8)))
    assert(s(1) == ((2L, 4L, 0.8)))         // censoring alone never drops S
    assert(s(2) == ((3L, 3L, 0.533333)))    // 0.8 * 2/3
    assert(s(3) == ((4L, 2L, 0.266667)))    // * 1/2
    assert(s(4) == ((5L, 1L, 0.266667)))
    // everyone at risk dies at t=2: survival pins to exactly 0.0
    val wipe = Seq((1L, true), (2L, true), (2L, true))
      .toDF("t", "obs").withColumn("g", lit(1))
    val w = graft.ops.Survival.kaplanMeier(wipe, Seq("g"), "t", col("obs"))
      .orderBy("t").collect()
    assert(w(1).getAs[Double]("survival") == 0.0)
  }

  test("matchDistribution: output histogram takes the reference shape") {
    // corpus: 300 short + 100 long; reference: 50/50 → the long bin (the
    // argmin) keeps all 100, the short bin samples down toward ~100
    val corpus = ((1 to 300).map(i => (i.toLong, 10.0)) ++
      (301 to 400).map(i => (i.toLong, 90.0))).toDF("id", "len")
    val ref = ((1 to 50).map(_ => 10.0) ++ (1 to 50).map(_ => 90.0))
      .toDF("len")
    val out = graft.ops.Curate.matchDistribution(corpus, "len", ref, "len",
      col("id"), lo = 0.0, hi = 100.0, nbins = 2).collect()
    val byBin = out.groupBy(_.getAs[Double]("len")).view.mapValues(_.length)
    assert(byBin(90.0) == 100, "argmin bin must keep every row")
    val short = byBin(10.0)
    assert(short > 70 && short < 130,
      s"short bin must sample toward the 1:1 reference shape: $short")
    // membership is a subset of the input, never fabricated
    assert(out.map(_.getAs[Long]("id")).toSet.subsetOf((1L to 400L).toSet))
  }

  test("linkage: agreement on a rarer field outweighs a common one") {
    // 'rare' has 10 values (u ≈ 0.1), 'common' has 2 (u ≈ 0.5): a pair
    // agreeing only on rare must outscore a pair agreeing only on common
    def mk(ids: Range, idCol: String) = ids.map { i =>
      (i.toLong, 1L, s"r${i % 10}", s"c${(i / 10) % 2}")
    }.toDF(idCol, "blk", "rare", "common")
    val a = mk(0 until 100, "id_a")
    val b = mk(100 until 200, "id_b")
    val out = graft.ops.Linkage.scorePairs(a, b, "id_a", "id_b",
        blocks = Seq("blk"), fields = Seq("rare", "common"))
      .collect()
    assert(out.length == 100 * 100)
    def score(ra: Boolean, c: Boolean): Double = {
      val hits = out.filter(r => r.getAs[Boolean]("agree_rare") == ra &&
        r.getAs[Boolean]("agree_common") == c)
      assert(hits.nonEmpty); hits.head.getAs[Double]("score")
    }
    assert(score(ra = true, c = false) > score(ra = false, c = true))
    assert(score(ra = true, c = true) > score(ra = true, c = false))
    assert(score(ra = false, c = false) < score(ra = false, c = true))
    // u-weights are data-derived: agree-on-rare ≈ ln(.9/.1) + ln(.1/.5)
    val exp = math.log(0.9 / 0.1) + math.log((1.0 - 0.9) / (1.0 - 0.5))
    assert(math.abs(score(ra = true, c = false) - exp) < 1e-6)
  }

  test("mutualInfo: MI(x, x) = H(x) and NMI = 1") {
    val df = Seq("a", "a", "b", "b", "c", "c", "c", "d")
      .toDF("x").withColumn("g", lit(1)).withColumn("y", col("x"))
    val r = Eval.mutualInfo(df, Seq("g"), "x", "y").collect().head
    assert(r.getAs[Double]("mi") == r.getAs[Double]("h_a"))
    assert(r.getAs[Double]("nmi") == 1.0)
  }

  test("mutualInfo: independent uniform columns have MI 0") {
    val df = (for { a <- Seq("a", "b"); b <- Seq("x", "y", "z") }
      yield (a, b)).toDF("u", "v").withColumn("g", lit(1))
    val r = Eval.mutualInfo(df, Seq("g"), "u", "v").collect().head
    assert(math.abs(r.getAs[Double]("mi")) <= 1e-6)
  }

  test("mutualInfo: both-constant columns yield NULL nmi") {
    val df = Seq(("k", "k"), ("k", "k")).toDF("u", "v")
      .withColumn("g", lit(1))
    val r = Eval.mutualInfo(df, Seq("g"), "u", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("nmi")))
    assert(r.getAs[Double]("mi") == 0.0)
  }

  test("cohensKappa: textbook 2x2 table, perfect agreement, and " +
      "chance-only NULL") {
    // 2x2 fixture: marginals a=(25,25), b=(30,20) -> po = 0.70,
    // pe = (25·30 + 25·20)/50² = 0.50, kappa = 0.2/0.5 = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Eval.cohensKappa(rows.toDF("a", "b").withColumn("g", lit(1)),
      Seq("g"), "a", "b").collect().head
    assert(r.getAs[Long]("n_items") == 50L)
    assert(math.abs(r.getAs[Double]("po") - 0.70) < 1e-12)
    assert(math.abs(r.getAs[Double]("pe") - 0.50) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-12)
    // identical raters over >1 class: kappa = 1
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"))
      .toDF("a", "b").withColumn("g", lit(1))
    assert(Eval.cohensKappa(perfect, Seq("g"), "a", "b")
      .collect().head.getAs[Double]("kappa") == 1.0)
    // both raters constant and equal: pe = 1 -> NULL, po = 1
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
      .withColumn("g", lit(1))
    val rc = Eval.cohensKappa(const, Seq("g"), "a", "b").collect().head
    assert(rc.isNullAt(rc.fieldIndex("kappa")))
    assert(rc.getAs[Double]("po") == 1.0)
  }

  test("twoProportionZ: hand-computed z; zero-variance and empty-arm " +
      "NULLs") {
    // A: 30/100, B: 50/100 -> pooled 0.4, z = 0.2/sqrt(0.4·0.6·0.02)
    val rows = (Seq.fill(30)((false, true)) ++ Seq.fill(70)((false, false))
      ++ Seq.fill(50)((true, true)) ++ Seq.fill(50)((true, false)))
    val r = Eval.twoProportionZ(
        rows.toDF("arm", "ok").withColumn("g", lit(1)),
        Seq("g"), col("arm"), col("ok")).collect().head
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("succ_b") == 50L)
    val expected = 0.2 / math.sqrt(0.4 * 0.6 * 0.02)
    assert(math.abs(r.getAs[Double]("z") - expected) < 1e-12)
    // all failures -> zero variance -> NULL z
    val zero = Seq((false, false), (true, false)).toDF("arm", "ok")
      .withColumn("g", lit(1))
    val rz = Eval.twoProportionZ(zero, Seq("g"), col("arm"), col("ok"))
      .collect().head
    assert(rz.isNullAt(rz.fieldIndex("z")))
    // one arm empty -> NULL z and NULL rate for that arm
    val onearm = Seq((true, true), (true, false)).toDF("arm", "ok")
      .withColumn("g", lit(1))
    val ro = Eval.twoProportionZ(onearm, Seq("g"), col("arm"), col("ok"))
      .collect().head
    assert(ro.isNullAt(ro.fieldIndex("z")))
    assert(ro.isNullAt(ro.fieldIndex("rate_a")))
  }

  test("associationRules: exact support/confidence/lift on tiny baskets") {
    val baskets = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
      ("g3", "a"), ("g3", "c"), ("g4", "b")).toDF("g", "item")
    val out = graft.ops.Graph.associationRules(baskets, "g", "item",
        minCount = 1L)
      .collect().map(r => (r.getAs[String]("id1"), r.getAs[String]("id2"))
        -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("w") == 2L)
    assert(ab.getAs[Double]("support") == 0.5)
    assert(ab.getAs[Double]("conf_1_to_2") == 2.0 / 3.0)
    assert(ab.getAs[Double]("conf_2_to_1") == 2.0 / 3.0)
    assert(ab.getAs[Double]("lift") == 8.0 / 9.0)
    val ac = out(("a", "c"))
    assert(ac.getAs[Long]("w") == 1L && ac.getAs[Double]("lift") == 4.0 / 3.0)
    assert(!out.contains(("b", "c")))
  }

  test("bradleyTerry: planted dominance order recovered; all-loser " +
      "collapses to 0; shares sum to 1") {
    // a beats b 9:1, b beats c 9:1, c never beats anyone but loses to a
    val votes = (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(5)(("a", "c")))
      .toDF("winner", "loser")
    val out = graft.ops.Preference.bradleyTerry(votes, "winner", "loser")
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Long]("strength"), r.getAs[Double]("share"))).toMap
    assert(out("a")._1 > out("b")._1 && out("b")._1 > out("c")._1)
    assert(out("c")._1 == 0L, "never-winner must collapse to strength 0")
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
    // determinism: a second run returns the identical fixed-point longs
    val again = graft.ops.Preference.bradleyTerry(votes, "winner", "loser")
      .collect().map(r => r.getAs[String]("item") ->
        r.getAs[Long]("strength")).toMap
    assert(out.keys.forall(k => again(k) == out(k)._1))
  }

  test("ndcgAtK: perfect ranking = 1, inverted < 1, no relevant = NULL") {
    // scores rank ids 1..6 descending; relevance matches that order
    val df = Seq((1L, 6.0, 1L), (2L, 5.0, 1L), (3L, 4.0, 0L),
      (4L, 3.0, 0L), (5L, 2.0, 0L), (6L, 1.0, 0L))
      .toDF("id", "score", "rel").withColumn("g", lit(1))
    val r = Eval.ndcgAtK(df, Seq("g"), col("score"), col("rel"),
      col("id"), k = 3).collect().head
    assert(r.getAs[Double]("ndcg") == 1.0)
    assert(r.getAs[Long]("n_candidates") == 6L)
    // invert the scores: both relevant docs fall out of the top-3 cut
    // entirely, so dcg = 0 while idcg > 0
    val inv = df.withColumn("score", -col("score"))
    val ri = Eval.ndcgAtK(inv, Seq("g"), col("score"), col("rel"),
      col("id"), k = 3).collect().head
    assert(ri.getAs[Double]("ndcg") == 0.0)
    assert(ri.getAs[Double]("idcg") > 0.0)
    // all-zero relevance: idcg = 0 -> NULL
    val none = df.withColumn("rel", lit(0L))
    val rn = Eval.ndcgAtK(none, Seq("g"), col("score"), col("rel"),
      col("id"), k = 3).collect().head
    assert(rn.isNullAt(rn.fieldIndex("ndcg")))
  }
}

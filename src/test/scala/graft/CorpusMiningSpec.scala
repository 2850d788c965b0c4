package graft

import org.apache.spark.sql.functions._

import graft.text.{Boilerplate, Subword, Winnow}

class CorpusMiningSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------- duplicated-span removal

  private lazy val spanDocs = Seq(
    (1L, "x y z w tail one"),   // shares 4-gram "x y z w" with 2 and 3
    (2L, "x y z w tail two"),
    (3L, "pre x y z w end"),
    (4L, "totally unrelated words here")
  ).toDF("doc_id", "text")

  test("duplicatedSpans drops tokens covered by a df>=3 4-gram") {
    val out = Boilerplate.duplicatedSpans(spanDocs, "doc_id", "text",
        k = 4, minDf = 3, dfPerDocs = 1000)
      .orderBy("doc_id").collect()
    // "x y z w" appears in docs 1,2,3 -> flagged; covers 4 tokens each
    assert(out.map(_.getAs[String]("clean_text")).toSeq == Seq(
      "tail one", "tail two", "pre end", "totally unrelated words here"))
    assert(out.map(_.getAs[Int]("n_dropped")).toSeq == Seq(4, 4, 4, 0))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq == Seq(6, 6, 6, 4))
  }

  test("duplicatedSpans: overlapping flagged grams cover the union of spans") {
    // "a b c d e" in all 3 docs: grams "a b c d" and "b c d e" both df=3;
    // coverage is positions 0..4 (union), not double-dropped
    val docs = Seq((1L, "a b c d e t1"), (2L, "a b c d e t2"),
      (3L, "a b c d e t3")).toDF("doc_id", "text")
    val out = Boilerplate.duplicatedSpans(docs, "doc_id", "text",
        k = 4, minDf = 3, dfPerDocs = 1000)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("t1", "t2", "t3"))
    assert(out.map(_.getAs[Int]("n_dropped")).toSeq == Seq(5, 5, 5))
  }

  test("duplicatedSpans: short docs (< k tokens) pass through untouched") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Boilerplate.duplicatedSpans(docs, "doc_id", "text",
        k = 4, minDf = 3, dfPerDocs = 1000)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("n_dropped")).forall(_ == 0))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq == Seq(2, 2, 2, 0))
  }

  // --------------------------------------------------------- BPE pair stats

  test("bpePairStats counts word-frequency-weighted adjacent char pairs") {
    // "ab ab abc" -> words: ab(n=2), abc(n=1)
    // pairs: ab: from "ab"x2 + "abc"x1 = 3; bc: from "abc" = 1
    val out = Subword.bpePairStats(Seq("ab ab abc").toDF("text"), "text")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("ab", 3L), ("bc", 1L)))
  }

  test("bpePairStats: single-char words contribute nothing; tie broken by pair asc") {
    val out = Subword.bpePairStats(Seq("a a a xy zw").toDF("text"), "text")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("xy", 1L), ("zw", 1L)))
  }

  // ----------------------------------------------------------- BPE training

  test("bpeTrain: greedy within-word merges, adjacent runs pair up") {
    // corpus: "aaaa" x3, "ab" x2. Round 1: pair (a,a) freq = 3*3 = 9
    // beats (a,b) freq = 2. Merging (a,a) in "aaaa" greedily -> [aa, aa]
    // (NOT [aa, a, a] — adjacent non-overlapping matches both consumed).
    // Round 2: pairs now (aa,aa) freq 3 vs (a,b) freq 2 -> merge (aa,aa).
    val docs = Seq("aaaa aaaa aaaa ab ab").toDF("text")
    val out = Subword.bpeTrain(docs, "text", merges = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (1, "a", "a", "aa", 9L),
      (2, "aa", "aa", "aaaa", 3L),
      (3, "a", "b", "ab", 2L)))
  }

  test("bpeTrain: a merged symbol never re-merges with a bare char") {
    // "aaa": round 1 counts (a,a) at both adjacent positions (freq 2/word,
    // 4 total) then merges greedily -> [aa, a]; the new pair is (aa, a),
    // NOT another (a, a) — symbol identity is the full merged string.
    val out = Subword.bpeTrain(Seq("aaa aaa").toDF("text"), "text", 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", "a", "aa", 4L), (2, "aa", "a", "aaa", 2L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    // single-char words only: zero pairs -> empty merge table
    val out = Subword.bpeTrain(Seq("a b a").toDF("text"), "text", 5)
    assert(out.count() == 0)
    // one word exhausts after 2 merges
    val out2 = Subword.bpeTrain(Seq("abc").toDF("text"), "text", 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out2.size == 2 && out2.last._4 == "abc")
  }

  test("bpeVocab: merged subwords appear with corpus frequencies") {
    // "abab" x2 "cd": merges (a,b)x4 ... after enough rounds "abab" is one
    // symbol with freq 2; c/d survive as single chars with freq 1.
    val vocab = Subword.bpeVocab(Seq("abab abab cd").toDF("text"), "text",
        merges = 8, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(vocab.contains(("abab", 2L)))
    assert(vocab.contains(("cd", 1L)))
    assert(!vocab.exists(_._1 == "a")) // fully absorbed into merges
  }

  test("bpeEncode: trained merges compress token counts per doc") {
    // after 8 merges on this corpus, "abab" is one token, "cd" one token
    val docs = Seq((1L, "abab abab cd"), (2L, "abab xy"))
      .toDF("doc_id", "text")
    val out = Subword.bpeEncode(docs, "doc_id", "text", merges = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: 3 words -> abab(1) + abab(1) + cd(1) = 3 tokens
    // doc 2: 2 words -> abab(1) + xy(1 or 2 depending on merge budget)
    assert(out.head == ((1L, 3L, 3L)))
    assert(out(1)._2 == 2L && out(1)._3 <= 3L)
  }

  // ------------------------------------------------------------------- DSIR

  test("dsir: docs matching the target vocabulary outrank the rest") {
    // target docs speak "alpha beta"; off-target docs speak "junk spam".
    // A raw doc mixing both must land between the pure ones.
    val docs = Seq(
      (1L, true, "alpha beta alpha beta"),
      (2L, true, "alpha beta beta alpha"),
      (3L, false, "junk spam junk spam"),
      (4L, false, "alpha beta junk spam"),
      (5L, false, "junk junk spam spam")).toDF("id", "tgt", "text")
    val top = graft.text.Dsir.selectTopK(docs, "id", "text",
      isTarget = col("tgt"), k = 5, buckets = 64)
      .select("id", "logw").as[(Long, Double)].collect()
    val rank = top.map(_._1).toSeq
    assert(rank.take(2).toSet == Set(1L, 2L), s"target docs not on top: $rank")
    assert(rank(2) == 4L, s"mixed doc not in the middle: $rank")
    assert(rank.drop(3).toSet == Set(3L, 5L))
    // identical token bags -> identical weights
    val byId = top.toMap
    assert(byId(1L) == byId(2L) && byId(3L) == byId(5L))
    assert(byId(1L) > byId(4L) && byId(4L) > byId(3L))
  }

  // ------------------------------------------------- winnowing fingerprints

  /** Naive reference winnowing: same polynomial hash, explicit window scan
    * with rightmost-min selection. */
  private def naiveWinnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    val n = text.length - k + 1
    if (n < w) return Set.empty
    val h = (1 to n).map { p =>
      val hv = (0 until k).foldLeft(0L)((a, j) =>
        a * Winnow.Base + text.charAt(p - 1 + j).toLong) % Winnow.Mod
      (p, hv)
    }
    (0 to n - w).map { i =>
      val win = h.slice(i, i + w)
      val m = win.map(_._2).min
      win.filter(_._2 == m).maxBy(_._1) // rightmost min
    }.toSet
  }

  test("fingerprints match a naive reference implementation") {
    val texts = Seq("abcdefghijklmnop", "the quick brown fox jumps",
      "aaaaaaaaaaaa", "abababababab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 5)
      .select($"doc_id", $"p", $"h").collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        (r.getAs[Long]("p").toInt, r.getAs[Long]("h"))).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Set.empty) == naiveWinnow(t, 4, 5),
        s"doc $i: '$t'")
    }
  }

  test("fingerprint density: every length-(w+k-1) substring window selects >= 1") {
    // guarantee from the winnowing paper: at least one fingerprint per
    // w consecutive k-grams
    val t = "qwertyuiopasdfghjklzxcvbnm0123456789"
    val fps = naiveWinnow(t, 4, 5).map(_._1).toSeq.sorted
    val n = t.length - 3
    (1 to n - 4).foreach { i =>
      assert(fps.exists(p => p >= i && p <= i + 4), s"window at $i uncovered")
    }
    val spark2 = Winnow.fingerprintSummary(
      Seq((1L, t)).toDF("doc_id", "text"), "doc_id", "text", 4, 5).collect()(0)
    assert(spark2.getAs[Long]("n_fp") == fps.size)
  }

  test("fingerprints: doc shorter than k+w-1 emits no row (no partial windows)") {
    val out = Winnow.fingerprintSummary(
      Seq((1L, "abc"), (2L, "abcdefg")).toDF("doc_id", "text"),
      "doc_id", "text", k = 4, w = 5).collect()
    assert(out.isEmpty) // doc 2 has 4 grams < w=5 -> no full window
  }
}

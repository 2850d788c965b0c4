package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/**
 * Near-duplicate detection for training-data pipelines: exact (hash
 * groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
 *
 * Scale design:
 *  - Exact dedup groups on md5(text), never on the raw text, so the shuffle
 *    carries 32-byte keys instead of documents.
 *  - Jaccard runs only inside candidate blocks (LSH buckets or a caller
 *    blocking key); the all-pairs form is O(n^2) and deliberately not
 *    exposed.
 *  - Shingle self-joins cap document frequency (`maxDf`): a shingle
 *    appearing in thousands of docs is both useless for similarity and a
 *    quadratic skew bomb — dropping it bounds per-key join fan-out.
 *  - MinHash/SimHash signatures are fixed-width (numPerm longs / one long),
 *    so the candidate-pair shuffle is tiny regardless of document size.
 */
object FuzzyDedup {

  /** Exact duplicate groups keyed by content hash; keeps the smallest id as
    * the canonical representative. */
  def exactDupGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("content_md5"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word-shingle n-gram expansion: one row per distinct (id, shingle). */
  def shingles(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id), explode(array_distinct(
        TextAnalysis.wordNGrams(TextAnalysis.tokens(col(text)), n))).as("shingle"))

  /** Hash-space shingle expansion: one row per distinct (id, h64) where h64
    * is the XXH64 of the n-gram bytes, computed by the native NGramHashes
    * expression — no shingle strings are ever materialized and downstream
    * shuffles carry 8-byte keys. */
  def shingleHashes(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id), explode(graft.functions.NGramHashes.ngramHashes(
        TextAnalysis.tokens(col(text)), n)).as("h64"))

  /** N-gram Jaccard similarity pairs within a blocking key.
    *
    * block: coarse partition (a column name) limiting the candidate space —
    * an LSH bucket, language, length bucket... Pairs are emitted with
    * id1 < id2 and jaccard >= minJaccard.
    *
    * maxDf: drop shingles occurring in more than maxDf docs within a block
    * (skew + usefulness guard; None keeps all).
    *
    * Self-contained, service-safe form: builds the shingle table, computes,
    * materializes the (small) pair output, and releases every internal
    * cache before returning. Pipelines issuing MANY dedup queries over one
    * corpus should build the shingle table once ([[shingleHashes]] +
    * persist, or a stored table at cluster scale) and call
    * [[jaccardPairsFromShingles]] instead of re-tokenizing per call. */
  def jaccardPairs(df: DataFrame, id: String, text: String, block: String,
                   n: Int, minJaccard: Double,
                   maxDf: Option[Int] = Some(1000)): DataFrame = {
    val sh = shingleHashes(df, id, text, n)
      .select(col(id).as("id"), col("h64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = df.select(col(id).as("id"), col(block).as("block"))
    val out = jaccardPairsFromShingles(sh, Some(blocks), minJaccard, maxDf)
    sh.unpersist(false)
    out
  }

  /** Per-document cross-corpus n-gram overlap: the fraction of a doc's
    * distinct n-grams that appear in at least `minDf` documents
    * corpus-wide (itself included, so minDf=2 means "shared with at least
    * one OTHER doc") — the boilerplate/memorization-risk score curation
    * pipelines threshold on (1.0 = nothing unique, 0.0 = all novel).
    * Input is the prebuilt `(id, h64)` shingle table (one row per DISTINCT
    * doc-shingle), so document frequency is a plain count per h64; cost is
    * one 8-byte-key aggregate + one join back — the same class as the
    * dedup index this table already feeds. */
  def crossDocOverlapFromShingles(sh: DataFrame, minDf: Int = 2): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    val dfreq = sh.groupBy(col("h64")).agg(count(lit(1)).as("__df"))
    sh.join(dfreq, "h64")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("__df") >= minDf, 1)).as("n_shared"))
      .withColumn("overlap_ratio",
        col("n_shared").cast("double") / col("n_shingles"))
  }

  /** [[jaccardPairs]] core over a prebuilt `(id, h64)` shingle-hash table —
    * the "index once, query many" path. `blocks` optionally maps id ->
    * blocking key (None = one global block). The caller owns `sh`'s
    * lifetime (persist it when several dedup queries share it; at 100 TB it
    * is a stored table). The pair output is materialized (localCheckpoint)
    * before returning — it is orders of magnitude smaller than the shingle
    * expansion — so no internal cache outlives the call and iterative
    * consumers (connectedComponents) start from a flat, computed plan. */
  def jaccardPairsFromShingles(sh: DataFrame, blocks: Option[DataFrame],
                               minJaccard: Double,
                               maxDf: Option[Int] = Some(1000)): DataFrame =
    pairScoresFromShingles(sh, blocks, maxDf) { d =>
      d.withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")))
        .filter(col("jaccard") >= minJaccard)
        .select("id1", "id2", "n_common", "n1", "n2", "jaccard")
    }

  /** The UNTHRESHOLDED pair-score table over the prebuilt shingle table:
    * one row per co-occurring (id1 < id2) pair with `n_common`, `n1`,
    * `n2` — the shared core both the Jaccard and the containment
    * thresholds are pure column arithmetic over. A pipeline issuing
    * several threshold queries over one corpus should materialize THIS
    * once and filter per consumer: jaccard = n_common/(n1+n2−n_common)
    * and containment = n_common/min(n1,n2) are functions of the row, so
    * filtering the shared table is exactly the per-threshold
    * recomputation minus the repeated intersection self-join (the
    * dominant cost). Output is materialized (localCheckpoint); its size
    * is bounded by the df-capped co-occurrence pair count (290 K rows at
    * sf0.1), orders of magnitude below the shingle expansion. */
  def pairScoreTableFromShingles(sh: DataFrame, blocks: Option[DataFrame],
                                 maxDf: Option[Int] = Some(1000))
      : DataFrame =
    pairScoresFromShingles(sh, blocks, maxDf)(d =>
      d.select("id1", "id2", "n_common", "n1", "n2"))

  /** Exact threshold-CONTAINMENT pairs over the prebuilt shingle table:
    * containment = |A∩B| / min(|A|, |B|) — catches a short document
    * embedded verbatim inside a much longer one, where Jaccard stays
    * small (≤ |A|/|B|) and a Jaccard threshold never fires (the
    * quote-inclusion case dedup pipelines miss with Jaccard alone).
    * Same df-capped blocked self-join shape as
    * [[jaccardPairsFromShingles]]; output adds both one-sided
    * containments so the consumer can tell which side is the subset. */
  def containmentPairsFromShingles(sh: DataFrame, blocks: Option[DataFrame],
                                   minContainment: Double,
                                   maxDf: Option[Int] = Some(1000))
      : DataFrame =
    pairScoresFromShingles(sh, blocks, maxDf) { d =>
      d.withColumn("containment",
        col("n_common").cast("double") / least(col("n1"), col("n2")))
        .filter(col("containment") >= minContainment)
        .select("id1", "id2", "n_common", "n1", "n2", "containment")
    }

  /** The shared blocked df-capped pair core: intersection counts + both
    * sizes, scored/filtered by `finish`, materialized before the
    * internal cache releases. */
  private def pairScoresFromShingles(sh: DataFrame,
                                     blocks: Option[DataFrame],
                                     maxDf: Option[Int])
                                    (finish: DataFrame => DataFrame)
      : DataFrame = {
    val withBlock = blocks match {
      case Some(bl) => sh.join(bl, "id")
        .select(col("id"), col("block"), col("h64").as("shingle"))
      case None => sh
        .select(col("id"), lit(1).as("block"), col("h64").as("shingle"))
    }
    // The df-filtered shingle table feeds three consumers (sizes, both
    // self-join sides): persist for the duration of the call, release after
    // the pair output is materialized.
    val filtered = (maxDf match {
      case Some(cap) =>
        val dfreq = withBlock.groupBy("block", "shingle")
          .agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") <= cap)
          .select("block", "shingle")
        withBlock.join(dfreq, Seq("block", "shingle"))
      case None => withBlock
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val a = filtered.as("a")
    val b = filtered.as("b")
    val inter = a.join(b,
        col("a.block") === col("b.block") &&
        col("a.shingle") === col("b.shingle") &&
        col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_common"))
    val out = finish(inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n_shingles", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n_shingles", "n2"), "id2"))
    val materialized = out.localCheckpoint()
    filtered.unpersist(false)
    materialized
  }

  /** Exact threshold-Jaccard pair join via PREFIX FILTERING — the
    * AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08)
    * as the high-threshold scale path next to the full shingle self-join
    * of [[jaccardPairsFromShingles]] (which pays df² per shingle) and
    * MinHash banding (which carries a probabilistic recall contract).
    *
    * Principle: order shingles globally rarest-first (df asc, hash asc).
    * A pair with jaccard ≥ t needs overlap o ≥ t/(1+t)·(n1+n2), and any
    * pair that can pass also satisfies the length filter t·n2 ≤ n1 (sizes
    * within ratio t), which makes o ≥ ceil(t·nᵢ) for BOTH sides — so by
    * the prefix-filter principle each doc need only EXPOSE its first
    * nᵢ − ceil(t·nᵢ) + 1 ordered shingles to the candidate join. At
    * t = 0.7 that is ~35% of rows, and because the RAREST shingles lead
    * the order, exposed-shingle multiplicity is near 1 exactly where the
    * full self-join multiplies df². Candidates are then verified with an
    * exact intersection count over the full (df-capped) shingle table, so
    * the output EQUALS the all-pairs exact result at ≥ t — deterministic,
    * no banding miss probability. ceil() is taken on t·n − 1e-9 (rounding
    * a hairline product DOWN lengthens a prefix — safe direction — never
    * shortens one). Same block + maxDf semantics as
    * [[jaccardPairsFromShingles]]; same output schema. */
  def prefixJaccardPairs(sh: DataFrame, blocks: Option[DataFrame],
                         minJaccard: Double,
                         maxDf: Option[Int] = Some(1000)): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0, 1]: $minJaccard")
    import org.apache.spark.sql.expressions.Window
    val withBlock = blocks match {
      case Some(bl) => sh.join(bl, "id")
        .select(col("id"), col("block"), col("h64").as("shingle"))
      case None => sh
        .select(col("id"), lit(1).as("block"), col("h64").as("shingle"))
    }
    val dfreq = withBlock.groupBy("block", "shingle")
      .agg(count(lit(1)).as("df_count"))
    val capped = maxDf.foldLeft(dfreq)((d, cap) =>
      d.filter(col("df_count") <= cap))
    // (id, block, shingle, df) after the cap feeds sizes, the prefix
    // expansion, AND both verify sides: persist for the call
    val filtered = withBlock.join(capped, Seq("block", "shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sized = filtered
      .withColumn("n", count(lit(1)).over(Window.partitionBy("id")))
      .withColumn("rn", row_number().over(Window.partitionBy("id")
        .orderBy(col("df_count"), col("shingle"))))
    val prefix = sized.filter(
      col("rn") <= col("n") - ceil(lit(minJaccard) * col("n") - 1e-9) + 1)
      .select("id", "block", "shingle", "n")
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.block") === col("b.block") &&
        col("a.shingle") === col("b.shingle") &&
        col("a.id") < col("b.id") &&
        // length filter: sizes within ratio t or the pair can't reach t
        col("a.n") >= lit(minJaccard) * col("b.n") - 1e-9 &&
        col("b.n") >= lit(minJaccard) * col("a.n") - 1e-9)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .distinct()
    // exact verify: count the FULL intersection for candidate pairs only
    val s1 = filtered.select(col("id").as("id1"), col("shingle"))
    val s2 = filtered.select(col("id").as("id2"), col("shingle"))
    val out = cands.join(s1, "id1").join(s2, Seq("id2", "shingle"))
      .groupBy("id1", "id2", "n1", "n2")
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id1", "id2", "n_common", "n1", "n2", "jaccard")
    val materialized = out.localCheckpoint()
    filtered.unpersist(false)
    materialized
  }

  /** Incremental dedup: near-dup pairs between a NEW batch and the existing
    * corpus — the daily-increment shape. The corpus is never self-joined:
    * cost is Σ (probe-df × corpus-df) per shingle within blocks, bounded by
    * `maxDf`, so a day's batch dedups against years of history at the price
    * of the batch, not the history. At 100 TB the corpus shingle table is a
    * stored index (write [[shingleHashes]] bucketed by (block, shingle)
    * once, reuse daily).
    *
    * The df cap is computed on the CORPUS side only (that is where the
    * boilerplate skew lives), and over-cap shingles are dropped from BOTH
    * sides via anti-join — a probe shingle absent from the corpus entirely
    * (df=0) still counts toward the probe doc's size, keeping the Jaccard
    * denominator honest. Ids are assumed disjoint across the two frames.
    * Output: (new_id, corpus_id, n_common, n1, n2, jaccard >= minJaccard).
    */
  def jaccardPairsAgainst(newDf: DataFrame, corpus: DataFrame, id: String,
                          text: String, block: String, n: Int,
                          minJaccard: Double,
                          maxDf: Option[Int] = Some(1000)): DataFrame = {
    def tagged(df: DataFrame): DataFrame =
      shingleHashes(df, id, text, n)
        .join(df.select(col(id), col(block).as("block")), id)
        .select(col(id).as("id"), col("block"), col("h64").as("shingle"))
    val shC = tagged(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try jaccardPairsAgainstFromShingles(tagged(newDf), shC, minJaccard,
      maxDf)
    finally shC.unpersist(false)
  }

  /** [[jaccardPairsAgainst]] over PRE-SHINGLED sides — (id, block,
    * shingle) frames, typically cut from one session-persisted shingle
    * index so the corpus tokenizes ONCE per session instead of once per
    * call (the cost that made repeated incremental-dedup runs
    * bimodal). Semantics identical: the df cap computes on the corpus
    * side, over-cap shingles drop from BOTH sides via anti/semi joins,
    * probe-only shingles keep counting toward the denominator. */
  def jaccardPairsAgainstFromShingles(shN: DataFrame, shC: DataFrame,
                                      minJaccard: Double,
                                      maxDf: Option[Int] = Some(1000))
      : DataFrame = {
    val filteredN = maxDf match {
      case Some(cap) =>
        val overCap = shC.groupBy("block", "shingle")
          .agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") > cap).select("block", "shingle")
        shN.join(overCap, Seq("block", "shingle"), "left_anti")
      case None => shN
    }
    val filteredC = maxDf match {
      case Some(cap) =>
        // corpus side: equivalent semi form via window-free groupBy join
        val underCap = shC.groupBy("block", "shingle")
          .agg(count(lit(1)).as("df_count"))
          .filter(col("df_count") <= cap).select("block", "shingle")
        shC.join(underCap, Seq("block", "shingle"))
      case None => shC
    }
    val pN = filteredN
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pC = filteredC
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = pN.groupBy("id").agg(count(lit(1)).as("n1"))
      .withColumnRenamed("id", "new_id")
    val n2 = pC.groupBy("id").agg(count(lit(1)).as("n2"))
      .withColumnRenamed("id", "corpus_id")
    val inter = pN.as("a").join(pC.as("b"),
        col("a.block") === col("b.block") &&
        col("a.shingle") === col("b.shingle"))
      .groupBy(col("a.id").as("new_id"), col("b.id").as("corpus_id"))
      .agg(count(lit(1)).as("n_common"))
    val out = inter
      .join(n1, "new_id").join(n2, "corpus_id")
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("new_id", "corpus_id", "n_common", "n1", "n2", "jaccard")
    val materialized = out.localCheckpoint()
    Seq(pN, pC).foreach(_.unpersist(false))
    materialized
  }

  /** MinHash signatures: numPerm 64-bit minima per document over its shingle
    * set. One shuffle (groupBy id); signature width is constant so the
    * output is tiny relative to the corpus. Computed by the one-pass
    * MinHashAgg TypedImperativeAggregate (single long[numPerm] buffer per
    * group), whose per-permutation hash is a 64-bit bijective mixer — see
    * MinHashAgg scaladoc for why the textbook (a*x+b) mod p family was
    * replaced. */
  def minhashSignatures(df: DataFrame, id: String, text: String, n: Int,
                        numPerm: Int = 64, seed: Long = 42L): DataFrame =
    shingleHashes(df, id, text, n)
      .groupBy(col(id))
      .agg(graft.functions.SketchAggs.minhashSig(col("h64"), numPerm, seed)
        .as("signature"))

  /** LSH banding over MinHash signatures: split the signature into `bands`
    * bands of numPerm/bands rows, hash each band, and emit (band_idx,
    * band_hash) bucket keys. Docs sharing any bucket are candidates. */
  def lshBuckets(sig: DataFrame, id: String, bands: Int): DataFrame = {
    val rowsPerBand = expr(s"size(signature) div $bands")
    sig.select(col(id), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("signature"), b * rowsPerBand + 1, rowsPerBand), b)))
        .as(Seq("band_idx", "band_hash")))
  }

  /** Drop bucket keys whose group exceeds `cap` rows — the self-join over a
    * bucket is O(bucket²), so one degenerate mega bucket (empty docs, a
    * boilerplate header shared by millions of pages) is a shuffle bomb.
    * Same guard as jaccardPairs' maxDf; pair it with an *OverflowBuckets
    * audit so truncation stays visible. */
  private def capBuckets(rows: DataFrame, keys: Seq[String],
                         cap: Option[Int]): DataFrame = cap match {
    case Some(c) =>
      val ok = rows.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= c).select(keys.map(col): _*)
      rows.join(ok, keys)
    case None => rows
  }

  /** MinHash-LSH candidate pairs (id1 < id2, distinct). Band buckets larger
    * than maxBucket are dropped (audit: [[minhashOverflowBuckets]]). */
  def minhashCandidates(df: DataFrame, id: String, text: String, n: Int,
                        numPerm: Int = 64, bands: Int = 16,
                        seed: Long = 42L,
                        maxBucket: Option[Int] = Some(10000)): DataFrame =
    minhashCandidatesFromShingles(
      shingleHashes(df, id, text, n).select(col(id).as("id"), col("h64")),
      numPerm, bands, seed, maxBucket)

  /** MinHash signature table from a prebuilt `(id, h64)` shingle table —
    * the second reusable index artifact: banding configurations (any
    * `bands` dividing numPerm) derive from ONE signature computation, so
    * pipelines probing several precision/recall points amortize the sketch
    * aggregation. */
  def minhashSignaturesFromShingles(sh: DataFrame, numPerm: Int = 64,
                                    seed: Long = 42L): DataFrame =
    sh.groupBy(col("id"))
      .agg(graft.functions.SketchAggs.minhashSig(col("h64"), numPerm, seed)
        .as("signature"))

  /** [[minhashCandidates]] over a prebuilt `(id, h64)` shingle table (see
    * [[jaccardPairsFromShingles]] for the sharing contract). Pass
    * `precomputedSig` (an `(id, signature)` frame from
    * [[minhashSignaturesFromShingles]], typically persisted) to skip the
    * sketch aggregation. */
  def minhashCandidatesFromShingles(sh: DataFrame, numPerm: Int = 64,
                                    bands: Int = 16, seed: Long = 42L,
                                    maxBucket: Option[Int] = Some(10000),
                                    precomputedSig: Option[DataFrame] = None): DataFrame = {
    val sig = precomputedSig.getOrElse(
      minhashSignaturesFromShingles(sh, numPerm, seed))
    val buckets = capBuckets(lshBuckets(sig, "id", bands),
      Seq("band_idx", "band_hash"), maxBucket)
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** Star-edge candidate generation for CLUSTERING — the 100 TB dedup-apply
    * path. Listing all candidate pairs ([[minhashCandidatesFromShingles]])
    * is OUTPUT-quadratic in duplicate multiplicity: a family of f copies
    * shares band buckets, so every bucket of size f emits ~f²/2 pairs —
    * no algorithm can beat the output size (DedupScaleProbe at 64×
    * replication: the pair-listing stages are the walls that blow up).
    * Connected components don't need all pairs: within one band bucket, a
    * STAR rooted at the bucket's minimum id connects exactly the same
    * vertex set, so the union of per-bucket stars has exactly the same
    * connected components as the union of per-bucket cliques — with
    * Σ(bucket-1) edges instead of Σ bucket²/2. Per-family cost drops from
    * quadratic to linear in multiplicity; at 100 TB this, plus
    * [[connectedComponents]] and [[applyDedup]], is the dedup pipeline.
    * One window min over the bucket key (a single exchange), no self-join.
    * Equivalence with the all-pairs candidate components is asserted in
    * TextDedupSpec. Precision note: star edges feed CLUSTERING; for
    * verified pairwise similarity use [[minhashVerifiedPairsFromShingles]]
    * — verifying star edges alone would make membership depend on the
    * arbitrary star center. */
  def minhashClusterEdges(sh: DataFrame, numPerm: Int = 64,
                          bands: Int = 16, seed: Long = 42L,
                          maxBucket: Option[Int] = Some(10000),
                          precomputedSig: Option[DataFrame] = None): DataFrame = {
    val sig = precomputedSig.getOrElse(
      minhashSignaturesFromShingles(sh, numPerm, seed))
    val buckets = capBuckets(lshBuckets(sig, "id", bands),
      Seq("band_idx", "band_hash"), maxBucket)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_hash"))
    buckets
      .withColumn("__center", min(col("id")).over(w))
      .filter(col("id") =!= col("__center"))
      .select(col("__center").as("id1"), col("id").as("id2"))
      .distinct()
  }

  /** MinHash-LSH end-to-end near-dup pairs: banding candidates verified
    * with exact n-gram Jaccard computed ONLY on candidate pairs — the
    * production dedup shape (candidate generation bounds the pair space;
    * the exact verify restores precision 1).
    *
    * Recall contract: with the default 16 bands of numPerm/16 = 4 rows, a
    * pair at jaccard j is banded with probability 1-(1-j^4)^16 — at
    * j = 0.9 that is 1 - 4e-8, so for thresholds >= 0.9 the verified
    * output IS (to that probability) the exact true pair set. That makes
    * this operator oracle-checkable end to end, unlike the raw candidate
    * set whose hash family is engine-specific. For lower thresholds raise
    * `bands` (more, narrower bands = higher recall, more candidates).
    *
    * maxDf: the verify step drops shingles above a global document
    * frequency cap, exactly like [[jaccardPairs]] — candidates, however,
    * are banded on the UNFILTERED shingle sets (signatures are computed
    * before df counts exist; the mismatch only perturbs banding
    * probability, never verified correctness). */
  def minhashVerifiedPairs(df: DataFrame, id: String, text: String, n: Int,
                           minJaccard: Double, numPerm: Int = 64,
                           bands: Int = 16, seed: Long = 42L,
                           maxBucket: Option[Int] = Some(10000),
                           maxDf: Option[Int] = Some(1000)): DataFrame = {
    val sh = shingleHashes(df, id, text, n)
      .select(col(id).as("id"), col("h64"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = minhashVerifiedPairsFromShingles(sh, minJaccard, numPerm,
      bands, seed, maxBucket, maxDf).localCheckpoint()
    sh.unpersist(false)
    out
  }

  /** [[minhashVerifiedPairs]] over a prebuilt `(id, h64)` shingle table (see
    * [[jaccardPairsFromShingles]] for the sharing contract). Lazy output;
    * the candidate docs' shingle subset is internally localCheckpointed. */
  def minhashVerifiedPairsFromShingles(sh0in: DataFrame, minJaccard: Double,
                                       numPerm: Int = 64, bands: Int = 16,
                                       seed: Long = 42L,
                                       maxBucket: Option[Int] = Some(10000),
                                       maxDf: Option[Int] = Some(1000),
                                       precomputedSig: Option[DataFrame] = None): DataFrame = {
    // Checkpoint the candidate set: it feeds the length prefilter, the
    // docs-in-candidates projection, AND the intersection join — without a
    // materialization the banding self-join would re-run for each consumer.
    val cand = minhashCandidatesFromShingles(sh0in, numPerm, bands, seed,
      maxBucket, precomputedSig).localCheckpoint()
    val sh0 = sh0in.select(col("id").as("__sid"), col("h64"))
    val filtered = maxDf match {
      case Some(cap) =>
        // global df counts need the full shingle table once (constant-width
        // partial aggregate), but nothing else does
        val ok = sh0.groupBy("h64").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("h64")
        sh0.join(ok, "h64")
      case None => sh0
    }
    // Length prefilter (exact, no recall loss): J(A,B) <= min(|A|,|B|) /
    // max(|A|,|B|), so a candidate pair whose post-filter shingle-set sizes
    // are too far apart can never verify at minJaccard. Wide-band configs
    // (e.g. 32 bands of 2 rows, chosen for a recall proof) produce mostly
    // length-mismatched false positives; this drops them BEFORE their
    // shingle sets are shuffled into the O(pair × shingle) verify join.
    // Sizes come from the same filtered table the verify counts against, so
    // the bound is tight and the surviving-pair jaccard is unchanged.
    val sizesAll = filtered.groupBy("__sid").agg(count(lit(1)).as("__n"))
    val candF = cand
      .join(sizesAll.select(col("__sid").as("id1"), col("__n").as("n1")), "id1")
      .join(sizesAll.select(col("__sid").as("id2"), col("__n").as("n2")), "id2")
      .filter(least(col("n1"), col("n2")).cast("double") /
        greatest(col("n1"), col("n2")) >= minJaccard)
    // Only docs that survive the prefilter need their shingle sets on the
    // verify path — at corpus scale the candidate side is orders of
    // magnitude smaller than the corpus, so checkpoint THAT, not the corpus.
    val docsInCand = candF.select(col("id1").as("__sid"))
      .union(candF.select(col("id2").as("__sid"))).distinct()
    val sh = filtered.join(docsInCand, "__sid").localCheckpoint()
    candF
      .join(sh.select(col("__sid").as("id1"), col("h64")), "id1")
      .join(sh.select(col("__sid").as("id2"), col("h64")), Seq("id2", "h64"))
      .groupBy("id1", "id2", "n1", "n2").agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id1", "id2", "n_common", "n1", "n2", "jaccard")
  }

  /** Side output for [[minhashCandidates]]' maxBucket cap: dropped band
    * buckets with sizes. */
  def minhashOverflowBuckets(df: DataFrame, id: String, text: String, n: Int,
                             maxBucket: Int, numPerm: Int = 64,
                             bands: Int = 16, seed: Long = 42L): DataFrame =
    lshBuckets(minhashSignatures(df, id, text, n, numPerm, seed), id, bands)
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)

  /** Connected components over an undirected pair list (id1, id2) by
    * iterative min-label propagation WITH pointer jumping: each round every
    * node adopts the smallest label among itself, its neighbors, and its
    * current representative's label (the jump) — the jump doubles effective
    * reach per round, giving true O(log(diameter)) convergence (plain
    * neighbor propagation is O(diameter): one hop per round). Throws if
    * maxIter rounds don't converge rather than silently returning split
    * components.
    *
    * The pair list is the post-verification candidate set — orders of
    * magnitude smaller than the corpus — so the per-round join+aggregate
    * is cheap; each round persists and materializes to keep the plan flat
    * (no exponential lineage). Returns (id, comp) where comp = min id of
    * the component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          driverThreshold: Long = 1000000L): DataFrame = {
    // Fast path: the verified pair list is usually tiny relative to the
    // corpus (near-dup rates are low), and the iterative distributed loop
    // costs ~3 jobs per round. Below the threshold, run classic union-find
    // on the driver — exact same output, one job. Guards: (a) only integral
    // id columns take it (the driver decode is long-based; string/decimal
    // ids would cast to null) — anything else goes distributed, which
    // handles any ordered type; (b) ONE limit(threshold+1) collect serves as
    // both the size probe and the edge list, so the upstream pair plan (an
    // expensive verify self-join when unmaterialized) runs once, never
    // twice, and the driver never holds more than threshold+1 rows.
    val spark = pairs.sparkSession
    val integralIds = pairs.schema.fields.take(2).forall(_.dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => true
      case _ => false
    })
    if (driverThreshold > 0 && integralIds) {
      import scala.collection.mutable
      val probe = pairs
        .select(col("id1").cast("long"), col("id2").cast("long"))
        .filter(col("id1").isNotNull && col("id2").isNotNull)
        .limit(driverThreshold.toInt + 1)
        .collect()
      if (probe.length <= driverThreshold) {
        val edges = probe.map(r => (r.getLong(0), r.getLong(1)))
        val parent = mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val next = parent.getOrElse(c, c); parent(c) = r; c = next
          }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        import spark.implicits._
        return nodes.map(n => (n, find(n))).toSeq.toDF("id", "comp")
      }
    }
    distributedComponents(pairs, maxIter)
  }

  /** Distributed min-label propagation with pointer jumping — used above
    * the driver threshold; O(log diameter) rounds. */
  private[dedup] def distributedComponents(pairs: DataFrame,
                                           maxIter: Int): DataFrame = {
    // localCheckpoint (not persist): iterative algorithms grow the Catalyst
    // plan every round, and when the result feeds ANOTHER iterative op
    // (dedup of a deduped corpus) the nested lineage explodes analysis
    // cost/driver heap. Checkpointing truncates the logical plan to a
    // materialized scan each round. (On a cluster with executor churn,
    // swap localCheckpoint for reliable checkpoint(dir).)
    val edges = pairs.select(col("id1"), col("id2"))
      .union(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .localCheckpoint()
    var labels = edges.select(col("id1").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = labels.as("l")
        .join(edges.as("e"), col("l.id") === col("e.id1"))
        .select(col("e.id2").as("id"), col("l.comp").as("comp"))
      // pointer jump: adopt the representative's own representative
      val jump = labels.as("x")
        .join(labels.as("y"), col("x.comp") === col("y.id"))
        .select(col("x.id").as("id"), col("y.comp").as("comp"))
      val next = labels.unionByName(prop).unionByName(jump)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val noChange = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .isEmpty
      labels = next
      converged = noChange
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Dedup ROI report: near-duplicate cluster size distribution and the
    * bytes the min-id-representative rule would save — the number a
    * curation run reports before anyone approves dropping data. One row
    * per cluster SIZE: how many clusters, how many member docs, total
    * member chars, and chars saved (total minus each cluster's kept
    * representative). Representative chars via min_by(size, id) — id is
    * unique, so the choice is total and engine-replayable.
    *
    * Cost: components over the verified pair list (pair-sized), one join
    * of component MEMBERS against the corpus's (id, size) projection,
    * two small aggregates. Unclustered rows never join anything. */
  def dedupStats(df: DataFrame, id: String, sizeCol: String,
                 pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val perCluster = comps
      .join(df.select(col(id).as("id"), col(sizeCol).as("__sz")), "id")
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"),
        sum(col("__sz")).as("__tot"),
        expr("min_by(__sz, id)").as("__kept"))
    perCluster.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("__tot")).as("chars_total"),
        sum(col("__tot") - col("__kept")).as("chars_saved"))
  }

  /** Keep one representative (the min-id member) per near-duplicate
    * component; rows never appearing in `pairs` pass through untouched. */
  def applyDedup(df: DataFrame, id: String, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(id))
    df.join(drop, Seq(id), "left_anti")
  }

  /** Keep the BEST-scoring member per near-duplicate component (max
    * `score`, min-id tiebreak) instead of [[applyDedup]]'s min-id rule —
    * the curation-grade representative choice: when a cluster mixes a
    * full document with its truncated/mangled copies, keep the one worth
    * training on. `score` must be a deterministic column of `df` (length,
    * quality score); ties at equal score fall back to min id so the
    * choice is total. NULL scores lose to any non-NULL score; a component
    * whose members are ALL NULL-scored still elects its min-id member
    * (max() skips NULLs, and the null-safe `<=>` match makes every member
    * a tie) — one representative per component, no matter what. Cost
    * shape is identical to applyDedup: components over the (tiny)
    * verified pair list, two aggregates over component MEMBERS only, and
    * one left_anti against the corpus — rows never in `pairs` pass
    * through untouched without shuffling. */
  def applyDedupBest(df: DataFrame, id: String, pairs: DataFrame,
                     score: String): DataFrame = {
    val comps = connectedComponents(pairs)
    val members = comps.join(
      df.select(col(id).as("id"), col(score).as("__s")), "id")
    val best = members.groupBy(col("comp")).agg(max(col("__s")).as("__smax"))
    val keep = members.join(best, "comp")
      .filter(col("__s") <=> col("__smax"))
      .groupBy(col("comp")).agg(min(col("id")).as("__keep"))
    val drop = members.join(keep, "comp")
      .filter(col("id") =!= col("__keep"))
      .select(col("id").as(id))
    df.join(drop, Seq(id), "left_anti")
  }

  /** End-to-end corpus dedup: block -> n-gram Jaccard verify -> connected
    * components -> keep min-id representative per cluster. */
  def dedupCorpus(df: DataFrame, id: String, text: String, block: String,
                  n: Int, minJaccard: Double): DataFrame =
    applyDedup(df, id,
      jaccardPairs(df, id, text, block, n, minJaccard)
        .select(col("id1"), col("id2")))

  /** SimHash-64 per document: sign-sum of token-hash bits, weighted by token
    * frequency. One-pass SimHashAgg (single int[64] buffer per group, bits
    * packed at eval) — one shuffle, constant-width partials. */
  def simhash64(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id), explode(TextAnalysis.tokens(col(text))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    tok.groupBy(col(id))
      .agg(graft.functions.SketchAggs.simhash64(col("h")).as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit chunks (a pair within hamming
    * distance <= 3 shares at least one of the 4 chunks), verify with
    * bit_count(xor) <= maxHamming. Chunk buckets larger than maxBucket are
    * dropped (audit: [[simhashOverflowBuckets]]) — near-identical
    * boilerplate corpora put millions of docs in one chunk bucket. */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3,
                   maxBucket: Option[Int] = Some(10000)): DataFrame = {
    val sig = simhash64(df, id, text)
    val chunkCols = (0 until 4).map(c =>
      shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)))
    val chunks = capBuckets(
      sig.select(col(id), col("simhash"),
        posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk"))),
      Seq("chunk_idx", "chunk"), maxBucket)
    val a = chunks.as("a")
    val b = chunks.as("b")
    a.join(b,
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk") === col("b.chunk") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"),
        col("a.simhash").as("sh1"), col("b.simhash").as("sh2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh1 ^ sh2)"))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Edit-distance (Levenshtein) near-dup pairs within a blocking key:
    * the character-level complement to token-level Jaccard — catches
    * small in-place edits (typo fixes, template fills) that shift every
    * overlapping n-gram.
    *
    * Cost model: levenshtein(a, b) is O(|a|·|b|) per pair, so the pair
    * space must be bounded BEFORE the verify. Two prefilters do that:
    * the caller's block (lang, cluster, LSH bucket) and the length band
    * (|len(a) - len(b)| <= maxDist is a NECESSARY condition for edit
    * distance <= maxDist — a pure-filter pushdown that costs one length
    * column). Spark 3.5+'s three-arg levenshtein(a, b, threshold) also
    * abandons each computation at the threshold, so per-pair cost is
    * O(maxDist · min(|a|,|b|)), not O(|a|·|b|).
    *
    * Parallelism: the length band is ALSO an equi-key. A join keyed only on
    * `block` puts every same-block pair on one reducer (a constant block =
    * one task doing all the work); bucketing length by width maxDist and
    * exploding the left side to its bucket ± 1 turns the band predicate
    * into an equi-join on (block, bucket) — each bucket's pairs land on
    * their own reducer, and a qualifying pair matches in exactly one
    * bucket (no distinct needed: |len1-len2| <= maxDist puts the buckets
    * at most 1 apart). */
  def editDistancePairs(df: DataFrame, id: String, text: String,
                        block: String, maxDist: Int): DataFrame = {
    val w = math.max(maxDist, 1)
    // Char-histogram counting filter (exact, classic q-gram counting bound):
    // each edit changes at most two per-character counts by 1, so
    // ED(a, b) >= L1(hist(a), hist(b)) / 2 — counting only a subset of the
    // alphabet (here a-z) merely weakens the bound, never breaks it. The
    // histogram costs one O(26·len) pass per DOC; it prunes pairs whose DP
    // would cost O(maxDist·len) each. On the sf0.1 corpus the length band
    // keeps 87k pairs; L1 <= 2·maxDist keeps 155 of them (565x less DP).
    val hist = array(('a' to 'z').map(c =>
      (length(col("t")) -
        length(replace(col("t"), lit(c.toString), lit("")))).cast("int")): _*)
    val base = df.select(col(id).as("id"), col(block).as("block"),
        col(text).as("t"), length(col(text)).as("len"))
      .withColumn("bkt", floor(col("len") / w))
      .withColumn("hist", hist)
    // Spread the verify across reducers even when the doc table is small
    // enough to broadcast (a broadcast join would keep every pair's DP in
    // the scan's few input partitions): hash-repartition the probe side on
    // the bucket keys so each (block, bucket)'s pair work is its own task.
    val lefts = base.withColumn("jbkt",
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)))
      .repartition(col("block"), col("jbkt"))
    val l1 = (0 until 26).map(i =>
      abs(col("a.hist").getItem(i) - col("b.hist").getItem(i))).reduce(_ + _)
    // The DP predicate lives INSIDE the join condition, textually LAST: a
    // post-join filter would be merged into the condition ahead of the
    // cheap conjuncts (Filter-into-Join puts the filter first), making
    // every banded pair pay the levenshtein before the length/histogram
    // bounds get a chance to short-circuit it.
    val dp = levenshtein(col("a.t"), col("b.t"), maxDist)
    lefts.as("a").join(base.as("b"),
        col("a.block") === col("b.block") &&
        col("a.jbkt") === col("b.bkt") &&
        col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= maxDist &&
        l1 <= 2 * maxDist &&
        dp >= 0)
      // survivors are few (155 of 87k banded pairs at sf0.1): recomputing
      // the DP once more per emitted row is noise next to evaluating it
      // pre-filter on every pair
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        dp.as("edit_dist"))
  }

  /** Side output for [[simhashPairs]]' maxBucket cap: dropped chunk buckets
    * with sizes. */
  def simhashOverflowBuckets(df: DataFrame, id: String, text: String,
                             maxBucket: Int): DataFrame = {
    val sig = simhash64(df, id, text)
    val chunkCols = (0 until 4).map(c =>
      shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)))
    sig.select(col(id),
        posexplode(array(chunkCols: _*)).as(Seq("chunk_idx", "chunk")))
      .groupBy("chunk_idx", "chunk").agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus curation for training-data pipelines: deterministic train/val/test
 * splits, weighted source mixtures, and token-budget sequence packing.
 *
 * All membership decisions derive from md5 of the ROW's own key, never from
 * RNG state: the same document lands in the same split on any cluster, any
 * day, any engine (md5 hex is lowercase in Spark and DuckDB alike, and hex
 * strings of equal length order lexicographically exactly as their numeric
 * value — so an 8-hex-digit literal threshold IS a fraction of 2^32).
 * Splits and mixtures are pure narrow filters/projections — no shuffle, no
 * driver state — so they cost one scan at any scale.
 */
object Curate {

  /** Fraction -> 8-hex-digit boundary literal (fraction of the 2^32 hash
    * space). 1.0 maps to "ffffffff"+1 conceptually; we clamp to keep-all. */
  private[graft] def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction out of [0,1]: $f")
    val v = math.min((f * 4294967296.0).toLong, 4294967295L)
    if (f >= 1.0) "g" // '>' any hex digit: keeps every row
    else f"$v%08x"
  }

  /** First 8 hex chars of md5(salt ++ key-as-string): a uniform, portable
    * 32-bit bucket. Key is cast to string so bigint ids render identically
    * across engines. */
  def hashBucket(key: Column, salt: String = ""): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** Deterministic, replayable train/val/test split: each row's bucket is
    * compared against cumulative fraction thresholds. `key` decides
    * membership — pass a GROUP key (e.g. the dedup cluster's canonical id)
    * rather than the row id to get a leakage-safe split where near-duplicate
    * documents always share a side. */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                salt: String = "", splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $splits")
    val h = hashBucket(key, salt)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val first = when(h < lit(hexThreshold(cum.head)), lit(splits.head._1))
    val assigned = splits.tail.init.zip(cum.tail.init)
      .foldLeft(first) { case (acc, ((name, _), c)) =>
        acc.when(h < lit(hexThreshold(c)), lit(name))
      }
      .otherwise(lit(splits.last._1))
    df.withColumn(splitCol, assigned)
  }

  /** Weighted source mixture: keep each row with probability
    * `weights(source)`, decided by its own (source, key) hash — the
    * deterministic form of "sample Wikipedia at 3x, CommonCrawl at 0.1x"
    * corpus blending. The source participates in the hash input so the same
    * key under two sources draws independently. Sources absent from
    * `weights` drop entirely. */
  def mixtureSample(df: DataFrame, sourceCol: String, key: Column,
                    weights: Map[String, Double],
                    salt: String = "mix"): DataFrame = {
    val h = hashBucket(concat(col(sourceCol), lit(":"), key.cast("string")),
      salt)
    val thr = weights.toSeq.sortBy(_._1)
      .foldLeft(lit("")) { case (acc, (src, w)) =>
        when(col(sourceCol) === lit(src), lit(hexThreshold(w))).otherwise(acc)
      }
    df.filter(h < thr)
  }

  /** Rebalance a corpus toward TARGET group shares by deterministic
    * down-sampling — "make the mix 20% per language" when the raw corpus
    * is 42% English. Output size M = min over groups of n_g / t_g (the
    * largest corpus for which no group would need up-sampling); each
    * group's keep-rate is then (M · t_g) / n_g ≤ 1, and membership is the
    * same md5-threshold draw as mixtureSample — fully replayable, no RNG.
    * The rates come from a |groups|-row count aggregate broadcast back
    * onto the corpus: one small shuffle + one narrow filter, never a
    * driver collect. Groups with zero/absent target drop entirely. */
  def balanceBy(df: DataFrame, groupCol: String, key: Column,
                target: Map[String, Double],
                salt: String = "balance"): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ >= 0),
      s"bad target: $target")
    val positive = target.filter(_._2 > 0)
    val tExpr = positive.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (g, t)) =>
        when(col(groupCol) === lit(g), lit(t)).otherwise(acc)
      }
    val counts = df.filter(col(groupCol).isin(positive.keys.toSeq: _*))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__t", tExpr)
    val m = counts.agg(min(col("__n") / col("__t")).as("__m"))
    // keep-rate and its hex threshold as COLUMN twins of hexThreshold:
    // w >= 1 -> "g" (> any hex digit, keep all); else %08x of the clamped
    // 32-bit boundary — lower(hex(...)) because Spark's hex() is uppercase.
    // The keep-all cut uses a 1e-9 tolerance: for the argmin group,
    // (min(n/t))*t/n can land one ulp BELOW 1.0 with non-dyadic targets
    // (e.g. t=0.1), which would hash-sample the very group the contract
    // promises to keep whole.
    val rates = counts.crossJoin(broadcast(m))
      .withColumn("__w", col("__m") * col("__t") / col("__n"))
      .withColumn("__thr",
        when(col("__w") >= 1.0 - 1e-9, lit("g")).otherwise(
          lpad(lower(hex(least(floor(col("__w") * lit(4294967296.0)),
            lit(4294967295.0)).cast("long"))), 8, "0")))
      .select(col(groupCol), col("__thr"))
    val h = hashBucket(concat(col(groupCol), lit(":"), key.cast("string")),
      salt)
    df.join(broadcast(rates), groupCol)
      .filter(h < col("__thr"))
      .drop("__thr")
  }

  /** Down-sample so a numeric feature's distribution matches a REFERENCE
    * corpus's shape — "give the blended corpus the length profile of the
    * curated subset" ([[balanceBy]]'s continuous-feature sibling, with
    * targets DERIVED from data instead of a caller map). Both corpora
    * bin on the same clamped fixed-range grid (the Stats.histogram
    * contract); the kept size is the largest for which no bin needs
    * up-sampling (M = min_b n_b/t_b — the reference total cancels, so
    * the rate is min_c(n_c/r_c)·r_b/n_b directly from raw counts), and
    * membership is the same md5-threshold draw as balanceBy — fully
    * replayable, no RNG. Bins with zero reference mass drop entirely;
    * NULL features drop. Cost: two |bins|-row aggregates broadcast back,
    * one narrow filter — the corpus shuffles zero times. */
  def matchDistribution(df: DataFrame, value: String, reference: DataFrame,
                        refValue: String, key: Column, lo: Double,
                        hi: Double, nbins: Int,
                        salt: String = "matchdist"): DataFrame = {
    require(nbins > 0 && hi > lo, s"need hi > lo and nbins > 0")
    def binOf(c: Column): Column = Stats.binColumn(c, lo, hi, nbins)
    val cur = df.filter(col(value).isNotNull)
      .withColumn("__bin", binOf(col(value)))
    val counts = cur.groupBy(col("__bin")).agg(count(lit(1)).as("__n"))
    val refCounts = reference.filter(col(refValue).isNotNull)
      .withColumn("__bin", binOf(col(refValue)))
      .groupBy(col("__bin")).agg(count(lit(1)).as("__r"))
    val joined = counts.join(refCounts, "__bin")
    val m = joined.agg(min(col("__n").cast("double")
      / col("__r").cast("double")).as("__m"))
    // same keep-all ulp tolerance + hex-threshold twins as balanceBy
    val rates = joined.crossJoin(broadcast(m))
      .withColumn("__w",
        col("__m") * col("__r").cast("double") / col("__n").cast("double"))
      .withColumn("__thr",
        when(col("__w") >= 1.0 - 1e-9, lit("g")).otherwise(
          lpad(lower(hex(least(floor(col("__w") * lit(4294967296.0)),
            lit(4294967295.0)).cast("long"))), 8, "0")))
      .select(col("__bin"), col("__thr"))
    cur.join(broadcast(rates), "__bin")
      .filter(hashBucket(concat(col("__bin").cast("string"), lit(":"),
        key.cast("string")), salt) < col("__thr"))
      .drop("__thr", "__bin")
  }

  /** Corpus blending with weights above 1: weight w emits floor(w) full
    * copies of every row plus one more with probability frac(w) — the
    * "Wikipedia x2.5, CommonCrawl x0.1" epoch-repetition mixture. Each
    * output row carries `copy_id` (0-based) so downstream shuffles/dedups
    * see distinct rows. Deterministic: the fractional copy is decided by
    * the row's own (source, key) hash, so the blended corpus is replayable
    * anywhere. Narrow: one explode, no shuffle; output volume =
    * Σ w_s × |source_s| by construction. */
  def mixtureRepeat(df: DataFrame, sourceCol: String, key: Column,
                    weights: Map[String, Double],
                    salt: String = "mix"): DataFrame = {
    require(weights.values.forall(_ >= 0), s"negative weight in $weights")
    val h = hashBucket(concat(col(sourceCol), lit(":"), key.cast("string")),
      salt)
    val sorted = weights.toSeq.sortBy(_._1)
    val fullCopies = sorted.foldLeft(lit(0L)) { case (acc, (src, w)) =>
      when(col(sourceCol) === lit(src), lit(math.floor(w).toLong))
        .otherwise(acc)
    }
    val fracThreshold = sorted.foldLeft(lit("")) { case (acc, (src, w)) =>
      when(col(sourceCol) === lit(src),
        lit(hexThreshold(w - math.floor(w)))).otherwise(acc)
    }
    df.withColumn("__copies",
        fullCopies + when(h < fracThreshold, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Materialize packed sequences: group [[tokenPack]] output by pack and
    * concatenate the member documents in order into one training-sequence
    * string. Per-group state is bounded by the pack BUDGET (a pack holds at
    * most ~budget tokens by construction), so the collect_list that would
    * be a red flag on arbitrary groups is safe here — the operator's own
    * upstream guarantees the buffer size. Ordering inside the pack is the
    * same total order the packing used (struct-sort on the order columns),
    * so the assembled text is deterministic. */
  def assemblePacks(packed: DataFrame, partitionCols: Seq[String],
                    order: Seq[String], text: String,
                    packCol: String = "pack_id"): DataFrame = {
    val sortKey = struct((order.map(col) :+ col(text)): _*)
    packed.groupBy((partitionCols :+ packCol).map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(sortKey)),
            x => x.getField(text)), " ").as("seq_text"))
  }

  /** Sliding-window document chunking: split each document's token stream
    * into chunks of `size` tokens advancing by `size - overlap` — the
    * retrieval/context-window prep step (long doc -> overlapping model-size
    * pieces). Emits one row per (doc, chunk) with [tok_start, tok_end)
    * bounds; empty documents produce no chunks; a doc of <= `size` tokens
    * produces exactly one. Narrow op: sequence+explode per row, no shuffle —
    * fan-out is bounded by n_tokens/step per document, so output scales
    * with corpus token count, not doc count squared. */
  def chunkByTokens(df: DataFrame, tokensCol: String, size: Int,
                    overlap: Int, chunkCol: String = "chunk_id"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val n = col(tokensCol)
    // integer ceil((n - overlap) / step), floored at 1 chunk for any
    // non-empty doc; double floor is exact below 2^53 tokens per doc
    val nChunks = greatest(lit(1L),
      floor((n - lit(overlap) + lit(step - 1)) / lit(step.toDouble))
        .cast("long"))
    df.filter(n > 0)
      .withColumn(chunkCol, explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("tok_start", col(chunkCol) * step)
      .withColumn("tok_end", least(col("tok_start") + size, n))
  }

  /** Token-budget sequence packing, concatenate-and-chunk semantics: within
    * each partition group, documents ordered by `order` are laid head to
    * tail; a document belongs to pack floor(start_offset / budget) — the
    * standard "concat then slice every N tokens" batching used to build LLM
    * training sequences, where a document may straddle a pack boundary but
    * its ASSIGNMENT (which pack its first token lands in) is deterministic.
    *
    * One shuffle, on `partitionCols`: pick the granularity (language, date,
    * shard) so a group's rows fit an executor — the running sum is a single
    * window pass, O(1) state per row. `order` must be a total order (tie
    * rows would make the running sum nondeterministic). */
  def tokenPack(df: DataFrame, partitionCols: Seq[String], order: Seq[Column],
                tokensCol: String, budget: Long,
                packCol: String = "pack_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val startOff = sum(col(tokensCol)).over(w) - col(tokensCol)
    df.withColumn("start_offset", startOff)
      .withColumn(packCol, floor(startOff / lit(budget)).cast("long"))
  }

  /** Per-group cap: keep at most `n` rows per group, best-first by `order`
    * (which must be a total order for a deterministic cut). This is the
    * "at most N documents per domain" anti-spam curation rule. One shuffle
    * on the group key; row_number is O(1) state per row, and with AQE on,
    * a hot domain's partition is split by skew handling rather than
    * serializing the whole corpus through one task. */
  def capPerGroup(df: DataFrame, group: Seq[String], order: Seq[Column],
                  n: Int, rankCol: String = "rank_in_group"): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    TopK.topKPerGroup(df, group, order, n, rankCol)
  }

  /** k deterministic NEGATIVE partners per anchor row for contrastive
    * training: candidate index = multiplicative draw
    *   ((pos·A) mod N + slot·B) mod N           [A, B odd 32-bit primes]
    * over the [[globalSortIndex]] permutation (md5-ordered, so adjacent
    * ids land far apart), +1-probe on self-collision. Pure int64
    * arithmetic on positive values — bit-identical on any engine, no RNG
    * state — and the md5 permutation de-correlates the draw from id
    * locality. Supports N up to ~3.4e9 rows before pos·A can overflow
    * int64 (document-level corpora; shard above that).
    *
    * Emits (anchor, slot, negative) with slots 1..k. Negatives CAN repeat
    * across slots of one anchor (birthday odds) and are sampled from the
    * whole corpus — anti-join your positive/near-dup pair set downstream
    * (same composition as q_split_leakage's leakage-safe discipline).
    * A single-row corpus has no valid negative: the N ≥ 2 guard below
    * emits ZERO rows rather than the anchor as its own negative.
    * Scale shape: the index is the two-pass global sort (O(256) global
    * step); the draw is a narrow projection; the only join resolves
    * candidate positions back to ids — shuffle on a dense long key. */
  def negativePairs(df: DataFrame, id: String, k: Int,
                    seed: String = "neg"): DataFrame = {
    require(k >= 1 && k <= 1000, s"k out of range: $k")
    val indexed = globalSortIndex(df.select(col(id)), col(id), seed,
      out = "__pos")
    val n = indexed.agg(count(lit(1)).as("__n"))
    val anchors = indexed
      .select(col(id).as("anchor"), col("__pos").as("__apos"))
      .crossJoin(broadcast(n))
      .filter(col("__n") >= 2L)
      .select(col("anchor"), col("__apos"), col("__n"),
        explode(sequence(lit(1), lit(k))).as("slot"))
      .withColumn("__c1",
        expr("pmod(pmod(__apos * 2654435761L, __n) " +
          "+ slot * 2246822519L, __n) + 1L"))
      .withColumn("__cand",
        when(col("__c1") === col("__apos"),
          pmod(col("__c1"), col("__n")) + lit(1L))
          .otherwise(col("__c1")))
    anchors.join(indexed.select(col(id).as("negative"),
        col("__pos").as("__npos")),
        col("__cand") === col("__npos"))
      .select(col("anchor"), col("slot"), col("negative"))
  }

  /** Deterministic global shuffle with a contiguous position column —
    * "ORDER BY md5(key ++ seed)" plus the row_number a training-data loader
    * needs to slice the epoch into batches — WITHOUT the single-partition
    * global window that row_number() over (ORDER BY ...) would plan.
    *
    * Two-pass shape that survives any scale: rows bucket by the first two
    * hex digits of their md5 (256 buckets, so (bucket, hash) order == hash
    * order); pass 1 computes per-bucket counts and exclusive prefix offsets
    * (a 256-row aggregate — the only global step, and it's O(256));
    * pass 2 broadcast-joins the offsets back and takes row_number within
    * each bucket. position = offset + in-bucket rank, 1-based. The key
    * itself breaks md5-collision ties, so the permutation is total. */
  /** Quantile normalization: replace each row's `value` with the
    * reference corpus's value at the SAME quantile — the exact-rank
    * sibling of [[matchDistribution]] (that one drops rows to match a
    * histogram; this one keeps every row and rewrites the feature), and
    * the standard cross-corpus feature alignment before mixing scores
    * from different sources onto one scale.
    *
    * Mechanics, all exact integers: rank r of each row by the total
    * order (value, id); rank j of each reference row by value; target
    * j = ⌈r·n_ref / n⌉ = (r·n_ref + n − 1) DIV n; join the reference's
    * (j → value) map. Equal values share an arbitrary tie order, but
    * every rank inside a tied block maps to the same reference value
    * region deterministically given the id tiebreak on the input side.
    *
    * Both rankings use the banded two-pass pattern ([[Eval.binaryAuc]]'s
    * cumulative) on the clamped [lo, hi] grid — banding only partitions
    * the order, so clamped outliers still rank correctly inside the
    * edge bands; no window ever spans a whole corpus. The final join is
    * an equi-join on the rank int. Int64 envelope: r·n_ref ≤ 9.2e18 —
    * both corpora below ~3·10⁹ rows; shard by quantile range past that.
    */
  def quantileNormalize(df: DataFrame, value: String, id: String,
                        ref: DataFrame, refValue: String,
                        lo: Double, hi: Double, nbands: Int = 256,
                        out: String = "q_normalized"): DataFrame = {
    def ranked(in: DataFrame, v: String, tiebreak: Seq[Column],
               rankCol: String): DataFrame = {
      val banded = in.filter(col(v).isNotNull)
        .withColumn("__b", Stats.binColumn(col(v), lo, hi, nbands))
      val bandTotals = banded.groupBy("__b").agg(count(lit(1)).as("__bn"))
      val offsets = bandTotals
        .withColumn("__off", coalesce(sum(col("__bn")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .drop("__bn")
      val wIn = Window.partitionBy(col("__b"))
        .orderBy((col(v) +: tiebreak): _*)
      banded.join(broadcast(offsets), "__b")
        .withColumn(rankCol, col("__off") + row_number().over(wIn))
        .drop("__b", "__off")
    }
    val r = ranked(df, value, Seq(col(id)), "__r")
    val refIdx = ranked(ref.select(col(refValue)), refValue, Seq.empty,
      "__j").select(col("__j"), col(refValue).as(out))
    val nSelf = r.agg(count(lit(1)).as("__n"))
    val nRef = refIdx.agg(count(lit(1)).as("__nref"))
    r.crossJoin(broadcast(nSelf)).crossJoin(broadcast(nRef))
      .withColumn("__j",
        expr("(__r * __nref + __n - 1) DIV __n"))
      .join(refIdx, "__j")
      .drop("__j", "__r", "__n", "__nref")
  }

  def globalSortIndex(df: DataFrame, key: Column, seed: String = "",
                      out: String = "shuffle_pos"): DataFrame = {
    val withH = df
      .withColumn("__h", md5(concat(key.cast("string"), lit(seed))))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val wb = Window.partitionBy(col("__b")).orderBy(col("__h"), key)
    withH.join(broadcast(offsets), "__b")
      .withColumn(out, col("__off") + row_number().over(wb))
      .drop("__h", "__b", "__off")
  }
}

package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Subword/tokenizer-design statistics: the first iteration of byte-pair
 * encoding (Sennrich et al. 2016) as a corpus aggregate — adjacent
 * character-pair frequencies weighted by word frequency, ranked to give
 * the merge table a BPE trainer would learn first.
 *
 * Scale shape: word explode -> groupBy(word) — the vocabulary table, tiny
 * relative to the corpus (Heaps' law), so every later stage runs on the
 * vocab, not the corpus: per-word character pairs explode a <=word-length
 * factor of a small table, and the pair aggregate is a second small
 * shuffle. This is why BPE training is feasible at 100 TB at all — one
 * corpus-sized shuffle, then everything is vocabulary-sized.
 */
object Subword {

  /** Top-k BPE merge candidates: (pair, freq), freq = total corpus
    * occurrences of the adjacent character pair (within words), ordered by
    * freq desc then pair asc (total order — deterministic at the cut). */
  def bpePairStats(docs: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(length(col("w")) >= 2)
    words
      .select(col("n"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"), col("w"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("n"))
      .groupBy("pair").agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(topK)
  }

  /** Symbol-boundary delimiter for the BPE word representation. Each symbol
    * is stored as `\u0001sym\u0001`, so a word's symbol sequence is their
    * concatenation (`\u0001a\u0001\u0001b\u0001…`). Merging the pair (l, r)
    * is then a single greedy left-to-right literal string replace of
    * `\u0001l\u0001\u0001r\u0001` with `\u0001lr\u0001` — `replace` consumes
    * non-overlapping matches left to right, which is exactly BPE's greedy
    * within-word merge order, and because every symbol carries its own
    * delimiters a match can never straddle a symbol boundary. Words
    * containing the delimiter (absent from any real text) are dropped. */
  private val Sep = "\u0001"
  private val Sep2 = Sep + Sep

  /** Corpus vocabulary in delimited-symbol representation: one row per
    * distinct word `w`, `r` = delimited char-level symbols, `n` = corpus
    * frequency. This is the only corpus-sized pass; everything after runs
    * on the (Heaps-law small) vocabulary. `w` rides along untouched so
    * bpeEncode can join the trained segmentation back to the corpus. */
  private def initVocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(!col("w").contains(Sep))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w"),
        concat(lit(Sep), array_join(array_remove(split(col("w"), ""), ""),
          Sep2), lit(Sep)).as("r"),
        col("n"))

  /** Adjacent-symbol pair frequencies of a delimited vocab, ranked to the
    * single best merge: freq desc, lhs asc, rhs asc (total order). */
  private def bestPair(vocab: DataFrame): Option[(String, String, Long)] =
    vocab
      .select(col("n"),
        split(expr("substring(r, 2, length(r) - 2)"), Sep2).as("syms"))
      // sequence(1, 0) would DESCEND in Spark; 1-symbol words have no pairs
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS lhs,
          |              element_at(syms, i + 1) AS rhs))""".stripMargin))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
      .limit(1)
      .collect()
      .headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** Byte-pair-encoding training (Sennrich et al. 2016): `merges` greedy
    * rounds, each picking the globally most frequent adjacent symbol pair
    * and merging it throughout the vocabulary. Returns the learned merge
    * table `(mrank, lhs, rhs, merged, freq)` ordered by rank.
    *
    * Scale shape: ONE corpus-sized shuffle builds the word-frequency vocab;
    * each round is then a vocabulary-sized aggregate plus a 1-row driver
    * collect (the argmax pair) and a map-only literal replace — k rounds =
    * k tiny jobs, never touching the corpus again. Each round's vocab is
    * localCheckpointed, so lineage never replays earlier rounds (see
    * trainLoop). This is why BPE training stays feasible at 100 TB: cost
    * is corpus + k·|vocab|, not k·corpus. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (table, _) = trainLoop(initVocab(docs, textCol), merges)
    val schema = StructType(Seq(
      StructField("mrank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("freq", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(table.map(Row.fromTuple), 1), schema)
      .orderBy(col("mrank"))
  }

  /** The learned subword vocabulary after `merges` BPE rounds: top-k
    * symbols (single chars + merged subwords) by total corpus occurrences,
    * freq desc then symbol asc. The cut the tokenizer's vocab file would
    * open with. */
  def bpeVocab(docs: DataFrame, textCol: String, merges: Int,
               topK: Int = 40): DataFrame = {
    val (_, vocab) = trainLoop(initVocab(docs, textCol), merges)
    vocab
      .select(col("n"),
        explode(split(expr("substring(r, 2, length(r) - 2)"), Sep2))
          .as("sym"))
      .groupBy("sym").agg(sum(col("n")).as("freq"))
      .orderBy(col("freq").desc, col("sym").asc)
      .limit(topK)
  }

  /** Tokenize the corpus with the merge table learned by `merges` BPE
    * rounds on that same corpus: per-document whitespace word count and
    * REAL subword token count (sum of each word's final symbol count) —
    * the trained counterpart of TextAnalysis.bpeishTokenCount's regex
    * proxy.
    *
    * Scale shape: training is vocabulary-sized (see bpeTrain); the word →
    * token-count segmentation table projects the final checkpointed vocab
    * (vocab-sized, no k-round lineage) and joins back to the exploded corpus — a
    * corpus × tiny-vocab equi-join AQE turns into a broadcast — then one
    * doc-keyed aggregate. Never a corpus-sized shuffle beyond the final
    * per-doc groupBy. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Int): DataFrame = {
    val words = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("w"))
      .filter(!col("w").contains(Sep))
    val (_, vocab) = trainLoop(initVocab(docs, textCol), merges)
    val segmented = vocab
      .select(col("w"),
        size(split(expr("substring(r, 2, length(r) - 2)"), Sep2))
          .as("tok"))
    words.join(segmented, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("tok").cast("long")).as("n_tokens"))
  }

  /** The trained tokenizer's OUTPUT STREAM: one row per emitted subword
    * token — (id, wi, si, token) where `wi` is the word's position in
    * the document and `si` the symbol's position within the word. This
    * is what a training pipeline actually feeds downstream (packing,
    * chunking, vocabulary mapping), not just the per-doc count
    * [[bpeEncode]] summarizes.
    *
    * Scale shape: identical to bpeEncode — training is
    * vocabulary-sized, the segmentation table (word → final symbol
    * ARRAY) projects the checkpointed vocab and joins back
    * broadcast-shaped, and the token explode is a narrow per-row
    * fan-out bounded by word length. Output scales with corpus token
    * count; no extra shuffle beyond the segmentation join. */
  def bpeTokens(docs: DataFrame, idCol: String, textCol: String,
                merges: Int): DataFrame = {
    val words = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("wi", "w")))
      .filter(!col("w").contains(Sep))
    val (_, vocab) = trainLoop(initVocab(docs, textCol), merges)
    val segmented = vocab
      .select(col("w"),
        split(expr("substring(r, 2, length(r) - 2)"), Sep2).as("syms"))
    words.join(segmented, "w")
      .select(col(idCol), col("wi"),
        posexplode(col("syms")).as(Seq("si", "token")))
      .select(col(idCol), col("wi").cast("long").as("wi"),
        col("si").cast("long").as("si"), col("token"))
  }

  /** Runs the merge loop; returns (merge table rows, final vocab). Each
    * round's vocab is localCheckpointed (one eager vocab-sized job that
    * TRUNCATES lineage to materialized blocks), so round i+1's aggregate
    * and replace read round i's blocks — never a replayed chain. A
    * persist()-based variant measured EXPONENTIAL past ~10 rounds (the
    * lazily-cached chain kept re-evaluating); checkpointed rounds keep
    * training linear in k at any round count. The SUPERSEDED round's
    * blocks unpersist as soon as the next round's checkpoint has
    * materialized (the eager localCheckpoint returns only after its
    * blocks exist), so peak storage is TWO vocab snapshots at any k —
    * a realistic vocab build runs k in the tens of thousands, and
    * leaving cleanup to GC-driven ContextCleaner would accumulate k
    * snapshots first. Stops early if no pair remains. */
  private def trainLoop(vocab0: DataFrame, merges: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var vocab = vocab0.localCheckpoint()
    val table = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= merges && !done) {
      bestPair(vocab) match {
        case None => done = true
        case Some((l, r, freq)) =>
          val m = l + r
          table += ((round, l, r, m, freq))
          val next = vocab
            .withColumn("r", replace(col("r"),
              lit(Sep + l + Sep2 + r + Sep), lit(Sep + m + Sep)))
            .localCheckpoint()
          vocab.unpersist()
          vocab = next
          round += 1
      }
    }
    (table.result(), vocab)
  }
}

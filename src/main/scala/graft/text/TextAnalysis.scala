package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language ID, document fingerprinting.
 *
 * Everything is built-in-function composition (split/filter/transform/
 * regexp) — codegen'd, no UDFs, embarrassingly parallel per row: the shape
 * that scales linearly to 100 TB because it adds zero shuffles to a scan.
 */
object TextAnalysis {

  /** Whitespace tokenizer. split() emits an empty first token when the
    * text starts with whitespace (and trim() only strips ASCII spaces, so
    * a leading tab/newline still leaks one through) — remove empties
    * explicitly; empty text tokenizes to [] (count 0). */
  def tokens(c: Column): Column = array_remove(split(c, "\\s+"), "")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword proxy: count of maximal runs of letters, digits, or
    * single other non-space symbols — a cheap, deterministic stand-in for a
    * real tokenizer's token count. Uses graft's native RegexpCountExpr
    * (codegen'd count, no match-array allocation) rather than
    * size(regexp_extract_all(...)). */
  def bpeishTokenCount(c: Column): Column =
    graft.functions.GraftFunctions.regexpCount(c,
      "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  /** Quality features: length, token stats, punctuation/whitespace/alpha
    * ratios, stopword ratio — the standard pre-training quality filters. */
  def withQualityFeatures(df: DataFrame, text: String,
                          stopwords: Seq[String]): DataFrame = {
    val t = col(text)
    val toks = tokens(t)
    val nChars = length(t).cast(DoubleType)
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast(DoubleType)
    val nPunct = length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast(DoubleType)
    val nSpace = nChars - length(regexp_replace(t, "\\s", "")).cast(DoubleType)
    val sw = typedlit(stopwords)
    val nStop = size(filter(toks, tk => array_contains(sw, tk))).cast(DoubleType)
    val nToks = size(toks).cast(DoubleType)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("avg_token_len", (nChars - nSpace) / nToks)
      .withColumn("punct_ratio", nPunct / nChars)
      .withColumn("space_ratio", nSpace / nChars)
      .withColumn("alpha_ratio", nAlpha / nChars)
      .withColumn("stopword_ratio", nStop / nToks)
  }

  /** Default English-ish stopword markers used by the quality score. */
  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Composite quality score in [0,1]: favors mid-length docs with sane
    * punctuation and some stopwords (a crude C4-style heuristic). Expects
    * withQualityFeatures columns. */
  def qualityScore(df: DataFrame): DataFrame =
    df.withColumn("quality_score",
      round(
        least(col("n_tokens") / 100.0, lit(1.0)) * 0.4
          + (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * 0.3
          + least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3, 6))

  /** Language-marker table: language -> distinctive high-frequency words.
    * N-gram/stopword heuristic language ID. */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Heuristic language ID: per-language marker-token counts, argmax with a
    * deterministic tie order (marker-table order; "und" = undetermined when
    * nothing matches). Adds lang_pred + one score column per language. */
  def withLanguageId(df: DataFrame, text: String,
                     markers: Seq[(String, Seq[String])] = defaultMarkers): DataFrame = {
    val toks = tokens(lower(col(text)))
    val scored = markers.foldLeft(df) { case (d, (lang, ws)) =>
      d.withColumn(s"score_$lang",
        size(filter(toks, tk => array_contains(typedlit(ws), tk))))
    }
    val best = markers.map { case (lang, _) => col(s"score_$lang") }
      .reduce((a, b) => greatest(a, b))
    // first marker in table order wins ties (deterministic argmax)
    val pred = markers.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, _)) =>
        when(col(s"score_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text (exact
    * near-normalization dedup key) plus a prefix fingerprint over the first
    * `prefixTokens` tokens (catches shared boilerplate heads). */
  def withFingerprints(df: DataFrame, text: String, prefixTokens: Int = 8): DataFrame = {
    val norm = trim(regexp_replace(lower(col(text)), "\\s+", " "))
    df.withColumn("fp_md5", md5(norm))
      .withColumn("fp_prefix", md5(concat_ws(" ",
        slice(split(norm, " "), 1, prefixTokens))))
  }

  /** Word n-grams (shingles) from a token array column: positions i..i+n-1
    * joined by a single space. Guarded for size < n: Spark's sequence(1, 0)
    * would DESCEND ([1,0]) rather than be empty. */
  def wordNGrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Gopher-style repetition signals: the fraction-of-duplicate-content
    * filters used to drop low-quality boilerplate/spam before pre-training
    * (Rae et al. 2021 §A1.1). All per-row array math — zero shuffles, linear
    * scan at any scale:
    *   - dup_word_ratio:   1 − distinct tokens / tokens
    *   - top_word_ratio:   occurrences of the most frequent token / tokens
    *   - dup_bigram_ratio: 1 − distinct bigrams / bigrams
    * Tokens are lowercased so "The the" counts as a repeat. Rows with zero
    * tokens emit nulls (ratios are undefined, not 0). */
  def withRepetitionFeatures(df: DataFrame, text: String): DataFrame = {
    val toks = tokens(lower(col(text)))
    val n = nullif(size(toks), lit(0)).cast(DoubleType)
    val uniq = array_distinct(toks)
    // O(|uniq|·|toks|) per row: fine for document-sized rows, and it stays
    // inside Catalyst HOFs (no UDF, no per-row map allocation)
    val topN = array_max(transform(uniq, w => size(filter(toks, t => t === w))))
    val bigrams = wordNGrams(toks, 2)
    val nBi = nullif(size(bigrams), lit(0)).cast(DoubleType)
    df.withColumn("n_tokens_r", size(toks))
      .withColumn("dup_word_ratio",
        round(lit(1.0) - size(uniq) / n, 6))
      .withColumn("top_word_ratio", round(topN / n, 6))
      .withColumn("dup_bigram_ratio",
        when(size(toks) > 0 && size(bigrams) === 0, lit(0.0))
          .otherwise(round(lit(1.0) - size(array_distinct(bigrams)) / nBi, 6)))
  }

  /** PII patterns scrubbed before a corpus ships to training: each is a
    * (name, regex, replacement-tag) triple. Regexes stay within the
    * RE2-compatible subset (no backreferences/lookaround) so the same
    * pattern text runs identically in Spark (java.util.regex), RE2-based
    * engines, and the DuckDB oracle. Order matters: email before phone so
    * digit runs inside an address are consumed as part of the email. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Replace every PII match with its tag — row-parallel regexp_replace
    * chain, zero shuffles. */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag) }

  /** Redacted text plus per-pattern match counts (the audit columns a
    * scrubbing job reports): n_<name> per pattern + the scrubbed column. */
  def withPiiRedaction(df: DataFrame, text: String,
                       out: String = "text_redacted"): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (acc, (name, re, _)) =>
      acc.withColumn(s"n_$name",
        graft.functions.GraftFunctions.regexpCount(col(text), re))
    }
    counted.withColumn(out, redactPii(col(text)))
  }
}

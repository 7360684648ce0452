package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis vocabulary for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Catalyst expressions (regexp / md5 / array ops) — codegen'd, no UDFs.
  * Beyond the reference's surface (its only text ops are the Polish delay
  * strings, `src/delays.py:27-30`); designed for per-document evaluation
  * over a 100 TB corpus: every function is a scalar expression, so the
  * whole analysis is one map stage with zero shuffles.
  */
object TextFunctions {

  private[graft] def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // --- language ID (n-gram / marker-word heuristic) --------------------
  /** Marker stopwords per language; scores are whole-word regex counts. */
  val langMarkers: Map[String, String] = Map(
    "en" -> "\\b(the|and|of|is|to|in|that|it)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|que|dans)\\b",
    "es" -> "\\b(el|los|las|y|es|una|que|en)\\b")

  /** CJK codepoint presence → "zh" short-circuit. */
  def cjkCount(text: Column): Column =
    countMatches(text, "[\\x{4e00}-\\x{9fff}]")

  /** Predicted language: zh when CJK chars present; else the marker-count
    * argmax with deterministic priority en > de > fr > es; "unknown" when
    * nothing matches. */
  def langId(text: Column): Column = {
    val lower = lowerText(text)
    val scores = Seq("en", "de", "fr", "es")
      .map(l => l -> countMatches(lower, langMarkers(l)))
    val g = greatest(scores.map(_._2): _*)
    val byPriority = scores.foldLeft(when(cjkCount(text) > 0, "zh")
        .when(g === 0, "unknown")) {
      case (acc, (l, s)) => acc.when(s === g, l)
    }
    byPriority.otherwise("unknown")
  }

  private def lowerText(text: Column): Column = lower(text)

  // --- quality scoring -------------------------------------------------
  def wsTokenCount(text: Column): Column = size(split(text, " "))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(split(text, " ")))

  /** Fraction of whitespace tokens that are common-word markers (any
    * language) — high for prose, low for code/garbage. */
  def stopwordRatio(text: Column): Column =
    countMatches(lowerText(text),
      "\\b(the|a|and|of|is|der|die|und|le|la|et|el|los|y)\\b")
      .cast("double") / wsTokenCount(text).cast("double")

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    countMatches(text, "[^\\w\\s]").cast("double") /
      length(text).cast("double")

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") /
      wsTokenCount(text).cast("double")

  /** Mean token length, exact for single-space-joined text. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (wsTokenCount(text) - 1)).cast("double") /
      wsTokenCount(text).cast("double")

  /** Additive integer quality score (same shape as the reference's weather
    * score F13, `src/weather.py:15-48`): length, diversity, stopword and
    * punctuation signals, bucketed by [[qualityLabel]]. */
  def qualityScore(text: Column): Column = {
    val nTok = wsTokenCount(text)
    val lenScore = when(nTok.between(20, 2000), 2)
      .when(nTok.between(5, 19), 1).otherwise(-1)
    val divScore = when(typeTokenRatio(text) >= 0.4, 2)
      .when(typeTokenRatio(text) >= 0.2, 1).otherwise(0)
    val stopScore = when(stopwordRatio(text) >= 0.05, 1).otherwise(0)
    val punctScore = when(punctRatio(text) > 0.2, -2)
      .when(punctRatio(text) > 0.1, -1).otherwise(0)
    lenScore + divScore + stopScore + punctScore
  }

  def qualityLabel(score: Column): Column =
    when(score >= 4, "high").when(score >= 2, "medium")
      .when(score >= 0, "low").otherwise("garbage")

  /** Fraction of duplicated n-gram occurrences in a gram-array column —
    * the Gopher §A1.1 repetition signal (Rae et al. 2021). Shared by the
    * per-doc signal query (q69) and the corpus report card (q83) so the
    * gate formula cannot silently diverge between them. */
  def dupGramFrac(grams: Column): Column =
    when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") /
        size(grams).cast("double"))
      .otherwise(lit(0.0))

  // --- token counting --------------------------------------------------
  /** BPE-ish pre-tokenizer count: runs of word chars or runs of
    * non-word-non-space chars (the usual GPT-2-style pre-split shape). */
  def regexTokenCount(text: Column): Column =
    countMatches(text, "\\w+|[^\\w\\s]+")

  /** Cheap subword estimate: ~4 chars per BPE token. */
  def estBpeTokens(text: Column): Column = ceil(length(text) / 4.0).cast("long")

  // --- fingerprinting --------------------------------------------------
  /** Canonical text: lowercased, punctuation collapsed to single spaces. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Exact-content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalizedText(text))

  /** Order-insensitive (bag-of-words) fingerprint: md5 of the sorted
    * distinct token list — survives token reordering, the classic
    * near-dup canary. */
  def sortedFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(
      split(normalizedText(text), " "))), " "))
}

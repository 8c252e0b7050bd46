package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis building blocks for large-scale training-data
  * pipelines: tokenization, quality signals, language-ID heuristics,
  * fingerprinting. All pure `org.apache.spark.sql.functions` compositions —
  * codegen'd end to end, no UDFs, so whole-stage codegen spans the full
  * projection at 100 TB scan scale.
  */
object TextFns {
  /** Whitespace tokenizer (lowercased). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Token count; 0 for empty/whitespace-only text (split would yield [""]). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Word n-gram shingles, deduplicated; empty array when fewer than n
    * tokens. `sequence` is guarded — sequence(0, negative) would descend.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Language marker word lists (ASCII-only heuristics; ties resolved in
    * fixed en→es→de→fr order).
    */
  val Markers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is)\\b",
    "es" -> "\\b(el|la|los|las|de|y|en|que)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein)\\b",
    "fr" -> "\\b(le|la|les|et|des|est|un)\\b")

  /** Marker-regex hit count for one language. */
  def langScore(text: Column, pattern: String): Column =
    regexp_count(lower(text), lit(pattern)).cast("long")

  /** Predicted language by max marker count, fixed tie-break order. */
  def langId(text: Column): Column = {
    val scores = Markers.map { case (l, p) => l -> langScore(text, p) }
    val (l0, s0) = scores.head
    scores.tail.foldLeft((lit(l0), s0)) { case ((bestLang, bestScore), (l, sc)) =>
      (when(sc > bestScore, lit(l)).otherwise(bestLang),
        when(sc > bestScore, sc).otherwise(bestScore))
    }._1
  }

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are stopwords (0 when no tokens). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val hits = size(filter(t, tok => tok.isin(Stopwords: _*)))
    when(size(t) === 0, lit(0.0)).otherwise(hits.cast("double") / size(t))
  }

  /** Punctuation characters per character of text (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(regexp_count(text, lit("[.,!?;:]")).cast("double") / length(text))

  /** BPE-style pre-tokenization (GPT-2-family shape, ASCII approximation):
    * letter runs, digit runs, and punctuation runs are separate tokens, so
    * "don't stop!!" → [don, ', t, stop, !!]. Engine-portable RE2/Java
    * class-run pattern; counts sub-word-ish units rather than whitespace
    * words.
    */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("long")

  /** Training-corpus text cleanup: lowercase, strip non-alphanumerics,
    * collapse runs of whitespace, trim.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Whitespace-normalized lowercase form. */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normText(text))
}

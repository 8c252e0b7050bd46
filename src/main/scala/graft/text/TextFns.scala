package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Gopher-style repetition/quality signals per document (the filter
    * family from the Gopher/MassiveText data pipeline, adapted to
    * token-level text): distinct-token fraction, most-common-token
    * fraction, mean word length, duplicate-bigram fraction. Low
    * distinct_frac / high top_tok_frac / high dup_bigram_frac mark the
    * degenerate repetitive documents those pipelines drop.
    *
    * Relational codegen shape: one explode, two hash aggregations and a
    * per-key window — all map-side-combinable or key-local; no lambdas,
    * no per-row interpretation, scans once at corpus scale.
    */
  def gopherQuality(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    gopherQualityFromTokens(docs.select(
      col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t"))))

  /** [[gopherQuality]] over a pre-built token relation (doc_id, pos, t) —
    * the fusion point for pipelines that tokenize once and feed several
    * consumers (quality gate + contamination shingles in p7): the metrics
    * below read `toks` three times (base counts, top-token, bigrams), so a
    * caller that materializes the relation pays tokenization once for all
    * of them.
    */
  def gopherQualityFromTokens(toks: DataFrame): DataFrame = {
    val base = toks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("t")).as("n_distinct"),
      sum(length(col("t"))).as("sum_len"))
    val topTok = toks.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks
      .select(col("doc_id"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(w)).as("bg"),
        lead(col("t"), 1).over(w).isNotNull.as("complete"))
      .filter(col("complete"))
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bi"),
        countDistinct(col("bg")).as("n_bi_distinct"))
    base
      .join(topTok, "doc_id")
      .join(bigrams, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6).as("distinct_frac"),
        round(col("top_c").cast("double") / col("n_tokens"), 6).as("top_tok_frac"),
        round(col("sum_len").cast("double") / col("n_tokens"), 4).as("mean_word_len"),
        when(col("n_bi").isNull, lit(0.0)) // single-token doc: no bigrams
          .otherwise(round(lit(1.0) - col("n_bi_distinct").cast("double") / col("n_bi"), 6))
          .as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Concat-and-chunk context-window packing — the standard pretraining
    * sharding step: documents are concatenated in a deterministic order
    * and the token stream is cut into fixed `budget`-token chunks
    * (documents straddle chunk boundaries, exactly like GPT-style
    * "concat and chunk"; no padding waste, no bin-packing heuristic).
    *
    * Scale shape: a GLOBAL prefix sum is a one-partition window — a
    * scale-killer — so packing is done per SHARD (`doc_id % shards`,
    * the way production pipelines pack per output file): each shard's
    * running offset is an independent window partition, embarrassingly
    * parallel, and the chunk explode is the bin-replication idiom
    * (⌈n/budget⌉ + 1 rows per document). Fully deterministic →
    * oracle-checkable.
    *
    * Output: one row per (document × chunk it occupies):
    * (shard, chunk, doc_id, tok_from, tok_len) — `tok_from` is the
    * 0-based offset INSIDE the document, Σ tok_len over a (shard, chunk)
    * = budget except each shard's tail chunk. Empty documents are
    * dropped (they occupy no tokens).
    */
  def packChunks(
      docs: DataFrame, idCol: String, textCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val base = docs
      .select(col(idCol).as("doc_id"), tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    base
      .withColumn("off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk", explode(sequence(
        expr(s"off div ${budget}L"),
        expr(s"(off + n_tokens - 1) div ${budget}L"))))
      .select(
        col("shard"), col("chunk"), col("doc_id"),
        greatest(lit(0L), col("chunk") * budget - col("off")).as("tok_from"),
        (least(col("n_tokens"), (col("chunk") + 1) * budget - col("off"))
          - greatest(lit(0L), col("chunk") * budget - col("off"))).as("tok_len"))
      .orderBy(col("shard"), col("chunk"), col("doc_id"))
  }

  /** Per-document top-k TF-IDF terms — the classic term-salience signal
    * (keyword extraction / topic labeling over a training corpus):
    * tfidf(d, t) = tf(d, t) · ln(N / df(t)), ranked per document by the
    * ROUNDED score (ties → term asc) so results are engine-portable.
    *
    * Scale shape: two combinable hash aggregations over the exploded token
    * relation (per-doc tf, corpus df) + a broadcast 1-row N; the final
    * rank is a per-doc window over ≤|vocab(d)| rows. The token relation is
    * cached across its two consumers for the duration of the call. No
    * driver-side state — N rides a broadcast cross join like a6's
    * renormalization scalar.
    */
  def tfIdfTop(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("t"))
    val tf = toks.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df = toks.groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df_t"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, "t").crossJoin(broadcast(n))
      .select(col("doc_id"), col("t").as("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df_t")), 6).as("tfidf"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Gopher repetition signals (Rae et al. 2021 §A1.1): per document the
    * fraction of word characters covered by the most frequent word
    * 2-gram, the fraction covered by duplicated (count>1) word 5-grams,
    * and the distinct-word ratio. Coverage counts every occurrence, so
    * overlapping grams can push a fraction above 1 (as in the paper).
    * ONE posexplode + one window pass yields every lead offset; the
    * 2-gram and 5-gram branches share that subtree's doc_id exchange
    * (ReuseExchange), and all per-doc aggregates are map-side-
    * combinable. Docs too short for a gram keep their row with coverage
    * 0 via the left joins.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(
      col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val led = tok
      .withColumn("w2", lead(col("t"), 1).over(w))
      .withColumn("w3", lead(col("t"), 2).over(w))
      .withColumn("w4", lead(col("t"), 3).over(w))
      .withColumn("w5", lead(col("t"), 4).over(w))
    val c2 = led.filter(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("t"), col("w2")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    // Deterministic top gram: (count desc, gram asc) — equal-count grams
    // of different lengths would otherwise make coverage engine-dependent.
    val wTop = Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("g"))
    val top2 = c2.withColumn("rn", row_number().over(wTop)).filter(col("rn") === 1)
      .select(col("doc_id").as("d2"),
        (col("c") * (length(col("g")) - 1)).as("cov2"))
    val dup5 = led.filter(col("w5").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("t"), col("w2"), col("w3"), col("w4"), col("w5")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * (length(col("g")) - 4)).as("cov5"))
      .withColumnRenamed("doc_id", "d5")
    val base = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(length(col("t"))).as("wchars"),
        countDistinct(col("t")).as("dt"))
    base.join(top2, col("doc_id") === col("d2"), "left")
      .join(dup5, col("doc_id") === col("d5"), "left")
      .select(col("doc_id"),
        round(coalesce(col("cov2"), lit(0L)).cast("double") / col("wchars"), 6)
          .as("top2_char_frac"),
        round(coalesce(col("cov5"), lit(0L)).cast("double") / col("wchars"), 6)
          .as("dup5_char_frac"),
        round(col("dt").cast("double") / col("n"), 6).as("distinct_ratio"))
  }

  /** PII patterns — public, widely-used formats (email local@domain.tld,
    * NANP-style 3-3-4 phone with `-`/`.` separators, dotted-quad IPv4).
    * Both regex dialects in play (Java for Spark, RE2 for the DuckDB
    * oracle) support every construct used: classes, bounded repeats, \b.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Occurrences of one PII pattern on the given text as-is. Prefer the
    * stage-consistent `piiCountEmails`/`piiCountPhones`/`piiCountIps` for
    * reporting next to [[redactPii]] — independent raw-text counts can
    * disagree with the redaction when one PII form embeds another (a
    * phone-shaped local part inside an email matches PhonePattern on raw
    * text but is consumed whole by the email pass).
    */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Stage-consistent counts: each pattern counts on the text AFTER the
    * earlier redaction passes, so n_x is exactly the number of `<X>`
    * tokens [[redactPii]] writes.
    */
  def piiCountEmails(text: Column): Column = piiCount(text, EmailPattern)
  def piiCountPhones(text: Column): Column =
    piiCount(regexp_replace(text, EmailPattern, "<EMAIL>"), PhonePattern)
  def piiCountIps(text: Column): Column =
    piiCount(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern)

  /** Redacted text: emails first (their dotted domains would otherwise
    * feed the IP pattern), then phones (3-3-4 with dots overlaps dotted
    * digit runs), then IPv4 — codegen'd regexp_replace chain, no UDFs.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
}

package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators: quality scoring, token counting, language ID,
  * document fingerprinting. All pure column expressions (codegen'd, no
  * UDFs, no shuffle) — at 100 TB these run at scan speed.
  */
object TextAnalysis {

  private def toks(text: Column): Column = split(text, " ")

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "on")

  /** Quality metrics: token count, average token length, stopword ratio,
    * and a binary keep/drop signal (the usual pre-training heuristic
    * gates: document length band + minimum stopword density). */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val t = toks(text)
    val nTok = size(t).cast("long")
    val nStop = size(filter(t, (x: Column) => x.isin(stopwords: _*))).cast("long")
    // chars minus the single separator spaces, averaged over tokens
    val avgTokLen = (length(text) - (nTok - 1)).cast("double") / nTok
    val stopRatio = nStop.cast("double") / nTok
    Seq(
      "n_tokens" -> nTok,
      "avg_token_len" -> avgTokLen,
      "stopword_ratio" -> stopRatio,
      "keep" -> (nTok >= 10 && nTok <= 10000 && stopRatio >= 0.05).cast("long"))
  }

  /** Whitespace token count + BPE-ish subword count via a tokenizer regex
    * (letter runs / digit runs / single punctuation — the classic
    * pre-tokenizer split, portable across regex engines). */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def whitespaceTokenCount(text: Column): Column = size(toks(text)).cast("long")
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast("long")

  /** Polynomial rolling fingerprint over characters:
    * fp = fold(chars, 0, (acc, c) → (acc·31 + codepoint(c)) mod 1e9+7).
    * Order-sensitive (unlike a bag-of-words hash) and expressible in both
    * engines for the oracle. */
  def fingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc: Column, c: Column) => (acc * 31 + ascii(c)) % 1000000007L)

  /** Text normalization / scrubbing for training corpora: lowercase,
    * redact email-like and long-digit tokens (PII hygiene), strip
    * non-alphanumerics, collapse whitespace. Pure regex projection —
    * scan-speed, and portable across engines for the oracle. */
  def cleaned(text: Column): Column = {
    val lowered = lower(text)
    val noEmail = regexp_replace(lowered, "[a-z0-9._%+-]+@[a-z0-9.-]+", "<email>")
    val noLongNum = regexp_replace(noEmail, "[0-9]{7,}", "<num>")
    val noPunct = regexp_replace(noLongNum, "[^a-z0-9<> ]", " ")
    trim(regexp_replace(noPunct, " +", " "))
  }

  /** Typed PII audit patterns: (name, regex, placeholder), applied in
    * this order (emails first so their digit runs never count as
    * numbers; IPv4 before the bare digit-run catch-all). The regexes
    * stay inside the Java-regex ∩ RE2 portable subset — char classes,
    * bounded repetition, `\b` — so the DuckDB oracle runs them
    * verbatim. Redaction placeholders contain no digits, so later
    * patterns cannot re-match earlier redactions. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+\\d{1,3}-\\d{3}-\\d{4}", "<PHONE>"),
    ("longnum", "\\d{9,}", "<NUM>"))

  /** Per-category PII hit counts (audit side: counted on the RAW text,
    * independently per category). Scan-local, codegen'd. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (n, p, _) =>
      s"n_$n" -> regexp_count(text, lit(p)).cast("long")
    }

  /** Typed redaction: every pattern replaced by its placeholder, in
    * [[piiPatterns]] order. */
  def piiRedacted(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (_, p, r)) =>
      regexp_replace(t, p, r)
    }

  /** Lower-cased host of an http(s) URL (everything between `://` and
    * the first `/`, `?` or `#`) — scan-local regex, no URL library, so
    * the oracle mirrors it verbatim. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^https?://([^/?#]+)", 1))

  /** Aggressive crawl-style canonicalization: lower-cased host, path
    * kept verbatim, query string and fragment dropped (the standard
    * dedup key for crawl curation — tracking params and fragments are
    * the bulk of URL-level duplication). Scheme normalizes to https. */
  def canonicalUrl(url: Column): Column =
    concat(lit("https://"), urlHost(url),
      regexp_extract(url, "^https?://[^/?#]+([^?#]*)", 1))

  /** Domain-blocklist match with SUBDOMAIN-SUFFIX semantics (the crawl
    * filter rule set: `example.org` blocks `a.b.example.org` but never
    * `notexample.org`): the first (lexicographically smallest) blocklist
    * rule matching any label-boundary suffix of `host`, null when clean.
    *
    * 100 TB shape: ZERO shuffle and zero join. The label-suffix chain is
    * bounded by the host's label count (~4–6), built scan-local with
    * `transform`/`sequence`, and tested against the rule set as a plan
    * LITERAL (`typedLit`) — the degenerate broadcast. This replaces the
    * LIKE-cross-join (rules × corpus regex scan) a naive port would
    * write; for rule sets too big for a literal, swap the `array_contains`
    * for the x73 bloom probe + verify join without touching callers. */
  def hostBlockRule(host: Column, rules: Seq[String]): Column = {
    require(rules.nonEmpty, "empty blocklist")
    val labels = split(host, "\\.")
    val sufs = transform(sequence(lit(1), size(labels)),
      i => concat_ws(".", slice(labels, i, size(labels))))
    array_min(filter(sufs, s =>
      array_contains(typedLit(rules.sorted), s)))
  }

  /** Language-ID marker words (tiny per-language stopword profiles —
    * the classic n-gram/stopword heuristic at word granularity). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "la", "y", "es", "los"),
    "zh" -> Seq("de", "shi", "le", "zai", "he"))

  /** Predicted language = argmax of marker-word hits, ties broken by
    * language code order; "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val t = toks(text)
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(t, (x: Column) => x.isin(words: _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Sliding-window chunking (RAG / long-context ingestion prep): each
    * document's token stream cut into windows of `window` tokens
    * starting every `stride` tokens — overlapping when stride < window,
    * the standard retrieval-chunking shape (overlap keeps boundary
    * context retrievable from both sides). One chunk row per start
    * offset `0, stride, 2·stride, …` strictly below the token count;
    * the tail chunk is PARTIAL (`n_toks < window`), never dropped and
    * never padded — training-side packing is [[Curation]]'s sequence
    * packer, retrieval-side ranking doesn't care. Pure column
    * expressions over one posexplode — scan-local, zero shuffle, the
    * 100 TB shape of every per-doc text op here. Returns the input's
    * id column plus (chunk_no, start_tok, n_toks, chunk).
    *
    * Distinct from [[Curation]]'s fixed-chunk dedup (content dedup
    * keyed on disjoint chunk VALUES) and the CDC chunker
    * (content-defined boundaries for delta storage): this one exists
    * to FEED a retriever, so windows overlap and offsets are stable
    * doc-relative positions. */
  def chunkWindows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be positive")
    df.select(col(idCol), toks(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0),
          greatest(size(col("__tk")) - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_no"),
        col("col").cast("long").as("start_tok"),
        size(slice(col("__tk"), col("col") + 1, lit(window)))
          .cast("long").as("n_toks"),
        array_join(slice(col("__tk"), col("col") + 1, lit(window)), " ")
          .as("chunk"))
  }

  /** [[chunkWindows]] emitting the chunk as its TOKEN ARRAY instead of
    * rejoined text — same windows, same `chunk_no`, no `array_join`.
    * For consumers that immediately re-tokenize the chunk text (BM25
    * over a chunk corpus: x147), join-then-split is lossless (split
    * products cannot contain the delimiter) and pure waste — a cached
    * chunk corpus of token arrays saves one full `split` of every chunk
    * on every corpus pass (round-14 optimization). */
  def chunkWindowTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be positive")
    df.select(col(idCol), toks(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0),
          greatest(size(col("__tk")) - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_no"),
        slice(col("__tk"), col("col") + 1, lit(window)).as("tk"))
  }
}

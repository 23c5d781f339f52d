package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline, composed
  * exclusively from `org.apache.spark.sql.functions` so every one of them
  * stays inside whole-stage codegen (no Scala UDFs in the hot path).
  */
object Text {

  /** Whitespace tokens. Trim first so leading/trailing space can't mint
    * empty tokens. */
  def wsTokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Cast to long: DuckDB len()/length() yield BIGINT, so oracle-facing
    * counts must be int64 on the Spark side too. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(wsTokens(text))).cast("long")

  /** One query-term BM25 contribution (k1 = 1.2, b = 0.75) with the
    * LOG-FREE ratio idf ((N+1)/(df+1)) — the text_tfidf family: a log
    * would be the one transcendental whose last ulp could differ across
    * engines, and BM25's actual behavior (tf saturation, doc-length
    * normalization) survives the substitution. All rational double
    * arithmetic in a fixed op order — bit-replayable. Callers add the
    * per-term contributions in FIXED literal order, never via an agg sum
    * whose partition order could perturb the float total. */
  def bm25Contrib(tf: Column, df: Column, dl: Column,
      nDocs: Column, sumDl: Column): Column =
    (nDocs + lit(1.0)) / (df + lit(1.0)) * (tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
        (dl / (sumDl / nDocs.cast("double")))))

  /** BPE-ish subword pieces: letter runs, digits, or single punctuation —
    * the classic pre-tokenization regex shape. */
  val bpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  /** Small fixed stopword list shared with the DuckDB oracle. */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(wsTokens(text), t => t.isin(stopwords.map(x => x: Any): _*)))

  /** Gopher-rule columns (Rae et al. 2021, table A1 subset) — ONE
    * definition consumed by the `text_gopher_filters` query AND its
    * boundary spec, so a threshold change cannot desynchronize them. Flags
    * are exact integral cross-multiplications (never comparisons on the
    * rounded display ratios); mean word length counts exactly the
    * non-whitespace chars so padding can't flip a rule bit. */
  final case class GopherCols(
      nWords: Column, meanWordLen: Column, fracAlphaWords: Column,
      nStop: Column, okWordCount: Column, okMeanLen: Column,
      okAlpha: Column, okStop: Column)

  def gopher(text: Column): GopherCols = {
    val toks = wsTokens(text)
    val lowToks = wsTokens(lower(text))
    val nTok = size(toks)
    val nWords = wsTokenCount(text)
    val wordChars = length(regexp_replace(text, "\\s+", ""))
    val nAlpha = size(filter(toks, t => t.rlike("[a-zA-Z]")))
    val nStop = size(filter(lowToks,
      t => t.isin(stopwords.map(x => x: Any): _*))).cast("long")
    def flag(c: Column) = when(c, 1L).otherwise(0L)
    GopherCols(
      nWords,
      round(wordChars.cast("double") / greatest(nTok, lit(1)), 4),
      round(nAlpha.cast("double") / greatest(nTok, lit(1)), 4),
      nStop,
      flag(nWords >= 50 && nWords <= 100000),
      flag(wordChars >= nTok * 3 && wordChars <= nTok * 10),
      flag(nAlpha * 5 >= nTok * 4),
      flag(nStop >= 2))
  }

  /** Quality-scoring feature columns (all rounded 4dp for oracle parity). */
  def qualityFeatures(text: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nTokens = wsTokenCount(text)
    val nStop = stopwordCount(text)
    val nPunct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    Seq(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      round(nChars.cast("double") / greatest(nTokens, lit(1)), 4).as("avg_token_len"),
      round(nStop.cast("double") / greatest(nTokens, lit(1)), 4).as("stopword_ratio"),
      round(nPunct.cast("double") / greatest(nChars, lit(1)), 4).as("punct_ratio"))
  }

  /** Composite quality score in [0,1]: long enough, natural stopword density,
    * low punctuation noise. Deterministic, oracle-expressible. */
  def qualityScore(text: Column): Column = {
    val nTokens = wsTokenCount(text).cast("double")
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTokens, lit(1.0))
    val punctRatio = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("double") / greatest(length(text).cast("double"), lit(1.0))
    // least/greatest SKIP nulls in Spark, so a null text would otherwise
    // produce a garbage partial score instead of propagating null
    when(text.isNull, lit(null).cast("double")).otherwise(
      round(
        least(nTokens / lit(100.0), lit(1.0)) * lit(0.4) +
          least(stopRatio * lit(5.0), lit(1.0)) * lit(0.4) +
          (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2),
        4))
  }

  /** Language-ID by marker-word voting: count hits against tiny per-language
    * marker sets; highest count wins, 'und' if nothing hits. The n-gram
    * heuristic degenerates to word-unigram markers, which is what fits a
    * fixed public word list. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "una"))

  def langId(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers.map(x => x: Any): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // array_max on (hits, lang) structs = argmax with lexicographic tie-break
    val best = array_max(array(scores: _*))
    when(text.isNull, lit(null).cast("string"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise("und")
  }

  /** Word k-shingles joined with a separator — the unit for MinHash/Jaccard. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = wsTokens(lower(text))
    val n = size(toks)
    when(n < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), n - lit(k)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
  }

  /** PII patterns kept to a dialect-neutral subset (plain character
    * classes) so Java regex (Spark) and RE2 (DuckDB oracle) agree. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Email/phone/IPv4 redaction — the corpus-wide PII scrub pass. Order
    * matters: emails first so their domain dots can't be half-eaten by the
    * IP pattern. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>")

  /** Rolling polynomial (Karp-Rabin-style) fingerprint over tokens:
    * acc = (acc * 31 + h(token)) mod M. Modular so ANSI mode can't overflow
    * (acc < M ≈ 1e15, so acc*31 + h < 3.3e16 « Long.Max). Order-sensitive,
    * so permuted documents fingerprint differently (unlike a bag hash).
    *
    * h(token) is the 60-bit md5-prefix (the same value DuckDB reads as
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT`), so the whole chain is
    * replayable in the oracle. This HOF form is the slow reference the
    * native `Md5FingerprintExpr` is parity-spec'd against — queries use
    * the native one. */
  private val fpMod = graft.plans.NativeHashes.FpMod

  def fingerprint(text: Column): Column =
    aggregate(wsTokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(31L) +
        pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"), lit(fpMod)),
        lit(fpMod)))
}

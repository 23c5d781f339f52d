package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Text-analysis inventory (SURVEY.md §2): token counting, quality scoring,
  * language ID, entropy, document fingerprinting over `documents`. The
  * per-document scorers are map-only; the corpus-level ones (top-ngrams,
  * entropy, the pipeline passes) shuffle once on their aggregation key with
  * map-side partial aggregation absorbing the explode.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.sharded(s, dir, "documents")

  /** Zipf-fit head size: the regression runs over each source's top-k
    * token frequencies (bounded — never the whole vocabulary). */
  private val zipfK = 100

  /** The per-(source, token) frequency table — the corpus tokenization
    * artifact BOTH vocabulary-health passes (vocab_stats, zipf_fit) read.
    * A production pipeline materializes this once (it is vocabulary-sized,
    * orders of magnitude smaller than the corpus) and every distribution
    * diagnostic reads it — the 100 TB corpus is tokenized ONCE per
    * session, not once per query. */
  private val cntMemo = new graft.operators.SessionMemo[DataFrame]

  private def sourceTokenCounts(s: SparkSession, dir: String): DataFrame =
    cntMemo.get(s, dir) {
      docs(s, dir).select(col("source"),
          explode(Text.wsTokens(lower(col("text")))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
        .transform(graft.operators.Checkpointing.cut)
    }

  /** Per-doc distinct-bigram counts (doc_id, a, b, n) — the shared
    * artifact of BOTH bigram consumers (text_lm_bigram's LM filter and
    * text_collocations' lift miner): the corpus is tokenized and
    * lead-window-paired ONCE per (session, lake), and the artifact is
    * lineage-cut so each consumer's several readers never replay the
    * posexplode scan (the supplierDaily rule applied to text). */
  private val docBigramsMemo = new graft.operators.SessionMemo[DataFrame]

  private def docBigrams(s: SparkSession, dir: String): DataFrame =
    docBigramsMemo.get(s, dir) {
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      graft.operators.Checkpointing.cut(
        docs(s, dir)
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            posexplode(Text.wsTokens(lower(col("text")))).as(Seq("pos", "w")))
          .withColumn("nxt", lead("w", 1).over(byDoc))
          .filter(col("nxt").isNotNull)
          .select(col("doc_id"), col("w").as("a"), col("nxt").as("b"))
          .groupBy("doc_id", "a", "b").agg(count(lit(1)).as("n")))
    }

  /** Ordered token chunks for the streaming heavy-hitter gate — doc_id is
    * the replay order (the corpus arriving in doc-range batches). */
  private val hhFeedMemo = new graft.operators.SessionMemo[String]

  private def hhFeedDir(s: SparkSession, dir: String): String =
    hhFeedMemo.get(s, dir) {
      graft.streaming.StreamGate.writeOrderedChunks(
        docs(s, dir).select(col("source").as("segment"),
            posexplode(Text.wsTokens(lower(col("text"))))
              .as(Seq("pos", "item")),
            col("doc_id"))
          .filter(col("item") =!= "")
          // UNIQUE per-token ordinal (doc_id · 2^16 + in-doc position) so
          // the engine's (ord, item) fold is the document order itself;
          // docs are length-bounded far under 2^16 tokens, asserted here
          // so a longer doc fails loudly instead of aliasing ordinals
          .select(col("segment"), col("item"),
            (when(col("pos") < 65536, col("doc_id") * 65536L + col("pos"))
              .otherwise(raise_error(lit(
                "hh feed: doc exceeds 65536 tokens — widen the ordinal"))
                .cast("long"))).as("ord")),
        "ord", chunks = 4, prefix = "graft-hh-stream")
    }

  /** Fixed probe patterns for the trigram-index substring search — literal
    * on both sides so the DuckDB oracle replays the brute-force scan. */
  private val trgmPatterns = Seq(
    "window table", "spark scan", "slow query", "key agg row")

  /** The trigram inverted index (gram_hash, doc_id) — the stored search
    * artifact every substring probe reads; distinct grams per doc come
    * free from the expression. */
  private val trgmMemo = new graft.operators.SessionMemo[DataFrame]

  private def trgmIndex(s: SparkSession, dir: String): DataFrame =
    trgmMemo.get(s, dir) {
      docs(s, dir).select(col("doc_id"),
          explode(graft.plans.NgramHashes.charGrams(s, col("text"), 3)).as("g"))
        .transform(graft.operators.Checkpointing.cut)
    }

  /** The corpus-LM document scores (doc_id, n_tokens, lm_score) — memoized
    * like [[sourceTokenCounts]]: text_lm_score and text_ccnet_buckets both
    * read it, and a production pipeline scores the corpus once per session.
    * Empty/whitespace-only docs tokenize to one "" pseudo-token — filtered
    * so degenerate docs can't become a high-frequency vocabulary entry that
    * scores them ABOVE real prose (they get n_tokens = 0 and a null score
    * instead, consistent with wsTokenCount/text_entropy). */
  private val lmMemo = new graft.operators.SessionMemo[DataFrame]

  private def lmScored(s: SparkSession, dir: String): DataFrame =
    lmMemo.get(s, dir) {
      val tok = docs(s, dir).select(col("doc_id"),
        explode(Text.wsTokens(lower(col("text")))).as("tok"))
        .filter(col("tok") =!= "")
      val freq = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val total = freq.agg(sum("cnt").as("total"))
      val scored = tok.join(freq, "tok").crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log(col("cnt").cast("double") / col("total"))), 4).as("lm_score"))
      docs(s, dir).select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("lm_score"))
        .transform(graft.operators.Checkpointing.cut)
    }

  /** The 6-merge BPE fit (merge list + rewritten vocab) — one driver-
    * iterative training run per (session, sf-dir), read by BOTH gated
    * trainer queries (text_bpe_merges, text_bpe_encode). */
  private val bpeFitMemo =
    new graft.operators.SessionMemo[(Seq[graft.operators.TokenizerFit.Merge], DataFrame)]

  private def bpeFit(s: SparkSession, dir: String)
      : (Seq[graft.operators.TokenizerFit.Merge], DataFrame) =
    bpeFitMemo.get(s, dir) {
      // minCount = 1: the oracle's argmax is unconditional (it merges the
      // best pair whatever its count), so the trainer must too — the
      // default minCount=2 early-stop would silently diverge on a sparse
      // corpus whose best remaining pair occurs once. A fully exhausted
      // pair table (no adjacent pairs at all) stops BOTH sides: fit()
      // returns early, and the oracle's empty argmax contributes no merge
      // row and leaves the vocab unchanged (LEFT JOIN in the rewrite CTE).
      graft.operators.TokenizerFit.fit(
        graft.operators.TokenizerFit.vocab(docs(s, dir), "text"),
        merges = 6, minCount = 1L)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Text.wsTokenCount(col("text")).as("n_ws_tokens"),
        Text.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),

    "text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        (col("doc_id") +: Text.qualityFeatures(col("text"))) :+
          Text.qualityScore(col("text")).as("quality_score"): _*)
        .orderBy("doc_id")),

    // CODE-vs-PROSE detection (r9) — the pretraining-mix router every LLM
    // pipeline runs before language-specific filters (code shouldn't be
    // judged by stopword ratios, prose shouldn't be judged by brace
    // density). Map-only, one pass; every feature is an exact integer
    // (regexp_count over patterns valid in both Java regex and RE2) and
    // both rules are exact integral cross-multiplications — never a
    // comparison on a rounded ratio — so the flags replay bit-identically.
    // 100 TB: embarrassingly parallel, no shuffle at all before the sort.
    "text_code_detect" -> ((s, dir) => {
      val nChars = length(col("text"))
      val nLines = (lit(1) + regexp_count(col("text"), lit("\n"))).cast("long")
      val punct = regexp_count(col("text"), lit("[{};]")).cast("long")
      // explicit (^|\n) anchoring, NOT (?m)^: Java's multiline ^ also
      // matches after CR, NEL and the Unicode line/paragraph separators,
      // while RE2 matches only after LF; a lone-CR line ending would
      // silently diverge the count between the Spark side and the DuckDB
      // oracle. The explicit alternation means the same thing in both
      // engines; n_lines counts LF only, consistently.
      val indent = regexp_count(col("text"), lit("(^|\n)(\t|    )")).cast("long")
      val kw = regexp_count(col("text"),
        lit("\\b(def|class|return|import|function|const|public|void)\\b"))
        .cast("long")
      val punctRule = punct * 25 >= nChars && nChars > 0
      val structRule = kw >= 2 && indent * 4 >= nLines
      docs(s, dir).select(col("doc_id"), nLines.as("n_lines"),
          punct.as("n_code_punct"), indent.as("n_indent_lines"),
          kw.as("kw_hits"), punctRule.as("punct_rule"),
          structRule.as("struct_rule"), (punctRule || structRule).as("is_code"))
        .orderBy("doc_id")
    }),

    "text_langid" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        Text.langId(col("text")).as("lang_pred"),
        col("lang").as("lang_actual"))
        .orderBy("doc_id")),

    // LANGUAGE-ID CONFUSION MATRIX (r10) — the classifier-quality audit
    // over text_langid's per-doc predictions (the text-tier twin of
    // emb_confusion): the lake's stored `lang` column is the truth axis,
    // the marker-vote prediction the other; diagonal mass = detector
    // accuracy per language, the 'und' column = coverage gaps. One
    // map-only prediction pass + one O(langs²) groupBy; the per-truth
    // accuracy is an exact integer rational floor-quantized once.
    "text_lang_confusion" -> ((s, dir) => {
      val cells = docs(s, dir)
        .select(col("lang").as("lang_actual"),
          Text.langId(col("text")).as("lang_pred"))
        .groupBy("lang_actual", "lang_pred")
        .agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("lang_actual").agg(sum("n").as("n_actual"))
      cells.join(broadcast(tot), "lang_actual")
        .select(col("lang_actual"), col("lang_pred"), col("n"),
          (expr("(n * 10000) div n_actual").cast("double") / lit(10000.0))
            .as("share_of_actual"))
        .orderBy("lang_actual", "lang_pred")
    }),

    // Rolling md5-prefix polynomial fingerprint (order-sensitive): native
    // one-pass expression; the identical recurrence replays in the oracle
    // via list_reduce, so this is exact-checked, not rows-only.
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        graft.plans.NativeHashes.md5Fingerprint(s, Text.wsTokens(col("text")))
          .as("fingerprint"),
        Text.wsTokenCount(col("text")).as("n_ws_tokens"))
        .orderBy("doc_id")),

    // INTRA-DOC REPETITION REMOVAL (r10) — the REWRITE companion of
    // text_repetition's score (the Gopher/Dolma cleaning verb: stuttered
    // generation and scraped boilerplate produce immediate token
    // repeats): consecutive exact-duplicate whitespace tokens collapse
    // to one occurrence; the rewritten doc is the kept tokens joined by
    // single spaces (whitespace normalization is PART of the rewrite
    // contract). The gate hashes the rewritten text (md5) plus exact
    // removal accounting. Map-only, and the collapse is ONE codegen'd
    // pass per document (plans.Derep — the per-token interpreted lambda
    // it replaced costs µs per element at corpus scale; the HOF chain
    // survives as the parity reference in Round10OpsSpec).
    "text_derep" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("dr", graft.plans.Derep(s, col("text")))
        .select(col("doc_id"),
          Text.wsTokenCount(col("text")).as("n_tokens"),
          col("dr.n_removed").cast("long").as("n_removed"),
          md5(col("dr.clean")).as("clean_md5"))
        .orderBy("doc_id")),

    // WINNOWING fingerprints (r10) — the MOSS selection rule (Schleimer
    // et al. '03) next to text_fingerprint's whole-doc hash: slide a
    // w=4 window over the doc's k=3 shingle hashes and keep each
    // window's RIGHTMOST minimal hash, deduplicated — the classic
    // guarantee that any shared run of ≥ w+k−1 tokens between two docs
    // yields at least one IDENTICAL selected fingerprint, at ~2/(w+1)
    // storage density. Tie-break is encoded IN the window key
    // (hash·2¹⁶ + (65535 − pos) — min of that is smallest hash, then
    // RIGHTMOST position; doc length is asserted < 2¹⁶ grams, failing
    // loudly instead of aliasing). Shape at scale: one codegen'd shingle
    // pass, one per-doc bounded window (per-doc fan-in, never corpus
    // order), O(selected) rows out. Docs shorter than one window emit
    // their single whole-doc minimum (pos = n−1 — the degenerate window).
    "text_winnowing" -> ((s, dir) => {
      val grams = docs(s, dir).select(col("doc_id"),
        posexplode(graft.plans.NgramHashes.shingles(s, col("text"), 3))
          .as(Seq("pos", "g")))
      val keyed = grams.select(col("doc_id"), col("pos"),
        (conv(substring(md5(col("g")), 1, 10), 16, 10).cast("long") * 65536L
          + when(col("pos") < 65536, lit(65535L) - col("pos"))
            .otherwise(raise_error(lit(
              "winnowing: doc exceeds 65536 shingles — widen the ordinal"))
              .cast("long"))).as("ck"))
      val wMin = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
      val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val sel = keyed
        .withColumn("rm", min("ck").over(wMin))
        .withColumn("ng", count(lit(1)).over(wDoc))
        .filter(col("pos") >= 3 ||
          (col("ng") < 4 && col("pos") === col("ng") - 1))
        .select(col("doc_id"), col("ng"), col("rm")).distinct()
      sel.groupBy("doc_id")
        .agg(max("ng").as("n_grams"),
          count(lit(1)).as("n_fingerprints"),
          sum(pmod(col("rm"), lit(1000000007L))).as("fp_checksum"))
        .orderBy("doc_id")
    }),

    // BPE iteration-0 statistic (the pair table a tokenizer trainer ranks
    // before its first merge): corpus-weighted adjacent character-pair
    // counts inside whitespace tokens. THE scale trick: the pair explode
    // runs over the VOCABULARY (distinct terms × their freq — types), never
    // the corpus (tokens) — at 100 TB that is millions of rows instead of
    // trillions. One term-keyed exchange builds the vocab, the bigram
    // positions come from a codegen'd sequence explode + substr (no
    // interpreted per-element lambda), and the top-20 is a bounded sort
    // over the O(alphabet²) pair space. Companion trainer:
    // `operators.TokenizerFit` iterates merges on the same vocab table.
    "text_bpe_pairs" -> ((s, dir) => {
      val vocab = docs(s, dir)
        .select(explode(Text.wsTokens(lower(col("text")))).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("freq"))
      vocab.filter(length(col("term")) >= 2)
        .select(col("term"), col("freq"),
          explode(sequence(lit(1), length(col("term")) - 1)).as("i"))
        .select(col("freq"), col("term").substr(col("i"), lit(2)).as("pair"))
        .groupBy("pair").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    }),

    // The BPE TRAINER itself, gated (r8 — VERDICT item 7): the first 6
    // learned merges with their weighted counts. Every iteration runs over
    // the collapsed VOCAB table alone (types, never corpus tokens — the
    // text_bpe_pairs scale shape), the only driver state is the O(merges)
    // merge list, and the tie rule is total (count desc, pair lexicographic
    // on binary UTF-8 — identical collation in both engines). The oracle
    // replays all 6 iterations as a chained-CTE fold: symbols ride a
    // wrapped separator string (␟sym␟ concatenated, so a pair pattern can
    // never match across a symbol boundary or share a boundary separator
    // between adjacent matches) and each merge is one left-to-right
    // non-overlapping string replace — exactly the fold's rewrite rule.
    "text_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      bpeFit(s, dir)._1.zipWithIndex
        .map { case (m, i) => ((i + 1).toLong, m.left, m.right, m.count) }
        .toDF("merge_idx", "lhs", "rhs", "cnt")
        .orderBy("merge_idx")
    }),

    // The ENCODER side of the trainer pair (r8): after the 6 learned
    // merges, the 50 highest-frequency terms with their piece counts and
    // the pieces themselves — the "what does the tokenizer actually do to
    // the head of the distribution" report every tokenizer change ships
    // with. Reads the trainer's REWRITTEN vocab directly (the corpus is
    // never re-encoded: the vocab table IS the encoded corpus, weighted by
    // freq); bounded output via the (freq desc, term) total order. The
    // oracle replays the same 6 fold iterations and unwraps the separator
    // encoding into space-joined pieces.
    "text_bpe_encode" -> ((s, dir) => {
      val v = bpeFit(s, dir)._2
      v.select(col("term"), col("freq"),
          size(col("syms")).cast("long").as("n_pieces"),
          array_join(col("syms"), " ").as("pieces"))
        .orderBy(col("freq").desc, col("term"))
        .limit(50)
    }),

    // READABILITY indexes (ARI, Coleman–Liau) — the count-based family a
    // curation pipeline can afford corpus-wide (syllable-based indexes
    // need a dictionary; these need three integer counts per doc). All
    // inputs are exact integers, every formula is a fixed-order chain of
    // IEEE multiplies/divides shared with the oracle, and the difficulty
    // band cuts on the ALREADY-ROUNDED index (never the raw float, so the
    // band boundary replays). Map-only scan; zero shuffles.
    "text_readability" -> ((s, dir) => {
      val txt = col("text")
      val wsClass = "[ \\t\\n\\x0B\\f\\r]"
      docs(s, dir).select(col("doc_id"),
          length(regexp_replace(txt, wsClass, "")).cast("long").as("n_letters"),
          Text.wsTokenCount(txt).as("n_words"),
          greatest(length(txt) - length(translate(txt, ".!?", "")), lit(1))
            .cast("long").as("n_sentences"))
        .filter(col("n_words") > 0)
        .select(col("doc_id"), col("n_letters"), col("n_words"), col("n_sentences"),
          // floor-quantize, never round(): ARI's rational inputs land
          // exactly on the 4dp half-boundary (hit at sf0.01) where the
          // engines' double-rounding rules diverge — emb_pca's rule
          (floor((lit(4.71) * (col("n_letters").cast("double") / col("n_words")) +
            lit(0.5) * (col("n_words").cast("double") / col("n_sentences")) -
            lit(21.43)) * lit(10000)) / lit(10000)).as("ari"),
          (floor((lit(0.0588) * (lit(100.0) * col("n_letters") / col("n_words")) -
            lit(0.296) * (lit(100.0) * col("n_sentences") / col("n_words")) -
            lit(15.8)) * lit(10000)) / lit(10000)).as("cli"))
        .withColumn("band",
          when(col("ari") < 8, "easy").when(col("ari") < 16, "medium")
            .otherwise("hard"))
        .orderBy("doc_id")
    }),

    // Corpus-LM quality score (the CCNet-style perplexity filter): mean
    // log-probability of a doc's tokens under the corpus unigram
    // distribution — boilerplate/common-token docs score high (near 0),
    // rare-token noise scores low. Scale shape: one groupBy(token) for the
    // frequency table, one shuffle join token→freq (the vocab is too big to
    // broadcast at corpus scale), one groupBy(doc) — all linear; the corpus
    // total rides a broadcast 1-row aggregate, never a driver collect.
    "text_lm_score" -> ((s, dir) => lmScored(s, dir).orderBy("doc_id")),

    // BIGRAM corpus-LM scoring (r8) — the CCNet-style perplexity filter
    // one order up from text_lm_score's unigram: per doc, the mean
    // log P(w_i | w_{i-1}) under the corpus's own bigram counts (trained
    // on itself, every observed bigram has count ≥ 1 — no backoff branch
    // can fire, so the estimator stays a pure count ratio). Scale shape:
    // pairing is a per-DOC lead window (bounded by a doc's token count,
    // never a corpus window); the bigram table is map-side-combined
    // O(observed bigrams); the two joins key on (a,b)/(a) — AQE-
    // splittable, vocab too big to broadcast at corpus scale; the per-doc
    // aggregate absorbs map-side. Same avg-ln + 4dp rounding discipline
    // the gated text_lm_score established.
    "text_lm_bigram" -> ((s, dir) => {
      // pre-aggregated (doc, a, b, n) BEFORE any join (r9 — VERDICT item
      // 6): both join inputs shrink by the duplicate factor (the joins
      // carry distinct per-doc bigrams, never corpus token occurrences),
      // and the per-doc mean becomes the n-weighted mean over distinct
      // bigrams — same value, since avg(log x over occurrences)
      // = Σ n·log(x) / Σ n. The artifact is shared with
      // text_collocations via docBigrams.
      val docPairs = docBigrams(s, dir)
      val big = docPairs.groupBy("a", "b").agg(sum("n").as("c_ab"))
      val left = big.groupBy("a").agg(sum("c_ab").as("c_a"))
      docPairs.join(big, Seq("a", "b")).join(left, Seq("a"))
        .groupBy("doc_id")
        .agg(sum("n").as("n_bigrams"),
          round(sum(col("n").cast("double") *
              log(col("c_ab").cast("double") / col("c_a"))) /
            sum(col("n").cast("double")), 4).as("lm2_score"))
        .orderBy("doc_id")
    }),

    // LEXICAL COLLOCATIONS by exact LIFT — the association-strength miner
    // ("new york", "machine learning") next to text_lm_bigram's per-doc LM
    // filter: lift(a,b) = P(ab) / (P(a)·P(b)) as the RATIONAL
    // (n_ab·N_u²) / (n_a·n_b·N_p) on exact integer counts — no PMI log, so
    // the score is one double division of exact decimal products and the
    // top-20 ranking is identical in both engines (ties broken by (a, b)).
    // Scale shape: the pair stream pre-aggregates map-side to the
    // vocab²-bounded bigram table, unigram counts join on the vocab table,
    // the two corpus totals broadcast — after the token scan everything is
    // vocabulary-sized. Min support n_ab ≥ 5 cuts the hapax noise floor
    // (textbook collocation practice) and bounds the lift join input.
    "text_collocations" -> ((s, dir) => {
      // both count tables come from the session's memoized artifacts —
      // the bigram table folds docBigrams (shared with text_lm_bigram),
      // the unigram table folds sourceTokenCounts (shared with the
      // vocab/zipf/drift family): the same token multiset on both paths
      // (wsTokens of a trimmed nonempty text never yields ""), and the
      // corpus is tokenized once per session, not once per consumer
      val big = docBigrams(s, dir)
        .groupBy("a", "b").agg(sum("n").as("n_ab"))
      val uni = sourceTokenCounts(s, dir)
        .groupBy(col("tok").as("w")).agg(sum("cnt").as("n_w"))
      val nu = uni.agg(sum("n_w").cast("decimal(38,0)").as("n_u"))
      val np = big.agg(sum("n_ab").cast("decimal(38,0)").as("n_p"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      big.filter(col("n_ab") >= 5)
        .join(uni.select(col("w").as("a"), col("n_w").as("n_a")), "a")
        .join(uni.select(col("w").as("b"), col("n_w").as("n_b")), "b")
        .crossJoin(broadcast(nu)).crossJoin(broadcast(np))
        .withColumn("lift",
          floor((dec(col("n_ab")) * col("n_u") * col("n_u")).cast("double") /
            (dec(col("n_a")) * dec(col("n_b")) * col("n_p")).cast("double")
            * 10000) / 10000)
        // rank on the QUANTIZED lift (exactly what the oracle's ORDER BY
        // binds to — its output alias), with the (a, b) tie-break making
        // the top-20 cut total: ranking raw doubles while the oracle
        // ranks floored ones would cut same-quantum pairs differently
        .orderBy(col("lift").desc, col("a"), col("b")).limit(20)
        .select(col("a"), col("b"), col("n_ab"), col("lift"))
    }),

    // CCNet-style corpus partition (Wenzek et al. 2020): per language, split
    // docs into head/middle/tail terciles by LM score. The boundaries come
    // from an integer score HISTOGRAM (score × 10⁴ as a long), not a
    // per-language sort: groupBy(lang, score) is bounded by the score
    // domain (~10⁵ values), the cumulative window runs over that aggregated
    // table, and docs bucket by comparing against the broadcast boundary
    // pair — map-only on the corpus, exact integer rank math (3·cum ≥ k·n),
    // no interpolation, no per-stratum single-reducer sort. Ties share a
    // bucket (the CCNet perplexity-cut behavior), so no tie-break order is
    // ever needed.
    "text_ccnet_buckets" -> ((s, dir) => {
      val sc = lmScored(s, dir).filter(col("lm_score").isNotNull)
        .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
        .select(col("lang"),
          round(col("lm_score") * 10000).cast("long").as("score_e4"))
      val hist = sc.groupBy("lang", "score_e4").agg(count(lit(1)).as("cnt"))
      val byLang = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      val cum = hist
        .withColumn("cum", sum("cnt").over(byLang.orderBy("score_e4")))
        .withColumn("n", sum("cnt").over(byLang))
      val bounds = cum.groupBy("lang").agg(
        min(when(col("cum") * 3 >= col("n"), col("score_e4"))).as("b_lo"),
        min(when(col("cum") * 3 >= col("n") * 2, col("score_e4"))).as("b_hi"))
      sc.join(broadcast(bounds), "lang")
        .withColumn("bucket",
          when(col("score_e4") <= col("b_lo"), "tail")
            .when(col("score_e4") > col("b_hi"), "head")
            .otherwise("middle"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          min("score_e4").as("min_score_e4"),
          max("score_e4").as("max_score_e4"))
        .orderBy("lang", "bucket")
    }),

    // Gopher-style quality rules (Rae et al. 2021, table A1 subset): word
    // count in [50, 10⁵], mean word length in [3, 10], ≥ 80% words with an
    // alphabetic char, ≥ 2 stopword hits. Map-only; every rule flag is
    // EXACT integral cross-multiplication (5·n_alpha ≥ 4·n_tokens, never a
    // comparison on the rounded display ratio), so the pass bit replays
    // bit-identically in the oracle. Mean word length counts EXACTLY the
    // non-whitespace chars (strip \s, divide by token count) — a
    // separator-count approximation would let whitespace runs or padding
    // inflate the ratio past a rule bound and flip the pass bit.
    "text_gopher_filters" -> ((s, dir) => {
      val g = Text.gopher(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        g.nWords.as("n_words"),
        g.meanWordLen.as("mean_word_len"),
        g.fracAlphaWords.as("frac_alpha_words"),
        g.nStop.as("n_stop"),
        g.okWordCount.as("ok_word_count"), g.okMeanLen.as("ok_mean_len"),
        g.okAlpha.as("ok_alpha"), g.okStop.as("ok_stop"),
        (g.okWordCount * g.okMeanLen * g.okAlpha * g.okStop).as("gopher_pass"))
        .orderBy("doc_id")
    }),

    // TF-IDF keywords: top-3 terms per doc by tf·idf. The idf uses the
    // RATIONAL form (N+1)/(df+1) instead of its log — log is monotone, so
    // ranks are identical, and the score stays a quotient of exact
    // integers computed with single correctly-rounded IEEE ops (* then /),
    // which both engines reproduce bit-for-bit (libm log would not be).
    // Scale shape: tf is one (doc,term) groupBy absorbing the explode
    // map-side; df is a map-side-combined groupBy(term) over tf (the
    // partials exchange is O(vocab)) JOINED back onto tf — NOT a
    // count-over-window: a window partitioned by term must land a term's
    // entire posting list on ONE task (no combine, no split), so a
    // stopword-frequency term at web scale funnels billions of rows
    // through one reducer; the join-back costs the same term-keyed
    // exchange of tf but is AQE-skew-SPLITTABLE (the one-row-per-term df
    // build side duplicates across the split probe partitions). Vocab is
    // too big to broadcast at corpus scale, so df stays a shuffled
    // one-row-per-term build (SHUFFLE_HASH: no sort of the tf stream);
    // the corpus doc count rides a broadcast 1-row agg.
    "text_tfidf" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"),
        explode(Text.wsTokens(lower(col("text")))).as("term"))
        .filter(col("term") =!= "")
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df")).hint("SHUFFLE_HASH")
      val nd = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      tf.join(df, "term")
        .crossJoin(broadcast(nd))
        .withColumn("score",
          col("tf") * (col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
          col("tf"), col("df"), round(col("score"), 4).as("tfidf"))
        .orderBy("doc_id", "rk")
    }),

    // BM25 retrieval scoring (Robertson–Spärck Jones family) for a fixed
    // keyword query — the search primitive retrieval-augmented curation
    // runs corpus-wide. Same replayability discipline as text_tfidf: the
    // idf stays the LOG-FREE ratio family ((N+1)/(df+1) — a log would be
    // the one transcendental whose last-ulp could differ across engines),
    // composed with the two things BM25 adds over tf-idf: tf SATURATION
    // (k1 = 1.2 — doubling an already-frequent term barely moves the
    // score) and DOC-LENGTH normalization (b = 0.75 against avgdl).
    // Scale shape: per-doc tf/dl is MAP-ONLY array arithmetic on the scan
    // (no explode, no term shuffle — the query terms are a literal);
    // corpus stats are ONE 1-row aggregate broadcast back; the top-20 is
    // a bounded global TakeOrdered. The per-term contributions add in
    // FIXED literal order (t0 + t1 + t2), never an agg sum whose
    // partition order could perturb the float total.
    "text_bm25" -> ((s, dir) => {
      val query = Seq("join", "hash", "vector")
      val perDoc = docs(s, dir)
        .select(col("doc_id"), Text.wsTokens(lower(col("text"))).as("toks"),
          Text.wsTokenCount(col("text")).as("dl"))
        .select(col("doc_id") +: col("dl") +:
          query.zipWithIndex.map { case (t, i) =>
            size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf$i")
          }: _*)
      val stats = perDoc.agg(
        count(lit(1)).as("n_docs"), sum("dl").as("sum_dl") +:
          query.indices.map(i =>
            count(when(col(s"tf$i") > 0, 1)).as(s"df$i")): _*)
      def contrib(i: Int) = Text.bm25Contrib(col(s"tf$i"), col(s"df$i"),
        col("dl"), col("n_docs"), col("sum_dl"))
      val scored = perDoc.crossJoin(broadcast(stats))
        .withColumn("score", contrib(0) + contrib(1) + contrib(2))
        .filter(col("score") > 0.0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
      scored
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .select(col("rank"), col("doc_id"), col("dl"),
          col("tf0").as("tf_join"), col("tf1").as("tf_hash"),
          col("tf2").as("tf_vector"), round(col("score"), 4).as("bm25"))
        .orderBy("rank")
    }),

    // Per-source heavy hitters via the Misra–Gries FreqItemsAgg — the
    // bounded-memory frequent-items aggregate Spark lacks as a groupBy
    // aggregate. One pass, O(capacity) state per group, map-side partial
    // sketches cross the exchange (tokens never shuffle raw). Capacity 128
    // exceeds this corpus' per-source vocabulary, so the summary is
    // provably exact and the query hash-matches an exact-count oracle; at
    // web scale the SAME operator runs approximate with the n/capacity
    // error bound (spec'd in both regimes).
    "text_heavy_hitters" -> ((s, dir) => {
      val tok = docs(s, dir).select(col("source"),
        explode(Text.wsTokens(lower(col("text")))).as("tok"))
        .filter(col("tok") =!= "")
      tok.groupBy("source")
        .agg(graft.plans.FreqItems.freqItems(s, col("tok"), 128).as("hh"))
        .select(col("source"), posexplode(col("hh")).as(Seq("pos", "e")))
        .filter(col("pos") < 5)
        .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
          col("e.item").as("token"), col("e.count").as("n"))
        .orderBy("source", "rk")
    }),

    // The STREAMING Misra–Gries heavy-hitter ENGINE inside the hash gate:
    // `SketchStream.heavyHitters` (per-source state = ONE 64-counter MG
    // table + processed count; fixed size at any vocabulary) runs over
    // the doc-ordered 4-chunk token replay; final state per source picked
    // distributively by max n_seen, then filtered by the exact integer
    // threshold 32·count > n_seen. The MG theorem (no false negatives
    // above n/capacity; counts within n/capacity of truth — and EXACT
    // here, capacity 64 ≥ the 31-token vocabulary, so no decrement ever
    // fires at the gate SFs) makes the filtered summary EQUAL the batch
    // heavy set, so plain batch SQL oracles the engine; the approximate
    // decrement/merge regime is spec'd on a crafted stream where
    // capacity < distinct items (StreamingSpec).
    "q_heavy_hitters_stream" -> ((s, dir) => {
      import s.implicits._
      val stream = s.readStream.schema(
          org.apache.spark.sql.Encoders.product[graft.streaming.TokenObs].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(hhFeedDir(s, dir)).as[graft.streaming.TokenObs]
      val finals = graft.streaming.StreamGate.run(s,
          graft.streaming.SketchStream.heavyHitters(stream, 64), "hh_gate",
          org.apache.spark.sql.streaming.OutputMode.Update()) { sink =>
        // bounded by construction: O(sources × batches) rows of ≤ 64
        // counters each — never O(token emissions)
        sink.as[graft.streaming.HeavyRow].collect()
      }.groupBy(_.segment).toSeq.flatMap { case (seg, rows) =>
        val last = rows.maxBy(_.n_seen) // n_seen strictly increases per touch
        last.items.toSeq.collect {
          case (tok, n) if 32L * n > last.n_seen => (seg, tok, n, last.n_seen)
        }
      }
      finals.toDF("source", "token", "n", "total")
        .orderBy("source", "token")
    }),

    // Substring search through a TRIGRAM INVERTED INDEX (the pg_trgm GIN
    // idea re-expressed on Spark): the corpus is indexed ONCE into
    // (gram_hash, doc_id) postings via the codegen'd byte-trigram
    // expression (a stored artifact — at 100 TB it lives bucketed by
    // gram), and a LIKE-'%pat%' probe becomes: broadcast the pattern's
    // gram set onto the postings (map-side), keep docs holding ALL
    // pattern grams (one groupBy counting distinct-gram hits), then
    // exact-verify `contains` on just the candidates. False negatives
    // are impossible (P substring of T ⇒ gramset(P) ⊆ gramset(T)), false
    // positives die in the verify — so the index path provably EQUALS the
    // brute-force corpus scan the oracle runs, while touching only the
    // candidate docs' text.
    "text_trgm_search" -> ((s, dir) => {
      import s.implicits._
      val pats = trgmPatterns.toDF("pat")
      val grams = graft.plans.NgramHashes.charGrams(s, col("pat"), 3)
      val probe = pats.select(col("pat"), size(grams).as("ng"),
        explode(grams).as("g"))
      val cand = trgmIndex(s, dir).join(broadcast(probe), "g")
        .groupBy("pat", "ng", "doc_id").agg(count(lit(1)).as("hits"))
        .filter(col("hits") === col("ng"))
      cand.join(docs(s, dir).select("doc_id", "text"), "doc_id")
        .filter(col("text").contains(col("pat")))
        .groupBy("pat")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("doc_id_sum"))
        .orderBy("pat")
    }),

    // Character-entropy quality signal (low entropy = repetitive/boilerplate
    // text, a standard pretraining filter): H = log2(N) − (1/N)·Σ n·log2(n)
    // over per-char counts — the identity avoids a per-row probability
    // column and matches the oracle's summation term-for-term.
    "text_entropy" -> ((s, dir) => {
      val d = docs(s, dir)
      val ent = d
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "") // empty text explodes to one "" pseudo-char
        .groupBy("doc_id", "ch").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(round(
          log2(sum("n")) - sum(col("n") * log2(col("n"))) / sum("n"), 4)
          .as("char_entropy"))
      // empty-text docs have no char rows; for a quality-filter signal the
      // most degenerate doc must still get a row (entropy 0), not vanish
      d.select(col("doc_id")).join(ent, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"))
        .orderBy("doc_id")
    }),

    // Corpus-wide n-gram frequency: explode → count → top-k. The classic
    // "vocabulary/statistics over 100 TB" shape: map-side partial counts
    // absorb the explosion before the single shuffle, and the shingle map
    // phase is one native codegen'd pass (WordShinglesExpr) — the
    // interpreted sequence/transform/concat_ws chain it replaced was the
    // corpus-dominant cost (~µs per gram).
    "text_top_ngrams" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(graft.plans.NgramHashes.shingles(s, col("text"), 2)).as("ngram"))
        .groupBy("ngram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)),

    // Vocabulary-health stats per source — the corpus diagnostics a data
    // team watches across ingests: token/type counts, type-token ratio,
    // and head-mass (the fraction of all tokens covered by the source's
    // 10 most frequent types — high head-mass = templated/boilerplate
    // source). One (source, token) groupBy absorbs the explode map-side;
    // the head-10 mass comes from the bounded-heap `topk` aggregate in the
    // SAME per-source aggregate — each map task pre-reduces its slice of a
    // source's vocabulary to ≤ 10 candidates before the exchange — instead
    // of ranking the entire vocabulary of a source inside one window
    // reducer (a single-task terabyte sort at corpus scale). The heap
    // tie-break (hashed token) differs from the window's lexicographic one,
    // but head-MASS is tie-free: rows tied at the k-th rank have equal
    // counts, so the sum of the top 10 counts is the same multiset sum
    // under any tie-break. Exact integers + 4dp ratios.
    "text_vocab_stats" -> ((s, dir) => {
      sourceTokenCounts(s, dir).groupBy("source")
        .agg(sum("cnt").as("n_tokens"),
          count(lit(1)).as("n_types"),
          graft.plans.TopKAgg.topk(s,
            struct(col("cnt").cast("double").as("score"),
              xxhash64(col("tok")).as("id")), 10).as("top"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 4)
            .as("type_token_ratio"),
          // counts are exact integers ≤ 2^53: the double round-trip through
          // the (score, id) heap slot is lossless
          round(aggregate(col("top"), lit(0L),
              (acc, x) => acc + x.getField("score").cast("long"))
              .cast("double") / col("n_tokens"), 4)
            .as("head_mass"))
        .orderBy("source")
    }),

    // PER-SOURCE DISTRIBUTION DRIFT vs the corpus — TOTAL-VARIATION
    // distance between each source's token distribution and the whole
    // corpus's (the "does this ingest look like the rest of the data"
    // number a curation team tracks per source/epoch). TV is chosen over
    // KL deliberately: it is a RATIONAL function of exact integer counts —
    // Σ|n·M − m·N| plus the absent-token mass (M − Σ_{t∈s} m)·N in closed
    // form, one division at the end — so the whole metric is order-free
    // exact decimal algebra with no transcendental (a KL gate would ride
    // on ln agreeing between engines per token; see the q_approx_distinct
    // ulp analysis for why that needs a finite-domain proof). Every stage
    // runs over the memoized VOCAB-sized count artifact — the corpus is
    // never rescanned.
    "pipeline_token_drift" -> ((s, dir) => {
      val cnt = sourceTokenCounts(s, dir)
      val vocab = cnt.groupBy("tok")
        .agg(sum("cnt").cast("decimal(38,0)").as("m"))
      val totals = cnt.groupBy("source")
        .agg(sum("cnt").cast("decimal(38,0)").as("nn"))
      val mTot = vocab.agg(sum("m").as("mm"))
      val agg = cnt.join(vocab, "tok")
        .join(totals, "source")
        .crossJoin(broadcast(mTot))
        .groupBy("source")
        .agg(
          sum(abs(col("cnt").cast("decimal(38,0)") * col("mm") -
            col("m") * col("nn"))).as("a"),
          sum(col("m")).as("sm"),
          first(col("nn")).as("nn"), first(col("mm")).as("mm"))
      agg.select(col("source"), col("nn").cast("long").as("n_tokens"),
          (floor((col("a") + (col("mm") - col("sm")) * col("nn"))
              .cast("double") /
            (lit(2).cast("decimal(38,0)") * col("nn") * col("mm"))
              .cast("double") * 10000) / 10000).as("tv_dist"))
        .orderBy("source")
    }),

    // Zipf fit — the templated/synthetic-source detector at the
    // distribution level (vocab_stats' head-mass sees only the top-10
    // mass; this sees the SHAPE): regress ln(freq) on ln(rank) over each
    // source's top-100 tokens. Natural text gives slope ≈ −1 with high
    // r²; templates/boilerplate flatten or break the line. The top-100
    // head rides the bounded-heap TopKAgg (map-side partial heaps — no
    // vocabulary-wide window sort), ranks come free from the returned
    // array's order, and the regression runs on round(ln·1e6) integer
    // sums so both engines do EXACT integer algebra until one final
    // double division (safe to ~10^17-token corpora; ln is the only
    // float step and its 1e-6 grid sits ~9 orders above the ulp).
    // Rank/boundary ties are freq-equal by definition, so the (rank,
    // freq) multiset — and therefore the fit — is tie-break-invariant.
    "text_zipf_fit" -> ((s, dir) => {
      val pts = sourceTokenCounts(s, dir).groupBy("source")
        .agg(graft.plans.TopKAgg.topk(s,
          struct(col("cnt").cast("double").as("score"),
            xxhash64(col("tok")).as("id")), zipfK).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"),
          round(log(col("pos") + lit(1.0)) * 1e6).cast("long").as("x"),
          round(log(col("col").getField("score")) * 1e6).cast("long").as("y"))
      val a = pts.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
      val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
      a.select(col("source"), col("n").as("n_terms"),
          round(cov / when(vx === 0, lit(null)).otherwise(vx), 4)
            .as("zipf_slope"),
          round(cov * cov /
            when(vx * vy === 0, lit(null)).otherwise(vx * vy), 4)
            .as("fit_r2"))
        .orderBy("source")
    }),

    // Content novelty: the fraction of a doc's distinct 3-gram set that
    // FIRST occurs in this doc (ingest order = doc_id) — the "how much new
    // content does each doc contribute" curation signal, the per-doc view
    // of the span-dedup idea. First-occurrence is min(doc_id) per gram:
    // one groupBy on the (hashed) gram, one join back, one groupBy doc —
    // all linear shuffles; the gram map phase is the native one-pass
    // expression. The oracle counts STRING grams (hash-collision-free at
    // n²/2⁶⁴ odds, same accepted equivalence as pipeline_decontaminate).
    "text_novelty" -> ((s, dir) => {
      val grams = docs(s, dir).select(col("doc_id"),
        explode(graft.plans.NgramHashes.hashes(s, col("text"), 3)).as("gram"))
      val firstSeen = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
      val nov = grams.join(firstSeen, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast("double") / col("n_grams"), 4))
      // empty docs have no grams but must keep a row (novelty 0 of 0)
      docs(s, dir).select(col("doc_id")).join(nov, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          coalesce(col("novelty"), lit(0.0)).as("novelty"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition/quality signals (Rae et al. '21 heuristics):
    // duplicate-3gram mass, alphabetic-word fraction, mean word length —
    // the per-document filters a pretraining pipeline applies corpus-wide.
    "text_repetition" -> ((s, dir) => {
      val grams = Text.wordShingles(col("text"), 3)
      val toks = Text.wsTokens(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        round((size(grams) - size(array_distinct(grams))).cast("double") /
          greatest(size(grams), lit(1)), 4).as("dup_3gram_ratio"),
        round(size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") /
          greatest(size(toks), lit(1)), 4).as("frac_alpha_words"),
        round((length(col("text")) - (size(toks) - lit(1))).cast("double") /
          greatest(size(toks), lit(1)), 4).as("mean_word_len"))
        .orderBy("doc_id")
    }),

    // Deterministic content-hash train/val/test split: assignment depends
    // only on the text (not row order, partitioning, or ids), so re-runs,
    // re-shards, and near-dup handling can't leak val/test into train.
    // First md5 hex nibble: 0-b train (75%), c-d val, e-f test.
    "pipeline_train_split" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          substring(md5(col("text")), 1, 1).as("nibble"))
        .select(col("doc_id"),
          when(col("nibble") < "c", "train")
            .when(col("nibble") < "e", "val")
            .otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .orderBy("split")),

    // End-to-end training-data cleaning pass: quality-gate → exact dedup
    // (lowest doc_id survives, copies counted). One scan, one shuffle on the
    // content hash; the same shape runs unchanged over a 100 TB corpus.
    "pipeline_clean_corpus" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          Text.qualityScore(col("text")).as("quality_score"))
        .filter(col("quality_score") >= 0.5)
        .withColumn("rn", row_number().over(w.orderBy("doc_id")))
        .withColumn("n_copies", count(lit(1)).over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "quality_score", "n_copies")
        .orderBy("doc_id")
    }))

  private[queries] val stopList = Text.stopwords.map(w => s"'$w'").mkString(", ")

  /** The 4dp quality-score formula over a raw `text` column, as DuckDB
    * SQL — the ONE copy every quality-gating oracle embeds
    * (pipeline_clean_corpus here; pipeline_attrition and
    * pipeline_token_budget in PipelineQueries). Must mirror
    * Text.qualityScore term-for-term; a tweak applied to fewer than all
    * users would desynchronize engines confusingly. */
  private[queries] val qualityScoreSql: String =
    s"""round(
       |  least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |        ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS DOUBLE) / 100.0, 1.0) * 0.4 +
       |  least((CAST(len(list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+'),
       |        x -> x IN ($stopList))) AS DOUBLE) /
       |        greatest(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       |        ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS DOUBLE), 1.0)) * 5.0, 1.0) * 0.4 +
       |  (1.0 - least((CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\x0b\\f\\r]')) AS DOUBLE) /
       |        greatest(CAST(length(text) AS DOUBLE), 1.0)) * 10.0, 1.0)) * 0.2,
       |  4)""".stripMargin

  /** `(lang, markers)` VALUES rows generated from the same map the Spark
    * side votes with, so the two can't drift. */
  private val markerRows = Text.langMarkers.toSeq.sortBy(_._1)
    .map { case (lang, ms) =>
      s"('$lang', [${ms.map(m => s"'$m'").mkString(", ")}])"
    }.mkString(",\n        |      ")

  /** Generated DuckDB replay of `n` BPE trainer iterations. Symbols are
    * encoded as chr(31)-wrapped segments (`␟sym␟` concatenated): the merge
    * pattern `␟a␟␟b␟` → `␟ab␟` can neither match across a symbol boundary
    * (an interior `a`-suffix like symbol "xa" is never preceded by ␟) nor
    * make adjacent matches share a boundary character — so DuckDB's
    * left-to-right non-overlapping replace() IS the trainer's fold rule. */
  private val bpeSep = "chr(31)"

  /** The shared CTE chain: toks → v0 → (pair stats, argmax, rewrite) × n,
    * ending at vocab `v<n>`. */
  private def bpeCte(n: Int): String = {
    val sep = bpeSep
    def stage(k: Int): String =
      s"""s$k AS (SELECT freq, str_split(trim(syms, $sep), $sep || $sep) AS s FROM v$k),
         |p$k AS (
         |  SELECT s[i] AS a, s[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM s$k, unnest(generate_series(1, len(s) - 1)) AS t(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT a, b, cnt FROM p$k ORDER BY cnt DESC, a, b LIMIT 1),
         |v${k + 1} AS (
         |  -- LEFT JOIN, not CROSS: an exhausted pair table (empty argmax)
         |  -- must leave the vocab unchanged, matching the trainer's stop
         |  SELECT term, freq,
         |         CASE WHEN b.a IS NULL THEN v.syms
         |              ELSE replace(v.syms, $sep || b.a || $sep || $sep || b.b || $sep,
         |                           $sep || b.a || b.b || $sep) END AS syms
         |  FROM v$k v LEFT JOIN b$k b ON TRUE)""".stripMargin
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)),
       |                '[ \\t\\n\\x0b\\f\\r]+')) AS term
       |  FROM documents),
       |v0 AS (
       |  SELECT term, count(*) AS freq,
       |         regexp_replace(term, '(.)', $sep || '\\1' || $sep, 'g') AS syms
       |  FROM toks WHERE term <> '' GROUP BY term),
       |${(0 until n).map(stage).mkString(",\n")}""".stripMargin
  }

  private def bpeMergesOracle(n: Int): String = {
    val unions = (0 until n).map(k =>
      s"SELECT CAST(${k + 1} AS BIGINT) AS merge_idx, a AS lhs, b AS rhs, cnt FROM b$k")
      .mkString("\nUNION ALL\n")
    s"${bpeCte(n)}\n$unions ORDER BY merge_idx"
  }

  /** Encode replay: unwrap `v<n>`'s separator string into space-joined
    * pieces for the top-50 terms by (freq desc, term). */
  private def bpeEncodeOracle(n: Int): String = {
    val sep = bpeSep
    s"""${bpeCte(n)},
       |pieces AS (
       |  SELECT term, CAST(freq AS BIGINT) AS freq,
       |         str_split(trim(syms, $sep), $sep || $sep) AS s
       |  FROM v$n)
       |SELECT term, freq, CAST(len(s) AS BIGINT) AS n_pieces,
       |       array_to_string(s, ' ') AS pieces
       |FROM pieces ORDER BY freq DESC, term LIMIT 50""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // Marker-word voting is pure list arithmetic, so the oracle replays it:
    // per-language hit counts, then Spark's array_max over (hits, lang)
    // structs = row_number ordered by hits DESC, lang DESC.
    // the identical integer features via regexp_extract_all counts; both
    // rules replayed as the same integral cross-multiplications
    "text_code_detect" ->
      s"""WITH f AS (
         |  SELECT doc_id, length(text) AS n_chars,
         |         1 + len(regexp_extract_all(text, '\\n')) AS n_lines,
         |         len(regexp_extract_all(text, '[{};]')) AS n_code_punct,
         |         len(regexp_extract_all(text, '(^|\\n)(\\t|    )')) AS n_indent_lines,
         |         len(regexp_extract_all(text,
         |           '\\b(def|class|return|import|function|const|public|void)\\b')) AS kw_hits
         |  FROM documents)
         |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
         |       CAST(n_code_punct AS BIGINT) AS n_code_punct,
         |       CAST(n_indent_lines AS BIGINT) AS n_indent_lines,
         |       CAST(kw_hits AS BIGINT) AS kw_hits,
         |       n_code_punct * 25 >= n_chars AND n_chars > 0 AS punct_rule,
         |       kw_hits >= 2 AND n_indent_lines * 4 >= n_lines AS struct_rule,
         |       (n_code_punct * 25 >= n_chars AND n_chars > 0)
         |         OR (kw_hits >= 2 AND n_indent_lines * 4 >= n_lines) AS is_code
         |FROM f ORDER BY doc_id""".stripMargin,

    // exact-regime replay: capacity ≥ vocabulary ⇒ the MG counters are
    // the exact counts, and the engine's 32·n > total filter is this
    // exact-count threshold
    "q_heavy_hitters_stream" ->
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        |        FROM toks GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total
        |        FROM cnt GROUP BY 1)
        |SELECT source, tok AS token, n, total
        |FROM cnt JOIN tot USING (source)
        |WHERE 32 * n > total
        |ORDER BY source, token""".stripMargin,

    // the oracle IS the brute-force scan the index path must equal
    "text_trgm_search" ->
      """SELECT pat, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
        |FROM (VALUES ('window table'), ('spark scan'), ('slow query'),
        |      ('key agg row')) pats(pat)
        |JOIN documents ON contains(text, pat)
        |GROUP BY pat ORDER BY pat""".stripMargin,

    "text_langid" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang AS lang_actual,
         |         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
         |  FROM documents),
         |hits AS (
         |  SELECT doc_id, lang_actual, l.lang,
         |         len(list_filter(t, x -> list_contains(l.markers, x))) AS hits
         |  FROM toks CROSS JOIN (
         |    SELECT * FROM (VALUES
         |      $markerRows) v(lang, markers)) l),
         |best AS (
         |  SELECT doc_id, lang_actual, lang, hits,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY hits DESC, lang DESC) AS rn
         |  FROM hits)
         |SELECT doc_id,
         |       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred,
         |       lang_actual
         |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // the same marker-vote prediction CTEs cross-tabbed against the
    // stored lang column; shares as quantized integer rationals
    "text_lang_confusion" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang AS lang_actual,
         |         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS t
         |  FROM documents),
         |hits AS (
         |  SELECT doc_id, lang_actual, l.lang,
         |         len(list_filter(t, x -> list_contains(l.markers, x))) AS hits
         |  FROM toks CROSS JOIN (
         |    SELECT * FROM (VALUES
         |      $markerRows) v(lang, markers)) l),
         |best AS (
         |  SELECT doc_id, lang_actual, lang, hits,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY hits DESC, lang DESC) AS rn
         |  FROM hits),
         |pred AS (
         |  SELECT lang_actual,
         |         CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred
         |  FROM best WHERE rn = 1),
         |cells AS (SELECT lang_actual, lang_pred,
         |                 CAST(count(*) AS BIGINT) AS n
         |          FROM pred GROUP BY 1, 2),
         |tot AS (SELECT lang_actual, CAST(sum(n) AS BIGINT) AS n_actual
         |        FROM cells GROUP BY 1)
         |SELECT lang_actual, lang_pred, n,
         |       CAST((n * 10000) // n_actual AS DOUBLE) / 10000.0
         |         AS share_of_actual
         |FROM cells JOIN tot USING (lang_actual)
         |ORDER BY lang_actual, lang_pred""".stripMargin,

    // same vocab collapse, same weighted bigram unnest, integer counts
    "text_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)),
        |                '[ \t\n\x0b\f\r]+')) AS term
        |  FROM documents),
        |vocab AS (
        |  SELECT term, count(*) AS freq FROM toks
        |  WHERE term <> '' GROUP BY term),
        |pos AS (
        |  SELECT term, freq,
        |         unnest(generate_series(1, length(term) - 1)) AS i
        |  FROM vocab WHERE length(term) >= 2)
        |SELECT substr(term, CAST(i AS INTEGER), 2) AS pair,
        |       CAST(sum(freq) AS BIGINT) AS n
        |FROM pos GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    // full 6-iteration trainer replay: same vocab collapse, same
    // overlapping pair stats, same (cnt desc, a, b) argmax, same
    // left-to-right non-overlapping rewrite — as a generated CTE chain
    // over the wrapped-separator symbol encoding (see the query's note on
    // why the wrapping makes string replace exactly the BPE fold)
    "text_bpe_merges" -> bpeMergesOracle(6),

    // encoder replay: the same 6-iteration fold, final vocab unwrapped
    // into pieces; bounded head by the (freq desc, term) total order
    "text_bpe_encode" -> bpeEncodeOracle(6),

    // same three integer counts, same fixed-order IEEE formula chain, band
    // cut on the rounded index
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CAST(length(regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g')) AS BIGINT)
        |           AS n_letters,
        |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+'))
        |              END AS BIGINT) AS n_words,
        |         CAST(greatest(length(text) - length(translate(text, '.!?', '')), 1)
        |           AS BIGINT) AS n_sentences
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_letters, n_words, n_sentences,
        |         floor((4.71 * (CAST(n_letters AS DOUBLE) / n_words) +
        |                0.5 * (CAST(n_words AS DOUBLE) / n_sentences) -
        |                21.43) * 10000) / 10000 AS ari,
        |         floor((0.0588 * (100.0 * CAST(n_letters AS DOUBLE) / n_words) -
        |                0.296 * (100.0 * CAST(n_sentences AS DOUBLE) / n_words) -
        |                15.8) * 10000) / 10000 AS cli
        |  FROM c WHERE n_words > 0)
        |SELECT doc_id, n_letters, n_words, n_sentences, ari, cli,
        |       CASE WHEN ari < 8 THEN 'easy' WHEN ari < 16 THEN 'medium'
        |            ELSE 'hard' END AS band
        |FROM r ORDER BY doc_id""".stripMargin,

    // Same unigram model: freq/total in double, natural log, 4dp-rounded
    // mean (ln and summation order agree to ~1e-14 — far from the rounding
    // boundary, the same accepted class as emb_centroids' avg(cos)). The
    // "" pseudo-token of empty docs is filtered on both sides; empty docs
    // come back via the left join with n_tokens 0 and a null score.
    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT count(*) AS total FROM toks),
        |scored AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |         round(avg(ln(CAST(f.cnt AS DOUBLE) / tt.total)), 4) AS lm_score
        |  FROM toks t JOIN freq f USING (tok) CROSS JOIN tot tt
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id, coalesce(s.n_tokens, 0) AS n_tokens, s.lm_score
        |FROM documents d LEFT JOIN scored s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // same windowed pairing (lead per doc ≡ arr[i], arr[i+1]), count
    // ratios, avg-ln + 4dp rounding as the unigram gate
    "text_lm_bigram" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS arr
        |  FROM documents WHERE length(trim(text)) > 0),
        |p AS (
        |  SELECT doc_id, arr[i] AS a, arr[i + 1] AS b
        |  FROM d, unnest(generate_series(1, len(arr) - 1)) AS t(i)),
        |dp AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS n
        |       FROM p GROUP BY 1, 2, 3),
        |big AS (SELECT a, b, CAST(sum(n) AS BIGINT) AS c_ab FROM dp GROUP BY 1, 2),
        |lf AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM big GROUP BY 1)
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(sum(CAST(n AS DOUBLE) * ln(CAST(c_ab AS DOUBLE) / c_a))
        |             / sum(CAST(n AS DOUBLE)), 4) AS lm2_score
        |FROM dp JOIN big USING (a, b) JOIN lf USING (a)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical pair/unigram universes (the lm_bigram CTEs + unnested
    // tokens of the same arrays); lift is HUGEINT products → ONE double
    // division, so the DESC ranking and floor-quantize replay exactly
    "text_collocations" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS arr
        |  FROM documents WHERE length(trim(text)) > 0),
        |p AS (
        |  SELECT arr[i] AS a, arr[i + 1] AS b
        |  FROM d, unnest(generate_series(1, len(arr) - 1)) AS t(i)),
        |big AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM p GROUP BY 1, 2),
        |uni AS (SELECT w, CAST(count(*) AS HUGEINT) AS n_w FROM (
        |          SELECT unnest(arr) AS w FROM d) GROUP BY 1),
        |nu AS (SELECT CAST(sum(n_w) AS HUGEINT) AS n_u FROM uni),
        |np AS (SELECT CAST(sum(n_ab) AS HUGEINT) AS n_p FROM big)
        |SELECT a, b, n_ab, floor(lift * 10000) / 10000 AS lift FROM (
        |  SELECT a, b, n_ab,
        |         CAST(CAST(n_ab AS HUGEINT) * n_u * n_u AS DOUBLE) /
        |         CAST(ua.n_w * ub.n_w * n_p AS DOUBLE) AS lift
        |  FROM big JOIN uni ua ON big.a = ua.w
        |           JOIN uni ub ON big.b = ub.w, nu, np
        |  WHERE n_ab >= 5)
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,

    // same LM CTE, then integer-histogram tercile boundaries per lang
    // (3·cum ≥ k·n — exact integer rank math, ties share a bucket)
    "text_ccnet_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |tot AS (SELECT count(*) AS total FROM toks),
        |scored AS (
        |  SELECT t.doc_id,
        |         round(avg(ln(CAST(f.cnt AS DOUBLE) / tt.total)), 4) AS lm_score
        |  FROM toks t JOIN freq f USING (tok) CROSS JOIN tot tt
        |  GROUP BY t.doc_id),
        |sc AS (
        |  SELECT d.lang, CAST(round(s.lm_score * 10000) AS BIGINT) AS score_e4
        |  FROM documents d JOIN scored s USING (doc_id)),
        |hist AS (SELECT lang, score_e4, count(*) AS cnt FROM sc GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, score_e4,
        |         sum(cnt) OVER (PARTITION BY lang ORDER BY score_e4) AS cum,
        |         sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |bounds AS (
        |  SELECT lang,
        |         min(CASE WHEN cum * 3 >= n THEN score_e4 END) AS b_lo,
        |         min(CASE WHEN cum * 3 >= n * 2 THEN score_e4 END) AS b_hi
        |  FROM cum GROUP BY lang),
        |b AS (
        |  SELECT sc.lang,
        |         CASE WHEN score_e4 <= b_lo THEN 'tail'
        |              WHEN score_e4 > b_hi THEN 'head'
        |              ELSE 'middle' END AS bucket,
        |         score_e4
        |  FROM sc JOIN bounds USING (lang))
        |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(score_e4) AS min_score_e4, max(score_e4) AS max_score_e4
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // integral rule flags (cross-multiplied), ratios rounded for display only
    "text_gopher_filters" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |         regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+') AS t,
         |         regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') AS lt,
         |         CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_words
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, n_words,
         |         len(t) AS n_tok,
         |         length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', '', 'g')) AS word_chars,
         |         len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         |         len(list_filter(lt, x -> x IN ($stopList))) AS n_stop
         |  FROM f),
         |r AS (
         |  SELECT doc_id, n_words,
         |         round(CAST(word_chars AS DOUBLE) / greatest(n_tok, 1), 4) AS mean_word_len,
         |         round(CAST(n_alpha AS DOUBLE) / greatest(n_tok, 1), 4) AS frac_alpha_words,
         |         CAST(n_stop AS BIGINT) AS n_stop,
         |         CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_word_count,
         |         CAST(CASE WHEN word_chars >= n_tok * 3 AND word_chars <= n_tok * 10 THEN 1 ELSE 0 END AS BIGINT) AS ok_mean_len,
         |         CAST(CASE WHEN n_alpha * 5 >= n_tok * 4 THEN 1 ELSE 0 END AS BIGINT) AS ok_alpha,
         |         CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_stop
         |  FROM g)
         |SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop,
         |       ok_word_count, ok_mean_len, ok_alpha, ok_stop,
         |       ok_word_count * ok_mean_len * ok_alpha * ok_stop AS gopher_pass
         |FROM r ORDER BY doc_id""".stripMargin,

    // identical rational tf·idf: integers into one * and one /, both
    // correctly-rounded IEEE — rank comparisons see identical doubles
    "text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS term
        |    FROM documents) WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         tf.tf * (nd.n_docs + 1.0) / (df.df + 1.0) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN nd),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY score DESC, term) AS BIGINT) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tf, df, round(score, 4) AS tfidf
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // BM25 replay: identical rational arithmetic in identical op order —
    // ratio idf (no log), tf saturation, dl/avgdl normalization, and the
    // three per-term contributions added in the same literal order
    "text_bm25" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN []
        |              ELSE regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') END AS toks,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS dl
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, CAST(dl AS BIGINT) AS dl,
        |         CAST(len(list_filter(toks, x -> x = 'join')) AS BIGINT) AS tf0,
        |         CAST(len(list_filter(toks, x -> x = 'hash')) AS BIGINT) AS tf1,
        |         CAST(len(list_filter(toks, x -> x = 'vector')) AS BIGINT) AS tf2
        |  FROM d),
        |g AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
        |         CAST(count(CASE WHEN tf0 > 0 THEN 1 END) AS BIGINT) AS df0,
        |         CAST(count(CASE WHEN tf1 > 0 THEN 1 END) AS BIGINT) AS df1,
        |         CAST(count(CASE WHEN tf2 > 0 THEN 1 END) AS BIGINT) AS df2
        |  FROM f),
        |s AS (
        |  SELECT doc_id, dl, tf0, tf1, tf2,
        |    (g.n_docs + 1.0) / (g.df0 + 1.0) * (tf0 * 2.2) /
        |      (tf0 + 1.2 * (0.25 + 0.75 * (dl / (g.sum_dl / CAST(g.n_docs AS DOUBLE))))) +
        |    (g.n_docs + 1.0) / (g.df1 + 1.0) * (tf1 * 2.2) /
        |      (tf1 + 1.2 * (0.25 + 0.75 * (dl / (g.sum_dl / CAST(g.n_docs AS DOUBLE))))) +
        |    (g.n_docs + 1.0) / (g.df2 + 1.0) * (tf2 * 2.2) /
        |      (tf2 + 1.2 * (0.25 + 0.75 * (dl / (g.sum_dl / CAST(g.n_docs AS DOUBLE))))) AS score
        |  FROM f, g)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        |       doc_id, dl, tf0 AS tf_join, tf1 AS tf_hash, tf2 AS tf_vector,
        |       round(score, 4) AS bm25
        |FROM s WHERE score > 0 ORDER BY rank LIMIT 20""".stripMargin,

    // Exact-count replay of the heavy-hitter summary: with capacity ≥ the
    // per-source vocabulary the Misra–Gries sketch never decrements, so
    // its counters ARE the exact counts; rank by (count desc, token asc),
    // the aggregate's own output order.
    "text_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |cnt AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS BIGINT)
        |         AS rk
        |  FROM cnt)
        |SELECT source, rk, tok AS token, n FROM rk WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin,

    // Same recurrence as Md5FingerprintExpr: left fold of
    // (acc*31 + md5prefix(tok) mod M) mod M over the whitespace tokens,
    // seeded by the prepended 0. Bounds: acc < M ≈ 2^50, so acc*31 + h
    // never leaves BIGINT on either engine.
    "text_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(
        |         list_prepend(0::BIGINT,
        |           list_transform(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+'),
        |             t -> (('0x' || substr(md5(t), 1, 15))::BIGINT % 1000000000000037))),
        |         (acc, h) -> (acc * 31 + h) % 1000000000000037) AS fingerprint,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same consecutive-duplicate collapse (1-based DuckDB lambda index;
    // w[0] is NULL and TRUE OR NULL = TRUE, so no guard needed here)
    "text_derep" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text),
        |                   '[ \t\n\x0b\f\r]+')) END AS n_tokens,
        |         regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+') AS w
        |  FROM documents),
        |k AS (SELECT doc_id, n_tokens,
        |             list_filter(w, (x, i) -> i = 1 OR x <> w[i-1]) AS kept,
        |             len(w) AS raw_len
        |      FROM t)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(raw_len - len(kept) AS BIGINT) AS n_removed,
        |       md5(array_to_string(kept, ' ')) AS clean_md5
        |FROM k ORDER BY doc_id""".stripMargin,

    // same 3-shingle construction (short docs → one whole-doc gram), the
    // same hash·2¹⁶+(65535−pos) window key, the same full-window filter
    "text_winnowing" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(range(len(t) - 2),
        |                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END AS gs
        |  FROM toks),
        |g1 AS (SELECT doc_id, unnest(gs) AS g,
        |              unnest(range(len(gs))) AS pos
        |       FROM g0),
        |k AS (SELECT doc_id, pos,
        |             ('0x' || substr(md5(g), 1, 10))::BIGINT * 65536
        |               + (65535 - pos) AS ck
        |      FROM g1),
        |r AS (SELECT doc_id, pos, ck,
        |             min(ck) OVER (PARTITION BY doc_id ORDER BY pos
        |               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rm,
        |             count(*) OVER (PARTITION BY doc_id) AS ng
        |      FROM k),
        |sel AS (SELECT DISTINCT doc_id, ng, rm FROM r
        |        WHERE pos >= 3 OR (ng < 4 AND pos = ng - 1))
        |SELECT doc_id, CAST(max(ng) AS BIGINT) AS n_grams,
        |       CAST(count(*) AS BIGINT) AS n_fingerprints,
        |       CAST(sum(rm % 1000000007) AS BIGINT) AS fp_checksum
        |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |       CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \t\n\x0b\f\r]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |         length(text) AS n_chars,
         |         CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens,
         |         len(list_filter(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+'),
         |             x -> x IN ($stopList))) AS n_stop,
         |         len(regexp_extract_all(text, '[^a-zA-Z0-9 \\t\\n\\x0b\\f\\r]')) AS n_punct
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |       round(CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS avg_token_len,
         |       round(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio,
         |       round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
         |       round(
         |         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
         |         least((CAST(n_stop AS DOUBLE) / greatest(CAST(n_tokens AS DOUBLE), 1.0)) * 5.0, 1.0) * 0.4 +
         |         (1.0 - least((CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0)) * 10.0, 1.0)) * 0.2,
         |         4) AS quality_score
         |FROM f ORDER BY doc_id""".stripMargin,

    "text_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(length(text)),
        |                i -> substr(text, i + 1, 1))) AS ch
        |  FROM documents),
        |counts AS (SELECT doc_id, ch, count(*) AS n FROM chars GROUP BY 1, 2),
        |ent AS (
        |  SELECT doc_id,
        |         round(log2(CAST(sum(n) AS DOUBLE)) -
        |               sum(n * log2(CAST(n AS DOUBLE))) / CAST(sum(n) AS DOUBLE),
        |               4) AS char_entropy
        |  FROM counts GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(ent.char_entropy, 0.0) AS char_entropy
        |FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "text_top_ngrams" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t FROM documents),
        |grams AS (
        |  SELECT unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
        |                ELSE list_transform(range(len(t) - 1),
        |                     i -> t[i + 1] || ' ' || t[i + 2]) END) AS ngram
        |  FROM toks)
        |SELECT ngram, count(*) AS n FROM grams
        |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

    "text_vocab_stats" ->
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |cnt AS (
        |  SELECT source, tok, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY count(*) DESC, tok) AS rk
        |  FROM toks GROUP BY source, tok)
        |SELECT source,
        |       CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |       count(*) AS n_types,
        |       round(CAST(count(*) AS DOUBLE) / sum(cnt), 4) AS type_token_ratio,
        |       round(CAST(sum(CASE WHEN rk <= 10 THEN cnt ELSE 0 END) AS DOUBLE) /
        |             sum(cnt), 4) AS head_mass
        |FROM cnt GROUP BY source ORDER BY source""".stripMargin,

    // exact rational replay: HUGEINT carries Σ|n·M − m·N| and the
    // absent-mass closed form; ONE double division, floor-quantized
    "pipeline_token_drift" ->
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |cnt AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2),
        |vocab AS (SELECT tok, CAST(sum(n) AS HUGEINT) AS m FROM cnt GROUP BY 1),
        |tot AS (SELECT source, CAST(sum(n) AS HUGEINT) AS nn FROM cnt GROUP BY 1),
        |mm AS (SELECT CAST(sum(m) AS HUGEINT) AS mm FROM vocab),
        |agg AS (
        |  SELECT c.source,
        |         sum(abs(CAST(c.n AS HUGEINT) * mm.mm - v.m * t.nn)) AS a,
        |         sum(v.m) AS sm
        |  FROM cnt c
        |  JOIN vocab v USING (tok)
        |  JOIN tot t USING (source), mm
        |  GROUP BY 1)
        |SELECT a.source, CAST(t.nn AS BIGINT) AS n_tokens,
        |       floor(CAST(a.a + (mm.mm - a.sm) * t.nn AS DOUBLE) /
        |             CAST(2 * t.nn * mm.mm AS DOUBLE) * 10000) / 10000
        |         AS tv_dist
        |FROM agg a JOIN tot t USING (source), mm
        |ORDER BY a.source""".stripMargin,

    // any tie-break works (ties are freq-equal → same (rank, freq)
    // multiset); sums are exact (DuckDB HUGEINT ⊇ Spark's in-range longs)
    "text_zipf_fit" ->
      s"""WITH toks AS (
         |  SELECT source, tok FROM (
         |    SELECT source, unnest(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS tok
         |    FROM documents) WHERE tok <> ''),
         |cnt AS (SELECT source, tok, count(*) AS cnt FROM toks GROUP BY source, tok),
         |r AS (SELECT source, cnt,
         |             row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok) AS rk
         |      FROM cnt),
         |i AS (SELECT source,
         |             CAST(round(ln(rk) * 1e6) AS BIGINT) AS x,
         |             CAST(round(ln(cnt) * 1e6) AS BIGINT) AS y
         |      FROM r WHERE rk <= $zipfK),
         |a AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |             sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
         |      FROM i GROUP BY source)
         |SELECT source, n AS n_terms,
         |       round(CAST(n*sxy - sx*sy AS DOUBLE) /
         |             nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0), 4) AS zipf_slope,
         |       round(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE) /
         |             nullif(CAST(n*sxx - sx*sx AS DOUBLE) *
         |                    CAST(n*syy - sy*sy AS DOUBLE), 0), 4) AS fit_r2
         |FROM a ORDER BY source""".stripMargin,

    // string-gram replay of the hashed-gram novelty pass (same accepted
    // hash-vs-string equivalence as pipeline_decontaminate)
    "text_novelty" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |                ELSE list_transform(range(len(t) - 2),
        |                     i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) END)) AS gram
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
        |        FROM documents)),
        |fs AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram),
        |nov AS (
        |  SELECT g.doc_id, count(*) AS n_grams,
        |         CAST(sum(CASE WHEN fs.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM g JOIN fs USING (gram) GROUP BY g.doc_id)
        |SELECT d.doc_id, coalesce(nov.n_grams, 0) AS n_grams,
        |       coalesce(nov.n_novel, 0) AS n_novel,
        |       coalesce(round(CAST(nov.n_novel AS DOUBLE) / nov.n_grams, 4), 0.0) AS novelty
        |FROM documents d LEFT JOIN nov USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "text_repetition" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t,
        |         regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+') AS toks,
        |         length(text) AS n_chars
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks, n_chars,
        |         CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |              ELSE list_transform(range(len(t) - 2),
        |                   i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) END AS grams
        |  FROM f)
        |SELECT doc_id,
        |       round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) /
        |             greatest(len(grams), 1), 4) AS dup_3gram_ratio,
        |       round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) /
        |             greatest(len(toks), 1), 4) AS frac_alpha_words,
        |       round(CAST(n_chars - (len(toks) - 1) AS DOUBLE) /
        |             greatest(len(toks), 1), 4) AS mean_word_len
        |FROM g ORDER BY doc_id""".stripMargin,

    "pipeline_train_split" ->
      """WITH assigned AS (
        |  SELECT doc_id,
        |         CASE WHEN substr(md5(text), 1, 1) < 'c' THEN 'train'
        |              WHEN substr(md5(text), 1, 1) < 'e' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM assigned GROUP BY split ORDER BY split""".stripMargin,

    "pipeline_clean_corpus" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, source, text,
         |         $qualityScoreSql AS quality_score
         |  FROM documents),
         |good AS (SELECT * FROM scored WHERE quality_score >= 0.5),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
         |         count(*) OVER (PARTITION BY md5(text)) AS n_copies
         |  FROM good)
         |SELECT doc_id, lang, source, quality_score, n_copies
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)
}

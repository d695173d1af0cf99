package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization
  * stats, quality scoring, language ID, and document fingerprinting.
  *
  * Everything is built from codegen'd Catalyst expressions (split / regexp /
  * array functions) — no UDFs — so a 100 TB documents scan stays inside
  * whole-stage codegen and the text column is the only column read.
  */
object TextAnalysis {

  /** Whitespace tokenization; empty/blank text → empty array (a bare
    * split("") would return [""]).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of maximal runs of word characters plus
    * standalone punctuation marks — approximates tokenizer token counts
    * without a vocab (regexp is codegen'd, runs at scan speed).
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), t => length(trim(t)) > 0))

  /** Character n-gram / word shingle helpers (shared with dedup). */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(lower(text))
    if (n == 1) array_distinct(t)
    else {
      // slide an n-window over the token array: positions 1..size-n+1
      when(size(t) < n, array().cast("array<string>")).otherwise(
        array_distinct(transform(
          sequence(lit(1), size(t) - lit(n - 1)),
          i => array_join(slice(t, i, lit(n)), " "))))
    }
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"))

  /** Number of tokens that belong to `lang`'s stopword list. */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = stopwords(lang).map(lit(_))
    size(filter(tokens(lower(text)), t => t.isin(sw: _*)))
  }

  /** Heuristic language ID: argmax of per-language stopword-hit counts with
    * a deterministic tie-break (language code ascending); "und" when no
    * list scores at all. n-gram-lexicon heuristic, not a model — by design
    * (no external deps, pure codegen).
    */
  def langIdScores(text: Column): Seq[(String, Column)] =
    stopwords.keys.toSeq.sorted.map(l => l -> stopwordHits(text, l))

  def langId(text: Column): Column = {
    val scored = langIdScores(text)
    // array of (score, lang) structs; array_max compares lexicographically:
    // highest score wins, then the LARGEST lang code — so store the lang
    // negated... instead sort ascending by (score, revLang) and take max
    // with tie-break on smallest code by maxing (score, -ord). Encode the
    // tie-break as (score, 25 - ordinal) so max picks the alphabetically
    // first language among equals.
    val arr = array(scored.zipWithIndex.map { case ((l, s), i) =>
      struct(s.as("s"), lit(scored.size - i).as("tb"), lit(l).as("lang"))
    }: _*)
    val best = array_max(arr)
    when(best.getField("s") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality-score features + a composite score in [0,1]. All ratios are
    * exact integer divisions promoted to double, so the score is
    * deterministic and oracle-reproducible bit-for-bit.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChar = length(t)
    val punct = length(t) - length(regexp_replace(t, "[.,;:!?]", ""))
    val stop = stopwordHits(t, "en")
    df.withColumn("n_tokens", nTok.cast("int"))
      .withColumn("n_chars_m", nChar.cast("int"))
      .withColumn("punct_ratio", punct.cast("double") / greatest(nChar, lit(1)))
      .withColumn("stopword_ratio", stop.cast("double") / greatest(nTok, lit(1)))
      .withColumn("mean_token_len",
        (nChar - (nTok - lit(1))).cast("double") / greatest(nTok, lit(1)))
      .withColumn("quality_score",
        least(lit(1.0), nTok.cast("double") / lit(64.0)) * lit(0.5)
          + least(lit(1.0), col("stopword_ratio") * lit(4.0)) * lit(0.25)
          + (lit(1.0) - least(lit(1.0), col("punct_ratio") * lit(10.0))) * lit(0.25))
  }

  /** Repetition scores (Gopher-style repetition filters, token-level):
    * per document, the share of tokens taken by the single most frequent
    * token (`top_tok_ratio`), the distinct/total token ratio
    * (`distinct_ratio`), and the fraction of duplicate 2-grams
    * (`dup_2gram_ratio`) — the three signals the Gopher/MassiveText
    * curation rules threshold to drop boilerplate and degenerate
    * machine-generated text. Blank documents produce no row.
    *
    * Shape: the 2-gram counts are pure STAGED projections
    * (`array_distinct` is a linear hash-set pass; staging keeps the
    * transform out of repeated lambda expansion — see the winnowing note),
    * and only the per-token frequency needs a shuffle: the same
    * explode → (doc, token) count shape as TF (q68), with the per-doc
    * scalars riding along via `first`. ONE shuffle key = (doc, token), so
    * at 100 TB this scales exactly as far as TF computation does.
    */
  def repetitionScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("__rp_")),
      "input already carries __rp_* columns — they would be clobbered")
    val toks = col("__rp_toks"); val grams = col("__rp_grams")
    val staged = df
      .select(col(idCol), tokens(lower(col(textCol))).as("__rp_toks"))
      .filter(size(toks) > 0)
      .withColumn("__rp_grams",
        when(size(toks) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
      .select(col(idCol), toks,
        size(grams).as("__rp_n2"),
        size(array_distinct(grams)).as("__rp_d2"))
    staged
      .select(col(idCol), col("__rp_n2"), col("__rp_d2"),
        explode(toks).as("__rp_tok"))
      .groupBy(col(idCol), col("__rp_tok"))
      .agg(count(lit(1)).as("__rp_c"),
        first("__rp_n2").as("__rp_n2"), first("__rp_d2").as("__rp_d2"))
      .groupBy(col(idCol))
      .agg(sum("__rp_c").as("n_tok"),
        count(lit(1)).as("__rp_nd"),
        max("__rp_c").as("__rp_top"),
        first("__rp_n2").as("__rp_n2"), first("__rp_d2").as("__rp_d2"))
      .select(col(idCol),
        col("n_tok"),
        (col("__rp_top").cast("double") / col("n_tok")).as("top_tok_ratio"),
        (col("__rp_nd").cast("double") / col("n_tok")).as("distinct_ratio"),
        when(col("__rp_n2") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("__rp_d2").cast("double") / col("__rp_n2"))
          .as("dup_2gram_ratio"))
  }

  /** Canonical text cleaning — the normalization chain run before any
    * hashing/dedup/tokenization touches a raw corpus: Unicode NFKC (folds
    * composed/decomposed forms, ligatures, full-width digits — see
    * [[graft.functions.expressions.NormalizeText]]), control-character
    * strip, and whitespace collapse. Pure projection: one codegen'd
    * normalize plus two regexp passes riding the scan.
    */
  def cleanText(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn(outCol,
      trim(regexp_replace(
        regexp_replace(
          graft.functions.GraftFunctions.normalizeText(col(textCol), "NFKC"),
          "[\\p{Cc}\\p{Cf}]", " "),
        "\\s+", " ")))
  }

  /** Per-group Shannon entropy of the token distribution — the vocabulary-
    * diversity statistic a corpus datasheet reports (a source whose
    * entropy collapses is template spam; one that jumps is a scrape-mix
    * change). H = ln(N) − (Σ c·ln c)/N over per-token counts c.
    *
    * Determinism contract (the q117/q135 discipline): every transcendental
    * term is rounded to 6 dp and lifted to DECIMAL(18,6) BEFORE the sum,
    * so the aggregate is order-free and cross-engine exact; the closing
    * arithmetic derives from identical integers/decimals through an
    * identical expression tree. Shape: one explode + two hash aggregates
    * (token counts, then the entropy fold per group) — token keys only,
    * text never shuffles twice.
    */
  def tokenEntropy(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(groupCol), explode(tokens(lower(col(textCol)))).as("__te_tok"))
      .groupBy(col(groupCol), col("__te_tok"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(round(col("c").cast("double") * log(col("c").cast("double")), 6)
          .cast("decimal(18,6)")).as("__te_sclnc"))
      .select(col(groupCol), col("n_tokens"), col("vocab_size"),
        round(log(col("n_tokens").cast("double")) -
          col("__te_sclnc").cast("double") / col("n_tokens").cast("double"), 6)
          .as("entropy"))
  }

  /** Hot-token boilerplate pruning — the token-granularity form of the
    * C4/RefinedWeb boilerplate strip: tokens appearing in more than
    * `maxDocFrequency` of all documents (navigation chrome, license
    * footers, template glue) are removed from every document, preserving
    * the order of what survives. Emits one row per input document with the
    * pruned text and before/after token counts, so drop rates are one
    * aggregation away.
    *
    * Scale shape: document frequency is one explode + hash aggregate over
    * 8-byte-ish token keys (map-side combine collapses each partition to
    * its vocabulary). The hot set is the ZIPF HEAD of that table — a df
    * floor that is a corpus fraction keeps only tokens frequent enough to
    * appear in a constant fraction of documents, so the set is bounded by
    * ~1/maxDocFrequency regardless of corpus size — and rides the driver
    * as a model parameter (same contract as IVF centroids; `maxHotTokens`
    * guards the collect). The rewrite is then a single codegen'd
    * projection over the scan — filter + array_contains against the
    * broadcast literal — with NO token-level shuffle and no join: the
    * corpus text crosses the wire zero times.
    */
  def pruneHotTokens(df: DataFrame, idCol: String, textCol: String,
      maxDocFrequency: Double, maxHotTokens: Int = 100000): DataFrame = {
    require(maxDocFrequency > 0 && maxDocFrequency <= 1, "maxDocFrequency in (0,1]")
    val total = df.count()
    val hot = df
      .select(explode(array_distinct(tokens(col(textCol)))).as("__ht_tok"))
      .groupBy(col("__ht_tok")).agg(count(lit(1)).as("__ht_df"))
      .filter(col("__ht_df") > lit(maxDocFrequency) * lit(total.toDouble))
      .select(col("__ht_tok")).collect().map(_.getString(0))
    require(hot.length <= maxHotTokens,
      s"hot-token set ${hot.length} exceeds maxHotTokens=$maxHotTokens — " +
        "raise maxDocFrequency or the cap")
    // hash-set probe per token (codegen'd StringArrayExcludeSet), not the
    // builtin filter+array_contains linear scan of the literal — at the
    // maxHotTokens ceiling the linear form is O(tokens·|hot|) over the
    // corpus and stops being scan-bound
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), tokens(col(textCol)).as("__ht_toks"))
      .select(col(idCol), size(col("__ht_toks")).as("n_tokens_before"),
        graft.functions.GraftFunctions
          .stringArrayExcludeSet(col("__ht_toks"), hot.toSeq.sorted).as("__ht_kept"))
      .select(col(idCol), col("n_tokens_before"),
        size(col("__ht_kept")).as("n_tokens_after"),
        array_join(col("__ht_kept"), " ").as("text_pruned"))
  }

  /** Rare-token ratio — a deterministic perplexity proxy (the CCNet-style
    * quality signal without a language model): the fraction of a document's
    * tokens whose CORPUS frequency is below `minFreq`. Documents dominated
    * by rare/garbled tokens score high and get filtered; everything
    * derives from integer counts plus one division, so the oracle is exact
    * (no float-sum order dependence, unlike a true mean-logprob).
    *
    * Shape: one TF pass builds the corpus frequency table, the explode
    * joins it back on the token key (shuffle join — the frequency table is
    * corpus-sized, not broadcastable at 100 TB), and one count-aggregate
    * per document closes. Three shuffles total, all keyed and partial-agg.
    */
  def rareTokenRatio(df: DataFrame, idCol: String, textCol: String,
      minFreq: Long): DataFrame = {
    val ex = df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("__rt_tok"))
    val freq = ex.groupBy(col("__rt_tok")).agg(count(lit(1)).as("__rt_f"))
    ex.join(freq, Seq("__rt_tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("__rt_f") < minFreq, 1L).otherwise(0L)).as("n_rare"))
      .select(col(idCol), col("n_tok"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tok")).as("rare_ratio"))
  }

  /** PMI collocations (phrase mining): the top bigrams by pointwise mutual
    * information, `ln(p(ab) / (p(a)·p(b)))` over corpus-wide counts — the
    * classic collocation-extraction step that feeds phrase-aware
    * tokenization and n-gram vocabularies. `minCount` filters the unstable
    * low-frequency tail (PMI's known bias); ties at the cut break on the
    * bigram string for a deterministic top-k.
    *
    * Everything derives from exact integer counts (two explode + hash-agg
    * passes, unigram totals broadcast back), so the doubles are
    * bit-reproducible on any cluster — same determinism contract as TF-IDF
    * (q106). PMI is rounded to 6 dp for cross-engine comparability.
    */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int,
      topK: Int): DataFrame = {
    val toks = col("__pm_toks")
    val base = df.select(tokens(lower(col(textCol))).as("__pm_toks"))
      .filter(size(toks) > 0)
    val uni = base.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("nw"))
    val totalU = uni.agg(sum(col("nw")).as("t")).select(col("t"))
    val biAll = base
      .filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nab"))
    // p(ab) is relative to ALL bigram occurrences; the minCount filter only
    // prunes which bigrams are REPORTED, not the probability space
    val totalB = biAll.agg(sum(col("nab")).as("tb")).select(col("tb"))
    val bi = biAll.filter(col("nab") >= minCount)
    // Unigram counts have VOCABULARY cardinality (grows with the corpus), so
    // no broadcast hint: plain equi-joins on the token, and AQE upgrades them
    // to broadcast only when the frame actually fits. The two 1-row totals
    // stay broadcast crossJoins.
    val scored = bi
      .join(uni.withColumnsRenamed(Map("w" -> "w1", "nw" -> "na")), Seq("w1"))
      .join(uni.withColumnsRenamed(Map("w" -> "w2", "nw" -> "nb")), Seq("w2"))
      .crossJoin(broadcast(totalU)).crossJoin(broadcast(totalB))
      .withColumn("pmi", round(
        log((col("nab").cast("double") / col("tb")) /
          ((col("na").cast("double") / col("t")) *
            (col("nb").cast("double") / col("t")))), 6))
    // Bounded global top-k: TakeOrderedAndProject (per-partition heap of k,
    // driver merge of k rows) — never the single-partition Window sort, which
    // would funnel every scored bigram through one task at corpus scale.
    scored.orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("nab"), col("pmi"))
  }

  /** Bigram language-model document scoring — the KenLM/CCNet-style
    * fluency signal as a self-scored corpus LM: each document's average
    * `ln p(w2|w1)` under the corpus's own bigram counts
    * (`p(w2|w1) = n(w1 w2) / n(w1)`). Low scores mark token soup and
    * boilerplate; the deterministic complement to [[rareTokenRatio]].
    *
    * Determinism contract: every per-bigram log term is rounded to 6 dp
    * and summed in DECIMAL(18,6) — accumulation-order-independent, so the
    * per-doc average is bit-identical on any cluster and in the DuckDB
    * oracle (the same dsum trick as the decimal-exact sums). The count
    * joins are vocabulary-sized — plain equi-joins, NO broadcast hints
    * (AQE decides). Docs with no bigram are absent by construction.
    */
  def bigramLmScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = col("__lm_toks")
    val base = df.select(col(idCol), tokens(lower(col(textCol))).as("__lm_toks"))
      .filter(size(toks) >= 2)
    val docBi = base.select(col(idCol),
      explode(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
        .as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = base.select(explode(toks).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("na"))
    val bi = docBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nab"))
    docBi
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .withColumn("__term", round(log(col("nab").cast("double") / col("na")), 6)
        .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__term")).as("__lp"))
      // final 6-dp rounding as floor(x·10⁶ + 0.5)/10⁶, NOT round(x, 6):
      // the quotient of a decimal-exact sum can land exactly on a 5·10⁻⁷
      // boundary, where engines' round() disagree on the tie (observed at
      // sf0.1, doc 3093); floor over identical IEEE doubles is the same
      // bit pattern everywhere
      .select(col(idCol), col("n_bigrams"),
        (floor(col("__lp").cast("double") / col("n_bigrams") * lit(1e6) + lit(0.5))
          / lit(1e6)).as("avg_logprob"))
  }

  /** Corpus-curation keep-list — the standard pre-training quality gate:
    * language allowlist + quality-score floor + token-count window, with
    * the FIRST failing check recorded as `reject_reason` (null when kept).
    * This is the audit artifact a curation run ships: every document gets
    * a row, kept or not, so drop rates per reason are one groupBy away.
    * Pure projection over the scan (language ID and the quality features
    * are codegen'd expressions — no joins, no shuffles, no UDFs).
    */
  def curationGate(df: DataFrame, idCol: String, textCol: String,
      langs: Seq[String], minQuality: Double,
      minTokens: Int, maxTokens: Int): DataFrame = {
    require(minTokens <= maxTokens, "need minTokens <= maxTokens")
    val feats = qualityFeatures(df, textCol)
      .withColumn("lang_pred", langId(col(textCol)))
    feats.select(
        col(idCol), col("lang_pred"), col("n_tokens"), col("quality_score"),
        when(col("n_tokens") < minTokens, lit("too_short"))
          .when(col("n_tokens") > maxTokens, lit("too_long"))
          .when(!col("lang_pred").isin(langs.map(lit(_)): _*), lit("lang"))
          .when(col("quality_score") < minQuality, lit("low_quality"))
          .otherwise(lit(null).cast("string")).as("reject_reason"))
      .withColumn("keep", col("reject_reason").isNull)
  }

  /** Benchmark-contamination scores: for each document, the fraction of
    * its DISTINCT word-n-gram shingles that appear anywhere in `bench` —
    * the standard decontamination gate before a corpus becomes training
    * data (docs overlapping an eval benchmark get dropped or flagged).
    * Distinct from pairwise dedup: this is cross-corpus containment, not
    * intra-corpus pair discovery, and it needs no pair enumeration at all.
    *
    * Scale shape: both sides reduce to 8-byte shingle hashes inside their
    * scan tasks ([[graft.functions.GraftFunctions.wordShingleHashes]] —
    * text never shuffles), the benchmark side is deduplicated, and ONE
    * left join on the hash key + a count aggregate per document produce
    * the scores. Benchmarks are typically tiny next to the corpus, so the
    * join side broadcasts; a giant benchmark degrades gracefully to a
    * shuffle join on 8-byte keys. Documents with fewer than n tokens have
    * no shingles and are omitted (0/0 has no meaningful score).
    *
    * The fraction is a ratio of small ints — bit-exact cross-engine.
    */
  def contaminationScores(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    def shingles(c: String) = graft.functions.GraftFunctions.wordShingleHashes(col(c), n)
    val d = docs.select(col(idCol), explode(shingles(textCol)).as("s"))
    val b = bench.select(explode(shingles(benchTextCol)).as("s"))
      .distinct().withColumn("hit", lit(1))
    d.join(b, Seq("s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_matched"))
      .select(col(idCol),
        col("n_shingles"), col("n_matched"),
        (col("n_matched").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"))
  }

  /** PII redaction patterns, in application order. Deliberately RE2-safe
    * (no lookaround, no backreferences) so the exact same pattern strings
    * run on any regex engine — Spark/Java here, RE2 in an oracle engine —
    * with identical results; leftmost-greedy matching is common to both.
    */
  val redactions: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9][0-9 ()-]{6,}[0-9]" -> "<PHONE>",
    "[0-9]{4,}" -> "<NUM>")

  /** Scrub emails, phone-shaped runs, then residual long digit runs from a
    * text column — the standard pre-training PII pass. Pure codegen'd
    * projection (regexp_replace is whole-stage-codegen'd): rides the scan,
    * no shuffle, no UDF.
    */
  def redact(text: Column): Column =
    redactions.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** OpenRefine-style key-collision fingerprint: lowercase, split on
    * whitespace, dedupe, sort, rejoin, md5. Two documents with the same
    * bag of words collide — a cheap exact-normalized-dup key that needs
    * only a groupBy (one shuffle) at any scale.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " ").cast("binary"))

  /** Winnowing document fingerprints (the MOSS selection algorithm):
    * hash every k-token gram, slide a window of `w` consecutive gram
    * hashes, keep each window's minimum, dedupe. Guarantee: two documents
    * sharing a token run of at least w+k-1 tokens share at least one
    * fingerprint — substring-level dedup with output density ~2/(w+1),
    * versus whole-set signatures (minhash/simhash) that only see documents
    * as bags.
    *
    * Fewer than w grams degenerate to one fingerprint (the global min);
    * fewer than k tokens yield none. Gram hashes are md5 strings so the
    * selection is engine-neutral (DuckDB-oracle-testable); at 100 TB the
    * same selection runs over [[graft.functions.GraftFunctions
    * .wordShingleHashes]]' chained XXH64 longs for an 8-byte hash — the
    * windowing logic is identical and everything stays codegen'd
    * (transform/slice/array_min — no explode, no shuffle).
    *
    * STAGED as three projections, not one nested Column: a single
    * expression tree would inline the gram array into every one of its
    * ~|tokens| window references (Catalyst lambda bodies don't share
    * subexpressions), turning O(tokens) md5s per document into O(tokens²)
    * — measured as a 150× slowdown at sf0.1. With per-stage columns every
    * stage evaluates once per row (CollapseProject keeps non-cheap
    * multi-referenced aliases staged).
    */
  def winnowingFingerprints(df: DataFrame, textCol: String, k: Int, w: Int,
      outCol: String): DataFrame = {
    require(!df.columns.contains("__wf_toks") && !df.columns.contains("__wf_grams"),
      "input already carries a __wf_toks/__wf_grams column — it would be clobbered")
    val none = array().cast("array<string>")
    val toks = col("__wf_toks"); val grams = col("__wf_grams")
    df.withColumn("__wf_toks", tokens(lower(col(textCol))))
      .withColumn("__wf_grams",
        when(size(toks) < k, none)
          .otherwise(transform(
            sequence(lit(1), size(toks) - lit(k - 1)),
            i => md5(array_join(slice(toks, i, lit(k)), " ").cast("binary")))))
      .withColumn(outCol,
        when(size(grams) === 0, none)
          .when(size(grams) < w, array(array_min(grams)))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size(grams) - lit(w - 1)),
            j => array_min(slice(grams, j, lit(w)))))))
      .drop("__wf_toks", "__wf_grams")
  }

  /** Overlapping token-window chunks — the context-window preprocessing
    * step of an LLM training pipeline: each document becomes chunks of
    * `chunkSize` tokens starting every `stride` tokens
    * (overlap = chunkSize−stride).
    * Output: (idCol, chunk_id, n_tok, chunk_text); empty/blank documents
    * produce no chunks.
    *
    * One generate per document (starts are a cheap int sequence over a
    * STAGED token count — the generator never inlines the tokenizer, see
    * the winnowing note above), then a slice+join projection. Everything
    * rides the scan; output size is input size × (1 + overlap ratio).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "need 1 <= stride <= chunkSize (stride > chunkSize would drop tokens)")
    df.select(col(idCol), tokens(col(textCol)).as("__ck_toks"))
      .withColumn("__ck_n", size(col("__ck_toks")))
      .filter(col("__ck_n") > 0)
      .withColumn("start",
        explode(sequence(lit(0), col("__ck_n") - 1, lit(stride))))
      .select(
        col(idCol),
        (col("start") / stride).cast("int").as("chunk_id"),
        least(lit(chunkSize), col("__ck_n") - col("start")).as("n_tok"),
        array_join(slice(col("__ck_toks"), col("start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Chunk-level exact dedup with DOCUMENT REWRITE (the paragraph-dedup
    * pass of web-corpus pipelines — Dolma/RefinedWeb drop duplicated
    * paragraphs from documents rather than dropping whole documents; this
    * corpus has no newlines, so the unit is a fixed `chunkSize`-token
    * window, the non-overlapping case of [[chunkTokens]]). A chunk
    * occurrence SURVIVES iff it is the corpus-wide first occurrence of
    * that exact chunk text, ordered by (doc id, chunk index) — repeats
    * within one document dedup too. Each document is then reassembled
    * from its surviving chunks in order (possibly to the empty string).
    *
    * Shape at scale: chunking rides the scan (one sequence-generate +
    * slice per document, no shuffle); first-occurrence is ONE hash
    * shuffle keyed on the chunk text — the same byte volume any exact
    * dedup pays ([[graft.ext.Dedup.dedupExact]]) — with a min-struct
    * aggregate, NOT a row_number window (min is partial-aggregable, so
    * map-side combine collapses each partition's occurrences of a hot
    * chunk to one row before the exchange; a window would ship every
    * occurrence of the hottest chunk into one partition — the boilerplate
    * chunks this pass exists to remove are exactly the skewed keys that
    * would make that window fall over at corpus scale). Reassembly is a
    * groupBy on the doc id with a sort of each doc's own ≤ n_chunks
    * surviving entries. Output: (id, text_dedup, n_kept, n_chunks) for
    * every input document, including rewritten-to-empty ones.
    */
  def chunkDedupRewrite(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    dedupRewriteFromChunks(df, idCol,
      chunkTokens(df, idCol, textCol, chunkSize, chunkSize)
        .select(col(idCol), col("chunk_id"), col("chunk_text")))
  }

  /** Shared dedup+reassembly tail of [[chunkDedupRewrite]] (fixed
    * windows) and [[cdcChunkDedupRewrite]] (content-defined): corpus-wide
    * first occurrence per exact chunk text — a min-struct HASH AGGREGATE
    * whose output IS the surviving occurrence set (one row per distinct
    * chunk, carrying where it first appeared; min is partial-aggregable,
    * so the hottest boilerplate chunk collapses map-side instead of
    * shipping every occurrence into one rank partition) — then per-doc
    * reassembly in chunk order.
    */
  private def dedupRewriteFromChunks(df: DataFrame, idCol: String,
      chunks: DataFrame): DataFrame = {
    val kept = chunks
      .groupBy(col("chunk_text"))
      .agg(min(struct(col(idCol), col("chunk_id"))).as("__first"))
      .select(col("chunk_text"), col("__first").getField(idCol).as(idCol),
        col("__first.chunk_id").as("chunk_id"))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("text_dedup"),
        count(lit(1)).cast("int").as("n_kept"))
    val totals = chunks.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_chunks"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("n_chunks"), lit(0)).as("n_chunks"))
  }

  /** Content-defined chunking: chunk boundaries are TOKENS whose
    * engine-neutral hash satisfies a fixed predicate (first hex digit of
    * md5 < `boundaryHexDigits` of 16 — the q77 md5 decision rule, so the
    * oracle recomputes boundaries bit-exactly), a boundary token ends its
    * chunk, and the tail past the last boundary is the final chunk.
    * Expected chunk length = 16/boundaryHexDigits tokens.
    *
    * This is the rsync/CDC trick applied to token streams, and it fixes
    * the structural miss of fixed windows ([[chunkDedupRewrite]]): insert
    * ONE token at the front of a duplicated document and every fixed
    * 10-token window shifts — zero chunks match — while content-defined
    * boundaries re-synchronize at the first boundary token after the
    * edit, so everything downstream still dedups. Chunking is computed
    * PER DOCUMENT with array functions (no explode, no window, rides the
    * scan); only the dedup aggregate shuffles.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      boundaryHexDigits: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // one codegen'd pass per row (tokenize + md5 + split in a primitive
    // loop — [[graft.functions.expressions.CdcChunksExpr]]); the first
    // Column-function draft paid per-element interpreted-lambda cost and
    // measured ~30x slower (7.4 s vs the fixed-window pass's 0.58 s at
    // sf0.1, 72 s at sf10)
    df.select(col(idCol),
        posexplode(graft.functions.GraftFunctions.cdcChunks(
          col(textCol), boundaryHexDigits)))
      .select(col(idCol), col("pos").cast("int").as("chunk_id"),
        col("col").as("chunk_text"))
  }

  /** [[chunkDedupRewrite]] on content-defined chunks — same output
    * contract, shift-robust dedup (q241's exact oracle recomputes the
    * boundaries and the rewrite in SQL).
    */
  def cdcChunkDedupRewrite(df: DataFrame, idCol: String, textCol: String,
      boundaryHexDigits: Int = 2): DataFrame =
    dedupRewriteFromChunks(df, idCol,
      cdcChunks(df, idCol, textCol, boundaryHexDigits))

  /** Persisted chunk-hash index: [[chunkDedupRewrite]] at crawl cadence.
    * The batch form must re-shuffle the WHOLE corpus's chunk text to find
    * first occurrences; a crawl pipeline instead keeps every chunk hash it
    * has ever admitted in an append-only table and pays O(|batch|) per
    * batch — new docs drop chunks already seen corpus-wide (and earlier in
    * the same batch), exactly the Dolma/CCNet "seen-paragraph" pass.
    *
    * `chunks/` stores ONE 8-byte xxhash64 per admitted chunk — not the
    * text. Collisions silently drop a novel chunk; at 2⁶⁴ the birthday
    * bound keeps P(any collision) under ~0.3% at 10 B distinct chunks,
    * the same accepted tradeoff as Bloom-filter paragraph dedup in
    * production crawls (which tolerates MORE, a tunable false-positive
    * rate, for even less space). The differential witness (q239/q240)
    * runs at corpora far below the bound, so incremental ≡ batch-rewrite
    * is still checked EXACTLY.
    *
    * Replay-tolerance: a replayed ingest re-appends hashes the table
    * already holds — harmless, the probe is an existence anti-join
    * (duplicates change nothing); [[chunkIndexCompact]] folds them away.
    * Ordering contract: arrival order IS first-occurrence order, so the
    * incremental rewrite of a batch equals [[chunkDedupRewrite]] over
    * (everything ingested so far ∪ batch) restricted to the batch's ids
    * iff ids arrive in nondecreasing ranges (the q118/q129 convention).
    */
  def buildChunkIndex(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, indexDir: String): Unit =
    chunkIndexBuildFrom(
      chunkTokens(df, idCol, textCol, chunkSize, chunkSize), indexDir)

  /** [[buildChunkIndex]] on content-defined chunks ([[cdcChunks]]) —
    * the shift-robust index variant; all probe/admit/compact machinery
    * is chunking-agnostic.
    */
  def buildCdcChunkIndex(df: DataFrame, idCol: String, textCol: String,
      indexDir: String, boundaryHexDigits: Int = 2): Unit =
    chunkIndexBuildFrom(
      cdcChunks(df, idCol, textCol, boundaryHexDigits), indexDir)

  /** Build commits by directory rename: a direct overwrite of `chunks/`
    * is a multi-file write, and the streaming sinks gate bootstrap on
    * `chunks/` EXISTENCE — a crash mid-build would leave a partial hash
    * set that flips the replay into the bootstrapped branch and
    * partial-rewrites the batch (the same window [[chunkIndexAdmit]]
    * closes on the append side). Writing to a temp dir and renaming
    * makes `chunks/` exist fully-built or not at all.
    */
  private def chunkIndexBuildFrom(chunks: DataFrame, indexDir: String): Unit = {
    val spark = chunks.sparkSession
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/chunks_building")
    val dest = new org.apache.hadoop.fs.Path(s"$indexDir/chunks")
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    chunks
      .select(xxhash64(col("chunk_text")).as("chash"))
      .distinct()
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest)) fs.delete(dest, true): Unit // overwrite semantics
    require(fs.rename(tmp, dest),
      s"chunkIndexBuild: atomic commit rename failed: $tmp -> $dest")
  }

  /** The pure half of the ingest: the batch's SURVIVING chunk
    * occurrences — within-batch first occurrence (the same min-struct
    * shape as the batch form) that is also novel corpus-wide (anti-join
    * on the index's hash column). No writes: callers that need
    * crash-safety persist their rewritten output FIRST and then
    * [[chunkIndexAdmit]] the survivors — admitting before the output is
    * durable would make a replayed batch rewrite itself to empty and
    * lose the store content (the half-written-index failure class of the
    * round-11 streaming-sink advisory).
    */
  def chunkIndexProbe(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame =
    chunkIndexProbeFrom(spark, indexDir,
      chunkTokens(batch, idCol, textCol, chunkSize, chunkSize), idCol)

  def cdcChunkIndexProbe(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String, textCol: String,
      boundaryHexDigits: Int = 2): DataFrame =
    chunkIndexProbeFrom(spark, indexDir,
      cdcChunks(batch, idCol, textCol, boundaryHexDigits), idCol)

  private def chunkIndexProbeFrom(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, chunkFrame: DataFrame, idCol: String): DataFrame = {
    val chunks = chunkFrame
      .select(col(idCol), col("chunk_id"), col("chunk_text"),
        xxhash64(col("chunk_text")).as("chash"))
    val firstInBatch = chunks
      .groupBy(col("chash"))
      .agg(min(struct(col(idCol), col("chunk_id"))).as("__first"),
        // same-hash texts are identical short of a 64-bit collision; min
        // keeps the pick deterministic even then
        min(col("chunk_text")).as("chunk_text"))
      .select(col("chash"), col("chunk_text"),
        col("__first").getField(idCol).as(idCol),
        col("__first.chunk_id").as("chunk_id"))
    // recursiveFileLookup: admitted hashes live in atomic per-admit
    // subdirs (chunks/admit_<token>) alongside the bootstrap's flat
    // files — see chunkIndexAdmit's commit protocol.
    firstInBatch.join(
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$indexDir/chunks"),
      Seq("chash"), "left_anti")
  }

  /** Reassemble the rewritten batch from its surviving occurrences —
    * the q233 output contract, (id, text_dedup, n_kept, n_chunks) for
    * every batch doc.
    */
  def chunkIndexRewrite(batch: DataFrame, surviving: DataFrame,
      idCol: String, textCol: String, chunkSize: Int): DataFrame =
    chunkIndexRewriteFrom(batch, idCol, surviving,
      chunkTokens(batch, idCol, textCol, chunkSize, chunkSize))

  def cdcChunkIndexRewrite(batch: DataFrame, surviving: DataFrame,
      idCol: String, textCol: String, boundaryHexDigits: Int = 2): DataFrame =
    chunkIndexRewriteFrom(batch, idCol, surviving,
      cdcChunks(batch, idCol, textCol, boundaryHexDigits))

  private def chunkIndexRewriteFrom(batch: DataFrame, idCol: String,
      surviving: DataFrame, chunkFrame: DataFrame): DataFrame = {
    val kept = surviving
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("text_dedup"),
        count(lit(1)).cast("int").as("n_kept"))
    val totals = chunkFrame.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_chunks"))
    batch.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("n_chunks"), lit(0)).as("n_chunks"))
  }

  /** Admit survivors: append their hashes ATOMICALLY. Call AFTER the
    * rewritten output is durable (see [[chunkIndexProbe]]).
    *
    * Atomicity: a plain `mode("append")` parquet write is a multi-file
    * commit — a crash mid-admit leaves SOME of the batch's hashes
    * visible, so a replayed batch probes against a partially-admitted
    * set and dynamic-overwrites its previously-complete store partition
    * with a non-empty partial rewrite (the pre-crash-admitted chunks
    * vanish from the store forever). Instead the hashes are written to
    * a sibling temp dir and committed with ONE directory rename into
    * `chunks/admit_<token>` — a replayed batch sees either all of its
    * admitted hashes or none. With a deterministic `admitToken` (the
    * streaming sinks pass `batch<id>`) a replayed admit whose commit
    * already landed is skipped, so the admit itself is idempotent too;
    * the default random token suits one-shot batch jobs. Readers list
    * `chunks/` recursively; [[chunkIndexCompact]] folds the admit dirs
    * (and sweeps any orphaned temp dirs) back into one flat file set.
    */
  def chunkIndexAdmit(surviving: DataFrame, indexDir: String,
      admitToken: String = java.util.UUID.randomUUID().toString): Unit =
    CompactionLease.guardedAppend(surviving.sparkSession, indexDir) {
      chunkIndexAdmitUnguarded(surviving, indexDir, admitToken)
    }

  private def chunkIndexAdmitUnguarded(surviving: DataFrame, indexDir: String,
      admitToken: String): Unit = {
    val spark = surviving.sparkSession
    val chunksDir = new org.apache.hadoop.fs.Path(s"$indexDir/chunks")
    val fs = chunksDir.getFileSystem(spark.sessionState.newHadoopConf())
    val dest = new org.apache.hadoop.fs.Path(chunksDir, s"admit_$admitToken")
    if (fs.exists(dest)) return // this admit already committed (replay)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$indexDir/chunks_admit_tmp_$admitToken")
    if (fs.exists(tmp)) fs.delete(tmp, true): Unit // crashed partial write
    surviving.select(col("chash"))
      .write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(chunksDir): Unit
    require(fs.rename(tmp, dest),
      s"chunkIndexAdmit: atomic commit rename failed: $tmp -> $dest")
  }

  /** Batch convenience: probe → rewrite → admit in one call. The caller
    * gets the rewritten frame AFTER the hashes are admitted, so this
    * form is for batch jobs whose output is the returned frame itself;
    * streaming sinks sequence the three steps around their store write
    * ([[graft.streaming.Streams.indexedChunkDedupIngestSink]]).
    */
  def chunkIndexIngest(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    val surviving = chunkIndexProbe(spark, indexDir, batch, idCol, textCol,
      chunkSize).localCheckpoint() // the admit append below must not
                                   // observe its own output mid-plan
    chunkIndexAdmit(surviving, indexDir)
    chunkIndexRewrite(batch, surviving, idCol, textCol, chunkSize)
  }

  /** [[chunkIndexIngest]] on content-defined chunks — q242's incremental
    * form; the same EXACT equivalence holds (incremental ≡
    * [[cdcChunkDedupRewrite]] restricted to the batch ids under
    * range-ordered arrival) because the dedup tail never depends on how
    * chunks were cut.
    */
  def cdcChunkIndexIngest(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, batch: DataFrame, idCol: String, textCol: String,
      boundaryHexDigits: Int = 2): DataFrame = {
    val surviving = cdcChunkIndexProbe(spark, indexDir, batch, idCol,
      textCol, boundaryHexDigits).localCheckpoint()
    chunkIndexAdmit(surviving, indexDir)
    cdcChunkIndexRewrite(batch, surviving, idCol, textCol, boundaryHexDigits)
  }

  /** Fold replayed appends and small files into one deduplicated file
    * set (crash-safe backup-rename swap; the [[graft.ext.Dedup]] index
    * compaction contract).
    */
  def chunkIndexCompact(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit =
    CompactionLease.withLease(spark, indexDir) {
      val tmp = s"$indexDir/chunks_compacting"
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$indexDir/chunks")
        .distinct()
        .write.mode("overwrite").parquet(tmp)
      Dedup.swapIn(spark, tmp, s"$indexDir/chunks")
      // Sweep temp dirs orphaned by admits that crashed before their
      // commit rename — never visible to readers, reclaimed here.
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$indexDir/chunks_admit_tmp_*"))
        .foreach(st => fs.delete(st.getPath, true): Unit)
    }

  /** Deterministic sequence packing: assign documents to fixed-token-budget
    * bins, per `domainCol` partition, in `orderCol` order — bin b holds the
    * documents whose preceding cumulative token count falls in
    * [b·budget, (b+1)·budget). This is next-fit packing relaxed to a
    * running sum, which is what scales: each domain partition packs
    * independently with ONE window pass and no sequential driver loop (a
    * true first-fit packer is inherently serial — at 100 TB the per-domain
    * running-sum form is the only shape that parallelizes).
    * A document straddling a boundary goes to the bin its first token
    * lands in (bins can exceed budget by < one document — the standard
    * streaming-packing tradeoff; oversized docs should be pre-split with
    * [[chunkTokens]]).
    */
  def sequencePack(df: DataFrame, idCol: String, textCol: String,
      domainCol: String, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol), col(domainCol), tokenCount(col(textCol)).as("n_tok"))
      .withColumn("__sp_cum", sum(col("n_tok")).over(w))
      .select(col(idCol), col(domainCol), col("n_tok"),
        ((col("__sp_cum") - col("n_tok")) / lit(budget.toLong))
          .cast("long").as("bin"))
  }

  /** Character L-grams of a text column as an array, empty when the text is
    * shorter than L. The short-text guard matters: `sequence(1, n)` with
    * n < 1 would generate a DESCENDING sequence (Spark fills in step −1),
    * not an empty one.
    */
  private def charGrams(text: Column, gramLen: Int): Column =
    when(length(text) < gramLen, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - lit(gramLen - 1)),
        i => text.substr(i, lit(gramLen))))

  /** Per-document duplicated-text fraction at character-L-gram granularity —
    * the ExactSubstr diagnostic of substring-level corpus duplication
    * (token-set dedup is blind to a copied paragraph inside an otherwise
    * novel document): a POSITION of a document is duplicated iff its L-char
    * substring occurs at least twice corpus-wide — in another document or
    * at another position of the same one. Output: (idCol, n_grams, n_dup,
    * dup_fraction); a document shorter than L carries zero grams and
    * fraction 0.0.
    *
    * Shape at scale: the gram explode is |corpus chars| rows — the honest
    * price of EXACT substring accounting — and everything after is linear
    * hash-agg work. Per-(gram, doc) counts collapse within-document repeats
    * before anything global; corpus totals per gram aggregate those; the
    * verdict comes back by an equi-join on the gram key (a streaming
    * shuffle join — NOT a per-gram window, whose unbounded frame would
    * buffer a stop-gram's whole document list in one task, the q154
    * per-group-buffering cliff in another costume).
    * Nothing wider than (gram, id, count) moves between stages. When even
    * |chars| rows are too many, the sampled scale path is
    * [[winnowingFingerprints]] (density ~2/(w+1) of positions, with the
    * shared-run guarantee).
    */
  def duplicatedTextFraction(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    // fanOut: the gram explode + per-(gram, doc) partial aggregation is the
    // expensive stage and must not inherit a small-file scan's split count
    // (the sf0.1 documents table is ONE split — measured 5.6 avg cores of
    // 32 on q168 before this); a no-op on inputs that already scan wide.
    val grams = Multimodal.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(charGrams(col(textCol), gramLen)).as("g"))
    // localCheckpoint: `perDoc` feeds BOTH the corpus totals and the
    // verdict join — without it Spark plans two independent subtrees and
    // the corpus explode + collapse runs TWICE (two Generate operators in
    // the round-13 plan). The checkpoint pins the COLLAPSED frame (≤ one
    // row per distinct (gram, doc) — far smaller than the raw gram
    // stream), which is the cheaper side of the recompute-vs-materialize
    // trade at any scale.
    val perDoc = grams.groupBy(col("g"), col(idCol)).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val totals = perDoc.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val scored = perDoc.join(totals, Seq("g"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("n") >= 2, col("c")).otherwise(lit(0L))).as("n_dup"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_grams").cast("double"))
          .as("dup_fraction"))
  }

  /** The char-COVERAGE member of the ExactSubstr family: per document, the
    * number of characters covered by at least one duplicated L-gram (the
    * union of the intervals `[i, i+L)` over duplicated positions `i`) and
    * its fraction of the document — exactly the text an ExactSubstr
    * dedup pass would cut, where [[duplicatedTextFraction]] counts
    * positions and double-counts overlap. Output: (idCol, n_chars,
    * covered_chars, coverage); documents with no duplicated grams (or
    * shorter than L, or null) carry 0 and 0.0.
    *
    * Same global stages as [[duplicatedTextFraction]] (per-(gram, doc)
    * collapse, corpus totals, verdict equi-join). The interval union is
    * then PER-DOCUMENT work: duplicated positions collect into one array
    * per document — bounded by document length, not by any corpus
    * dimension (pre-chunk pathological documents with [[chunkTokens]]) —
    * and a single codegen'd sorted fold merges overlapping intervals:
    * `covered += max(0, i+L − max(i, prevEnd))`.
    */
  def duplicatedCharCoverage(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int): DataFrame = {
    require(gramLen >= 2, s"gramLen must be >= 2, got $gramLen")
    // same fanOut + collapsed-checkpoint reasoning as
    // [[duplicatedTextFraction]]: the explode must not inherit a 1-split
    // scan, and `perDoc` feeds the dup-gram filter without re-running the
    // corpus explode (the coverage side below re-explodes by necessity —
    // it needs the positions the collapse dropped)
    val grams = Multimodal.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(charGrams(col(textCol), gramLen)).as(Seq("p", "g")))
      .select(col(idCol), (col("p") + 1).as("i"), col("g"))
    val perDoc = grams.groupBy(col("g"), col(idCol)).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val dupGrams = perDoc.groupBy(col("g")).agg(sum(col("c")).as("n"))
      .filter(col("n") >= 2).select(col("g"))
    val L = lit(gramLen.toLong)
    val covered = grams.join(dupGrams, Seq("g"), "left_semi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("i").cast("long"))).as("ps"))
      .select(col(idCol), aggregate(
        col("ps"),
        struct(lit(0L).as("cov"), lit(Long.MinValue / 2).as("end")),
        (acc, p) => struct(
          (acc("cov") + greatest(lit(0L), p + L - greatest(p, acc("end")))).as("cov"),
          greatest(acc("end"), p + L).as("end")),
        acc => acc("cov")).as("covered_chars"))
    df.select(col(idCol), coalesce(length(col(textCol)).cast("long"), lit(0L)).as("n_chars"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_chars"),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"),
        when(col("n_chars") === 0, lit(0.0))
          .otherwise(coalesce(col("covered_chars"), lit(0L)).cast("double") /
            col("n_chars").cast("double"))
          .as("coverage"))
  }

  /** The corpus-side companion of [[duplicatedTextFraction]]: the most
    * repeated L-char substrings, with corpus occurrence count and the
    * number of distinct documents carrying each — the report that names
    * the boilerplate (headers, license blurbs, navigation chrome) that
    * substring-level dedup would remove. Deterministic order: count desc,
    * then the gram itself; bounded output (`topK`), TakeOrderedAndProject
    * tail — the full gram frame never reaches the driver.
    */
  def topDuplicatedGrams(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int, topK: Int): DataFrame = {
    require(gramLen >= 2 && topK >= 1, "need gramLen >= 2 and topK >= 1")
    Multimodal.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(charGrams(col(textCol), gramLen)).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n") >= 2)
      .orderBy(col("n").desc, col("g"))
      .limit(topK)
  }

  /** One greedy left-to-right BPE merge pass over a symbol array: every
    * adjacent `(a, b)` becomes the fused symbol, scanning left to right so
    * a symbol consumed by one merge is not reused by the next (classic BPE
    * apply: "aaa" under (a,a) → [aa, a], not [aa, aa]). A single codegen'd
    * fold — no UDF; `try_element_at` keeps the empty-accumulator probe
    * NULL-safe under ANSI mode.
    */
  private def applyBpeMerge(syms: Column, a: String, b: String): Column =
    when(size(syms) < 2, syms).otherwise(
      aggregate(syms, array().cast("array<string>"),
        (acc, x) => when(
          try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x)))))

  /** The shared BPE training loop: word-frequency quotient, then
    * `numMerges` rounds of (pair-count aggregate → 1-row argmax → merge
    * apply). Returns the merge history and the final per-word
    * segmentation.
    *
    * Shape at scale — the reason industrial BPE trainers are feasible on
    * TB corpora: the corpus is read ONCE, collapsing to the DISTINCT-WORD
    * frequency table (the vocabulary quotient — millions of rows where the
    * corpus has trillions of tokens), and every training round afterwards
    * touches only that quotient: one hash aggregate over exploded adjacent
    * symbol pairs (weighted by word frequency, so instance-level counts
    * are exact), one bounded `orderBy.limit(1)` argmax (TakeOrdered — a
    * 1-row, require-free driver collect of model parameters, never data),
    * and one codegen'd fold to fuse the chosen pair. `localCheckpoint`
    * after every round truncates both the lineage and the otherwise
    * linearly-stacking fold expressions, so round cost is flat in the
    * round number. Determinism: argmax tie-break is (count desc, left asc,
    * right asc) on binary string order — identical on any cluster and in
    * the DuckDB oracle's collation for the ASCII corpus.
    */
  /** BPE training loop. `batchK = 1` (default) is EXACT sequential greedy
    * — one Spark round per merge, fine at the catalog's numMerges=30 but
    * hopeless at a real 32 k vocabulary. `batchK > 1` is the standard
    * batched induction (SentencePiece's trick): per round, count
    * adjacencies ONCE and accept up to batchK pairs in argmax order whose
    * SYMBOL SETS are mutually disjoint — including each accepted pair's
    * merged symbol, so no accepted merge can create or destroy another's
    * adjacencies. Disjoint merges commute and their round-start counts
    * are invariant under each other's application, so every accepted
    * pair's recorded pair_count is the count sequential greedy would
    * have seen at ITS OWN step ONLY IF no earlier accepted merge's
    * output symbol would have out-ranked it — batching is therefore the
    * documented approximation to the greedy merge ORDER (ranks follow
    * round-local count order), with identical per-round count
    * semantics and the same conservation identity (q185/q246 telescope
    * over applied_count regardless of order). Driver rounds:
    * ceil(numMerges / batchK) — bounded, the scale path for large
    * vocabularies.
    */
  /** UTF-8 unsigned byte comparison — exactly UTF8String's binary order,
    * the collation every distributed `orderBy` on StringType sorts in. The
    * driver BPE loop must tie-break argmax candidates in the SAME order or
    * the two routes could learn different (equal-count) merges.
    */
  private def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** One greedy left-to-right merge pass — the driver-side replica of
    * [[applyBpeMerge]]'s fold: an element joining the accumulator fuses
    * with the PREVIOUS accumulated symbol when (prev, x) == (a, b), so a
    * symbol consumed by one merge is never reused ("aaa" under (a,a) →
    * [aa, a]). Returns the input array unchanged (same reference) when no
    * merge applies, so the caller's delta bookkeeping can compare lengths.
    */
  private def applyMergeLocal(syms: Array[String], a: String, b: String)
      : Array[String] = {
    if (syms.length < 2) return syms
    val acc = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (acc.nonEmpty && acc(acc.length - 1) == a && x == b)
        acc(acc.length - 1) = a + b
      else acc += x
      i += 1
    }
    if (acc.length == syms.length) syms else acc.toArray
  }

  /** Driver-side BPE training loop — the small-vocabulary regime of
    * [[bpeTrain]], reached when the word quotient fits the bounded collect
    * cap. Replicates the distributed loop decision for decision: the same
    * frequency-weighted adjacency counts (exact Long sums), the same
    * (count desc, a, b) argmax in UTF-8 binary order, the same 4k+16
    * over-collect truncation before symbol-disjoint acceptance, the same
    * greedy merge application and freq·(len−len') applied-count deltas.
    * The final per-word segmentation returns as a local relation with the
    * distributed schema (w, freq, syms).
    */
  private def driverBpeTrain(vocab0: DataFrame, numMerges: Int, batchK: Int)
      : (Seq[(Int, String, String, String, Long, Long)], DataFrame) = {
    val spark = vocab0.sparkSession
    import spark.implicits._
    val rows = vocab0.select(col("w"), col("freq"), col("syms")).collect()
    val ws = rows.map(_.getString(0))
    val freqs = rows.map(_.getLong(1))
    val syms: Array[Array[String]] =
      rows.map(_.getSeq[String](2).toArray)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val k = math.min(batchK, numMerges - rank + 1)
      val counts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        if (s.length >= 2) {
          val f = freqs(i)
          var j = 0
          while (j < s.length - 1) {
            val key = (s(j), s(j + 1))
            counts.merge(key, f, (x, y) => x + y)
            j += 1
          }
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        import scala.jdk.CollectionConverters._
        val top = counts.entrySet().iterator().asScala
          .map(e => (e.getKey._1, e.getKey._2, e.getValue)).toArray
          .sortWith { case ((a1, b1, c1), (a2, b2, c2)) =>
            if (c1 != c2) c1 > c2
            else {
              val ca = utf8Compare(a1, a2)
              if (ca != 0) ca < 0 else utf8Compare(b1, b2) < 0
            }
          }
          .take(k * 4 + 16)
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        top.iterator.foreach { case (a, b, cnt) =>
          if (accepted.size < k && !used(a) && !used(b) && !used(a + b)) {
            used ++= Seq(a, b, a + b)
            accepted += ((a, b, cnt))
          }
        }
        val deltas = Array.fill(accepted.size)(0L)
        i = 0
        while (i < syms.length) {
          var cur = syms(i)
          val f = freqs(i)
          var s = 0
          while (s < accepted.length) {
            val (a, b, _) = accepted(s)
            val next = applyMergeLocal(cur, a, b)
            deltas(s) += f * (cur.length - next.length)
            cur = next
            s += 1
          }
          syms(i) = cur
          i += 1
        }
        accepted.zipWithIndex.foreach { case ((a, b, cnt), s) =>
          merges += ((rank + s, a, b, a + b, cnt, deltas(s)))
        }
        rank += accepted.size
      }
    }
    val finalVocab = ws.indices
      .map(j => (ws(j), freqs(j), syms(j).toSeq))
      .toDF("w", "freq", "syms")
    (merges.toSeq, finalVocab)
  }

  private def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      batchK: Int = 1)
      : (Seq[(Int, String, String, String, Long, Long)], DataFrame) = {
    require(numMerges >= 1 && numMerges <= 100000,
      s"numMerges must be in [1, 100000], got $numMerges")
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    // fanOut: the corpus-wide tokenize+explode is the one data-sized pass
    // of the whole trainer; a one-row-group scan serializes it (the gram
    // family's round-14 fix). The quotient aggregate is partitioning-
    // invariant, so the fan-out cannot change the vocabulary.
    var vocab = Multimodal.fanOut(df.select(col(textCol)))
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("syms"))
      .localCheckpoint()
    // REGIME DISPATCH (the connectedComponents/driverComponents pattern):
    // every training round below costs 3 driver-sequential Spark jobs
    // (pair-count collect, merge-apply checkpoint, deltas aggregate) on a
    // frame that is only VOCABULARY-sized — for catalog corpora a few
    // thousand slim rows, pure scheduling latency ~90 jobs deep at
    // numMerges=30. Under the bounded-collect cap the quotient is pulled
    // once and the identical greedy loop runs on the driver: adjacency
    // counts are exact integer sums, the argmax tie-break compares
    // UTF-8 bytes unsigned (UTF8String's binary order), the over-collect
    // truncation (4k+16), disjoint acceptance, merge application and the
    // applied-count deltas replicate the distributed forms step for step
    // — BpeDispatchSpec asserts route equality merge-row by merge-row.
    // Real-tokenizer trainers run exactly this shape (corpus pass →
    // in-memory word-count loop); vocabularies above the cap — the
    // open-vocabulary 100 TB regime — run the distributed loop unchanged.
    val spark = df.sparkSession
    val driverCap = spark.conf.getOption("spark.graft.bpe.driverVocabRows")
      .map(_.toLong).getOrElse(1000000L)
    // the collect materializes one 1-char String PER CHARACTER (the syms
    // array): ~64 heap bytes per char, so the cap must bound characters,
    // not just rows — a long-word corpus at the row cap alone could need
    // GBs. Defaults: 1 M rows AND 16 M chars ≈ 1 GB worst-case heap,
    // measured against real drivers, both conf-tunable. One aggregate
    // job answers both (same job count as the old row-only pre-flight).
    val charCap = spark.conf.getOption("spark.graft.bpe.driverVocabChars")
      .map(_.toLong).getOrElse(16000000L)
    val pre = vocab.agg(count(lit(1)).as("n"),
      coalesce(sum(length(col("w"))), lit(0L)).as("chars")).head()
    if (pre.getLong(0) <= driverCap && pre.getLong(1) <= charCap)
      return driverBpeTrain(vocab, numMerges, batchK)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val k = math.min(batchK, numMerges - rank + 1)
      // over-collect so conflict-rejected candidates don't starve the
      // round; the collect stays bounded (4k+16 slim rows)
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(k * 4 + 16).collect()
      if (top.isEmpty) exhausted = true
      else {
        // greedy symbol-disjoint acceptance in (cnt desc, a, b) order
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        top.iterator.foreach { r =>
          if (accepted.size < k) {
            val (a, b, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
            if (!used(a) && !used(b) && !used(a + b)) {
              used ++= Seq(a, b, a + b)
              accepted += ((a, b, cnt))
            }
          }
        }
        // apply ALL accepted merges in ONE pass: a chain of merge stages
        // in acceptance order (disjointness makes the order immaterial).
        // Only the per-stage symbol COUNTS and the final array are
        // materialized — k ints + one array per row, never k arrays.
        val chained = accepted.zipWithIndex.foldLeft(
          vocab.withColumn("__s0", col("syms"))) {
          case (d, ((a, b, _), i)) =>
            d.withColumn(s"__s${i + 1}",
              applyBpeMerge(col(s"__s$i"), a, b))
        }
        val stepped = chained.select(
          col("w") +: col("freq") +:
            col(s"__s${accepted.size}").as("next") +:
            (0 to accepted.size).map(i =>
              size(col(s"__s$i")).as(s"__z$i")): _*)
          .localCheckpoint()
        // greedy applied count can differ from the adjacency count `cnt`
        // on overlapping runs (aaa: 2 adjacencies, 1 application) — both
        // are recorded; applied_count is what the conservation identity
        // (q185) telescopes over
        val deltas = stepped.agg(
          sum(col("freq") * (col("__z0") - col("__z1"))).as("d0"),
          accepted.indices.drop(1).map(i =>
            sum(col("freq") * (col(s"__z$i") - col(s"__z${i + 1}")))
              .as(s"d$i")): _*)
          .head()
        accepted.zipWithIndex.foreach { case ((a, b, cnt), i) =>
          merges += ((rank + i, a, b, a + b, cnt, deltas.getLong(i)))
        }
        vocab = stepped.select(col("w"), col("freq"), col("next").as("syms"))
        rank += accepted.size
      }
    }
    (merges.toSeq, vocab)
  }

  /** The first training round's adjacency-pair counts, bounded to the top
    * `topK` (count desc, then pair ascending — the argmax tie-break order,
    * so row 1 IS the first learned merge): the independently
    * SQL-expressible slice of BPE training, oracle-checked against a
    * DuckDB recount from raw text (q183). Counted per word INSTANCE
    * (frequency-weighted quotient ≡ instance-level recount — the identity
    * the oracle exercises). Bounded TakeOrdered tail; the full pair frame
    * never reaches the driver.
    */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val syms = col("__syms")
    df.select(explode(tokens(lower(col(textCol)))).as("__w"))
      .select(split(col("__w"), "").as("__syms"))
      .filter(size(syms) >= 2)
      .select(explode(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("sym_a"), col("p.b").as("sym_b"))
      .agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("sym_a"), col("sym_b"))
      .limit(topK)
  }

  /** Distributed BPE (byte-pair-encoding) vocabulary induction — the
    * tokenizer-training stage of an LLM data pipeline, learned from the
    * corpus itself: `numMerges` greedy merges over whitespace-lowercased
    * words symbolized as characters (GPT-2-style without the byte mapping;
    * no end-of-word marker — merges cannot cross word boundaries because
    * the quotient is per-word by construction). Output: one row per merge
    * in training order — (rank, sym_a, sym_b, merged, pair_count,
    * applied_count) — pair_count the adjacency count that won the argmax,
    * applied_count the greedy non-overlapping applications.
    *
    * Scale shape in [[bpeTrain]]; the first round's pair-count table is
    * independently oracle-checked (q183), and the telescoping identity
    * Σ applied_count = initial symbols − final symbols is re-derived from
    * the final vocabulary state (q185).
    */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
      batchK: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeTrain(df, textCol, numMerges, batchK)._1
      .toDF("rank", "sym_a", "sym_b", "merged", "pair_count", "applied_count")
  }

  /** BPE token accounting per document under a vocabulary learned from
    * the same corpus: the real-tokenizer refinement of the
    * [[bpeishTokenCount]] heuristic. Output per document: whitespace word
    * count, BPE token count under `numMerges` learned merges, and the
    * total word characters — all integers, bit-exact cross-engine.
    *
    * Scale shape: the expensive iterative work happens once on the
    * vocabulary quotient ([[bpeTrain]]); the corpus then pays exactly one
    * explode + one vocabulary-sized equi-join (AQE broadcasts the mapping
    * when it fits) + one per-doc hash aggregate. Documents re-tokenize by
    * LOOKUP, never by running the merge loop per document — the shape that
    * holds when the corpus is 100 TB and the vocabulary is megabytes.
    * Docs with no tokens (empty/blank text) report zeros.
    */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame = {
    val (_, vocab) = bpeTrain(df, textCol, numMerges)
    val mapping = vocab.select(col("w"),
      size(col("syms")).cast("long").as("n_sub"),
      length(col("w")).cast("long").as("n_chr"))
    // fanOut: the corpus explode + vocabulary lookup + partial aggregate
    // is the data-sized stage; a one-row-group scan serializes it on one
    // task (round-14 gram-family fix). Per-doc aggregation is
    // partitioning-invariant, so the fan-out cannot change any count.
    val perDoc = Multimodal.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("w"))
      .join(mapping, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"),
        sum(col("n_chr")).as("n_word_chars"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("n_word_chars"), lit(0L)).as("n_word_chars"))
  }

  /** Conservation witness for [[bpeMerges]]: the per-round greedy
    * applied_count bookkeeping must telescope exactly against an
    * independent recount of the final vocabulary state —
    * Σ freq·|initial syms| − Σ applied_count == Σ freq·|final syms|.
    * Emits only disagreement rows (empty when the invariant holds;
    * `WHERE FALSE` oracle).
    */
  def bpeConservationCheck(df: DataFrame, textCol: String,
      numMerges: Int, batchK: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, vocab) = bpeTrain(df, textCol, numMerges, batchK)
    val sumApplied = merges.map(_._6).sum
    val totals = vocab
      .agg(sum(col("freq") * length(col("w"))),
        sum(col("freq") * size(col("syms"))))
      .head()
    val (initialSyms, finalSyms) = (totals.getLong(0), totals.getLong(1))
    Seq((initialSyms, sumApplied, finalSyms))
      .toDF("initial_symbols", "sum_applied", "final_symbols")
      .filter(col("initial_symbols") - col("sum_applied") =!= col("final_symbols"))
  }

  // --------------------------------------------------------------------------
  // WordPiece-style tokenizer: substring-vocabulary induction + greedy
  // longest-match encoding. The deterministic-integer sibling of the BPE
  // family above: induction is one frequency aggregate (no merge loop),
  // encoding is a per-position argmax + pointer-doubled walk — both exactly
  // replayable in ANSI SQL, so the whole tokenizer is oracle-checked rather
  // than witness-checked.
  // --------------------------------------------------------------------------

  /** Substring-vocabulary induction: corpus → distinct-word frequency
    * quotient → every substring of length 1..`maxLen` of every distinct
    * word (position-exploded, so per-word multiplicity counts), frequency-
    * weighted. The vocabulary is EVERY single character (the coverage
    * guarantee: greedy longest-match can then never fail mid-word) plus
    * the top `k` multi-character substrings by (count DESC, piece ASC) —
    * a bounded TakeOrdered tail, the same deterministic tie-break
    * discipline as [[bpeMerges]].
    *
    * Shape at scale: the corpus collapses once to the word quotient
    * (reference: BPE's quotient argument, [[bpeTrain]]); substring
    * explosion costs Σ|w|·maxLen rows over DISTINCT words only, one hash
    * aggregate, then a k-bounded top-k. No iteration, no driver-side data.
    */
  def substringVocab(df: DataFrame, textCol: String, maxLen: Int,
      k: Int): DataFrame = {
    require(maxLen >= 2 && maxLen <= 32, s"maxLen must be in [2, 32], got $maxLen")
    require(k >= 1 && k <= 1000000, s"k must be in [1, 1e6], got $k")
    val counts = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(lit(0), least(lit(maxLen - 1), length(col("w")) - i)),
          d => col("w").substr(i, d + lit(1)))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val chars = counts.filter(length(col("piece")) === 1)
    val multi = counts.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(k)
    chars.unionByName(multi)
      .select(col("piece"), length(col("piece")).as("piece_len"), col("cnt"))
  }

  /** Greedy longest-match piece counts per document against the self-
    * trained [[substringVocab]] vocabulary: for every distinct word, walk
    * left to right taking at each position the LONGEST vocabulary piece
    * that matches (single-character coverage makes the walk total), then
    * re-tokenize documents by lookup against the word→pieces quotient —
    * the [[bpeTokenCounts]] shape: the corpus pays one explode + one
    * vocabulary-sized equi-join, never the walk itself.
    *
    * The walk is NOT a per-word loop: the per-position best-piece length
    * is one explode (≤ maxLen candidate substrings per position) + one
    * broadcast-sized equi-join against the vocabulary + one hash argmax,
    * giving a functional graph pos → pos + bestLen over the quotient; the
    * piece count is the walk length from position 1, computed by POINTER
    * DOUBLING in ⌈log₂ maxWordLen⌉ rounds (the connected-components
    * discipline — `localCheckpoint` per round, flat round cost) instead
    * of one round per emitted piece. Scale: every frame is quotient- or
    * vocabulary-sized; the corpus is touched exactly twice (quotient
    * build, final lookup join).
    *
    * Docs with no tokens report zeros. Output: (id, n_words, n_pieces,
    * n_word_chars) — n_pieces == n_word_chars iff no multi-char piece
    * ever matched.
    */
  def wordpieceTokenCounts(df: DataFrame, idCol: String, textCol: String,
      maxLen: Int, k: Int): DataFrame = {
    val vocab = substringVocab(df, textCol, maxLen, k)
      .select(col("piece"), col("piece_len")).localCheckpoint()
    val words = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    // best matching piece length at every (word, position): candidates are
    // the ≤ maxLen substrings starting at the position; vocabulary match is
    // an equi-join on the piece text (AQE broadcasts the k-bounded side)
    val best = words
      .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("pos"))
      .select(col("w"), col("pos"), explode(transform(
        sequence(lit(0), least(lit(maxLen - 1), length(col("w")) - col("pos"))),
        d => col("w").substr(col("pos"), d + lit(1)))).as("piece"))
      .join(vocab, Seq("piece"))
      .groupBy(col("w"), col("pos")).agg(max(col("piece_len")).as("step"))
    // pointer doubling over the functional graph pos -> pos + step: each
    // row carries (reach, steps) = "from pos, `steps` pieces reach `reach`";
    // composing a row with the row AT its reach doubles the horizon. A row
    // whose reach is past the word end is terminal and self-composes.
    var hops = best
      .select(col("w"), col("pos"), (col("pos") + col("step")).as("reach"),
        lit(1L).as("steps"), length(col("w")).as("wlen"))
      .localCheckpoint()
    val maxWordLen = Option(words.agg(max(length(col("w")))).head().get(0))
      .map(_.asInstanceOf[Int]).getOrElse(0)
    var horizon = 1
    while (horizon < maxWordLen) {
      val nxt = hops.select(col("w"), col("pos").as("reach"),
        col("reach").as("reach2"), col("steps").as("steps2"))
      hops = hops
        .join(nxt, Seq("w", "reach"), "left")
        .select(col("w"), col("pos"),
          when(col("reach") > col("wlen"), col("reach"))
            .otherwise(col("reach2")).as("reach"),
          when(col("reach") > col("wlen"), col("steps"))
            .otherwise(col("steps") + col("steps2")).as("steps"),
          col("wlen"))
        .localCheckpoint()
      horizon *= 2
    }
    val mapping = hops.filter(col("pos") === 1)
      .select(col("w"), col("steps").as("n_pieces"),
        col("wlen").cast("long").as("n_chr"))
    // fanOut: the corpus explode + vocabulary lookup + partial aggregate
    // is the data-sized stage; a one-row-group scan serializes it on one
    // task (round-14 gram-family fix). Per-doc aggregation is
    // partitioning-invariant, so the fan-out cannot change any count.
    val perDoc = Multimodal.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("w"))
      .join(mapping, Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("n_chr")).as("n_word_chars"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_word_chars"), lit(0L)).as("n_word_chars"))
  }
}

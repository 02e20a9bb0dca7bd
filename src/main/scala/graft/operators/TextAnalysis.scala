package graft.operators

import graft.textkit.TextKit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text analysis over a documents table: language-ID (stopword-hit
 * heuristic), quality scoring, token counting (whitespace + BPE-ish regex),
 * and document fingerprinting (rolling hash of normalized text).
 * All row-local: embarrassingly parallel, no shuffles.
 */
object TextAnalysis {

  private val langIdUdf = udf((s: String) => TextKit.langId(Option(s).getOrElse("")))
  private val qualityUdf = udf((s: String) => TextKit.quality(Option(s).getOrElse("")))
  private val bpeishCountUdf = udf((s: String) => TextKit.bpeishTokens(Option(s).getOrElse("")).length)
  private val fingerprintUdf = udf((s: String) => TextKit.fingerprint(Option(s).getOrElse("")))

  /** (id, lang_pred) */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), langIdUdf(col(textCol)).as("lang_pred"))

  /** (id, n_chars, n_tokens, alpha_ratio, punct_ratio, stopword_ratio,
    * mean_token_len, quality_score) */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), qualityUdf(col(textCol)).as("q"))
      .select(col(idCol),
        col("q.nChars").as("n_chars"), col("q.nTokens").as("n_tokens"),
        col("q.alphaRatio").as("alpha_ratio"), col("q.punctRatio").as("punct_ratio"),
        col("q.stopwordRatio").as("stopword_ratio"), col("q.meanTokenLen").as("mean_token_len"),
        col("q.score").as("quality_score"))

  /** Token counts: whitespace tokens (declarative, codegen'd — no UDF) and
    * the BPE-ish regex token count. */
  def tokenCounts(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      when(length(trim(col(textCol))) === 0, lit(0))
        .otherwise(size(split(trim(col(textCol)), "\\s+"))).as("ws_tokens"),
      bpeishCountUdf(col(textCol)).as("bpeish_tokens"))

  /** (id, fingerprint) — rolling hash of normalized text. */
  def fingerprints(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), fingerprintUdf(col(textCol)).as("fingerprint"))

  /**
   * Corpus-level report — the per-language summary a training-data
   * pipeline publishes before/after each filter stage: doc count, token
   * total, corpus share, and mean quality per predicted language.
   * Both signals are row-local, so they compute in ONE map pass (no join
   * between them) followed by one aggregation on the language key: at
   * 100 TB that's a map-side-combined shuffle delivering a handful of
   * rows per partition (one per distinct lang). The corpus share divides
   * by a one-row scalar total broadcast back onto the grouped frame — NOT
   * an unpartitioned window, which would single-partition the plan.
   *
   * mean_quality is DETERMINISTIC across engines and summation orders:
   * per-row scores round to 4 decimals, scale to exact 10^4-integers, and
   * SUM as 64-bit integers (order-free); the single closing double
   * division is IEEE-identical everywhere. A float mean re-ordered by the
   * engine can land on a rounding boundary and flip the 4th decimal —
   * that class of correctness-gate flake is designed out here.
   *
   * `extraKeys` prepend additional grouping columns from `docs` (e.g. the
   * hashSplit label — the report-then-split publishing flow); doc_share
   * stays relative to the WHOLE frame, not the extra-key stratum.
   * Returns (extraKeys..., lang_pred, n_docs, total_tokens, grand_docs,
   * q_scaled, doc_share, mean_quality). The first six columns are INTEGRAL
   * (longs) — the correctness-gate projection, hash-stable across engines
   * and engine versions; doc_share/mean_quality are the derived
   * convenience doubles (doc_share = n_docs/grand_docs, mean_quality =
   * q_scaled/(n_docs·10^4)) whose last-decimal rounding is inherently
   * engine-sensitive, so gates should compare the integral pair instead.
   */
  def corpusStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                  extraKeys: Seq[String] = Nil): DataFrame = {
    val base = docs
      .select(extraKeys.map(col) ++ Seq(
        langIdUdf(col(textCol)).as("lang_pred"), qualityUdf(col(textCol)).as("q")): _*)
      .select(extraKeys.map(col) ++ Seq(col("lang_pred"),
        col("q.nTokens").as("n_tokens"), col("q.score").as("quality_score")): _*)
    // the grouped frame (one row per distinct key combo) feeds BOTH the
    // scalar total and the final projection: persist it so the corpus pass
    // runs ONCE — both plan branches share the same InMemoryRelation, and
    // a lazy un-cached plan would re-scan and re-score the whole corpus
    // for each reference (plan-audited; at 100 TB the second pass dwarfs
    // everything else in this operator). The cached frame is tiny (one
    // row per distinct key combo) and is LRU-managed; an eviction costs a
    // recompute, never correctness.
    val grouped = base.groupBy((extraKeys :+ "lang_pred").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        // floor(x·10^4 + 0.5) ≡ half-up round for the non-negative scores,
        // in plain double arithmetic — the SAME expression the DuckDB
        // oracle evaluates on bit-identical per-row doubles. (Spark's
        // round() goes through BigDecimal decimal-expansion semantics,
        // which can differ by one ulp-step from double multiply-and-floor
        // on knife-edge scores — the two engines must use ONE definition.)
        sum(floor(col("quality_score") * 10000 + lit(0.5)).cast("long")).as("q_scaled"))
      .persist()
    val total = grouped.agg(sum("n_docs").as("grand_docs"))
    grouped.crossJoin(broadcast(total))
      .select(extraKeys.map(col) ++ Seq(col("lang_pred"), col("n_docs"), col("total_tokens"),
        col("grand_docs"), col("q_scaled"),
        round(col("n_docs") / col("grand_docs"), 4).as("doc_share"),
        (col("q_scaled").cast("double") / (col("n_docs") * lit(10000.0))).as("mean_quality")): _*)
  }

  /**
   * CORPUS-level duplication signal (the C4/RefinedWeb-style filter): per
   * doc, the fraction of its distinct word-k-grams that also occur in at
   * least one OTHER document. Shares Dedup's gram kernel (row-local
   * hashing, then one df aggregation + one doc-keyed aggregation — two
   * hash shuffles total at any corpus size). Docs with no grams (empty
   * text) are absent, matching the SQL oracle.
   * Returns (id, n_grams, n_dup, dup_ngram_ratio) — the integral
   * (n_grams, n_dup) pair is the hash-stable gate shape; the ratio is the
   * derived convenience double.
   */
  def dupNgramRatio(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                    k: Int = 3): DataFrame = {
    val grams = Dedup.hashedGrams(docs, textCol, idCol, k)
    val dfCounts = grams.groupBy("gh").agg(count(lit(1)).as("df"))
    grams.join(dfCounts, "gh")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ngram_ratio", col("n_dup").cast("double") / col("n_grams"))
  }

  /**
   * Global top-k word n-grams by corpus occurrence count — the vocabulary
   * report a corpus pipeline publishes (and the input to boilerplate
   * blocklists). Ties break on the gram string, so the top-k cut is
   * deterministic and the integer-exact DuckDB oracle lands on the same
   * rows. Scale shape: grams materialize row-local, ONE gram-keyed
   * shuffle with map-side partial counts, then a global TakeOrdered
   * (no full sort) for the k winners.
   */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 100,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(n >= 1 && k >= 1)
    val toks = when(length(trim(coalesce(col(textCol), lit("")))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    docs.select(toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(explode(transform(sequence(lit(0), size(col("t")) - n),
        i => array_join(slice(col("t"), i + lit(1), lit(n)), " "))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)
  }

  private val nfcUdf = udf((s: String) =>
    java.text.Normalizer.normalize(Option(s).getOrElse(""),
      java.text.Normalizer.Form.NFC))

  /**
   * Unicode NFC normalization — the first step of web-text ingest
   * (Common-Crawl text mixes precomposed and combining-mark encodings of
   * the same graphemes; every downstream hash — exact dedup, minhash
   * shingles, fingerprints — silently misses duplicates across the two
   * encodings unless the corpus is normalized first). Canonical
   * composition only (NFC), never NFKC: compatibility folding is lossy
   * (ligatures, ²→2) and belongs to a quality policy, not normalization.
   * Row-local (one map pass, zero shuffles at any corpus size); both
   * engines implement the same Unicode canonical-composition algorithm
   * (java.text.Normalizer here, utf8proc in DuckDB's nfc_normalize), so
   * the oracle compares md5 digests of the normalized text directly.
   * Returns (id, text_nfc, changed, n_before, n_after) — char counts are
   * CODE POINTS on both engines.
   */
  def unicodeNormalize(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), col(textCol).as("__orig"),
      nfcUdf(col(textCol)).as("text_nfc"))
      .select(col(idCol), col("text_nfc"),
        (col("__orig") =!= col("text_nfc")).as("changed"),
        length(col("__orig")).cast("long").as("n_before"),
        length(col("text_nfc")).cast("long").as("n_after"))

  /**
   * Per-language best-k curation: for each predicted language, the k
   * highest-quality docs under the total order (q_scaled desc, id asc) —
   * the "keep the best N per language" selection step of a multilingual
   * corpus build. A naive `Window.partitionBy(lang)` would funnel the
   * whole corpus through ~|langs| partitions (the classic grouped-top-k
   * skew); instead the standard SALTED two-phase cut: rank within
   * (lang, hash(id) mod saltBuckets) and keep ≤ k per bucket — the global
   * per-lang top-k is provably a subset of the union of per-bucket
   * top-ks — then rank the surviving ≤ k·saltBuckets·|langs| candidates
   * within lang. Stage 2's window is skew-free because its input is
   * bounded by construction, independent of corpus size. Output is
   * salt-invariant and integral: (lang_pred, rk, id, q_scaled).
   */
  def langTopK(docs: DataFrame, k: Int = 20, saltBuckets: Int = 32,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && saltBuckets >= 1)
    val scored = docs.select(col(idCol),
      langIdUdf(col(textCol)).as("lang_pred"),
      floor(qualityUdf(col(textCol)).getField("score") * 10000 + lit(0.5))
        .cast("long").as("q_scaled"))
    val order = Seq(col("q_scaled").desc, col(idCol).asc)
    val w1 = Window.partitionBy(col("lang_pred"), col("__salt")).orderBy(order: _*)
    val cand = scored.withColumn("__salt", pmod(hash(col(idCol)), lit(saltBuckets)))
      .withColumn("__rk", row_number().over(w1)).filter(col("__rk") <= k)
      .drop("__rk", "__salt")
    val w2 = Window.partitionBy(col("lang_pred")).orderBy(order: _*)
    cand.withColumn("rk", row_number().over(w2).cast("long")).filter(col("rk") <= k)
      .select(col("lang_pred"), col("rk"), col(idCol), col("q_scaled"))
  }

  /**
   * Vocabulary-coverage / OOV filter (the CCNet-style cut: drop docs
   * whose tokens mostly fall outside the corpus' own top-`vocabSize`
   * vocabulary). Two integer-exact phases: (1) the vocabulary — ONE
   * token-keyed aggregation with map-side partial counts, top-k via a
   * global TakeOrdered (no full sort), ties broken on the token string
   * so the cut is deterministic; (2) the probe — the vocab (`vocabSize`
   * rows) broadcasts onto the exploded token stream, so coverage costs
   * no second shuffle beyond the final doc-keyed aggregation. Docs with
   * zero tokens keep a row (n_tokens = n_oov = 0): a filter must see
   * them to drop them, not lose them.
   * Returns (id, n_tokens, n_oov, oov_ratio) — the integral
   * (n_tokens, n_oov) pair is the hash-stable gate shape; the ratio is
   * the derived convenience double (0 for empty docs).
   */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 16,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(vocabSize >= 1)
    val toks = when(length(trim(coalesce(col(textCol), lit("")))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    // explode_outer keeps empty docs as a single null-token row, so the
    // doc-keyed agg emits their (0, 0) row without a second docs scan
    val stream = docs.select(col(idCol), explode_outer(toks).as("tok"))
    val vocab = stream.filter(col("tok").isNotNull)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    stream.join(broadcast(vocab), Seq("tok"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(col("tok")).as("n_tokens"),
        sum(when(col("tok").isNotNull && col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ratio",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_oov").cast("double") / col("n_tokens")))
  }

  /**
   * INTRA-doc repetition signal: 1 − distinct/total word bigrams — high
   * for degenerate repeated text (a standard LM-corpus quality cut).
   * Fully declarative (sequence/transform/array_distinct — codegen'd, no
   * UDF); docs with < 2 tokens score 0. Returns (id, n_bigrams,
   * n_distinct, repetition_ratio) — the integral (n_bigrams, n_distinct)
   * pair is the hash-stable gate shape; the ratio is the derived
   * convenience double.
   */
  def repetitionRatio(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    docs.select(col(idCol), toks.as("t"))
      .withColumn("bigrams",
        when(size(col("t")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2)))))
      .select(col(idCol), size(col("bigrams")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bigrams"))).cast("long").as("n_distinct"))
      .withColumn("repetition_ratio",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams")))
  }

  /** PII patterns, restricted to the java.util.regex ∩ RE2 common subset
    * (no lookaround, no backreferences, ASCII classes only) so the literal
    * pattern text evaluates identically on Spark and the DuckDB oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}([ -][0-9]{2,4})?\\b"

  /**
   * PII scrubbing — the redaction pass a training-data pipeline runs before
   * anything leaves the raw zone: emails, IPv4 addresses, and international
   * phone numbers are replaced by typed placeholder tokens, with a per-doc
   * redaction count for each class. Fully declarative (`regexp_count` /
   * `regexp_replace` — codegen'd, no UDF), row-local: embarrassingly
   * parallel, zero shuffles at any scale.
   *
   * The three classes are scrubbed in a FIXED order (email → IPv4 → phone)
   * and each count is taken on the text as it stands when that class runs,
   * so overlapping matches (an IPv4 inside an email local-part, say) resolve
   * deterministically: the earlier class consumes the span.
   *
   * Returns (id, clean_text, n_emails, n_ipv4, n_phones).
   */
  def piiScrub(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    docs.select(col(idCol), t0.as("_t0"))
      .withColumn("n_emails", regexp_count(col("_t0"), lit(EmailRe)))
      .withColumn("_t1", regexp_replace(col("_t0"), EmailRe, "<EMAIL>"))
      .withColumn("n_ipv4", regexp_count(col("_t1"), lit(Ipv4Re)))
      .withColumn("_t2", regexp_replace(col("_t1"), Ipv4Re, "<IP>"))
      .withColumn("n_phones", regexp_count(col("_t2"), lit(PhoneRe)))
      .withColumn("clean_text", regexp_replace(col("_t2"), PhoneRe, "<PHONE>"))
      .select(col(idCol), col("clean_text"),
        col("n_emails").cast("long").as("n_emails"),
        col("n_ipv4").cast("long").as("n_ipv4"),
        col("n_phones").cast("long").as("n_phones"))
  }

  /** The Gopher stop-word presence set (Rae et al. 2021 §A.2 use a small
    * English closed-class list; this is that list). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style document quality rules (Rae et al. 2021, "Scaling
   * Language Models" §A.2 — the MassiveWeb filter): word-count bounds,
   * mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis line
   * ratios, alphabetic-word fraction, and stop-word presence. The
   * standard pre-training corpus gate after dedup.
   *
   * Every rule is evaluated in EXACT integer arithmetic — ratio
   * thresholds become cross-multiplied integer comparisons (mean word
   * length ∈ [3, 10] ⟺ 3·n_words ≤ sum_word_len ≤ 10·n_words), so the
   * gate columns are longs/booleans with no float anywhere, and the
   * DuckDB oracle lands on identical values by construction. Fully
   * declarative (split/filter/regexp_count — codegen'd, no UDF),
   * row-local: zero shuffles at any scale. Regex literals are restricted
   * to the java.regex ∩ RE2 subset (the piiScrub convention) so the
   * identical patterns run in the oracle.
   *
   * Returns (id, n_words, sum_word_len, n_symbols, n_lines,
   * n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stopword_hits,
   * ok_words, ok_mean_len, ok_symbol, ok_bullet, ok_ellipsis, ok_alpha,
   * ok_stop, pass).
   */
  def gopherRules(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                  minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val words = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))
    val lines = split(t, "\n", -1)
    docs.select(col(idCol), t.as("_t"), words.as("_w"), lines.as("_l"))
      .select(col(idCol),
        size(col("_w")).cast("long").as("n_words"),
        // total non-whitespace chars = Σ word lengths (exact, no explode)
        length(regexp_replace(col("_t"), "\\s", "")).cast("long").as("sum_word_len"),
        (regexp_count(col("_t"), lit("#")) +
          regexp_count(col("_t"), lit("\\.\\.\\."))).cast("long").as("n_symbols"),
        size(col("_l")).cast("long").as("n_lines"),
        size(filter(col("_l"), l => l.rlike("^\\s*[-*•]"))).cast("long")
          .as("n_bullet_lines"),
        size(filter(col("_l"), l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
          .as("n_ellipsis_lines"),
        size(filter(col("_w"), w => w.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha_words"),
        GopherStopwords.map(sw =>
          when(col("_t").rlike("(^|\\s)" + sw + "($|\\s)"), 1L).otherwise(0L))
          .reduce(_ + _).as("n_stopword_hits"))
      .withColumn("ok_words", col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_mean_len",
        col("sum_word_len") >= lit(3) * col("n_words") &&
          col("sum_word_len") <= lit(10) * col("n_words") && col("n_words") > 0)
      .withColumn("ok_symbol", lit(10) * col("n_symbols") < col("n_words"))
      .withColumn("ok_bullet", lit(10) * col("n_bullet_lines") < lit(9) * col("n_lines"))
      .withColumn("ok_ellipsis", lit(10) * col("n_ellipsis_lines") < lit(3) * col("n_lines"))
      .withColumn("ok_alpha", lit(5) * col("n_alpha_words") >= lit(4) * col("n_words"))
      .withColumn("ok_stop", col("n_stopword_hits") >= 2)
      .withColumn("pass",
        col("ok_words") && col("ok_mean_len") && col("ok_symbol") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") && col("ok_stop"))
  }
}

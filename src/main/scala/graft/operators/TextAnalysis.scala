package graft.operators

import graft.textkit.TextKit
import org.apache.spark.sql.DataFrame
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
}

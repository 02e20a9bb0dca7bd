package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary training over the corpus — the real
 * learned-tokenizer operator (replacing the regex stand-in count): the
 * classic Sennrich et al. (arXiv:1508.07909) procedure, distributed the
 * way its structure dictates:
 *
 *  1. ONE corpus pass collapses the text to a (word type, count) frame —
 *     after this, every merge round works on word TYPES, not occurrences
 *     (the frame is orders of magnitude smaller than the corpus; at
 *     100 TB it is the ~10^8-row distinct-word table, comfortably
 *     distributed).
 *  2. Each merge round: count adjacent symbol pairs weighted by word
 *     count (one map-side-combined aggregation — the round's ONLY
 *     shuffle), pick the argmax on the driver (count desc, then pair
 *     string asc — fully deterministic), and apply the merge row-locally
 *     (sequential left-to-right, the standard non-overlapping semantics).
 *     k rounds → k small shuffles; per-round localCheckpoint keeps the
 *     plan from growing with the merge chain.
 *
 * Determinism is total (integer counts, lexicographic tie-break), so the
 * DuckDB oracle re-derives the SAME merge sequence independently: pair
 * counting via list enumeration, merge application via iterated
 * first-occurrence replacement on the space-joined symbol string — which
 * is provably equivalent to the left-to-right scan (earlier text never
 * re-matches: a replacement deletes an inter-symbol space and cannot
 * create a new `l r` adjacency before its own position).
 *
 * Words are whitespace tokens (the repo-wide convention the oracles
 * mirror); initial symbols are Unicode codepoints, optionally followed by
 * an end-of-word marker symbol (`eowMarker` — the standard Sennrich
 * refinement; the oracled queries train the marker-free default).
 */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Codepoint split (surrogate-safe — one symbol per codepoint, matching
    * the oracle's RE2 `.` extraction). */
  private[operators] def charSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One merge applied sequentially left-to-right (non-overlapping: after
    * merging positions (i, i+1), scanning resumes at i+2). */
  private[operators] def mergeOnce(syms: IndexedSeq[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Apply a trained merge table in rank order to one word (with the same
    * end-of-word marker the table was trained with, if any). */
  def applyMerges(word: String, merges: Seq[Merge],
                  eowMarker: Option[String] = None): Vector[String] =
    merges.foldLeft(initialSyms(word, eowMarker)) { (syms, m) => mergeOnce(syms, m.left, m.right) }

  /** (word type, count) over the corpus — the frame the merge loop runs on. */
  private def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(coalesce(col(textCol), lit(""))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol sequence of a word: codepoints, plus the end-of-word
    * marker as its own trailing symbol when configured — the standard
    * Sennrich refinement that lets merges distinguish word-final contexts
    * ("est</w>" vs "est"-as-prefix). */
  private[operators] def initialSyms(w: String, eowMarker: Option[String]): Vector[String] =
    eowMarker.fold(charSyms(w))(m => charSyms(w) :+ m)

  /** Train `numMerges` BPE merges. Stops early if no adjacent pair is left
    * (fully-merged degenerate corpora). `eowMarker` (e.g. Some("</w>"))
    * appends the marker as a trailing symbol of every word before
    * training — merges may then absorb it, and token counts under the
    * learned table reflect the marker symbol.  */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 8,
            eowMarker: Option[String] = None): Seq[Merge] = {
    require(numMerges >= 1)
    // ≥2 codepoints: a single-codepoint marker is indistinguishable from
    // that literal character's symbol, silently conflating word-final
    // context with text. (A multi-codepoint marker like "</w>" can still
    // collide only if merges reassemble the identical string from corpus
    // text that literally contains it — the standard, documented caveat.)
    require(eowMarker.forall(m =>
        m.codePointCount(0, m.length) > 1 && !m.exists(_.isWhitespace)),
      "the end-of-word marker must be >= 2 codepoints and whitespace-free")
    val symsUdf = udf((w: String) => initialSyms(w, eowMarker))
    // the corpus collapse is checkpointed ONCE (so no merge round ever
    // re-scans the corpus); the merge chain itself stays LAZY between
    // lineage cuts every `cutEvery` rounds — re-deriving ≤ cutEvery−1
    // row-local merges over the word-TYPE frame costs microseconds, while
    // a per-round localCheckpoint costs a full materialization job each
    // round (guide §1.2: remove unnecessary passes; measured ~half the
    // bpe bench time was these per-round jobs)
    var state = wordTypes(docs, textCol)
      .select(symsUdf(col("word")).as("syms"), col("cnt"))
      .localCheckpoint(true)
    var lastCut = state
    val cutEvery = 8
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    try {
      while (rank <= numMerges && !done) {
        val pairs = transform(sequence(lit(0), size(col("syms")) - 2), i =>
          concat(element_at(col("syms"), i + 1), lit(" "), element_at(col("syms"), i + 2)))
        val best = state
          .filter(size(col("syms")) >= 2) // sequence(0, -1) would DESCEND
          .select(col("cnt"), explode(pairs).as("pr"))
          .groupBy("pr").agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("pr"))
          .limit(1).collect()
        if (best.isEmpty) done = true
        else {
          val Array(l, r) = best(0).getString(0).split(" ", 2) // symbols never contain spaces
          merges += Merge(rank, l, r, best(0).getLong(1))
          val mergeUdf = udf((syms: Seq[String]) => mergeOnce(syms.toIndexedSeq, l, r))
          state = state.select(mergeUdf(col("syms")).as("syms"), col("cnt"))
          // bound plan depth for long merge chains (no cut after the final
          // round — nothing reads the post-final state)
          if (rank % cutEvery == 0 && rank < numMerges) {
            state = state.localCheckpoint(true)
            releaseCheckpoint(lastCut)
            lastCut = state
          }
          rank += 1
        }
      }
      merges.toSeq
    } finally releaseCheckpoint(lastCut)
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** The merge table as a DataFrame (merge_rank, left_sym, right_sym,
    * pair_count) — the publishable vocabulary artifact. */
  def mergeTable(docs: DataFrame, textCol: String = "text", numMerges: Int = 8,
                 eowMarker: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, eowMarker)
      .map(m => (m.rank, m.left, m.right, m.count))
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
  }

  /**
   * Per-doc token counts under a trained merge table. The merges apply
   * once per word TYPE (distinct-word frame), then join back to the
   * exploded occurrences — the same occurrences-vs-types split as
   * training; docs with no words (empty/whitespace text) are absent,
   * matching the oracle. Returns (idCol, bpe_tokens).
   */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge],
                  textCol: String = "text", idCol: String = "doc_id",
                  eowMarker: Option[String] = None): DataFrame = {
    val ms = merges.toVector
    val nSymsUdf = udf((w: String) => applyMerges(w, ms, eowMarker).length)
    val words = docs
      .select(col(idCol), explode(split(trim(coalesce(col(textCol), lit(""))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val perType = words.select("word").distinct()
      .withColumn("n_syms", nSymsUdf(col("word")))
    words.join(perType, "word")
      .groupBy(idCol).agg(sum(col("n_syms")).cast("long").as("bpe_tokens"))
  }
}

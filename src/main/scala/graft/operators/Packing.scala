package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus carving by cumulative token weight — the two operations an LM
 * pretraining pipeline runs after filtering/dedup to turn a document
 * table into training input:
 *
 *  - [[tokenShards]]: GPT-style contiguous-stream sharding. Documents in
 *    id order are conceptually concatenated into one token stream and cut
 *    into fixed-capacity shards (context-length chunks / output files);
 *    each doc learns its absolute token offset and the shard range it
 *    spans.
 *  - [[systematicWeightedSample]]: deterministic weight-proportional
 *    subsampling (systematic sampling over the cumulative-weight axis) —
 *    "keep ~1/step of the corpus BY TOKENS, not by docs", with zero RNG
 *    state and a partitioning-independent result.
 *
 * Both ride [[withCumulativeWeight]], a distributed prefix scan. The
 * naive Spark spelling — `sum(w).over(Window.orderBy(id))` with no
 * partition spec — collapses the whole corpus into ONE task (Spark's
 * WindowExec warns exactly this), a scale-killer at any real size. The
 * scan here is the classic two-phase distributed prefix sum instead:
 *
 *  1. one column-pruned pass computes approximate id quantiles → B
 *     explicit range-bucket cut points (a collected literal array, so
 *     bucket membership is a pure row-local expression — no
 *     `spark_partition_id()`, whose values would not be stable across
 *     the two jobs that follow);
 *  2. one pass aggregates per-bucket weight totals (B rows to the
 *     driver) → exclusive prefix offsets per bucket;
 *  3. the final pass windows WITHIN each bucket (partitionBy(bucket),
 *     ~n/B rows per task by quantile construction) and adds the
 *     broadcast bucket offset.
 *
 * Cost at 100 TB: two cheap (id, w)-only scans + the one bucket-keyed
 * shuffle the windowing needs anyway; driver state is B rows. The
 * OUTPUT is independent of the sampled cut points (they only move rows
 * between tasks), so approxQuantile's nondeterminism never reaches the
 * result — the cumulative weight of a row depends only on the id order.
 *
 * Contract: ids non-null and unique (the prefix order), weights ≥ 0.
 * Null-id rows are dropped (the Sampling null policy: a null id belongs
 * to no shard and no sample). All outputs are integral — the
 * correctness-gate shape that is hash-stable across engines.
 *
 * No reference counterpart (the reference crawls; it never packs a
 * training corpus) — this rounds out the LLM-pipeline operator set next
 * to dedup/quality/split.
 */
object Packing {

  /** Balanced binary-search `when` tree over the sorted cut points:
    * bucket(id) = |{c ∈ cuts : id ≥ c}| in ⌈log₂ B⌉ codegen'd comparisons
    * per row (the naive array-filter HOF is O(B) lambda evals per row —
    * measured 3.6 s/pass at 16M rows × B=64, PER pass). Tree size is one
    * node per cut, so B ≤ ~1k stays well inside codegen limits. */
  private def bucketSearch(idCol: String, cuts: Array[Long],
                           lo: Int, hi: Int): org.apache.spark.sql.Column =
    if (lo > hi) lit(lo)
    else {
      val mid = (lo + hi) / 2
      when(col(idCol) >= cuts(mid), bucketSearch(idCol, cuts, mid + 1, hi))
        .otherwise(bucketSearch(idCol, cuts, lo, mid - 1))
    }

  /**
   * Appends `cumName` = inclusive cumulative sum of `wCol` in `idCol`
   * order (long), via the two-phase bucket scan documented above.
   * `buckets` defaults to max(64, shuffle partitions) — parallelism for
   * the window pass independent of core count (the bucket count must
   * not change the per-row work, and with the log-depth search it
   * doesn't), with a driver-side offset table of no consequence.
   *
   * `tieCols` extend the window ordering below `idCol` for callers whose
   * id column is NOT unique (e.g. a 64-bit hash key): equal ids always
   * land in the SAME bucket (the cut search is `>=`), so a bucket-local
   * tie-break yields a total global order.
   */
  def withCumulativeWeight(df: DataFrame, idCol: String, wCol: String,
                           cumName: String = "cum_w", buckets: Int = 0,
                           tieCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val b =
      if (buckets > 0) buckets
      else math.max(64, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val base = df.filter(col(idCol).isNotNull)
    // pass 1: B-1 approximate id quantiles (column-pruned scan; the 1%
    // error only skews task sizes, never values)
    val probs = (1 until b).map(_.toDouble / b).toArray
    val cuts = base.stat.approxQuantile(idCol, probs, 0.01)
      .map(_.toLong).distinct.sorted
    val bucket =
      if (cuts.isEmpty) lit(0)
      else bucketSearch(idCol, cuts, 0, cuts.length - 1)
    val bucketed = base.withColumn("_bkt", bucket)
    // pass 2: per-bucket totals → exclusive prefix offsets (≤ B rows)
    val totals = bucketed.groupBy("_bkt")
      .agg(sum(col(wCol).cast("long")).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_bkt", "_off")
    // pass 3: bucket-local window + broadcast offset
    val w = Window.partitionBy("_bkt").orderBy((idCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offDf), "_bkt")
      .withColumn(cumName, col("_off") + sum(col(wCol).cast("long")).over(w))
      .drop("_bkt", "_off")
  }

  /** Whitespace token count of trimmed text — the same convention as
    * TextAnalysis.tokenCounts / the `text_tokens` gate. */
  private def wsTokens(textCol: String) =
    when(length(trim(coalesce(col(textCol), lit("")))) === 0, lit(0L))
      .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))

  /**
   * Contiguous token-stream sharding: docs in `idCol` order concatenate
   * into one stream cut every `capacity` tokens. Returns
   * (id, n_tokens, start_off, shard_first, shard_last) — a doc straddles
   * shards when its token interval [start_off, start_off + n_tokens)
   * crosses a capacity boundary; an empty doc occupies no tokens and
   * reports the shard its offset falls in for both bounds. Every column
   * is a long (gate-stable); divisions are integral (`div`) on
   * non-negative values, so they agree with any engine's floor division.
   */
  def tokenShards(docs: DataFrame, capacity: Long,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val base = docs.select(col(idCol), wsTokens(textCol).as("n_tokens"))
    withCumulativeWeight(base, idCol, "n_tokens")
      .select(col(idCol), col("n_tokens"),
        (col("cum_w") - col("n_tokens")).as("start_off"),
        expr(s"(cum_w - n_tokens) div ${capacity}L").as("shard_first"),
        when(col("n_tokens") > 0, expr(s"(cum_w - 1) div ${capacity}L"))
          .otherwise(expr(s"(cum_w - n_tokens) div ${capacity}L")).as("shard_last"))
  }

  /**
   * The materialization plan for [[tokenShards]]: one row per (shard,
   * doc) pair with the doc-local token subrange that lands in that shard
   * — what a shard-writing job groups by `shard` to emit fixed-budget
   * training files from straddling docs. Pure row-local arithmetic over
   * the tokenShards output (an explode of `sequence(shard_first,
   * shard_last)` — a doc adds one row per shard it touches, so the
   * explode factor is 1 + n_tokens/capacity, never quadratic). Returns
   * (shard, id, n_tokens, slice_start, slice_len): `slice_start` is the
   * 0-based token offset WITHIN the doc; per shard, Σ slice_len =
   * capacity exactly (the final shard may be short); per doc,
   * Σ slice_len = n_tokens. Empty docs occupy no tokens and emit no
   * slices. All columns long — the gate-stable shape.
   */
  def shardSlices(docs: DataFrame, capacity: Long,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    tokenShards(docs, capacity, textCol, idCol)
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"), col("start_off"),
        explode(sequence(col("shard_first"), col("shard_last"))).as("shard"))
      .select(col("shard"), col(idCol), col("n_tokens"),
        greatest(col("shard") * capacity - col("start_off"), lit(0L)).as("slice_start"),
        (least((col("shard") + 1) * capacity - col("start_off"), col("n_tokens")) -
          greatest(col("shard") * capacity - col("start_off"), lit(0L))).as("slice_len"))

  /**
   * RAG-style overlapping token chunking: each doc's token sequence is
   * cut into windows of `chunkTokens` advancing by `stride` (< chunk ⇒
   * overlap), the retrieval-corpus preparation step before embedding.
   * Chunk starts are 0, stride, 2·stride, … while start < n_tokens (a
   * final short window keeps the doc tail; a doc shorter than one chunk
   * yields exactly one chunk). Returns (id, chunk_id, chunk_start,
   * chunk_len, chunk_text) — chunk_text re-joined with single spaces
   * (the whitespace-token convention: original spacing is not
   * reconstructable, and the single-space join is the deterministic
   * canonical form both engines produce). Entirely row-local
   * (sequence + transform + slice + array_join, codegen'd, no UDF, no
   * shuffle at any corpus size); explode factor ≈ n_tokens/stride.
   */
  def tokenChunks(docs: DataFrame, chunkTokens: Int, stride: Int,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      "need 1 <= stride <= chunkTokens")
    val toks = when(length(trim(coalesce(col(textCol), lit("")))) === 0,
      array().cast("array<string>")).otherwise(split(trim(col(textCol)), "\\s+"))
    docs.select(col(idCol), toks.as("_t"))
      .filter(size(col("_t")) > 0)
      .select(col(idCol), col("_t"), size(col("_t")).cast("long").as("n_tokens"))
      // chunk count = 1 + floor((n_tokens - 1) / stride) clamped so the
      // last window STARTS inside the doc
      .withColumn("chunk_id",
        explode(sequence(lit(0L), expr(s"(n_tokens - 1) div ${stride}L"))))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        least(lit(chunkTokens.toLong), col("n_tokens") - col("chunk_id") * stride)
          .as("chunk_len"),
        array_join(slice(col("_t"), (col("chunk_id") * stride + 1).cast("int"),
          least(lit(chunkTokens), (col("n_tokens") - col("chunk_id") * stride).cast("int"))),
          " ").as("chunk_text"))
  }

  /**
   * Systematic sampling over the cumulative-weight axis: doc d with
   * weight interval (cum − w, cum] is selected iff the interval contains
   * a multiple of `step` — i.e. `cum div step > (cum − w) div step` (all
   * non-negative, so truncating and floor division agree across
   * engines). Exactly ⌊totalW/step⌋ docs are selected (each positive
   * multiple of step lands in exactly one interval); a doc's membership
   * is decided by the id order alone, so the sample is permanent for a
   * given corpus — no RNG, no partitioning dependence. With `wCol` =
   * token count this is "keep ~1/step of the corpus by TOKENS": heavy
   * docs are proportionally more likely to be kept, the standard
   * PPS-style corpus subsample. Returns (id, `wCol`, cum_w) of the
   * selected docs.
   */
  def systematicWeightedSample(docs: DataFrame, step: Long,
                               wCol: String, idCol: String = "doc_id"): DataFrame = {
    require(step >= 1, "step must be >= 1")
    withCumulativeWeight(docs.select(col(idCol), col(wCol)), idCol, wCol)
      .filter(expr(s"cum_w div ${step}L > (cum_w - $wCol) div ${step}L"))
  }

  /** [[systematicWeightedSample]] with weight = whitespace token count
    * of `textCol` (the corpus-by-tokens subsample). */
  def tokenWeightedSample(docs: DataFrame, step: Long,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    systematicWeightedSample(
      docs.select(col(idCol), wsTokens(textCol).as("n_tokens")), step, "n_tokens", idCol)
}

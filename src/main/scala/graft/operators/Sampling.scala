package graft.operators

import graft.textkit.TextKit
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus splitting and sampling by id hash — how a training
 * pipeline carves train/val/test and draws stable subsamples: no RNG
 * state, no ordering or partitioning dependence, stable under reruns and
 * engine changes (the DuckDB oracle recomputes splitmix64 in HUGEINT SQL
 * and lands on identical buckets). Each doc's id maps to a bucket in
 * [0, 10^6) via `TextKit.mix64`; splits and samples are bucket-range
 * predicates, so membership is decidable row-locally — zero shuffles at
 * any corpus size. The hash runs in a scalar UDF deliberately: Spark 4's
 * ANSI mode would throw on the intentional 64-bit wraparound if the same
 * arithmetic were written as SQL operators.
 *
 * No reference counterpart (the reference crawls; it never partitions a
 * training corpus) — this rounds out the LLM-pipeline operator set next
 * to dedup/quality/similarity.
 */
object Sampling {

  /** Bucket space size: fractions resolve to 1e-6 granularity. */
  val Buckets = 1000000L

  /** Unsigned bucket in [0, Buckets) of mix64(id + salt) — matches the
    * oracle's UBIGINT arithmetic exactly (remainderUnsigned, not %: the
    * signed remainder of a negative hash would disagree with UBIGINT mod). */
  private def bucketUdf(salt: Long) = udf((id: Long) =>
    java.lang.Long.remainderUnsigned(TextKit.mix64(id + salt), Buckets))

  /**
   * Split the corpus by cumulative weight over the bucket space: weights
   * ("train" 0.9, "val" 0.05, "test" 0.05) give bucket ranges
   * [0,900k) / [900k,950k) / [950k,1M). Appends (bucket, split) to every
   * row — pre-existing columns of those names are REPLACED (the split is
   * the output contract); expected proportions hold to hash uniformity
   * (~1e-3 relative at 10^6 docs), membership is exact and permanent for
   * a given salt. The sampling variants below keep their bookkeeping
   * under a reserved internal name instead, so caller columns survive.
   *
   * Null ids get (bucket, split) = (null, null) — explicitly unassigned,
   * never silently folded into the last label — consistent with the
   * sampling variants, whose bucket-range predicates are null-false and
   * therefore DROP null-id rows (round-3 ADVICE: the two paths must agree
   * that a null id belongs to no split and no sample).
   */
  def hashSplit(docs: DataFrame, idCol: String = "doc_id", salt: Long = 0L,
                weights: Seq[(String, Double)] =
                  Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val cuts = weights.map(_._1).zip(
      weights.scanLeft(0.0)(_ + _._2).tail.map(c => math.round(c * Buckets)))
    val labels = cuts.dropRight(1).foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), rest) => when(col("bucket") < cut, lit(name)).otherwise(rest)
    }
    // a null bucket (null id: the primitive-arg UDF null-propagates) must
    // not fall through every `when` into the last label
    val splitCol = when(col("bucket").isNull, lit(null).cast("string")).otherwise(labels)
    docs.withColumn("bucket", bucketUdf(salt)(col(idCol)))
      .withColumn("split", splitCol)
  }

  /**
   * Deterministic global training-order shuffle: every row gets a
   * `shuffle_key` (splitmix64 of id+salt, top bit flipped so SIGNED key
   * order ≡ UNSIGNED hash order — the DuckDB oracle derives the same
   * value as `hash − 2^63` in HUGEINT space) and `pos`, its 0-based rank
   * in (shuffle_key, id) order — the epoch order an LM trainer reads the
   * corpus in. Changing `salt` reshuffles; the same salt always yields
   * the same permutation, independent of partitioning and engine.
   *
   * Scale shape: the rank rides [[Packing.withCumulativeWeight]]'s
   * two-phase distributed prefix scan over the key axis (quantile range
   * buckets → per-bucket counts → bucket-local window + broadcast
   * offsets) — NO unpartitioned window, no global sort barrier beyond
   * the one bucket-keyed shuffle the trainer's writer needs anyway. Hash
   * keys can collide at 64 bits, so the id is the window tie-break
   * (equal keys provably land in the same bucket). Null ids are dropped
   * (the module-wide null policy: a null id belongs to no sample and no
   * training order).
   */
  def hashShuffle(docs: DataFrame, idCol: String = "doc_id", salt: Long = 0L): DataFrame = {
    val keyUdf = udf((id: Long) => TextKit.mix64(id + salt) ^ Long.MinValue)
    val keyed = docs.filter(col(idCol).isNotNull)
      .withColumn("shuffle_key", keyUdf(col(idCol)))
      .withColumn("__graft_one", lit(1L))
    Packing.withCumulativeWeight(keyed, "shuffle_key", "__graft_one",
      cumName = "__graft_rank", tieCols = Seq(idCol))
      .withColumn("pos", col("__graft_rank") - 1)
      .drop("__graft_one", "__graft_rank")
  }

  /** Stable `fraction`-sample: rows whose bucket falls below
    * fraction·Buckets. The same salt always draws the same sample; a
    * larger fraction's sample is a SUPERSET of a smaller one's (nested
    * samples for scaling-law runs). */
  def hashSample(docs: DataFrame, fraction: Double,
                 idCol: String = "doc_id", salt: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    // transient column under a reserved name: a caller's own "bucket"
    // column (e.g. hashSplit output fed back in for a nested draw) must
    // survive the sample untouched
    docs.withColumn("__graft_bucket", bucketUdf(salt)(col(idCol)))
      .filter(col("__graft_bucket") < math.round(fraction * Buckets))
      .drop("__graft_bucket")
  }

  /** Per-stratum stable sampling (e.g. per-language rebalancing): each
    * stratum keeps its own fraction; strata not listed keep `default`. */
  def stratifiedHashSample(docs: DataFrame, strataCol: String,
                           fractions: Map[String, Double], default: Double = 0.0,
                           idCol: String = "doc_id", salt: Long = 0L): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0))
    val cut = fractions.foldLeft(lit(math.round(default * Buckets)): Column) {
      case (rest, (k, f)) => when(col(strataCol) === k, lit(math.round(f * Buckets))).otherwise(rest)
    }
    docs.withColumn("__graft_bucket", bucketUdf(salt)(col(idCol)))
      .filter(col("__graft_bucket") < cut)
      .drop("__graft_bucket")
  }
}

package graft.sources

import graft.textkit.TextKit
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic synthetic documents corpus with PLANTED near-duplicate
 * clusters, for dedup validation at scale (the dedup analogue of
 * PagesGen.scale for the crawl).
 *
 * Layout: ids run in blocks of `blockSize` (20). Within a block,
 * offset 0 is the base document (48 words from a splitmix-derived 65k-word
 * vocabulary), offsets 1..3 are mutations of the base with 4·m words
 * replaced at pseudo-random positions (so true 3-gram Jaccard decreases
 * with m), offsets 4..19 are unrelated unique documents. Everything is a
 * pure function of doc_id — any task can recompute any text, and the truth
 * set (planted pairs with exact Jaccard over the same shingle kernel the
 * engine uses) is derivable without shipping state.
 */
object DocsGen {

  val blockSize = 20
  private val docWords = 48

  private def word(r: Long): String = "w" + (TextKit.mix64(r) & 0xffffL)

  private def baseWords(block: Long): Array[String] =
    Array.tabulate(docWords)(i => word(block * 131L + i * 7L + 1L))

  /** Text of any doc id (total, deterministic). */
  def text(id: Long): String = {
    val block = id / blockSize
    val off = (id % blockSize).toInt
    if (off == 0) baseWords(block).mkString(" ")
    else if (off <= 3) {
      val w = baseWords(block)
      val nRepl = 4 * off
      var j = 0
      while (j < nRepl) {
        // floorMod: math.abs(Long.MinValue) is still negative
        val pos = java.lang.Math.floorMod(TextKit.mix64(block ^ (off * 1000003L + j)), docWords.toLong).toInt
        w(pos) = word(block * 131L + 997L + off * 59L + j)
        j += 1
      }
      w.mkString(" ")
    } else
      Array.tabulate(docWords)(i => word(id * 977L + i * 13L + 5L)).mkString(" ")
  }

  /**
   * Planted ExactSubstr ground truth: maximal duplicated ≥minLen-token
   * spans, computed by an independent LOCAL reference (string hash maps +
   * a linear island scan — none of the operator's window-hash/Catalyst
   * machinery). Blocks are content-disjoint by construction (every word is
   * a mix64 of block- or id-salted seeds; a 10-token window repeating
   * across blocks would need 10 consecutive 16-bit collisions), so
   * corpus-wide duplication reduces to within-block duplication and each
   * block's truth is derivable row-locally from ids alone. The spec test
   * validates this reduction by brute-forcing a small corpus globally.
   */
  def substringTruth(spark: SparkSession, n: Long, minLen: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    val blocks = (n + blockSize - 1) / blockSize
    spark.range(0, blocks, 1, partitions)
      .flatMap { block =>
        val ids = (block * blockSize until math.min(n, (block + 1) * blockSize)).toSeq
        localSpans(ids.map(id => id -> text(id).split(" ").toSeq), minLen)
      }
      .toDF("doc_id", "start_tok", "end_tok", "n_windows")
  }

  /** The local reference kernel: window counts over the given docs, then
    * per-doc maximal islands of duplicated positions. */
  private[graft] def localSpans(docs: Seq[(Long, Seq[String])],
                                minLen: Int): Seq[(Long, Long, Long, Long)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, tk) <- docs; i <- 0 to tk.length - minLen)
      counts.updateWith(tk.slice(i, i + minLen).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    docs.flatMap { case (id, tk) =>
      val dupPos = (0 to tk.length - minLen)
        .filter(i => counts(tk.slice(i, i + minLen).mkString(" ")) >= 2)
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var run = List.empty[Int]
      def flush(): Unit = if (run.nonEmpty) {
        spans += ((id, run.last.toLong, run.head.toLong + minLen - 1, run.size.toLong))
        run = Nil
      }
      for (p <- dupPos) {
        if (run.nonEmpty && p != run.head + 1) flush()
        run = p :: run
      }
      flush()
      spans.toSeq
    }
  }

  /** The corpus as (doc_id, text), generated in parallel. */
  def docs(spark: SparkSession, n: Long, partitions: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .map(id => (id, text(id)))
      .toDF("doc_id", "text")
  }

  /**
   * Planted ground truth: all within-block pairs among {base, mutants}
   * whose EXACT word-3-gram Jaccard (the same TextKit kernel the oracles
   * verify) is ≥ `minJaccard`. Computed distributed — each pair is
   * row-local because both texts recompute from the ids.
   */
  def truthPairs(spark: SparkSession, n: Long, minJaccard: Double,
                 partitions: Int, k: Int = 3): DataFrame = {
    import spark.implicits._
    val blocks = (n + blockSize - 1) / blockSize
    spark.range(0, blocks, 1, partitions)
      .flatMap { block =>
        val ids = (0 to 3).map(off => block * blockSize + off).filter(_ < n)
        for {
          a <- ids; b <- ids if a < b
          j = TextKit.jaccard(TextKit.shingleHashes(text(a), k), TextKit.shingleHashes(text(b), k))
          if j >= minJaccard
        } yield (a, b, j)
      }
      .toDF("id_a", "id_b", "true_jaccard")
  }
}

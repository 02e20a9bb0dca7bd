package graft.operators

import org.apache.spark.util.sketch.BloomFilter

/**
 * Partial-key cuckoo filter over 64-bit key hashes (Fan, Andersen,
 * Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically Better Than
 * Bloom", CoNEXT 2014; public algorithm). The crawl engine's alternative
 * URL-seen pre-filter (north rule: "per-partition Bloom/cuckoo URL-seen
 * filter merged via treeAggregate"): vs Bloom it supports DELETION (a url
 * re-queued for re-crawl can leave the seen filter without a rebuild) and
 * a far lower false-positive rate (~2·4/2^16 ≈ 1.2e-4 with 16-bit
 * fingerprints vs the Bloom config's 1e-2), at ~3.5× the bits for the
 * same capacity. Exactness never depends on it: like the Bloom, it only
 * routes candidate urls around the exact seen anti-join.
 *
 * Layout: power-of-two buckets × 4 slots of 16-bit fingerprints (0 =
 * empty; fingerprints are never 0). A key's two candidate buckets are
 * b1 = mix(h) and b2 = b1 XOR mix(fingerprint) — XOR makes the pair
 * involutive, so any stored fingerprint can be displaced to its alternate
 * bucket without knowing the original key (the "partial-key" property,
 * which is also what makes two filters mergeable slot-by-slot).
 *
 * Degradation contract: if an insert exhausts MaxKicks evictions (table
 * effectively full), the filter flips to `overflowed` and answers
 * maybe-contains for EVERYTHING — the engine silently degrades to the
 * plain anti-join, never to a wrong answer. A key inserted more than
 * 2×slots times would loop forever instead; the engine inserts each
 * (seed,url) key exactly once (post-anti-join increments are disjoint).
 */
final class CuckooFilter private (val numBuckets: Int) extends Serializable {
  import CuckooFilter._

  private val table = new Array[Short](numBuckets * SlotsPerBucket)
  private var overflow = false
  private var n = 0L

  def size: Long = n
  def overflowed: Boolean = overflow

  private def idx(b: Int, s: Int): Int = b * SlotsPerBucket + s

  private def tryInsertAt(b: Int, f: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(idx(b, s)) == 0) { table(idx(b, s)) = f; return true }
      s += 1
    }
    false
  }

  private def containsAt(b: Int, f: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(idx(b, s)) == f) return true
      s += 1
    }
    false
  }

  private def removeAt(b: Int, f: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(idx(b, s)) == f) { table(idx(b, s)) = 0; return true }
      s += 1
    }
    false
  }

  /** Insert a fingerprint whose candidate pair includes bucket b. */
  private def insertFp(b0: Int, f0: Short): Unit = {
    if (overflow) return
    if (tryInsertAt(b0, f0) || tryInsertAt(altBucket(b0, f0, numBuckets), f0)) { n += 1; return }
    var b = b0
    var f = f0
    var kicks = 0
    while (kicks < MaxKicks) {
      // deterministic victim slot (round-robin over kicks): reproducible
      // filters for a given insert order, no RNG state to serialize
      val s = kicks % SlotsPerBucket
      val evicted = table(idx(b, s))
      table(idx(b, s)) = f
      f = evicted
      b = altBucket(b, f, numBuckets)
      if (tryInsertAt(b, f)) { n += 1; return }
      kicks += 1
    }
    overflow = true
  }

  def putLong(h: Long): Unit = insertFp(bucket1(h, numBuckets), fingerprint(h))

  def mightContainLong(h: Long): Boolean = {
    if (overflow) return true
    val f = fingerprint(h)
    val b1 = bucket1(h, numBuckets)
    containsAt(b1, f) || containsAt(altBucket(b1, f, numBuckets), f)
  }

  /** Remove ONE stored copy of the key's fingerprint. Only sound for keys
    * actually inserted (deleting a never-inserted key can evict a
    * colliding victim — the standard cuckoo-filter contract). */
  def deleteLong(h: Long): Boolean = {
    if (overflow) return false
    val f = fingerprint(h)
    val b1 = bucket1(h, numBuckets)
    val removed = removeAt(b1, f) || removeAt(altBucket(b1, f, numBuckets), f)
    if (removed) n -= 1
    removed
  }

  /** Fold another filter's fingerprints into this one (same geometry).
    * Mergeability comes from the partial-key property: a stored (bucket,
    * fingerprint) slot is re-insertable without its original key. */
  def mergeInPlace(o: CuckooFilter): CuckooFilter = {
    require(o.numBuckets == numBuckets,
      s"cuckoo geometry mismatch: $numBuckets vs ${o.numBuckets} buckets")
    if (o.overflow) overflow = true
    var b = 0
    while (b < numBuckets && !overflow) {
      var s = 0
      while (s < SlotsPerBucket) {
        val f = o.table(b * SlotsPerBucket + s)
        if (f != 0) insertFp(b, f)
        s += 1
      }
      b += 1
    }
    this
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500

  /** Size for ~84% target load: 4-slot cuckoo tables insert reliably to
    * ~95%, the headroom keeps eviction chains short. */
  def create(expectedInsertions: Long): CuckooFilter = {
    val needed = math.ceil(expectedInsertions / (SlotsPerBucket * 0.84)).toLong
    var buckets = 1
    while (buckets < needed && buckets < (1 << 30)) buckets <<= 1
    new CuckooFilter(buckets)
  }

  // splitmix64 finalizer: full-avalanche mix so bucket bits and
  // fingerprint bits of the same input hash are effectively independent
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def fingerprint(h: Long): Short = {
    val f = (mix(h) >>> 48).toInt & 0xffff
    (if (f == 0) 1 else f).toShort
  }

  def bucket1(h: Long, numBuckets: Int): Int =
    (mix(h ^ 0x5851f42d4c957f2dL) & (numBuckets - 1)).toInt

  def altBucket(b: Int, f: Short, numBuckets: Int): Int =
    b ^ (mix(f & 0xffffL) & (numBuckets - 1)).toInt
}

/**
 * The engine-facing seen-filter abstraction: Bloom (space-optimal,
 * insert-only) or cuckoo (deletable, lower FPR) behind one interface, so
 * `CrawlEngine.runLoop`'s maintenance paths — driver-side inserts below
 * `bloomDistributedMinRows`, per-partition build merged via treeAggregate
 * above it — are written once. Implementations are Serializable: partials
 * ride executor tasks and the merged filter rides a broadcast.
 */
sealed trait SeenFilter extends Serializable {
  def putLong(h: Long): Unit
  def mightContainLong(h: Long): Boolean
  def mergeInPlace(o: SeenFilter): Unit
}

object SeenFilter {
  final class BloomSeen(val bf: BloomFilter) extends SeenFilter {
    def putLong(h: Long): Unit = bf.putLong(h)
    def mightContainLong(h: Long): Boolean = bf.mightContainLong(h)
    def mergeInPlace(o: SeenFilter): Unit = bf.mergeInPlace(o.asInstanceOf[BloomSeen].bf)
  }
  final class CuckooSeen(val cf: CuckooFilter) extends SeenFilter {
    def putLong(h: Long): Unit = cf.putLong(h)
    def mightContainLong(h: Long): Boolean = cf.mightContainLong(h)
    def mergeInPlace(o: SeenFilter): Unit = cf.mergeInPlace(o.asInstanceOf[CuckooSeen].cf)
  }

  /** A serializable factory closing over just the sizing params (not the
    * whole config), used both driver-side and inside treeAggregate tasks. */
  def factory(kind: String, expectedInsertions: Long, fpp: Double): () => SeenFilter =
    kind match {
      case "bloom" => () => new BloomSeen(BloomFilter.create(expectedInsertions, fpp))
      case "cuckoo" => () => new CuckooSeen(CuckooFilter.create(expectedInsertions))
      case other => throw new IllegalArgumentException(
        s"seenFilterKind must be 'bloom' or 'cuckoo', got '$other'")
    }
}

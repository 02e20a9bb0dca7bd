package graft.textkit

/**
 * Pure text-analysis primitives for the training-data pipeline operators
 * (dedup shingling/minhash/simhash, language-ID heuristic, quality scoring,
 * token counting, fingerprinting). No Spark deps; everything deterministic —
 * hash mixing is splitmix64, no RNG state anywhere.
 */
object TextKit {

  // ---- hashing -------------------------------------------------------------

  /** splitmix64 — deterministic 64-bit mixer. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  // ---- tokenization ----------------------------------------------------------

  /** Whitespace tokens (the simple count both SQL engines can replicate). */
  def wsTokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
    * the usual GPT-2-style regex shape, simplified. */
  private val bpeishRe = java.util.regex.Pattern.compile("[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]")
  def bpeishTokens(s: String): Vector[String] = {
    val m = bpeishRe.matcher(s)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  // ---- shingling / minhash / simhash ----------------------------------------

  /** Hashes of word k-grams (the shingle set for Jaccard/minhash). */
  def shingleHashes(s: String, k: Int): Array[Long] = {
    val toks = wsTokens(s)
    if (toks.length < k) {
      if (toks.isEmpty) Array.empty else Array(fnv64(toks.mkString(" ")))
    } else {
      val out = new scala.collection.mutable.HashSet[Long]
      var i = 0
      while (i + k <= toks.length) {
        out += fnv64(toks.slice(i, i + k).mkString(" "))
        i += 1
      }
      out.toArray
    }
  }

  /** Exact Jaccard over two shingle-hash sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val inter = b.count(sa.contains)
    val union = sa.size + b.toSet.size - inter
    inter.toDouble / union
  }

  private val mersennePrime = (1L << 61) - 1
  /** Deterministic (a,b) parameters for minhash permutation i. */
  @inline private def permA(i: Int): Long = (mix64(2L * i) & Long.MaxValue) % (mersennePrime - 1) + 1
  @inline private def permB(i: Int): Long = (mix64(2L * i + 1) & Long.MaxValue) % mersennePrime

  /** MinHash signature: min over shingles of (a_i*x + b_i) mod p, per perm. */
  def minhash(shingles: Array[Long], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < numPerms) {
      val a = permA(i); val b = permB(i)
      var j = 0
      var min = Long.MaxValue
      while (j < shingles.length) {
        // branch-free mod-mersenne multiply would be nicer; Math.multiplyHigh
        // keeps this exact without BigInt
        val x = shingles(j) & Long.MaxValue
        val hi = Math.multiplyHigh(a, x)
        val lo = a * x
        // (a*x) mod 2^61-1 via fold of 128-bit product
        var v = (lo & mersennePrime) + ((lo >>> 61) | (hi << 3)) + b
        v = (v & mersennePrime) + (v >>> 61)
        if (v >= mersennePrime) v -= mersennePrime
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }

  /** Estimated Jaccard from two minhash signatures. */
  def minhashSimilarity(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** LSH band keys: hash of each band's slice of the signature. */
  def lshBands(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var i = b * rows
      while (i < (b + 1) * rows) { h = mix64(h ^ sig(i)); i += 1 }
      h
    }
  }

  /** 64-bit SimHash over whitespace tokens (unit weights). */
  def simhash64(s: String): Long = {
    val counts = new Array[Int](64)
    wsTokens(s).foreach { t =>
      val h = fnv64(t)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 16-bit chunks of a simhash — Hamming ≤ 3 ⇒ at least one chunk equal. */
  def simhashChunks(h: Long): Array[Int] =
    Array.tabulate(4)(i => ((h >>> (16 * i)) & 0xffff).toInt)

  // ---- language id (stopword-hit heuristic) ----------------------------------

  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "was", "for", "on", "with", "his", "they"),
    "de" -> Set("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "von", "zu", "den", "sie", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "je", "ne", "pas", "un", "une", "des", "du", "que", "dans"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "no", "un", "una", "de", "que", "en", "por", "con"),
    "zh" -> Set("的", "是", "不", "了", "在", "人", "有", "我", "他", "这", "中", "大", "来", "上")
  )

  /** Predicted language + per-language hit ratios; deterministic tie-break
    * (highest ratio, then alphabetical), "und" when nothing matches. */
  def langId(s: String): String = {
    val toks = wsTokens(s.toLowerCase(java.util.Locale.ROOT))
    if (toks.isEmpty) return "und"
    // zh has no spaces: also scan characters
    val zhHits = s.count(c => stopwords("zh").contains(c.toString))
    val scores = stopwords.map { case (lang, sw) =>
      val hits = if (lang == "zh") zhHits else toks.count(sw.contains)
      lang -> hits.toDouble / toks.length
    }
    val best = scores.maxBy { case (lang, score) => (score, lang) }
    if (best._2 <= 0.0) "und" else best._1
  }

  // ---- quality ----------------------------------------------------------------

  final case class Quality(
      nChars: Int, nTokens: Int, alphaRatio: Double, punctRatio: Double,
      stopwordRatio: Double, meanTokenLen: Double, score: Double)

  def quality(s: String): Quality = {
    val nChars = s.length
    val toks = wsTokens(s)
    val nTokens = toks.length
    if (nChars == 0 || nTokens == 0) return Quality(nChars, nTokens, 0, 0, 0, 0, 0)
    val alpha = s.count(_.isLetter).toDouble / nChars
    val punct = s.count(c => !c.isLetterOrDigit && !c.isWhitespace).toDouble / nChars
    val sw = stopwords("en")
    val swRatio = toks.count(t => sw.contains(t.toLowerCase(java.util.Locale.ROOT))).toDouble / nTokens
    val meanLen = toks.map(_.length).sum.toDouble / nTokens
    // simple composite in [0,1]: alphabetic, not punctuation-heavy, has some
    // stopwords, mean token length in a natural-language band
    val lenBand = if (meanLen >= 3 && meanLen <= 10) 1.0 else 0.5
    val score = math.max(0.0, math.min(1.0,
      0.4 * alpha + 0.2 * math.min(1.0, swRatio * 4) + 0.2 * (1.0 - math.min(1.0, punct * 5)) + 0.2 * lenBand))
    Quality(nChars, nTokens, alpha, punct, swRatio, meanLen, score)
  }

  // ---- fingerprint ---------------------------------------------------------------

  /** Rolling polynomial fingerprint of the normalized text (lowercased,
    * whitespace collapsed) — document identity under formatting noise.
    * Spec: h = fold over Unicode CODEPOINTS of (h * 1000003 + cp) mod
    * (2^61 - 1). The closed-form spec makes the value independently
    * recomputable (the DuckDB oracle folds the same polynomial in
    * HUGEINT), unlike a JVM-wraparound hash. */
  def fingerprint(s: String): Long = {
    val norm = s.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ")
    var h = 0L
    var i = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      // (h * 1000003 + cp) mod 2^61-1, exact via 128-bit product fold
      val a = h
      val x = 1000003L
      val lo = a * x
      val hi = Math.multiplyHigh(a, x)
      var v = (lo & mersennePrime) + ((lo >>> 61) | (hi << 3)) + cp
      v = (v & mersennePrime) + (v >>> 61)
      if (v >= mersennePrime) v -= mersennePrime
      h = v
      i += Character.charCount(cp)
    }
    h
  }
}

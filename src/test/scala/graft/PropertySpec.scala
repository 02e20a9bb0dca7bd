package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.htmlkit.HtmlKit
import graft.robotskit.RobotsKit
import graft.textkit.TextKit

/** ScalaCheck property coverage the reference lacks (SURVEY §5): tokenizer
  * totality/determinism on arbitrary input, robots matcher invariants,
  * minhash/jaccard bounds. (URL canonicalization properties live in
  * UrlKitSpec.) */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  private val htmlGen: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.oneOf("<", ">", "</", "<!", "<!--", "-->", "&", "&amp;", "&#x41;", "\"", "'", "=", "/>",
        "<a href=", "<a href=\"/x\">", "</a>", "<script>", "</script>", "<style>", " ", "\n"))
    Gen.listOf(frag).map(_.mkString)
  }

  test("property: tokenizer is total and deterministic on arbitrary soup") {
    forAll(htmlGen) { html =>
      val a = HtmlKit.extractText(html)
      val b = HtmlKit.extractText(html)
      assert(a == b)
      val l1 = HtmlKit.extractLinksStr("https://e.com/base", html)
      val l2 = HtmlKit.extractLinksStr("https://e.com/base", html)
      assert(l1 == l2)
      // every extracted link is an absolute canonical url
      l1.foreach(l => assert(graft.urlkit.UrlKit.parse(l.url).isRight))
    }
  }

  private val robotsGen: Gen[String] = {
    val line = Gen.oneOf(
      Gen.const("User-agent: *"),
      Gen.const("User-agent: MikesCrawler"),
      Gen.const("User-agent: OtherBot"),
      Gen.alphaNumStr.map(s => s"Disallow: /${s.take(8)}"),
      Gen.alphaNumStr.map(s => s"Allow: /${s.take(8)}"),
      Gen.alphaNumStr.map(s => s"Disallow: /${s.take(5)}*"),
      Gen.alphaNumStr.map(s => s"Disallow: /${s.take(5)}$$"),
      Gen.const("# comment"),
      Gen.const("Crawl-delay: 2"),
      Gen.const(""))
    Gen.listOf(line).map(_.mkString("\n"))
  }

  test("property: robots matcher is total, deterministic, and allow-by-default") {
    val pathGen = Gen.alphaNumStr.map(s => s"https://e.com/${s.take(10)}")
    forAll(Gen.zip(robotsGen, pathGen)) { case (robots, url) =>
      val a = RobotsKit.allowed(robots, "MikesCrawler", url)
      assert(a == RobotsKit.allowed(robots, "MikesCrawler", url))
      // no rules at all → allowed
      if (!robots.toLowerCase.contains("disallow")) assert(a)
    }
  }

  test("property: minhash similarity stays within [0,1] and respects identity") {
    val textGen = Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
      .map(_.mkString(" "))
    forAll(Gen.zip(textGen, textGen)) { case (a, b) =>
      val sa = TextKit.shingleHashes(a, 2)
      val sb = TextKit.shingleHashes(b, 2)
      val j = TextKit.jaccard(sa, sb)
      assert(j >= 0.0 && j <= 1.0)
      assert(TextKit.jaccard(sa, sa) == 1.0)
      val est = TextKit.minhashSimilarity(TextKit.minhash(sa, 64), TextKit.minhash(sb, 64))
      assert(est >= 0.0 && est <= 1.0)
      if (a == b) assert(est == 1.0)
    }
  }

  test("property: simhash hamming distance is a pseudo-metric under token edits") {
    val textGen = Gen.listOfN(20, Gen.oneOf("w1", "w2", "w3", "w4", "w5")).map(_.mkString(" "))
    forAll(textGen) { t =>
      val h = TextKit.simhash64(t)
      assert(TextKit.hammingDistance(h, h) == 0)
      // chunk banding is consistent with the full hash
      val chunks = TextKit.simhashChunks(h)
      assert(chunks.length == 4)
      val rebuilt = chunks.zipWithIndex.map { case (c, i) => c.toLong << (16 * i) }.reduce(_ | _)
      assert(rebuilt == h)
    }
  }

  test("property: PPJoin filter stack and adaptive dispatch are lossless vs a local reference") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Dedup
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docGen = Gen.chooseNum(3, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))).map(_.mkString(" "))
    val corpusGen = for {
      nDocs <- Gen.chooseNum(2, 20)
      docs <- Gen.listOfN(nDocs, docGen)
      t <- Gen.oneOf(0.1, 0.3, 0.5, 0.75, 0.9)
    } yield (docs, t)
    def gramsOf(str: String): Set[String] = {
      val toks = TextKit.wsTokens(str)
      if (toks.isEmpty) Set.empty
      else if (toks.length < 3) Set(toks.mkString(" "))
      else (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    forAll(corpusGen, n = 8) { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (str, i) => (i.toLong, str) }.toDF("doc_id", "text")
      // independent local all-pairs reference over distinct gram STRINGS
      val expected = (for {
        i <- docs.indices
        j <- docs.indices
        if i < j
        ga = gramsOf(docs(i))
        gb = gramsOf(docs(j))
        if ga.nonEmpty && gb.nonEmpty
        inter = ga.intersect(gb).size
        jac = inter.toDouble / (ga.size + gb.size - inter)
        if jac >= t
      } yield (i.toLong, j.toLong, math.round(jac * 1e9))).toSet
      val viaPrefix = Dedup.ngramJaccardPrefixJoin(df, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
      assert(viaPrefix == expected, s"prefix join diverged: t=$t docs=$docs")
      val viaAdaptive = Dedup.ngramJaccard(df, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
      assert(viaAdaptive == expected, s"adaptive dispatch diverged: t=$t docs=$docs")
    }
  }

  test("property: as-of join equals the brute-force local reference on random instances") {
    val spark = TestSpark.spark
    import spark.implicits._
    // right-side (key, ts) stays unique per instance (the documented
    // contract for deterministic matching); nulls, missing keys, equal-ts
    // left/right, and empty-history lefts all occur by construction
    (0 until 6).foreach { i =>
      val rnd = new scala.util.Random(1000 + i)
      val keys = (0 until 6).map(k => s"k$k")
      val right: Seq[(String, Option[Long], Option[Long], Long)] =
        keys.flatMap { k =>
          rnd.shuffle((0 until 40).toList).take(rnd.nextInt(12)).map(t =>
            (k, Some(t.toLong), if (rnd.nextBoolean()) Some(rnd.nextLong(100)) else None,
              rnd.nextLong(1000)))
        } ++ Seq(("k0", None, Some(999L), -1L)) // null ts must never match
      val left: Seq[(String, Long)] =
        (keys :+ "missing").flatMap(k => Seq.fill(1 + rnd.nextInt(6))((k, rnd.nextLong(50))))
      val out = graft.operators.AsofJoin.asofJoin(
        left.toDF("u", "ts"), right.toDF("u", "ts", "v", "w"),
        on = "ts", by = Seq("u"), rightCols = Seq("ts", "v", "w"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).sorted
      val expected = left.map { case (u, t) =>
        right.filter(r => r._1 == u && r._2.exists(_ <= t))
          .sortBy(_._2.get).lastOption match {
          case Some((_, ts, v, w)) => (u, t, ts, v, Some(w))
          case None => (u, t, None, None, None)
        }
      }.sorted
      assert(out.toSeq == expected, s"instance $i diverged")
    }
  }

  test("property: hot-key sharded as-of join is identical to the unsharded path") {
    val spark = TestSpark.spark
    import spark.implicits._
    // one pathological key holds ~all rows (the 100×-scale failure mode:
    // a single key too hot to sort in one task); maxKeyRows is tiny so the
    // coarse time-bucket split + boundary carry actually engages, and
    // right rows stop early so several later buckets contain ONLY left
    // rows (the carry must span multiple right-free buckets)
    (0 until 5).foreach { i =>
      val rnd = new scala.util.Random(3000 + i)
      val right: Seq[(String, Long, Long)] =
        (if (i == 0) Seq(50L) // single right ts: key is hot but width 0 → unsharded fallback
         else rnd.shuffle((0 until 150).toList).take(60).map(_.toLong))
          .map(t => ("hot", t, rnd.nextLong(100))) ++
          Seq(("cold", 10L, 7L), ("cold", 30L, 8L))
      val left: Seq[(String, Long)] =
        (if (i == 0) Seq.fill(200)(("hot", 77L))
         else Seq.fill(300)(("hot", rnd.nextLong(400)))) ++
          Seq.fill(5)(("cold", rnd.nextLong(50))) :+ (("missing", 5L))
      def run(maxKeyRows: Long) = graft.operators.AsofJoin.asofJoin(
        left.toDF("u", "ts"), right.toDF("u", "ts", "v"),
        on = "ts", by = Seq("u"), rightCols = Seq("ts", "v"), maxKeyRows = maxKeyRows)
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq.sorted
      assert(run(40L) == run(Long.MaxValue), s"instance $i diverged")
    }
  }

  test("property: BPE training equals the local reference on random corpora") {
    val spark = TestSpark.spark
    import spark.implicits._
    // tiny alphabet → dense pair collisions and plenty of count ties, so
    // the deterministic tie-break (count desc, pair asc) is exercised hard
    (0 until 5).foreach { i =>
      val rnd = new scala.util.Random(4000 + i)
      val alphabet = "abc"
      def word() = (0 until 1 + rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = (0 until 20).map(d => (d.toLong, (0 until rnd.nextInt(12)).map(_ => word()).mkString(" ")))
      def mergeSeq(syms: Vector[String], l: String, r: String): Vector[String] = {
        val out = Vector.newBuilder[String]; var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) { out += (l + r); j += 2 }
          else { out += syms(j); j += 1 }
        }
        out.result()
      }
      def localTrain(k: Int): Seq[(String, String, Long)] = {
        var state = docs.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
          .groupBy(identity).map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }.toSeq
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var exhausted = false
        for (_ <- 1 to k if !exhausted) {
          val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
          state.foreach { case (syms, c) =>
            syms.indices.dropRight(1).foreach(j => counts((syms(j), syms(j + 1))) += c)
          }
          if (counts.isEmpty) exhausted = true
          else {
            val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, s"$l $r") }
            out += ((l, r, c))
            state = state.map { case (syms, cc) => (mergeSeq(syms, l, r), cc) }
          }
        }
        out.toSeq
      }
      val got = graft.operators.Bpe.train(docs.toDF("doc_id", "text"), numMerges = 10)
        .map(m => (m.left, m.right, m.count))
      assert(got == localTrain(10), s"instance $i diverged: $got")
    }
  }

  test("property: batch sessionization equals the local island scan on random instances") {
    val spark = TestSpark.spark
    import spark.implicits._
    (0 until 6).foreach { i =>
      val rnd = new scala.util.Random(2000 + i)
      // events per user at random minute offsets (duplicate ts allowed —
      // equal-ts events always share a session, gap 0)
      val events = (0 until 5).flatMap { u =>
        Seq.fill(1 + rnd.nextInt(30))(
          (u.toLong, rnd.nextLong(100000), new java.sql.Timestamp(
            1700000000000L + rnd.nextInt(12 * 60) * 60000L)))
      }.zipWithIndex.map { case ((u, _, ts), idx) => (u, idx.toLong, ts) }
      val out = graft.streaming.StreamOps
        .sessionizeBatch(events.toDF("user_id", "event_id", "ts"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3))).sorted
      val expected = events.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        val ts = evs.map(_._3.getTime).sorted
        val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var start = ts.head; var last = ts.head; var cnt = 0L
        ts.foreach { t =>
          if (t - last > 30 * 60000L) { sessions += ((u, start, last, cnt)); start = t; cnt = 0L }
          last = t; cnt += 1L
        }
        sessions += ((u, start, last, cnt))
        sessions
      }.sorted
      assert(out.toSeq == expected, s"instance $i diverged")
    }
  }
}

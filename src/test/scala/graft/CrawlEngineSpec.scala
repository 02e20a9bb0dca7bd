package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{CrawlConfig, CrawlEngine, CrawlRun}
import graft.sources.PagesGen

/**
 * Ports of ALL 13 reference crawler unit tests (/root/reference/src/
 * crawler.rs:385-1014) and the 5 integration tests (tests/integration.rs)
 * against the synthetic pages table (FIXTURES.md), plus engine-specific
 * coverage (bloom path, politeness budget, multi-seed, resume).
 *
 * Hit-count asserts (e.g. crawler.rs:728-735) become "each fetched url has
 * exactly one result row and the counters' fetched-sum equals the number of
 * fetched urls" — the engine records exactly one result per fetch.
 */
class CrawlEngineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val pages = PagesGen.fixtures(spark).cache()

  /** Collected view of one crawl's result rows, keyed by url. */
  case class R(
      t: String, status: Option[Int] = None, body: Option[String] = None,
      location: Option[String] = None, ct: Option[String] = None,
      err: Option[String] = None,
      il: Option[Seq[String]] = None, el: Option[Seq[String]] = None)

  private def collectMap(run: CrawlRun, seed: String): Map[String, R] = {
    val rows = run.resultFor(seed).collect()
    val m = rows.map { r =>
      def opt[T](name: String): Option[T] =
        if (r.isNullAt(r.fieldIndex(name))) None else Some(r.getAs[T](name))
      r.getAs[String]("url") -> R(
        r.getAs[String]("result_type"),
        opt[Int]("status"), opt[String]("body"), opt[String]("location"),
        opt[String]("content_type"), opt[String]("error"),
        opt[Seq[String]]("internal_links"), opt[Seq[String]]("external_links"))
    }.toMap
    assert(m.size == rows.length, "duplicate result rows for a url — exactly-once violated")
    m
  }

  private def doCrawl(seed: String, cfg: CrawlConfig = CrawlConfig()): (CrawlRun, Map[String, R]) = {
    val run = new CrawlEngine(spark, pages, cfg).crawl(seed)
    (run, collectMap(run, seed))
  }

  private def crawled(il: Seq[String] = Seq.empty, el: Seq[String] = Seq.empty): R =
    R("Crawled", il = Some(il), el = Some(el))

  private val X = PagesGen.X

  // ---- the 13 crawler.rs unit tests ----------------------------------------

  test("reports_single_server_error (crawler.rs:560-581)") {
    val seed = s"${PagesGen.host("server-error")}/start"
    val (_, m) = doCrawl(seed)
    assert(m == Map(seed -> R("ServerFailure", status = Some(500), body = Some("Internal server error"))))
  }

  test("reports_single_network_error (crawler.rs:583-597)") {
    val seed = s"${PagesGen.host("network-error")}/start"
    val (_, m) = doCrawl(seed)
    assert(m == Map(seed -> R("Error", err = Some("Connection failed"))))
  }

  test("reports_single_page_with_external_links (crawler.rs:599-621)") {
    val seed = s"${PagesGen.host("external-only")}/start"
    val (_, m) = doCrawl(seed)
    assert(m == Map(seed -> crawled(el = Seq(s"$X/another"))))
  }

  test("follows_redirects (crawler.rs:623-656)") {
    val h = PagesGen.host("redirect-target")
    val (_, m) = doCrawl(s"$h/redirect")
    assert(m == Map(
      s"$h/redirect" -> R("Redirect", status = Some(302), location = Some(s"$h/target")),
      s"$h/target" -> crawled(el = Seq(s"$X/another"))))
  }

  test("crawls_multiple_pages (crawler.rs:658-680)") {
    val h = PagesGen.host("multi-links")
    val (run, m) = doCrawl(s"$h/start")
    assert(m == Map(
      s"$h/start" -> crawled(il = Seq(s"$h/link1", s"$h/link2")),
      s"$h/link1" -> crawled(),
      s"$h/link2" -> crawled()))
    assert(run.status.map(_.fetched).sum == 3)
  }

  test("handles_cycles (crawler.rs:682-704)") {
    val h = PagesGen.host("cycle")
    val (run, m) = doCrawl(s"$h/start")
    assert(m == Map(
      s"$h/start" -> crawled(il = Seq(s"$h/link1")),
      s"$h/link1" -> crawled(il = Seq(s"$h/link2")),
      s"$h/link2" -> crawled(il = Seq(s"$h/start"))))
    assert(run.status.map(_.fetched).sum == 3) // each fetched exactly once
  }

  test("handles_parallel_cycles (crawler.rs:706-735)") {
    val h = PagesGen.host("parallel-cycle")
    val (run, m) = doCrawl(s"$h/start")
    assert(m(s"$h/start") == crawled(il = Seq(s"$h/link1", s"$h/link2")))
    assert(m(s"$h/link1") == crawled(il = Seq(s"$h/start", s"$h/link2")))
    assert(m(s"$h/link2") == crawled(il = Seq(s"$h/start", s"$h/link1")))
    assert(run.status.map(_.fetched).sum == 3)
  }

  test("doesnt_follow_external_redirects (crawler.rs:737-757)") {
    val h = PagesGen.host("external-redirect")
    val (_, m) = doCrawl(s"$h/redirect")
    assert(m == Map(
      s"$h/redirect" -> R("Redirect", status = Some(302), location = Some(s"$X/target"))))
  }

  test("dont_revisit_after_redirect (crawler.rs:759-790)") {
    val h = PagesGen.host("redirect-no-revisit")
    val (run, m) = doCrawl(s"$h/start")
    assert(m == Map(
      s"$h/start" -> crawled(il = Seq(s"$h/redirect")),
      s"$h/redirect" -> R("Redirect", status = Some(302), location = Some(s"$h/start"))))
    assert(run.status.map(_.fetched).sum == 2) // start fetched once
  }

  test("dont_revisit_if_found_from_redirect (crawler.rs:792-826)") {
    val h = PagesGen.host("redirect-found-first")
    val (run, m) = doCrawl(s"$h/redirect")
    assert(m == Map(
      s"$h/redirect" -> R("Redirect", status = Some(302), location = Some(s"$h/target")),
      s"$h/target" -> crawled(il = Seq(s"$h/back")),
      s"$h/back" -> crawled(il = Seq(s"$h/target"))))
    assert(run.status.map(_.fetched).sum == 3)
  }

  test("fragments: queue key stripped, recorded links keep fragments (crawler.rs:828-850)") {
    val h = PagesGen.host("fragments")
    val (run, m) = doCrawl(s"$h/page")
    assert(m == Map(
      s"$h/page" -> crawled(il = Seq(s"$h/page#link1", s"$h/page#link2"))))
    assert(run.status.map(_.fetched).sum == 1) // page fetched exactly once
  }

  test("reports_other_content (crawler.rs:852-866)") {
    val seed = s"${PagesGen.host("non-html")}/thing.pdf"
    val (_, m) = doCrawl(seed)
    assert(m == Map(seed -> R("OtherContent", ct = Some("x-application/pdf"))))
  }

  test("excludes_urls_disallowed_by_robots_txt (crawler.rs:868-894; integration.rs:119-197)") {
    val h = PagesGen.host("robots-excluded")
    val (run, m) = doCrawl(s"$h/start")
    assert(m == Map(
      s"$h/start" -> crawled(il = Seq(s"$h/disallowed"), el = Seq(s"$X/another")),
      s"$h/disallowed" -> R("ExcludedByRobotsTxt")))
    // the disallowed page is never fetched (zero hits): only /start was fetched
    assert(run.status.map(_.fetched).sum == 1)
    assert(run.status.map(_.robotsDenied).sum == 1)
  }

  // ---- integration.rs tests not covered above -------------------------------

  test("relative_redirects (integration.rs:59-85)") {
    val seed = "http://127.0.0.1:8001/start"
    val (_, m) = doCrawl(seed)
    // Location "/next" resolved against the request url (http_client.rs:83);
    // same-domain via the None==None IP quirk → followed → absent row → Error
    assert(m(seed) == R("Redirect", status = Some(301), location = Some("http://127.0.0.1:8001/next")))
    assert(m("http://127.0.0.1:8001/next") == R("Error", err = Some("Connection failed")))
  }

  test("collected_things — full golden result (integration.rs:207-330)") {
    val h = "http://127.0.0.1:8000"
    val (run, m) = doCrawl(s"$h/start")
    assert(m.keySet == Set(s"$h/start", s"$h/another", s"$h/third", s"$h/pdf",
      s"$h/redirect", s"$h/relative"))
    // exact document order of start's links (integration.rs:306-315)
    assert(m(s"$h/start") == crawled(
      il = Seq(s"$h/another", s"$h/third", s"$h/pdf", s"$h/redirect", s"$h/relative"),
      el = Seq(s"$X/another")))
    assert(m(s"$h/another") == crawled(il = Seq(s"$h/third")))
    assert(m(s"$h/third") == crawled(il = Seq(s"$h/relative")))
    assert(m(s"$h/relative") == crawled(il = Seq(s"$h/third")))
    assert(m(s"$h/pdf") == R("OtherContent", ct = Some("x-application/something")))
    assert(m(s"$h/redirect") == R("Redirect", status = Some(301), location = Some(s"$h/start")))
    // every url fetched exactly once (integration.rs:324-329)
    assert(run.status.map(_.fetched).sum == 6)
    assert(run.count(s"$h/start") == 6)
    // /list projection (api.rs:145-163)
    assert(run.list(s"$h/start").collect().map(_.getString(0)).toSet == m.keySet)
  }

  // ---- classification edge cases (http_client.rs gaps) ----------------------

  test("no content type on OK response (http_client.rs:69-70)") {
    val seed = s"${PagesGen.host("no-content-type")}/start"
    val (_, m) = doCrawl(seed)
    assert(m == Map(seed -> R("Error", err = Some("No content type on OK response"))))
  }

  test("unparseable mime type (http_client.rs:72)") {
    val seed = s"${PagesGen.host("bad-mime")}/start"
    val (_, m) = doCrawl(seed)
    assert(m(seed).t == "Error")
    assert(m(seed).err.get.startsWith("invalid mime type"))
  }

  test("redirect without Location header (http_client.rs:83-85)") {
    val seed = s"${PagesGen.host("no-location")}/start"
    val (_, m) = doCrawl(seed)
    assert(m == Map(seed -> R("Error", err = Some("No Location header on redirect"))))
  }

  // ---- robots edge semantics -------------------------------------------------

  test("seed itself excluded by robots: zero fetches") {
    val seed = s"${PagesGen.host("robots-seed-excluded")}/start"
    val (run, m) = doCrawl(seed)
    assert(m == Map(seed -> R("ExcludedByRobotsTxt")))
    assert(run.status.map(_.fetched).sum == 0)
  }

  test("non-404 robots failure fails the whole crawl (http_client.rs:96-105)") {
    val seed = s"${PagesGen.host("robots-failure")}/start"
    val run = new CrawlEngine(spark, pages).crawl(seed)
    assert(run.failures(seed) == "Got status 500 for robots.txt")
    intercept[CrawlEngine.CrawlFailedException] { run.resultFor(seed) }
  }

  test("invalid seed url fails fast (api.rs:40-49)") {
    intercept[IllegalArgumentException] {
      new CrawlEngine(spark, pages).crawl("not a url")
    }
  }

  // ---- engine-specific: counters, bloom, politeness, multi-seed, resume, json

  test("per-round counters (crawler.rs:369-382 /status analogue)") {
    val h = PagesGen.host("cycle")
    val (run, _) = doCrawl(s"$h/start")
    val rs = run.status
    assert(rs.map(_.fetched) == Vector(1, 1, 1))
    assert(rs.last.done == 3)
    assert(rs.last.todo == 0)
    assert(rs.map(_.deduped).sum == 1) // link2 → start rediscovered once
  }

  test("bloom pre-filter path produces identical results") {
    val h = "http://127.0.0.1:8000"
    val cfg = CrawlConfig(bloomMinSeen = 0, bloomExpectedInsertions = 1000)
    val (run, m) = doCrawl(s"$h/start", cfg)
    val (_, m2) = doCrawl(s"$h/start")
    assert(m == m2)
    assert(run.status.map(_.fetched).sum == 6)
  }

  test("distributed Bloom path (treeAggregate merge) produces identical results") {
    val h = "http://127.0.0.1:8000"
    // bloomDistributedMinRows = 0 forces every filter insert through the
    // per-partition build + treeAggregate merge (the 10^10-frontier path)
    val cfg = CrawlConfig(bloomMinSeen = 0, bloomExpectedInsertions = 1000,
      bloomDistributedMinRows = 0)
    val (run, m) = doCrawl(s"$h/start", cfg)
    val (_, m2) = doCrawl(s"$h/start")
    assert(m == m2)
    assert(run.status.map(_.fetched).sum == 6) // exactly-once preserved
  }

  test("cuckoo seen filter (driver and treeAggregate paths) produces identical results") {
    val h = "http://127.0.0.1:8000"
    val (_, golden) = doCrawl(s"$h/start")
    val (run, m) = doCrawl(s"$h/start",
      CrawlConfig(seenFilterKind = "cuckoo", bloomMinSeen = 0, bloomExpectedInsertions = 1000))
    assert(m == golden)
    assert(run.status.map(_.fetched).sum == 6)
    val (run2, m2) = doCrawl(s"$h/start",
      CrawlConfig(seenFilterKind = "cuckoo", bloomMinSeen = 0, bloomExpectedInsertions = 1000,
        bloomDistributedMinRows = 0))
    assert(m2 == golden)
    assert(run2.status.map(_.fetched).sum == 6) // exactly-once preserved
  }

  test("politeness: per-host budget defers, result unchanged") {
    val h = PagesGen.host("multi-links")
    val cfg = CrawlConfig(perHostBudgetPerRound = 1)
    val (run, m) = doCrawl(s"$h/start", cfg)
    val (_, m2) = doCrawl(s"$h/start")
    assert(m == m2)
    assert(run.status.map(_.deferred).sum >= 1) // link2 deferred one round
    assert(run.status.length == 3)              // one extra round paid
  }

  test("priority score reorders fetches within the politeness budget, same final set") {
    val h = PagesGen.host("multi-links")
    val seed = s"$h/start"
    // budget 1/host/round: round 2 fetches exactly one of link1/link2
    def fetchedInRound2(cfg: CrawlConfig): Set[String] = {
      val dir = java.nio.file.Files.createTempDirectory("graft-prio-").toString
      val run = new CrawlEngine(spark, pages, cfg, dir).crawl(seed)
      val r2 = graft.sources.TableIO.readSnapshot(dir, 2)
      val urls = spark.read.parquet(r2.tables("results_inc"))
        .filter(col("result_type") =!= "ExcludedByRobotsTxt")
        .select("url").collect().map(_.getString(0)).toSet
      assert(collectMap(run, seed).keySet == Set(seed, s"$h/link1", s"$h/link2"))
      urls
    }
    // default order: shallowest depth then url asc → link1 first
    assert(fetchedInRound2(CrawlConfig(perHostBudgetPerRound = 1)) == Set(s"$h/link1"))
    // score expression flips the order: rank url descending → link2 first;
    // the FINAL crawl set is unchanged (priority affects scheduling only)
    assert(fetchedInRound2(CrawlConfig(perHostBudgetPerRound = 1,
      priorityScore = Some("url"))) == Set(s"$h/link2"))
  }

  test("politeness: robots Crawl-delay shrinks the budget") {
    val h = PagesGen.host("politeness")
    // crawl-delay 10s, round represents 10s → budget 1 fetch/host/round
    val cfg = CrawlConfig(roundSeconds = 10.0)
    val (run, m) = doCrawl(s"$h/start", cfg)
    assert(m.keySet == Set(s"$h/start", s"$h/a", s"$h/b"))
    assert(run.status.map(_.deferred).sum >= 1)
    val (_, m2) = doCrawl(s"$h/start") // default: generous budget, same result
    assert(m == m2)
  }

  test("multi-seed job equals per-seed crawls") {
    val s1 = s"${PagesGen.host("cycle")}/start"
    val s2 = s"${PagesGen.host("multi-links")}/start"
    val run = new CrawlEngine(spark, pages).crawlAll(Seq(s1, s2))
    val m1 = collectMap(run, s1)
    val m2 = collectMap(run, s2)
    val (_, e1) = doCrawl(s1)
    val (_, e2) = doCrawl(s2)
    assert(m1 == e1)
    assert(m2 == e2)
  }

  test("resume from checkpoint reproduces the exact final state (north rule St4)") {
    val h = "http://127.0.0.1:8000"
    val seed = s"$h/start"
    val dir = java.nio.file.Files.createTempDirectory("graft-resume-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir).crawl(seed)
    val expected = collectMap(run, seed)
    val lastRound = run.lastRound
    assert(lastRound >= 2)
    // simulate a kill after round 1's commit: delete every later round
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala.toList.foreach { p =>
      val name = p.getFileName.toString
      val round =
        if (name.startsWith("manifest-r")) Some(name.stripPrefix("manifest-r").stripSuffix(".json").toInt)
        else if (name.startsWith("r") && name.drop(1).forall(_.isDigit)) Some(name.drop(1).toInt)
        else None
      if (round.exists(_ > 1)) {
        // recursive delete
        Files.walk(p).iterator().asScala.toList.reverse.foreach(Files.delete)
      }
    }
    val resumed = new CrawlEngine(spark, pages, CrawlConfig(), dir).resume()
    assert(resumed.lastRound == lastRound)
    assert(collectMap(resumed, seed) == expected)
  }

  test("resume after a crash MID-commit: orphan temp manifest and data never count as a commit") {
    // The TableIO commit contract is write-data-first, write-temp-manifest,
    // ATOMIC-rename-manifest-last. A crash between the data write and the
    // rename leaves round data + a .tmp manifest but NO committed manifest;
    // latestRound must ignore both and resume must reproduce the exact
    // final state (the interrupted round is re-run and its data overwritten).
    val seed = "http://127.0.0.1:8000/start"
    val dir = java.nio.file.Files.createTempDirectory("graft-midcommit-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir).crawl(seed)
    val expected = collectMap(run, seed)
    val lastRound = run.lastRound
    assert(lastRound >= 2)
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val orphanJson = Files.readString(Paths.get(dir, "manifest-r00002.json"))
    Files.list(Paths.get(dir)).iterator().asScala.toList.foreach { p =>
      val name = p.getFileName.toString
      val manifestRound =
        if (name.startsWith("manifest-r")) Some(name.stripPrefix("manifest-r").stripSuffix(".json").toInt)
        else None
      val dataRound =
        if (name.startsWith("r") && name.drop(1).forall(_.isDigit)) Some(name.drop(1).toInt)
        else None
      // committed manifests from round 2 on are gone; round-2 DATA stays on
      // disk (the interrupted write); later data rounds never happened
      if (manifestRound.exists(_ >= 2) || dataRound.exists(_ > 2))
        Files.walk(p).iterator().asScala.toList.reverse.foreach(Files.delete)
    }
    Files.writeString(Paths.get(dir, ".manifest-r00002.json.tmp"), orphanJson)
    assert(graft.sources.TableIO.latestRound(dir).contains(1),
      "a temp manifest from an interrupted commit must not count as a commit")
    val resumed = new CrawlEngine(spark, pages, CrawlConfig(), dir).resume()
    assert(resumed.lastRound == lastRound)
    assert(collectMap(resumed, seed) == expected)
    // the re-run round committed over the orphan: manifest now real
    assert(graft.sources.TableIO.latestRound(dir).contains(lastRound))
  }

  test("compaction: consolidated span reads identically; resume unaffected") {
    val seed = "http://127.0.0.1:8000/start"
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir).crawl(seed)
    val expected = collectMap(run, seed)
    assert(run.lastRound >= 2)
    val entry = graft.sources.TableIO.compact(spark, dir, "results_inc", targetPartitions = 2)
    assert(entry.from == 0 && entry.to == run.lastRound)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(entry.path)))
    // reads resolve through the compacted span — byte-identical result set
    assert(collectMap(run, seed) == expected)
    // re-compacting to the same round is a no-op returning the standing entry
    assert(graft.sources.TableIO.compact(spark, dir, "results_inc") == entry)
    // an orphaned compact dir from a crashed compaction (data written,
    // pointer swap never happened) must not perturb reads
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "compact-results_inc-r99999"))
    assert(collectMap(run, seed) == expected)
    // the cumulative seen set compacts too, and resume still works
    graft.sources.TableIO.compact(spark, dir, "seen_inc", targetPartitions = 1)
    val resumed = new CrawlEngine(spark, pages, CrawlConfig(), dir).resume()
    assert(resumed.lastRound == run.lastRound)
    assert(collectMap(resumed, seed) == expected)
  }

  test("incremental compaction: spans fold only the new rounds; major merge supersedes") {
    val seed = "http://127.0.0.1:8000/start"
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-inc-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir).crawl(seed)
    val expected = collectMap(run, seed)
    assert(run.lastRound >= 2)
    val io = graft.sources.TableIO
    // first incremental span covers [0, 1] (nothing stands yet)
    val s1 = io.compact(spark, dir, "results_inc", upToRound = 1,
      targetPartitions = 1, incremental = true)
    assert(s1.from == 0 && s1.to == 1)
    assert(collectMap(run, seed) == expected)
    // second incremental span folds ONLY the tail [2, last]
    val s2 = io.compact(spark, dir, "results_inc",
      targetPartitions = 1, incremental = true)
    assert(s2.from == 2 && s2.to == run.lastRound)
    assert(io.readCompactions(dir).count(_.table == "results_inc") == 2)
    assert(collectMap(run, seed) == expected)
    // fully-covered table: another incremental call is a no-op on the span set
    assert(io.compact(spark, dir, "results_inc", incremental = true) == s2)
    // major compaction merges both spans into one [0, last] and supersedes;
    // expire reclaims the old span dirs and the per-round dirs
    val full = io.compact(spark, dir, "results_inc",
      targetPartitions = 1, expire = true)
    assert(full.from == 0 && full.to == run.lastRound)
    assert(io.readCompactions(dir).filter(_.table == "results_inc") == Seq(full))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s1.path)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s2.path)))
    assert(collectMap(run, seed) == expected)
  }

  test("compaction expire reclaims the per-round dirs; reads stay exact") {
    val seed = s"${PagesGen.host("cycle")}/start"
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-exp-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir).crawl(seed)
    val expected = collectMap(run, seed)
    graft.sources.TableIO.compact(spark, dir, "results_inc",
      targetPartitions = 1, expire = true)
    val leftover = (0 to run.lastRound)
      .map(r => java.nio.file.Paths.get(dir, f"r$r%05d", "results_inc"))
      .filter(java.nio.file.Files.exists(_))
    assert(leftover.isEmpty, s"expire left per-round dirs: $leftover")
    assert(collectMap(run, seed) == expected)
  }

  test("resume preserves failed seeds: CrawlFailedException survives the restart") {
    val bad = s"${PagesGen.host("robots-failure")}/start"
    val good = s"${PagesGen.host("cycle")}/start"
    val dir = java.nio.file.Files.createTempDirectory("graft-resume-fail-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir).crawlAll(Seq(bad, good))
    assert(run.failures(bad) == "Got status 500 for robots.txt")
    val expectedGood = collectMap(run, good)
    // resume from the completed checkpoint: failures must be restored from
    // the round-0 manifest, not silently dropped (crawler.rs:356-361 parity)
    val resumed = new CrawlEngine(spark, pages, CrawlConfig(), dir).resume()
    assert(resumed.failures(bad) == "Got status 500 for robots.txt")
    intercept[CrawlEngine.CrawlFailedException] { resumed.resultFor(bad) }
    assert(collectMap(resumed, good) == expectedGood)
  }

  test("catalog swap: the engine runs unchanged on an in-memory TableCatalog") {
    val seed = "http://127.0.0.1:8000/start"
    val cat = new graft.sources.InMemoryCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft-memcat-").toString
    val run = new CrawlEngine(spark, pages, CrawlConfig(), dir, cat).crawl(seed)
    val viaMem = collectMap(run, seed)
    val (parquetRun, viaParquet) = doCrawl(seed)
    assert(viaMem == viaParquet)
    assert(run.status == parquetRun.status)
    // the catalog owned ALL storage: nothing ever landed under the dir
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala.toList
    assert(files.isEmpty, s"engine bypassed the catalog: $files")
    // in-process resume reads the in-memory snapshots
    val resumed = new CrawlEngine(spark, pages, CrawlConfig(), dir, cat).resume()
    assert(collectMap(resumed, seed) == viaMem)
  }

  test("robots prefetch is ONE Spark job regardless of seed count (resume path)") {
    // 100 robots urls through the shared batched lookup: a per-seed
    // filter+collect would issue 100 jobs; the isin scan issues exactly one.
    // Pages go through parquet so the lookup is a REAL scan (a LocalRelation
    // would be folded driver-side and prove nothing).
    val pdir = java.nio.file.Files.createTempDirectory("graft-robots-batch-").toString
    pages.write.mode("overwrite").parquet(pdir)
    val filePages = spark.read.parquet(pdir)
    filePages.count() // warm the file index so listing jobs don't count below
    val engine = new CrawlEngine(spark, filePages)
    val robotsUrls = (0 until 100).map(i => s"https://host$i.example.com/robots.txt") :+
      s"${PagesGen.host("robots-excluded")}/robots.txt"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val m = engine.robotsBytesFor(robotsUrls)
      // the one fixture robots row comes back; the 100 absent hosts don't
      assert(m.keySet == Set(s"${PagesGen.host("robots-excluded")}/robots.txt"))
      // listener bus is async — poll until the job event lands
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(200) // grace period: any extra jobs would land here
      assert(jobs.get() == 1, s"expected one lookup job, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("fragment seed: fetched via the stripped url, recorded under the original") {
    // reqwest never sends fragments on the wire; the reference's seen set
    // still keys the fragment form, so /start is later fetched again plain
    val h = PagesGen.host("cycle")
    val (run, m) = doCrawl(s"$h/start#frag")
    assert(m.keySet == Set(s"$h/start#frag", s"$h/link1", s"$h/link2", s"$h/start"))
    assert(m(s"$h/start#frag") == crawled(il = Seq(s"$h/link1")))
    assert(m(s"$h/start") == crawled(il = Seq(s"$h/link1")))
    assert(run.status.map(_.fetched).sum == 4)
  }

  test("JSON export shape (serializers.rs; api.rs:303)") {
    val h = PagesGen.host("robots-excluded")
    val (run, _) = doCrawl(s"$h/start")
    val json = run.toJson(s"$h/start")
    assert(json.contains(""""pages""""))
    assert(json.contains(s""""$h/disallowed": "ExcludedByRobotsTxt""""))
    assert(json.contains(""""Crawled": {"internal_links": ["""))
    val h2 = PagesGen.host("server-error")
    val (run2, _) = doCrawl(s"$h2/start")
    assert(run2.toJson(s"$h2/start").contains(
      s""""$h2/start": {"ServerFailure": {"status": 500, "body": "Internal server error"}}"""))
  }

  test("end to end: entity-decoded hrefs and non-ASCII bodies flow through the engine") {
    import spark.implicits._
    // a page whose links need charref decoding (&amp; and a named entity in
    // the query) and whose body text is non-ASCII UTF-8 — exercises
    // tokenizer entity decode → WHATWG join/percent-encode → fetch-join key
    val h = "https://entities.example.com"
    val body =
      s"""<html><body>Bücher &amp; Töne — straße
         |<a href="/x?a&amp;b">one</a>
         |<a href="/y?v=&frac12;">two</a>
         |</body></html>""".stripMargin
    val rows = Seq(
      PagesGen.mkRow(s"$h/start", PagesGen.okHtmlUtf8(body), 0L),
      // the decoded+encoded forms must be the stored urls for the fetch to hit
      PagesGen.mkRow(s"$h/x?a&b", PagesGen.okHtmlUtf8(PagesGen.htmlWithLinks(Seq.empty)), 1L),
      PagesGen.mkRow(s"$h/y?v=%C2%BD", PagesGen.okHtmlUtf8(PagesGen.htmlWithLinks(Seq.empty)), 2L))
    val run = new CrawlEngine(spark, spark.createDataset(rows).toDF()).crawl(s"$h/start")
    val m = collectMap(run, s"$h/start")
    assert(m.keySet == Set(s"$h/start", s"$h/x?a&b", s"$h/y?v=%C2%BD"))
    assert(m(s"$h/start").t == "Crawled")
    assert(m(s"$h/x?a&b").t == "Crawled")
    assert(m(s"$h/y?v=%C2%BD").t == "Crawled")
    assert(run.status.map(_.fetched).sum == 3) // all three fetched exactly once
    // the non-ASCII body round-trips byte-identically into the text column
    val text = rows.head.text
    assert(text.contains("Bücher & Töne — straße"))
  }

  test("pinned http_classify oracle rows cover every fixture and match the classifier") {
    // the driver oracle's VALUES are hand-derived from http_client.rs:64-94
    // per fixture; this locks HttpKit to them (and the pin set to the
    // fixture set) so drift fails here first
    import graft.httpkit.HttpKit
    val pinned = SparkEntry.httpClassifyPinned.map(p => p._1 -> p).toMap
    val rows = PagesGen.fixtureRows()
    assert(rows.map(_.url).toSet == pinned.keySet)
    rows.foreach { r =>
      val c = HttpKit.classify(r.url, r.html)
      val (_, kind, status, ct) = pinned(r.url)
      assert(c.kind == kind, s"${r.url}: kind ${c.kind} != pinned $kind")
      assert(c.status == status, s"${r.url}: status ${c.status} != pinned $status")
      assert(c.contentType == ct, s"${r.url}: ct ${c.contentType} != pinned $ct")
    }
  }

  test("latest-snapshot fetch: a multi-capture pages table serves max-warc_ts per url") {
    import spark.implicits._
    val h = PagesGen.host("multi-snapshot")
    val seed = s"$h/start"
    val mp = PagesGen.multiSnapshotFixtures(spark)
    // auto mode detects the duplicate capture and serves the NEWEST body:
    // the crawl follows the new capture's link to /new; the stale capture's
    // /old-only is never discovered (and never fetched — exactly-once)
    val urls = new CrawlEngine(spark, mp).crawl(seed)
      .resultFor(seed).select("url").as[String].collect().toSet
    assert(urls == Set(seed, s"$h/new"), s"got $urls")
    // explicit latest mode skips the probe, same result
    val urls2 = new CrawlEngine(spark, mp, CrawlConfig(snapshotMode = "latest")).crawl(seed)
      .resultFor(seed).select("url").as[String].collect().toSet
    assert(urls2 == urls)
    // a single-capture table under auto takes the zero-aggregation path and
    // crawls identically to the explicit single mode
    val ct = "http://127.0.0.1:8000/start"
    val a = new CrawlEngine(spark, pages).crawl(ct).resultFor(ct).count()
    val b = new CrawlEngine(spark, pages, CrawlConfig(snapshotMode = "single")).crawl(ct)
      .resultFor(ct).count()
    assert(a == 6 && b == 6)
  }

  test("snapshotAsOf: time-travel crawl serves the capture at-or-before the instant") {
    import spark.implicits._
    val h = PagesGen.host("multi-snapshot")
    val seed = s"$h/start"
    val mp = PagesGen.multiSnapshotFixtures(spark)
    // between the two /start captures (2026-01-01T00:00 and +1 day): the
    // OLD capture is the latest visible, so the crawl follows /old-only
    // and never discovers /new
    val urls = new CrawlEngine(spark, mp,
        CrawlConfig(snapshotAsOf = Some("2026-01-01 12:00:00"))).crawl(seed)
      .resultFor(seed).select("url").as[String].collect().toSet
    assert(urls == Set(seed, s"$h/old-only"), s"got $urls")
    // an as-of before ANY capture: the seed itself is absent ≙ fetch error
    val r2 = new CrawlEngine(spark, mp,
        CrawlConfig(snapshotAsOf = Some("2025-12-31 00:00:00"))).crawl(seed)
      .resultFor(seed).select("url", "result_type").as[(String, String)].collect().toSet
    assert(r2 == Set((seed, "Error")), s"got $r2")
    // asOf on a warc_ts-less table is a config error
    intercept[IllegalArgumentException] {
      new CrawlEngine(spark, pages.drop("warc_ts"),
        CrawlConfig(snapshotAsOf = Some("2026-01-01 00:00:00")))
    }
  }

  test("text column invariant: extract_text(html bytes) == text column, byte-identical") {
    import graft.functions.GraftFunctions
    val mismatches = pages
      .withColumn("t2", GraftFunctions.extract_text_http(col("html")))
      .filter(coalesce(col("t2"), lit("")) =!= col("text"))
      .count()
    assert(mismatches == 0)
  }
}

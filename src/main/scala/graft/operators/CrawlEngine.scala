package graft.operators

import graft.htmlkit.HtmlKit
import graft.httpkit.HttpKit
import graft.robotskit.RobotsKit
import graft.sources.TableIO
import graft.urlkit.UrlKit
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.util.sketch.BloomFilter

/**
 * The distributed URL frontier — the Spark-native reimplementation of the
 * reference's crawl fixpoint (/root/reference/src/crawler.rs:332-382,
 * 212-329) per the BASELINE.json north rule.
 *
 * One crawl round ≙ one micro-batch:
 *
 *   frontier_r (host-shard partitioned on disk)
 *     → per-host politeness budget (salted window rank over depth,url
 *       within (seed, host, salt) — a skewed domain splits across salt
 *       buckets; robots Crawl-delay honored; deferred rows stay queued)
 *     → fetch: join against the pages table on url (frontier broadcast to
 *       stream the big table when small; shuffle join + AQE otherwise)
 *     → classify raw HTTP bytes (http_client.rs:64-94 semantics)
 *     → tokenize + extract links in one mapPartitions pass (document order,
 *       duplicates preserved; link_extractor.rs:26-62)
 *     → candidates: fragment-stripped internal links (crawler.rs:276-279)
 *       + same-domain redirect targets, NOT stripped (crawler.rs:297-309)
 *     → intra-round dedup + Bloom-prefiltered anti-join against `seen`
 *       (exactness from the anti-join; the cumulative Bloom filter is fed
 *       from compact xxhash64 key columns and broadcast — it only routes
 *       definitely-new urls around the join; crawler.rs:233-246 / D1)
 *     → robots gate at enqueue time: denied urls recorded as
 *       ExcludedByRobotsTxt, never fetched (crawler.rs:223-243 / P4)
 *     → checkpoint commit (results_r, new-seen increment, frontier_{r+1}
 *       partitioned by host_shard, counters + lineage) via TableIO — kill
 *       between commits resumes exactly from the last committed round
 *   until the frontier is empty  (≙ pages.len()==seen.len(), crawler.rs:342)
 *
 * Crawl identity: the engine runs MANY crawls in one job (`seeds`), the
 * north-star generalization of the reference's one-seed API. Each frontier
 * row carries its `seed`; seen/dedup/robots are scoped per seed exactly as
 * one reference crawl is (crawler.rs:204: per-crawl seen set; :353: robots
 * fetched once for the seed's host).
 */
final case class CrawlConfig(
    userAgent: String = "MikesCrawler",
    /** per-host fetches per round before politeness defers (Int.MaxValue = off) */
    perHostBudgetPerRound: Int = Int.MaxValue,
    /** wall-clock seconds a round "represents" for Crawl-delay budgeting */
    roundSeconds: Double = 30.0,
    maxRounds: Int = 10000,
    bloomExpectedInsertions: Long = 4L * 1000 * 1000,
    bloomFpp: Double = 0.01,
    /** below this many seen urls the Bloom pre-filter isn't worth building */
    bloomMinSeen: Long = 10000L,
    /** increment row count at which Bloom maintenance switches from a
      * driver-side collect of key hashes to a per-partition BloomFilter
      * build merged via treeAggregate (the 10^10-frontier scale path: the
      * fixed per-task filter cost amortizes over millions of rows per task,
      * and the driver never materializes the hash column) */
    bloomDistributedMinRows: Long = 4L * 1000 * 1000,
    /** which approximate seen pre-filter to maintain: "bloom" (insert-only,
      * space-optimal at the configured fpp) or "cuckoo" (deletable, 16-bit
      * fingerprints → ~1.2e-4 FPR, ~3.5× the bits; north rule names both).
      * The bloom* sizing fields apply to either; cuckoo ignores bloomFpp. */
    seenFilterKind: String = "bloom",
    /** >0: maintain `seen` as a (seed, url)-bucketed managed table so the
      * per-round anti-join never re-shuffles the cumulative seen side —
      * the shuffle that dominates once seen ≫ round size (the 10^10-URL
      * scale path; with real Iceberg this is the table's bucket spec).
      * 0 = read seen straight from the committed parquet increments and
      * let the join shuffle it (fine while seen is round-sized). */
    seenBuckets: Int = 0,
    /** Frontier row-count under which the fetch join broadcasts the
      * frontier. Scale-dependent (guide §3.1): broadcasting saves any
      * shuffle of the pages side — decisive on a cluster where the pages
      * table is the 100 TB side — but the broadcast relation itself costs
      * rows×~120 B built serially on the driver and resident on every
      * executor. Measured on this single-box bench: a 1.4M-row frontier
      * broadcast (~170 MB relation) made the big crawl rounds 30-40%
      * slower than the shuffle join (round 6: 8.0-10.4 s → 5.8-6.5 s;
      * whole crawl 26-35 s → 22-31 s), so the local default caps the
      * broadcast near the conventional tens-of-MB relation size.
      * Production clusters should raise it (env override
      * SPARK_GRAFT_FRONTIER_BCAST_MAX) to whatever relation size their
      * executors comfortably hold, because the alternative there is
      * re-shuffling a table orders of magnitude larger than any frontier. */
    broadcastFrontierMaxRows: Long =
      sys.env.get("SPARK_GRAFT_FRONTIER_BCAST_MAX").map(_.toLong)
        .getOrElse(200L * 1000),
    /** host-hash shards for frontier partition lineage (north rule) */
    numShards: Int = 32,
    /** salt buckets splitting a skewed host inside the politeness window */
    saltBuckets: Int = 4,
    /** optional SQL expression over the frontier columns (seed, url, host,
      * depth) scored DESCENDING ahead of the default (depth, url) order in
      * the politeness priority window — the north-star "window rank over
      * depth/score within host partitions". Only observable under a
      * politeness budget (without one every frontier row is fetched this
      * round anyway). Example: "1.0 / (depth + 1)" or "-char_length(url)". */
    priorityScore: Option[String] = None,
    /** How a multi-capture pages table (several `warc_ts` snapshots per
      * url — the Common-Crawl shape the input contract allows) resolves to
      * ONE fetched body per url:
      *  - "auto" (default): one cheap url-pruned count-vs-distinct probe
      *    per crawl decides; single-capture tables (the common case, and
      *    every bench graph) pay ZERO per-round cost;
      *  - "latest": always reduce to the max-warc_ts capture (one
      *    url-keyed max_by aggregation folded into the fetch side);
      *  - "single": trust the table to be one-row-per-url (skip both the
      *    probe and the aggregation — duplicates, if present, would fan
      *    out the fetch join). */
    snapshotMode: String = "auto",
    /** Crawl "as of" a capture instant (ISO timestamp string, session
      * zone = UTC): captures with `warc_ts` AFTER this instant are
      * invisible — the fetch serves the latest capture AT OR BEFORE it,
      * and a url whose only captures are newer is absent (≙ 404).
      * Time-travel over a Common-Crawl-style multi-capture table;
      * requires a warc_ts column. None (default) = the full table. */
    snapshotAsOf: Option[String] = None
)

final case class RoundCounters(
    round: Int, fetched: Long, discovered: Long, deduped: Long,
    robotsDenied: Long, deferred: Long, done: Long, todo: Long)

object CrawlEngine {
  /** result_type values — serde external tags of PageResult (crawler.rs:30-79). */
  val ServerFailure = "ServerFailure"
  val Error = "Error"
  val Redirect = "Redirect"
  val Crawled = "Crawled"
  val OtherContent = "OtherContent"
  val Excluded = "ExcludedByRobotsTxt"

  private[operators] final case class FrontierRow(seed: String, url: String, host: String, depth: Int, host_shard: Int)
  private[operators] final case class StepIn(seed: String, url: String, host: String, depth: Int, html: Array[Byte])
  private[operators] final case class StepOut(
      seed: String, url: String, depth: Int,
      result_type: String, status: Option[Int], body: Option[String],
      location: Option[String], content_type: Option[String], error: Option[String],
      internal_links: Option[Seq[String]], external_links: Option[Seq[String]],
      candidates: Seq[String])

  /** Pure per-url step (crawler.rs:261-329), minus the robots gate which is
    * applied to candidates after dedup, as the reference's add_link does. */
  private[operators] def step(in: StepIn): StepOut = {
    val c = HttpKit.classify(in.url, in.html)
    c.kind match {
      case HttpKit.Kind.Html =>
        val links = HtmlKit.extractLinksStr(in.url, c.body.getOrElse(""))
        val internal = links.filter(_.internal).map(_.url)
        val external = links.filterNot(_.internal).map(_.url)
        // enqueue-keys: fragment-stripped internal links (crawler.rs:276-279);
        // the recorded arrays keep their fragments
        val candidates = internal.map(UrlKit.stripFragmentStr)
        StepOut(in.seed, in.url, in.depth, Crawled, None, None, None, None, None,
          Some(internal), Some(external), candidates)
      case HttpKit.Kind.Redirect =>
        val target = c.location.get
        // follow only same-domain redirects — null-safe domain equality
        // including the None==None IP quirk (crawler.rs:299-302)
        val follow = UrlKit.sameDomain(in.url, target)
        StepOut(in.seed, in.url, in.depth, Redirect, c.status, None, Some(target), None, None,
          None, None, if (follow) Seq(target) else Seq.empty)
      case HttpKit.Kind.Other =>
        StepOut(in.seed, in.url, in.depth, OtherContent, None, None, None, c.contentType, None,
          None, None, Seq.empty)
      case HttpKit.Kind.Failure =>
        StepOut(in.seed, in.url, in.depth, ServerFailure, c.status, c.body, None, None, None,
          None, None, Seq.empty)
      case _ =>
        StepOut(in.seed, in.url, in.depth, Error, None, None, None, None, c.error,
          None, None, Seq.empty)
    }
  }

  private def hostOf(url: String): String = UrlKit.hostPortStr(url)

  private[operators] def hostShardOf(host: String, numShards: Int): Int = {
    val h = graft.textkit.TextKit.fnv64(host)
    (((h % numShards) + numShards) % numShards).toInt
  }

  final class CrawlFailedException(val seed: String, msg: String) extends RuntimeException(msg)
}

final class CrawlEngine(
    spark: SparkSession,
    pages: DataFrame,
    cfg: CrawlConfig = CrawlConfig(),
    checkpointDir: String = null,
    // the storage boundary: every commit/read goes through this (driver-
    // side only, hence transient); swap for a real catalog without
    // touching the engine
    @transient private val catalog: graft.sources.TableCatalog = TableIO
) extends Serializable {
  import CrawlEngine._
  import spark.implicits._

  private val ckptDir: String = Option(checkpointDir).getOrElse {
    java.nio.file.Files.createTempDirectory("graft-crawl-").toString
  }

  require(Set("auto", "latest", "single")(cfg.snapshotMode),
    s"snapshotMode must be auto|latest|single, got ${cfg.snapshotMode}")

  private val hasWarcTs = pages.columns.contains("warc_ts")

  require(cfg.snapshotAsOf.isEmpty || hasWarcTs,
    "snapshotAsOf requires the pages table to carry a warc_ts column")

  /** The pages table at the configured capture horizon. The filter sits
    * directly on the scan (predicate pushdown; partition-prunes when the
    * table is partitioned on warc_ts), so every downstream path — the
    * capture probe, the fetch join, robots lookups — sees one consistent
    * time-travel view. */
  private val pagesAt: DataFrame = cfg.snapshotAsOf match {
    case Some(t) => pages.filter(col("warc_ts") <= to_timestamp(lit(t)))
    case None    => pages
  }

  /** Does the table hold several captures of some url? Resolved once per
    * engine ("auto": a url-column-pruned count-vs-distinct probe — two
    * cheap scan aggregates, amortized over every round of every crawl). */
  private lazy val multiCapture: Boolean = cfg.snapshotMode match {
    case "single" => false
    case "latest" => hasWarcTs
    case _ =>
      hasWarcTs && {
        val r = pagesAt.agg(count(lit(1)).as("n"), countDistinct(col("url")).as("d")).head()
        r.getLong(0) != r.getLong(1)
      }
  }

  // explicit column pruning: the fetch join only ever needs (url, html) —
  // plus warc_ts when the table is multi-capture, because latest-capture
  // resolution happens AFTER the frontier join (see resolveLatest in
  // runLoop): aggregating the whole table per round would shuffle 100 TB
  // every round, while the post-join aggregation only ever shuffles
  // frontier-matched rows (frontier-sized × captures-per-url).
  private lazy val pagesSlim: DataFrame =
    if (multiCapture) pagesAt.select(col("url"), col("html"), col("warc_ts"))
    else pagesAt.select(col("url"), col("html"))

  graft.functions.UrlExpressions.registerAll(spark)

  /** One batched lookup for ALL robots.txt urls: a single isin scan /
    * Spark job regardless of seed count (a per-seed filter+collect would
    * issue O(seeds) jobs — round-2 VERDICT #5). Multi-capture robots rows
    * resolve to max-warc_ts DRIVER-side over the collected handful (one
    * row per seed-ish) — no extra Spark job, same latest-snapshot
    * semantics and tie-break as the fetch join. */
  private[graft] def robotsBytesFor(robotsUrls: Seq[String]): Map[String, Array[Byte]] = {
    if (robotsUrls.isEmpty) return Map.empty
    val projected =
      if (hasWarcTs) pagesAt.select(col("url"), col("html"), col("warc_ts"))
      else pagesAt.select(col("url"), col("html"), lit(null).cast("timestamp").as("warc_ts"))
    projected
      .filter(col("url").isin(robotsUrls.distinct: _*))
      .collect()
      .groupBy(_.getString(0))
      .map { case (u, rows) =>
        val best = rows.reduceLeft { (a, b) =>
          val ta = Option(a.getTimestamp(2)).map(_.getTime).getOrElse(Long.MinValue)
          val tb = Option(b.getTimestamp(2)).map(_.getTime).getOrElse(Long.MinValue)
          if (ta != tb) { if (ta > tb) a else b }
          else if (java.util.Arrays.compareUnsigned(
            a.getAs[Array[Byte]](1), b.getAs[Array[Byte]](1)) >= 0) a else b
        }
        u -> best.getAs[Array[Byte]](1)
      }
  }

  /** Reference single-seed API: GET /crawl/{seed} (api.rs:119-135). */
  def crawl(seed: String): CrawlRun = crawlAll(Seq(seed))

  def crawlAll(seedInputs: Seq[String]): CrawlRun = {
    // parse + canonicalize seeds; a bad seed fails fast (api.rs:40-49 → 400)
    val seeds: Seq[graft.urlkit.Url] = seedInputs.map { s =>
      UrlKit.parse(s).fold(
        e => throw new IllegalArgumentException(s"invalid seed url $s: $e"),
        identity)
    }
    val seedStrs = seeds.map(_.serialize)

    // robots prefetch: one lookup per seed against the pages table
    val robotsUrls = seeds.map(s => s.join("/robots.txt").fold(
      e => throw new IllegalArgumentException(s"cannot derive robots url: $e"),
      _.serialize))
    val robotsByUrl: Map[String, Array[Byte]] = robotsBytesFor(robotsUrls)

    var failures = Map.empty[String, String]
    var robotsRules = Map.empty[String, Vector[RobotsKit.Rule]] // seed → effective rules
    var crawlDelays = Map.empty[String, Option[Double]]
    seedStrs.zip(robotsUrls).foreach { case (seed, rUrl) =>
      robotsByUrl.get(rUrl) match {
        case None => // absent row ≙ 404 ≙ no rules (FIXTURES.md contract)
          robotsRules += seed -> Vector.empty
          crawlDelays += seed -> None
        case Some(bytes) =>
          HttpKit.parseResponse(bytes) match {
            case Some(r) if r.status >= 200 && r.status < 300 =>
              val parsed = RobotsKit.parse(r.bodyString, cfg.userAgent)
              robotsRules += seed -> parsed.effectiveRules
              crawlDelays += seed -> parsed.crawlDelay
            case Some(r) if r.status == 404 =>
              robotsRules += seed -> Vector.empty
              crawlDelays += seed -> None
            case Some(r) =>
              failures += seed -> s"Got status ${r.status} for robots.txt"
            case None =>
              failures += seed -> "Malformed robots.txt response"
          }
      }
    }
    val liveSeeds = seedStrs.filterNot(failures.contains)

    // seed add_link (crawler.rs:355 → :233-246): seen-insert + robots gate
    val seedRows = liveSeeds.map { s =>
      val host = hostOf(s)
      FrontierRow(s, s, host, 0, hostShardOf(host, cfg.numShards))
    }
    val (allowedSeeds, deniedSeeds) = seedRows.partition(r =>
      RobotsKit.allowedByRules(robotsRules(r.seed), RobotsKit.pathParamsQuery(r.url)))

    val frontier0 = spark.createDataset(allowedSeeds).toDF()
    val seen0 = spark.createDataset(seedRows.map(r => (r.seed, r.url))).toDF("seed", "url")
    val excluded0 = spark.createDataset(deniedSeeds.map(r =>
      StepOut(r.seed, r.url, 0, Excluded, None, None, None, None, None, None, None, Seq.empty)
    )).drop("candidates", "depth")

    // round 0 commit: seeds only
    val counters0 = RoundCounters(0, 0, seedRows.size, 0, deniedSeeds.size, 0,
      deniedSeeds.size, allowedSeeds.size)
    catalog.commit(spark, ckptDir, 0,
      Map("frontier" -> frontier0, "seen_inc" -> seen0, "results_inc" -> excluded0),
      liveSeeds, countersToMap(counters0),
      partitionBy = Map("frontier" -> Seq("host_shard")),
      failures = failures)

    runLoop(liveSeeds, failures, robotsRules, crawlDelays, startRound = 1)
  }

  /** Resume from the last committed round of `checkpointDir`. */
  def resume(): CrawlRun = {
    val last = catalog.latestRound(ckptDir).getOrElse(
      throw new IllegalStateException(s"no committed rounds under $ckptDir"))
    val snap = catalog.readSnapshot(ckptDir, last)
    val seeds = snap.seeds
    // robots re-derived from the immutable pages table — ONE batched scan
    // for all seeds, exactly like crawlAll (round-2 VERDICT #5)
    var robotsRules = Map.empty[String, Vector[RobotsKit.Rule]]
    var crawlDelays = Map.empty[String, Option[Double]]
    val robotsUrlBySeed: Map[String, String] = seeds.flatMap { seed =>
      UrlKit.parse(seed).toOption.flatMap(_.join("/robots.txt").toOption)
        .map(u => seed -> u.serialize)
    }.toMap
    val robotsByUrl = robotsBytesFor(robotsUrlBySeed.values.toSeq)
    seeds.foreach { seed =>
      val bytes = robotsUrlBySeed.get(seed).flatMap(robotsByUrl.get)
      val parsed = bytes.flatMap(HttpKit.parseResponse).filter(r => r.status >= 200 && r.status < 300)
        .map(r => RobotsKit.parse(r.bodyString, cfg.userAgent))
      robotsRules += seed -> parsed.map(_.effectiveRules).getOrElse(Vector.empty)
      crawlDelays += seed -> parsed.flatMap(_.crawlDelay)
    }
    // failures persisted in the round-0 manifest: a seed whose robots fetch
    // failed keeps raising CrawlFailedException after resume (the 500 path)
    val failures = catalog.readSnapshot(ckptDir, 0).failures
    runLoop(seeds, failures, robotsRules, crawlDelays, startRound = last + 1)
  }

  private def countersToMap(c: RoundCounters): Map[String, Long] = Map(
    "fetched" -> c.fetched, "discovered" -> c.discovered, "deduped" -> c.deduped,
    "robots_denied" -> c.robotsDenied, "deferred" -> c.deferred,
    "done" -> c.done, "todo" -> c.todo)

  private def mapToCounters(round: Int, m: Map[String, Long]): RoundCounters = RoundCounters(
    round, m.getOrElse("fetched", 0), m.getOrElse("discovered", 0), m.getOrElse("deduped", 0),
    m.getOrElse("robots_denied", 0), m.getOrElse("deferred", 0),
    m.getOrElse("done", 0), m.getOrElse("todo", 0))

  private def runLoop(
      seeds: Seq[String],
      failures: Map[String, String],
      robotsRules: Map[String, Vector[RobotsKit.Rule]],
      crawlDelays: Map[String, Option[Double]],
      startRound: Int
  ): CrawlRun = {
    val sc = spark.sparkContext
    val rulesBc = sc.broadcast(robotsRules)

    // per-SEED politeness budget from robots Crawl-delay (north-star; the
    // reference has no delay handling — documented delta)
    val budgetBySeed: Map[String, Int] = seeds.map { s =>
      val fromDelay = crawlDelays.getOrElse(s, None)
        .map(d => math.max(1, (cfg.roundSeconds / math.max(d, 1e-9)).toInt))
        .getOrElse(Int.MaxValue)
      s -> math.min(cfg.perHostBudgetPerRound.toLong, fromDelay.toLong).toInt
    }.toMap
    val anyBudget = budgetBySeed.values.exists(_ != Int.MaxValue)
    val budgetBc = sc.broadcast(budgetBySeed)

    // restore state from the last committed round
    val lastCommitted = startRound - 1
    val lastSnap = catalog.readSnapshot(ckptDir, lastCommitted)
    var frontier = catalog.readTable(spark, lastSnap, "frontier")
    var frontierCount = frontier.count()
    // full seen = union of all committed increments (lazy parquet read:
    // scanned once per round by the anti-join, so no persist)
    def seenIncSnaps(upTo: Int): Seq[TableIO.Snapshot] =
      (0 to upTo).map(r => catalog.readSnapshot(ckptDir, r))
    var seen = catalog.readTables(spark, seenIncSnaps(lastCommitted), "seen_inc")
    var seenCount = seen.count()
    var prevCounters = mapToCounters(lastCommitted, lastSnap.counters)
    var done = prevCounters.done
    var roundsLog = Vector.empty[RoundCounters]

    // Bucketed-seen mode (cfg.seenBuckets > 0): `seen` lives in a managed
    // table bucketed by the anti-join keys, so the cumulative side arrives
    // at every round's anti-join already hash-clustered -- the plan shows
    // ONE Exchange (the round's candidates), never a reshuffle of the
    // 10^10-row seen set. Rebuilt here from the committed increments (which
    // also covers resume), appended after each commit. The parquet
    // increments stay the durable source of truth; the table is a join
    // accelerator, exactly what an Iceberg bucket spec gives for free.
    var seenTable: Option[String] = None
    def seenForJoin: DataFrame = seenTable.map(spark.table).getOrElse(seen)
    try {
    seenTable =
      if (cfg.seenBuckets <= 0) None
      else {
        // name from a SHA-1 of the checkpoint dir: engines on distinct
        // checkpoints can never collide (a 31-bit hashCode could). A
        // checkpoint dir has exactly ONE writer at a time (same contract as
        // the round manifests themselves); concurrent engines on one
        // checkpoint are unsupported and would race on this DROP/rebuild.
        val sha = java.security.MessageDigest.getInstance("SHA-1")
          .digest(ckptDir.getBytes("UTF-8")).take(10).map("%02x".format(_)).mkString
        val name = s"graft_seen_$sha"
        spark.sql(s"DROP TABLE IF EXISTS $name")
        // clean stale files from a previous process (warehouse dir may be a
        // plain path or a URI — don't feed raw paths to the URI parser)
        val whConf = spark.conf.get("spark.sql.warehouse.dir")
        val wh =
          try {
            val u = new java.net.URI(whConf)
            if (u.getScheme != null) java.nio.file.Paths.get(u) else java.nio.file.Paths.get(whConf)
          } catch { case _: Exception => java.nio.file.Paths.get(whConf) }
        val loc = wh.resolve(name)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toList.reverse
            .foreach(java.nio.file.Files.delete)
        }
        seen.select("seed", "url").write.format("parquet")
          .bucketBy(cfg.seenBuckets, "seed", "url").saveAsTable(name)
        Some(name)
      }

    // Cumulative seen filter (Bloom or cuckoo per cfg.seenFilterKind) over
    // (seed, url) keys, rebuilt from seen on entry. Two maintenance paths,
    // gated by cfg.bloomDistributedMinRows:
    //  - small increments: COMPACT 64-bit hashes (xxhash64, computed in the
    //    plan, codegen'd) collected and inserted driver-side -- below the
    //    threshold the fixed per-task cost of shipping filter partials
    //    dominates (measured to anti-scale with core count at sandbox sizes);
    //  - large increments (the 10^10-frontier scale path): per-partition
    //    filter build merged via treeAggregate over the same hash column.
    //    The zero value is null (not an empty multi-MB filter), so nothing
    //    heavy rides the task binaries; partials are created lazily on the
    //    first row of each partition and merged in a 2-level tree, so the
    //    driver receives O(sqrt(P)) partials, not P.
    // Exactness never depends on this: the anti-join against `seen` stays
    // (which is also what makes a full cuckoo filter's degrade-to-maybe
    // overflow contract safe).
    var seenFilter: SeenFilter = null
    val mkFilter = SeenFilter.factory(
      cfg.seenFilterKind, cfg.bloomExpectedInsertions, cfg.bloomFpp)
    def keyHashCol = xxhash64(concat_ws("\u0001", col("seed"), col("url")))
    def filterInsert(df: DataFrame, rowsHint: Long): Unit = {
      if (seenFilter == null) seenFilter = mkFilter()
      val hashes = df.select(keyHashCol.as("h")).as[Long]
      if (rowsHint >= cfg.bloomDistributedMinRows) {
        val mk = mkFilter
        val merged = hashes.rdd.treeAggregate(null: SeenFilter)(
          seqOp = (sf, h) => {
            val b = if (sf == null) mk() else sf
            b.putLong(h)
            b
          },
          combOp = (a, b) =>
            if (a == null) b
            else if (b == null) a
            else { a.mergeInPlace(b); a },
          depth = 2)
        if (merged != null) seenFilter.mergeInPlace(merged)
      } else {
        hashes.collect().foreach(seenFilter.putLong)
      }
    }

    var round = startRound
    var emptyFrontier = frontierCount == 0

    // Optional per-round phase telemetry (SPARK_GRAFT_ROUND_LOG=1): wall
    // seconds spent in each driver-visible phase, to stderr. Used to locate
    // the serial (non-scaling) fraction of a crawl round.
    val roundLog = sys.env.contains("SPARK_GRAFT_ROUND_LOG")
    def tickSec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    while (!emptyFrontier && round < startRound + cfg.maxRounds) {
      val tRound = System.nanoTime()
      sc.setJobDescription(
        s"crawl round=$round seeds=${seeds.size} frontier=$frontierCount seen=$seenCount")
      // ---- politeness: per-host rank within each crawl ----
      val (toFetch, deferred, deferredCount) =
        if (anyBudget) {
          // Salted politeness: a skewed host's frontier rows are split over
          // min(saltBuckets, budget) salt buckets so no single window
          // partition holds a whole heavy domain; per-bucket budgets sum
          // exactly to the host budget (bucket 0 takes the remainder).
          val budgetCol = udf((seed: String) => budgetBc.value.getOrElse(seed, Int.MaxValue))
          val b = budgetCol(col("seed"))
          val saltCount = least(lit(cfg.saltBuckets), b)
          val salted = frontier
            .withColumn("_salt", pmod(xxhash64(col("url")), saltCount).cast("int"))
            .withColumn("_bb", when(col("_salt") === 0,
              b - (saltCount - 1) * (b.cast("long") / saltCount).cast("int"))
              .otherwise((b.cast("long") / saltCount).cast("int")))
          // priority queue: optional score expression ranks first (desc),
          // then the BFS default (shallowest depth, then url) breaks ties
          val order = cfg.priorityScore.map(e => expr(e).desc).toSeq ++
            Seq(col("depth").asc, col("url").asc)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("seed"), col("host"), col("_salt"))
            .orderBy(order: _*)
          val ranked = salted.withColumn("_rk", row_number().over(w))
          val now = ranked.filter(col("_rk") <= col("_bb")).drop("_rk", "_salt", "_bb")
          val later = ranked.filter(col("_rk") > col("_bb")).drop("_rk", "_salt", "_bb")
            .persist(StorageLevel.MEMORY_AND_DISK)
          val dc = later.count()
          (now, later, dc)
        } else (frontier, null.asInstanceOf[DataFrame], 0L)

      // ---- fetch join ----
      // The wire request never carries a fragment (reqwest strips it), so
      // the lookup key is the fragment-stripped url while the row is still
      // recorded under the original url (fragment seeds / redirect targets).
      // Native codegen expression — no UDF boundary on the per-row hot key.
      val toFetchK = toFetch.withColumn("fetch_url",
        graft.functions.UrlExpressions.url_strip_fragment_native(col("url")))
      val pagesK = pagesSlim.withColumnRenamed("url", "fetch_url")
      // Multi-capture resolution AFTER the frontier restriction: max_by
      // (warc_ts, html) grouped on the frontier row identity (seed, url),
      // so the aggregation shuffles only frontier-matched rows — never the
      // pages table. Ties (equal warc_ts) break on the body bytes,
      // deterministically; a null warc_ts capture loses to any timestamped
      // one; an absent row's (null, null) struct keeps html null. On
      // single-capture tables this is the identity — the audited
      // round-plan is unchanged.
      def resolveLatest(df: DataFrame): DataFrame =
        if (!multiCapture) df
        else df.groupBy(col("seed"), col("url"))
          .agg(max(struct(col("warc_ts"), col("html"))).as("_m"),
            first(col("host")).as("host"), first(col("depth")).as("depth"),
            first(col("host_shard")).as("host_shard"),
            first(col("fetch_url")).as("fetch_url"))
          .select(col("seed"), col("url"), col("host"), col("depth"),
            col("host_shard"), col("_m.html").as("html"), col("fetch_url"))
      val matchCols = Seq(col("seed"), col("url"), col("host"), col("depth"),
        col("host_shard"), col("html"), col("fetch_url")) ++
        (if (multiCapture) Seq(col("warc_ts")) else Nil)
      // An outer join can never broadcast its preserved side, so the
      // broadcast-frontier plan is inner-join + tiny anti-join:
      //   matched = pages join broadcast(frontier)   (streams the big table,
      //                                               zero shuffle of pages)
      //   missing = frontier anti broadcast(matched.keys) (absent rows -> Error)
      // Beyond broadcastFrontierMaxRows fall back to a shuffle left-outer
      // join and let AQE pick the physical strategy / split skewed urls.
      var matchedToRelease: DataFrame = null
      val joined =
        if (frontierCount <= cfg.broadcastFrontierMaxRows) {
          val matched = resolveLatest(
              pagesK.join(broadcast(toFetchK), Seq("fetch_url"), "inner")
                .select(matchCols: _*))
            .persist(StorageLevel.MEMORY_AND_DISK)
          matchedToRelease = matched
          val missing = toFetchK
            .join(broadcast(matched.select("fetch_url")), Seq("fetch_url"), "left_anti")
            .withColumn("html", lit(null).cast("binary"))
          matched.drop("fetch_url").unionByName(missing.drop("fetch_url"))
        } else
          resolveLatest(toFetchK.join(pagesK, Seq("fetch_url"), "left_outer"))
            .drop("fetch_url")

      // ---- classify + extract (one pass, reusable per task) ----
      val stepOut = joined
        .select(col("seed"), col("url"), col("host"), col("depth"), col("html"))
        .as[StepIn]
        .mapPartitions(_.map(step))
        .persist(StorageLevel.MEMORY_AND_DISK)

      // Round counters ride the commit writes as Observations — no extra
      // driver jobs per round (north rule: counters per checkpoint).
      val obsCand = org.apache.spark.sql.Observation()
      val obsNew = org.apache.spark.sql.Observation()
      val obsFrontier = org.apache.spark.sql.Observation()

      // ---- candidates -> dedup -> robots gate ----
      // NOTE: observe() must sit ABOVE persist() — an InMemoryTableScan hides
      // CollectMetrics nodes inside the cached plan from downstream queries.
      val candCached = stepOut
        .select(col("seed"), explode(col("candidates")).as("url"), (col("depth") + 1).as("depth"))
        .dropDuplicates("seed", "url")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cand = candCached.observe(obsCand, count(lit(1)).as("n"))

      if (seenFilter == null && seenCount >= cfg.bloomMinSeen) filterInsert(seen, seenCount)
      val newUrlsCached = {
        if (seenFilter != null) {
          val filterBc = sc.broadcast(seenFilter)
          val mightContain = udf((h: Long) => filterBc.value.mightContainLong(h))
          val keyed = cand.withColumn("_h", keyHashCol)
          val maybeSeen = keyed.filter(mightContain(col("_h"))).drop("_h")
          val definitelyNew = keyed.filter(!mightContain(col("_h"))).drop("_h")
          maybeSeen.join(seenForJoin, Seq("seed", "url"), "left_anti").unionByName(definitelyNew)
        } else {
          cand.join(seenForJoin, Seq("seed", "url"), "left_anti")
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)
      val newUrls = newUrlsCached.observe(obsNew, count(lit(1)).as("n"))

      val allowedCol = udf((seed: String, url: String) =>
        RobotsKit.allowedByRules(
          rulesBc.value.getOrElse(seed, Vector.empty), RobotsKit.pathParamsQuery(url)))
      val allowedNew = newUrls.filter(allowedCol(col("seed"), col("url")))
      val deniedNew = newUrls.filter(!allowedCol(col("seed"), col("url")))

      // ---- assemble round outputs ----
      // host + shard are native Catalyst expressions (UrlExpressions):
      // the frontier projection stays inside whole-stage codegen with no
      // Scala-UDF serialization boundary (round-2 VERDICT #7)
      val nextFromNew = allowedNew
        .withColumn("host", graft.functions.UrlExpressions.url_host_port_native(col("url")))
        .withColumn("host_shard",
          graft.functions.UrlExpressions.host_shard_native(col("host"), cfg.numShards))
        .select("seed", "url", "host", "depth", "host_shard")
      // cluster on the partition column BEFORE the partitionBy write
      // (guide §6): a dynamic-partitioned write from a K-partition input
      // otherwise fans out to K×numShards files — measured 4352 frontier
      // files in the 1.4M-url round, which both slows that commit and
      // splinters the NEXT round's frontier scan into thousands of tiny
      // reads. One hash exchange of the (narrow) frontier buys one
      // well-sized file per shard dir.
      val nextFrontier =
        (if (deferred != null) nextFromNew.unionByName(deferred.select("seed", "url", "host", "depth", "host_shard"))
         else nextFromNew)
          .repartition(col("host_shard"))
          .observe(obsFrontier, count(lit(1)).as("n"))

      val resultsRound = stepOut.drop("candidates", "depth").toDF()
        .unionByName(
          deniedNew.select(
            col("seed"), col("url"),
            lit(Excluded).as("result_type"),
            lit(null).cast("int").as("status"),
            lit(null).cast("string").as("body"),
            lit(null).cast("string").as("location"),
            lit(null).cast("string").as("content_type"),
            lit(null).cast("string").as("error"),
            lit(null).cast("array<string>").as("internal_links"),
            lit(null).cast("array<string>").as("external_links")))

      val seenInc = newUrls.select("seed", "url")

      // ---- commit (counters evaluated after the data writes land) ----
      val tPlan = tickSec(tRound) // plan assembly + politeness count job
      var counters: RoundCounters = null
      val fetched = frontierCount - deferredCount
      val tCommit0 = System.nanoTime()
      val snap = catalog.commit(spark, ckptDir, round,
        Map("frontier" -> nextFrontier, "seen_inc" -> seenInc, "results_inc" -> resultsRound),
        seeds, counters = {
          val discovered = obsCand.get("n").asInstanceOf[Long]
          val newCount = obsNew.get("n").asInstanceOf[Long]
          val newFrontierCount = obsFrontier.get("n").asInstanceOf[Long]
          val allowedCount = newFrontierCount - deferredCount
          val deniedCount = newCount - allowedCount
          done += fetched + deniedCount
          val newSeenCount = seenCount + newCount
          counters = RoundCounters(round, fetched, discovered, discovered - newCount,
            deniedCount, deferredCount, done, newSeenCount - done)
          countersToMap(counters)
        }, partitionBy = Map("frontier" -> Seq("host_shard")))
      val newCount = obsNew.get("n").asInstanceOf[Long]
      val newFrontierCount = obsFrontier.get("n").asInstanceOf[Long]
      val tCommit = tickSec(tCommit0)

      // frontier and seen are re-read from the committed parquet: constant-
      // depth, disk-backed lineage regardless of round count (without this
      // the plan tree grows exponentially with rounds)
      val tRead0 = System.nanoTime()
      val committedFrontier = catalog.readTable(spark, snap, "frontier")
      val newSeen = catalog.readTables(spark, seenIncSnaps(round), "seen_inc")
      val tRead = tickSec(tRead0)

      // ---- seen-filter maintenance ----
      val tBloom0 = System.nanoTime()
      if (seenFilter != null && newCount > 0) filterInsert(newUrlsCached.toDF(), newCount)
      val tBloom = tickSec(tBloom0)

      // ---- bucketed-seen maintenance: append the committed increment ----
      val tSeen0 = System.nanoTime()
      if (newCount > 0) seenTable.foreach { name =>
        catalog.readTable(spark, snap, "seen_inc").select("seed", "url")
          .write.format("parquet").mode("append")
          .bucketBy(cfg.seenBuckets, "seed", "url").saveAsTable(name)
      }
      val tSeenApp = tickSec(tSeen0)
      if (roundLog) System.err.println(
        f"[round] r=$round%2d frontier=$frontierCount%8d plan=$tPlan%6.2fs " +
          f"commit=$tCommit%6.2fs read=$tRead%5.2fs bloom=$tBloom%5.2fs " +
          f"seenApp=$tSeenApp%5.2fs total=${tickSec(tRound)}%6.2fs")

      // ---- rotate state ----
      stepOut.unpersist()
      candCached.unpersist()
      newUrlsCached.unpersist()
      if (matchedToRelease != null) matchedToRelease.unpersist()
      if (deferred != null) deferred.unpersist()
      frontier = committedFrontier
      frontierCount = newFrontierCount
      seen = newSeen
      seenCount = seenCount + newCount
      roundsLog :+= counters
      prevCounters = counters
      emptyFrontier = frontierCount == 0
      round += 1
    }

    new CrawlRun(spark, ckptDir, seeds, failures, roundsLog, round - 1, catalog)
    } finally {
      // the bucketed seen table is a join accelerator, not state: drop it
      // (even on a mid-crawl failure, including one during its own build)
      // so crawls never leak warehouse tables — resume rebuilds it from
      // the committed increments. The drop itself must never mask the
      // real failure (e.g. the SparkContext died mid-crawl).
      try seenTable.foreach(name => spark.sql(s"DROP TABLE IF EXISTS $name"))
      catch { case e: Exception =>
        System.err.println(s"[crawl] seen-table cleanup failed (ignored): $e")
      }
    }
  }
}

/** Handle over a finished (or resumed-to-finished) crawl job. */
final class CrawlRun(
    spark: SparkSession,
    val checkpointDir: String,
    val seeds: Seq[String],
    val failures: Map[String, String],
    val rounds: Vector[RoundCounters],
    val lastRound: Int,
    catalog: graft.sources.TableCatalog = TableIO
) {
  import org.apache.spark.sql.functions._

  /** All result rows: (seed, url, result_type, status, body, location,
    * content_type, error, internal_links, external_links). */
  def results: DataFrame = catalog.readTables(spark,
    (0 to lastRound).map(r => catalog.readSnapshot(checkpointDir, r)), "results_inc")

  /** Result rows tagged with the round that produced them — the checkpoint
    * lineage (one committed increment per round) surfaced as data. Under a
    * politeness budget this exposes the fetch SCHEDULE: which round each url
    * was actually fetched in, after deferrals and priority ranking. */
  def resultsByRound: DataFrame =
    (0 to lastRound).map { r =>
      catalog.readTable(spark, catalog.readSnapshot(checkpointDir, r), "results_inc")
        .withColumn("round", lit(r))
    }.reduce(_ unionByName _)

  /** Result of one seed's crawl — the reference CrawlResult (crawler.rs:127-135). */
  def resultFor(seed: String): DataFrame = {
    val canonical = UrlKit.canonicalize(seed).getOrElse(seed)
    if (failures.contains(canonical))
      throw new CrawlEngine.CrawlFailedException(canonical, failures(canonical))
    results.filter(col("seed") === canonical).drop("seed")
  }

  /** GET /crawl/{seed}/list (api.rs:145-163). */
  def list(seed: String): DataFrame = resultFor(seed).select("url")

  /** GET /crawl/{seed}/count (api.rs:171-187). */
  def count(seed: String): Long = resultFor(seed).count()

  /** GET /status analogue: per-round counters (crawler.rs:369-382). */
  def status: Vector[RoundCounters] = rounds

  /** serde-shape JSON of one crawl (serializers.rs / crawler.rs:131-149). */
  def toJson(seed: String): String = {
    val rows = resultFor(seed).collect()
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val entries = rows.map { r =>
      val url = r.getAs[String]("url")
      val v = r.getAs[String]("result_type") match {
        case CrawlEngine.Excluded => q("ExcludedByRobotsTxt")
        case CrawlEngine.OtherContent =>
          s"""{${q("OtherContent")}: ${q(r.getAs[String]("content_type"))}}"""
        case CrawlEngine.Error =>
          s"""{${q("Error")}: ${q(r.getAs[String]("error"))}}"""
        case CrawlEngine.Redirect =>
          s"""{${q("Redirect")}: {${q("status")}: ${r.getAs[Int]("status")}, ${q("location")}: ${q(r.getAs[String]("location"))}}}"""
        case CrawlEngine.ServerFailure =>
          s"""{${q("ServerFailure")}: {${q("status")}: ${r.getAs[Int]("status")}, ${q("body")}: ${q(r.getAs[String]("body"))}}}"""
        case CrawlEngine.Crawled =>
          val il = Option(r.getAs[scala.collection.Seq[String]]("internal_links")).getOrElse(Seq.empty)
          val el = Option(r.getAs[scala.collection.Seq[String]]("external_links")).getOrElse(Seq.empty)
          s"""{${q("Crawled")}: {${q("internal_links")}: ${il.map(q).mkString("[", ", ", "]")}, ${q("external_links")}: ${el.map(q).mkString("[", ", ", "]")}}}"""
      }
      s"${q(url)}: $v"
    }
    s"""{${q("pages")}: {${entries.mkString(", ")}}}"""
  }
}

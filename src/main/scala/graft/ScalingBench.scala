package graft

/**
 * The BASELINE.json two-cluster-size criterion, evidenced in-sandbox
 * (BASELINE.md "Sandbox measurement protocol"): the identical crawl job on
 * the identical generated pages table at local[8] (N) and local[32] (4N),
 * reporting throughput at both; efficiency = (throughput32/throughput8)/4.
 *
 * Each phase runs in its OWN JVM (sbt forks per runMain) so the second
 * measurement doesn't inherit the first one's heap/GC state:
 *
 *   sbt "runMain graft.ScalingBench gen 1000000"
 *   sbt "runMain graft.ScalingBench run 8 1000000"
 *   sbt "runMain graft.ScalingBench run 32 1000000"
 *
 * Each `run` prints one JSON line; efficiency is computed from the two.
 */
object ScalingBench {

  private val hosts = 8
  private def pagesDir(n: Long) = s"/tmp/graft_scaling_pages_$n"
  private def warmDir = "/tmp/graft_scaling_pages_warm"
  private val warmN = 20000L

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: nStr :: Nil =>
      val n = nStr.toLong
      val s = Bench.buildSession(32, "graft-scaling-gen")
      graft.sources.PagesGen.scale(s, n, hosts, 64)
        .write.mode("overwrite").parquet(pagesDir(n))
      graft.sources.PagesGen.scale(s, warmN, hosts, 32)
        .write.mode("overwrite").parquet(warmDir)
      s.stop()
      println(s"""{"metric":"gen","n":$n,"pagesDir":"${pagesDir(n)}"}""")

    case "run" :: cpusStr :: nStr :: Nil =>
      val cpus = cpusStr.toInt
      val n = nStr.toLong
      val s = Bench.buildSession(cpus, s"graft-scaling-$cpus")
      if (sys.env.contains("SPARK_GRAFT_STAGE_LOG")) Bench.attachStageLogger(s)
      // warm JIT/code paths with a small untimed crawl
      Bench.crawlBench(s, warmDir, warmN, hosts)
      val r = Bench.crawlBench(s, pagesDir(n), n, hosts)
      s.stop()
      val tp = r.processed / r.seconds
      println(
        s"""{"metric":"crawl_throughput","cpus":$cpus,"n":$n,"sec":${f"${r.seconds}%.2f"},""" +
        s""""processed":${r.processed},"urls_per_sec":${f"$tp%.1f"},"rounds":${r.rounds},""" +
        s""""fetched":${r.fetched},"deduped":${r.deduped},"robots_denied":${r.robotsDenied}}""")

    case "kernel" :: cpusStr :: nStr :: Nil =>
      // Isolated Spark kernel: parquet scan → classify → tokenize+extract
      // (the crawl's CPU-heavy stage) with NO checkpoint writes — separates
      // the engine's parallel term from the single-virtio-disk commit cost.
      val cpus = cpusStr.toInt
      val n = nStr.toLong
      val s = Bench.buildSession(cpus, s"graft-kernel-$cpus")
      import s.implicits._
      def pass(): (Long, Long) = {
        val out = s.read.parquet(pagesDir(n)).select("url", "html")
          .as[(String, Array[Byte])]
          .mapPartitions(_.map { case (url, html) =>
            val c = graft.httpkit.HttpKit.classify(url, html)
            if (c.kind == graft.httpkit.HttpKit.Kind.Html) {
              val body = c.body.getOrElse("")
              (graft.htmlkit.HtmlKit.extractLinksStr(url, body).size.toLong,
                graft.htmlkit.HtmlKit.extractText(body).length.toLong)
            } else (0L, 0L)
          })
          .toDF("links", "chars")
          .agg(org.apache.spark.sql.functions.sum("links"), org.apache.spark.sql.functions.sum("chars"))
          .head()
        (out.getLong(0), out.getLong(1))
      }
      // warm with one partial pass over the small warm table
      s.read.parquet(warmDir).select("url", "html").as[(String, Array[Byte])]
        .mapPartitions(_.map { case (u, h) => graft.httpkit.HttpKit.classify(u, h).kind }).count()
      val t0 = System.nanoTime()
      val (links, chars) = pass()
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      println(s"""{"metric":"kernel","cpus":$cpus,"n":$n,"sec":${f"$sec%.2f"},""" +
        s""""pages_per_sec":${f"${n / sec}%.1f"},"links":$links,"chars":$chars}""")

    case "control" :: threadsStr :: rest if rest.size <= 1 =>
      // Pure-JVM control: the tokenizer kernel across a thread pool —
      // measures THIS VM's thread-scaling ceiling so the crawl's scaling can
      // be normalized against hardware reality, independent of Spark.
      // Default: cache-hot (2k resident docs → CPU ceiling). With a large
      // distinct-doc count (e.g. `control 16 200000`) the working set
      // streams from RAM → memory-bandwidth ceiling, which is what the
      // Spark path (parquet scan → UnsafeRow → write) is bound by.
      val threads = threadsStr.toInt
      val nDocs = rest.headOption.map(_.toInt).getOrElse(2000)
      val bodies = (0 until nDocs).map { i =>
        graft.sources.PagesGen.htmlWithLinks(Seq.tabulate(16)(j => s"http://h.test/p${i}_$j")) +
          ("lorem ipsum dolor sit amet " * (20 + i % 30))
      }.toArray
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      // fixed work per thread, scaled so total docs stays tractable when the
      // distinct working set is large
      val work = threads * math.max(1, 40 * 2000 / nDocs)
      // warmup
      (0 until 2000).foreach(i => graft.htmlkit.HtmlKit.extractText(bodies(i % bodies.length)))
      val t0 = System.nanoTime()
      val futs = (0 until work).map { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < bodies.length) { graft.htmlkit.HtmlKit.extractText(bodies(i)); i += 1 }
          }
        })
      }
      futs.foreach(_.get())
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      val docs = work.toLong * bodies.length
      println(s"""{"metric":"control","threads":$threads,"sec":${f"$sec%.2f"},"docs":$docs,"docs_per_sec":${f"${docs / sec}%.1f"},"docs_per_sec_per_thread":${f"${docs / sec / threads}%.1f"}}""")

    case _ =>
      System.err.println("usage: ScalingBench gen <n> | ScalingBench run <cpus> <n> | ScalingBench control <threads>")
      sys.exit(2)
  }
}

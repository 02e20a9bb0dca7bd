package graft

/**
 * The BASELINE.json two-cluster-size criterion, evidenced in-sandbox
 * (BASELINE.md "Sandbox measurement protocol"): the identical crawl job on
 * the identical generated pages table at local[8] (N) and local[32] (4N),
 * reporting throughput at both and efficiency = (throughput32/throughput8)/4.
 *
 * Prints one JSON line; results are recorded in BASELINE.md.
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "1000000").toLong
    val hosts = 8

    // generate once with full parallelism, reuse for both runs
    val gen = Bench.buildSession(32, "graft-scaling-gen")
    val pagesDir = Bench.generatePages(gen, n, hosts, 64)
    val warmN = 20000L
    val warmDir = Bench.generatePages(gen, warmN, hosts, 32)
    gen.stop()

    def runAt(cpus: Int): Bench.CrawlBenchResult = {
      val s = Bench.buildSession(cpus, s"graft-scaling-$cpus")
      // warm JIT/code paths with a small untimed crawl so neither run pays
      // first-compilation costs
      Bench.crawlBench(s, warmDir, warmN, hosts)
      val r = Bench.crawlBench(s, pagesDir, n, hosts)
      s.stop()
      r
    }

    val r8 = runAt(8)
    val r32 = runAt(32)
    val tp8 = r8.processed / r8.seconds
    val tp32 = r32.processed / r32.seconds
    val eff = (tp32 / tp8) / 4.0
    println(
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio","n":$n,""" +
      s""""t8_sec":${f"${r8.seconds}%.2f"},"t32_sec":${f"${r32.seconds}%.2f"},""" +
      s""""urls_per_sec_8":${f"$tp8%.1f"},"urls_per_sec_32":${f"$tp32%.1f"},""" +
      s""""processed":${r8.processed},"rounds":${r8.rounds}}""")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Diagnostic benchmark harness for the optimization rounds (guide §1.4/§1.5):
 * runs named declared queries (or focused sub-benchmarks) in the SAME session
 * configuration as the frozen `graft.Bench`, with per-stage telemetry
 * (wall / summed task time / GC / shuffle bytes / spill) so time can be
 * attributed to operators, and dumps `.explain("formatted")` plans.
 *
 * Usage:
 *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchExtra <query> [query...]"
 *   sbt "runMain graft.BenchExtra plan <query> <outFile>"
 *
 * This main is ADDITIVE tooling — `Bench.scala` stays the frozen artifact
 * of record; numbers printed here are for optimization work only.
 */
object BenchExtra {

  def attachDetailedStageLogger(spark: SparkSession): Unit = {
    import org.apache.spark.scheduler._
    spark.sparkContext.addSparkListener(new SparkListener {
      private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        t0.put(e.stageInfo.stageId, System.nanoTime())
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = Option(t0.get(si.stageId)).map(t => (System.nanoTime() - t) / 1e9).getOrElse(-1.0)
        val m = si.taskMetrics
        System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%6.2fs " +
          f"task=${m.executorRunTime / 1e3}%7.1fs gc=${m.jvmGCTime / 1e3}%5.1fs " +
          f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          f"spillMem=${m.memoryBytesSpilled / 1e6}%7.1fMB rows=${m.outputMetrics.recordsWritten}%d " +
          f"${si.name.takeWhile(_ != '(')}")
      }
    })
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.buildSession(cpus, "graft-bench-extra")
    attachDetailedStageLogger(spark)

    // by-name df: construction runs INSIDE the timer (several operators
    // materialize eagerly at construction — the frozen Bench times that too)
    def runNoop(name: String, df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      System.err.println(f"[extra] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    args.toList match {
      case "plan" :: q :: out :: Nil =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          plan.getBytes("UTF-8"))
        System.err.println(s"[extra] plan of $q -> $out")
      case "boiler" :: which :: Nil =>
        // the boiler twin exactly as the frozen bench constructs it
        val boiler = "terms of service privacy policy cookie notice copyright two thousand " +
          "twenty six all rights reserved navigation home about contact search login " +
          "register subscribe newsletter follow us on social media share this page"
        val bdocs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), concat(lit(boiler + " "), col("text")).as("text")).cache()
        bdocs.count()
        val t0 = System.nanoTime()
        val n = which match {
          case "naive" => graft.operators.Dedup.ngramJaccardAllPairs(bdocs, threshold = 0.8).count()
          case "prefix" => graft.operators.Dedup.ngramJaccardPrefixJoin(bdocs, threshold = 0.8).count()
        }
        System.err.println(f"[extra] boiler_$which: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n pairs)")
        bdocs.unpersist()
      case "crawl" :: rest =>
        // the crawl bench exactly as the frozen Bench runs it, one rep,
        // in ITS configuration (separate session at SPARK_GRAFT_CRAWL_CPUS)
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
        val crawlCpus = sys.env.getOrElse("SPARK_GRAFT_CRAWL_CPUS", "8").toInt
        val crawlN = rest.headOption.map(_.toLong)
          .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "2000000").toLong)
        val crawlSpark = Bench.buildSession(crawlCpus, "graft-bench-extra-crawl")
        if (sys.env.contains("SPARK_GRAFT_STAGE_LOG")) attachDetailedStageLogger(crawlSpark)
        val pagesDir = Bench.generatePages(crawlSpark, crawlN, 8, crawlCpus * 2)
        (1 to sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "1").toInt).foreach { _ =>
          val cb = Bench.crawlBench(crawlSpark, pagesDir, crawlN, 8)
          System.err.println(f"[extra] crawl: ${cb.seconds}%.2f s " +
            f"(${cb.processed / cb.seconds}%.0f urls/s, rounds=${cb.rounds}, fetched=${cb.fetched})")
        }
        crawlSpark.stop()
        return
      case qs if qs.nonEmpty =>
        qs.foreach { q =>
          (1 to sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "1").toInt).foreach { _ =>
            runNoop(q, SparkEntry.queries(q)(spark, sfDir))
          }
        }
      case Nil =>
        System.err.println("usage: BenchExtra <query...> | plan <query> <out> | boiler naive|prefix")
    }
    spark.stop()
  }
}

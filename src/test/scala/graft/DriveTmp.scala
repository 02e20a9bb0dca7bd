package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriveTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("drive")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, q, 10).select("query_id", "neighbor_id").cache()
      def recall(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
        val hits = brute.join(approx.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
          .groupBy("query_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val per = (0L until 10L).map(i => hits.getOrElse(i, 0L) / 10.0)
        println(f"[drive] sf$sf $name recall min=${per.min}%.2f mean=${per.sum / 10}%.2f per=${per.mkString(",")}")
      }
      recall("lsh(b5,t8)", Similarity.lshTopK(emb, q, 10, signBits = 5, tables = 8))
      recall("lsh(b6,t12)", Similarity.lshTopK(emb, q, 10, signBits = 6, tables = 12))
      recall("ivf(16,4)", Similarity.ivfTopK(emb, q, 10, nlist = 16, nprobe = 4))
      recall("ivf(16,6)", Similarity.ivfTopK(emb, q, 10, nlist = 16, nprobe = 6))
      brute.unpersist()

      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val exact = Dedup.ngramJaccardAllPairs(docs, threshold = 0.3).select("id_a", "id_b").cache()
      val lsh = Dedup.minhashLshPairs(docs, threshold = 0.3).select("id_a", "id_b")
      val nExact = exact.count()
      val nHit = exact.join(lsh, Seq("id_a", "id_b")).count()
      println(s"[drive] sf$sf minhash recall: $nHit/$nExact = ${nHit.toDouble / math.max(1, nExact)}")
      exact.unpersist()

      val nd = Dedup.embeddingNearDupExact(emb, threshold = 0.44)
      println(s"[drive] sf$sf neardup exact pairs@0.44 = ${nd.count()}")
    }
    spark.stop()
  }
}

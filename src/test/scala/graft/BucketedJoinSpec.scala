package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: identical results to the plain join, and no
  * shuffle Exchange on either bucketed side of the sort-merge join. */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_join_agg_bucketed equals q_join_agg; join has no shuffle on bucketed sides") {
    val plain = SparkEntry.queries("q_join_agg")(spark, dir).collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_join_agg_bucketed")(spark, dir)
      // capture plans BEFORE execution (an executed AQE plan prints an
      // "Initial Plan" duplicate that double-counts exchanges)
      def planOf(d: org.apache.spark.sql.DataFrame) =
        d.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val bucketedPlan = planOf(df)
      val plainPlan = planOf(SparkEntry.queries("q_join_agg")(spark, dir))
      assert(df.collect().map(_.toSeq).toSet == plain)
      assert(bucketedPlan.contains("Bucketed: true"), s"expected bucketed scans in:\n$bucketedPlan")
      // bucketing removes the two fact-side shuffles: strictly fewer
      // hash-partitioning Exchanges than the identical unbucketed plan
      def nExchanges(p: String) = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nExchanges(bucketedPlan) < nExchanges(plainPlan),
        s"bucketed=${nExchanges(bucketedPlan)} plain=${nExchanges(plainPlan)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

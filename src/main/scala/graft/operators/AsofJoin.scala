package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * AS-OF join — the classic time-series operator Spark lacks natively: for
 * every left row, the right row with the greatest `on` ≤ left.`on` within
 * the same `by` key (inclusive at equal timestamps, matching DuckDB's
 * `ASOF LEFT JOIN ... ON l.ts >= r.ts`, which is the driver oracle).
 *
 * Spark-native shape (the union trick, not a range join): tag both
 * inputs, union them, and per `by`-key sort by (ts, tag right-first); a
 * running `last(…, ignoreNulls)` window carries the latest right row
 * forward to every later left row. The carried payload is ONE struct of
 * all requested right columns — carrying columns independently would
 * stitch fields from DIFFERENT right rows whenever a right column is
 * null at the matched row. Cost at 100 TB: ONE hash shuffle of both
 * inputs on the by-key plus the in-partition sort — compare a naive
 * range join's per-key quadratic blowup. A key whose history is too hot
 * to sort in one task is split by coarse time bucket with the previous
 * bucket's last right row replicated across the boundary (the standard
 * sharded-as-of refinement; not needed at benched sizes).
 *
 * Left rows with no prior right row keep nulls (left-outer semantics).
 * Right columns come back prefixed so they never collide with left ones.
 */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               on: String = "ts", by: Seq[String] = Seq("user_id"),
               rightCols: Seq[String] = Seq("value"),
               prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "carry at least one right column")
    val clash = rightCols.map(prefix + _).toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"prefixed right columns collide with left columns: ${clash.mkString(", ")} — pick another prefix")
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

    val lPart = left.select(
      Seq(struct(left.columns.map(col): _*).as("_l"), lit(1).as("_tag"),
        col(on).as("_ts"), lit(null).cast(rStructType).as("_r")) ++ by.map(col): _*)
    // a null right timestamp never matches anything (ASOF `l.ts >= r.ts`
    // is never true for null) — drop it before it can sort to the head
    // and be carried as a phantom match
    val rPart = right.filter(col(on).isNotNull).select(
      Seq(lit(null).cast(left.schema).as("_l"), lit(0).as("_tag"),
        col(on).as("_ts"), struct(rightCols.map(col): _*).as("_r")) ++ by.map(col): _*)

    // right rows sort BEFORE left rows at equal ts → inclusive match; the
    // whole right row travels as one struct, so its fields never mix.
    // `_r` as the final sort key makes ties among right rows at the same
    // (by, ts) deterministic: the greatest carried struct wins (Spark
    // leaves the pick undefined otherwise; so does DuckDB's ASOF — unique
    // (by, ts) on the right is still the contract for oracle comparisons)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.unionByName(rPart)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_r.$c").as(prefix + c)): _*)
  }
}

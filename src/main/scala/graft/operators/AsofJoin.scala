package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
 * range join's per-key quadratic blowup.
 *
 * HOT-KEY SHARDING (`maxKeyRows`): a key whose history is too hot to
 * sort in one task (one pathological user/instrument holding ~all rows)
 * is split by coarse time bucket, and each bucket's as-of runs as its own
 * window partition. Correctness across the boundary: per hot key, the
 * LAST right row of every earlier bucket (max (ts, payload) struct —
 * exactly the row the running window would carry) is replicated into each
 * later bucket as a synthetic right row, so a left row at the head of a
 * bucket still sees its predecessor. The probe is one aggregation over
 * the union (count/min/max per key) joined back via broadcast — hot keys
 * are few by definition. Detection is OFF by default (`Long.MaxValue`
 * skips the probe entirely); enable by passing the largest per-key row
 * count one task should sort. Buckets are equal-WIDTH in time (ceil(n /
 * maxKeyRows) of them), so a key whose rows also cluster in time keeps
 * oversized buckets — the split bounds the damage, it does not guarantee
 * maxKeyRows per task.
 *
 * Left rows with no prior right row keep nulls (left-outer semantics).
 * Right columns come back prefixed so they never collide with left ones.
 * Null semantics: a null right timestamp OR null right by-key never
 * matches (ASOF equality/inequality is never true for null) — both are
 * filtered from the right input; null-key LEFT rows survive unmatched.
 */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               on: String = "ts", by: Seq[String] = Seq("user_id"),
               rightCols: Seq[String] = Seq("value"),
               prefix: String = "asof_",
               maxKeyRows: Long = Long.MaxValue): DataFrame = {
    require(rightCols.nonEmpty, "carry at least one right column")
    require(maxKeyRows >= 2, "maxKeyRows must be >= 2")
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
    // and be carried as a phantom match. Same for null by-keys: ASOF's
    // equality condition never matches nulls, but Spark's
    // Window.partitionBy groups nulls into ONE partition, which would
    // match a null-key left row to a null-key right row (round-3 ADVICE)
    val rPart = right
      .filter(by.map(col(_).isNotNull).foldLeft(col(on).isNotNull)(_ && _))
      .select(
      Seq(lit(null).cast(left.schema).as("_l"), lit(0).as("_tag"),
        col(on).as("_ts"), struct(rightCols.map(col): _*).as("_r")) ++ by.map(col): _*)

    val union = lPart.unionByName(rPart)
    val bucketed =
      if (maxKeyRows == Long.MaxValue) union.withColumn("_bkt", lit(0L))
      else shardHotKeys(union, by, maxKeyRows)

    // right rows sort BEFORE left rows at equal ts → inclusive match; the
    // whole right row travels as one struct, so its fields never mix.
    // `_r` as the final sort key makes ties among right rows at the same
    // (by, ts) deterministic: the greatest carried struct wins (Spark
    // leaves the pick undefined otherwise; so does DuckDB's ASOF — unique
    // (by, ts) on the right is still the contract for oracle comparisons)
    val w = Window.partitionBy((by :+ "_bkt").map(col): _*)
      .orderBy(col("_ts").asc, col("_tag").asc, col("_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_l.*") +: rightCols.map(c => col(s"_r.$c").as(prefix + c)): _*)
  }

  /** Assign `_bkt` per row (0 for keys under the threshold; a coarse
    * equal-width time bucket for hot keys) and append the boundary-carry
    * synthetic right rows that make per-bucket windows exact. */
  private def shardHotKeys(union: DataFrame, by: Seq[String], maxKeyRows: Long): DataFrame = {
    val byCols = by.map(col)
    // numeric view of the time axis for bucket arithmetic: timestamps
    // (incl. parquet NTZ, which cannot cast to double directly) go through
    // integer microseconds; numerics cast straight
    val tsNumeric = union.schema("_ts").dataType match {
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("_ts").cast("timestamp")).cast("double")
      case _ => col("_ts").cast("double")
    }
    val u = union.withColumn("_tsd", tsNumeric)
    val hot = u.groupBy(byCols: _*)
      .agg(count(lit(1)).as("_n"), min(col("_tsd")).as("_tmin"), max(col("_tsd")).as("_tmax"))
      .filter(col("_n") > maxKeyRows)
      .withColumn("_nb", ceil(col("_n").cast("double") / maxKeyRows).cast("long"))
      .withColumn("_w", (col("_tmax") - col("_tmin")) / col("_nb"))
    val assigned = u.join(broadcast(hot), by, "left")
      .withColumn("_hot", col("_nb").isNotNull && col("_w") > 0.0)
      .withColumn("_bkt",
        when(!col("_hot"), lit(0L))
          .otherwise(least(
            floor((col("_tsd") - col("_tmin")) / col("_w")).cast("long"),
            col("_nb") - 1)))
      .drop("_tsd", "_n", "_tmin", "_tmax", "_nb", "_w")
    // per (hot key, bucket) — over ALL buckets the key occupies, including
    // left-only ones: the right row the running window would be carrying
    // at the bucket's end (max (ts, payload) struct matches the main
    // window's (ts asc, payload asc, last-wins) pick exactly; null for
    // right-free buckets, which max-over-preceding skips). The running max
    // over earlier buckets is each bucket's head carry — computed on the
    // tiny per-(key, bucket) frame, then injected as a synthetic right row.
    val carryW = Window.partitionBy(byCols: _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = assigned
      .filter(col("_hot"))
      .groupBy((byCols :+ col("_bkt")): _*)
      .agg(max(when(col("_tag") === 0, struct(col("_ts").as("t"), col("_r").as("r")))).as("_lastr"))
      .withColumn("_carry", max(col("_lastr")).over(carryW))
      .filter(col("_carry").isNotNull)
      .select(
        Seq(lit(null).cast(assigned.schema("_l").dataType).as("_l"), lit(0).as("_tag"),
          col("_carry.t").as("_ts"), col("_carry.r").as("_r"), lit(true).as("_hot")) ++
          byCols :+ col("_bkt"): _*)
    // a carry row's ts precedes every row of its target bucket (bucket is
    // a monotone function of ts within the key), so it sorts to the head
    assigned.unionByName(carries.select(assigned.columns.map(col): _*)).drop("_hot")
  }
}

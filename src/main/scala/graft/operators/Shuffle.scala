package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling (extension — SURVEY §7.2.8): training
  * pipelines need every document assigned a reproducible global shuffle
  * position (seeded, stable across re-runs and cluster sizes) so epoch
  * order is an input property, not an accident of partitioning.
  *
  * Position = rank of the row's seeded 60-bit hash in the global hash
  * order. The naive spelling — `row_number() OVER (ORDER BY hash)` — is
  * a single-partition window: one task ranks the whole corpus, the
  * canonical 100 TB scale-killer. Instead the rank is decomposed into
  * bounded pieces:
  *
  *   1. bucket = top `bucketBits` bits of the hash (monotone in hash,
  *      so bucket order refines global order; uniform because the hash
  *      is);
  *   2. per-bucket row counts — one map-side-combined aggregation whose
  *      result is ≤ 2^bucketBits rows;
  *   3. bucket start offsets — prefix sum over those counts. This IS an
  *      unpartitioned window, but over ≤ 2^bucketBits rows, bounded at
  *      plan time (same pattern as the E2 dictionary build, SURVEY §4);
  *   4. `row_number()` partitioned BY BUCKET within each bucket, plus
  *      the broadcast-joined bucket offset.
  *
  * Every stage is bounded: the per-bucket window ranks ~n/2^bucketBits
  * rows. At 100 TB raise `bucketBits` (16 bits → ~1.5M rows/bucket per
  * 100G docs) — cost stays two shuffles + one broadcast.
  */
object Shuffle {

  /** Attach `posCol` (1-based global shuffle position) ordered by
    * (hash60(seed:keyCol), tieBreak) — tieBreak must make the order
    * total (e.g. a unique id) or positions of tied rows are arbitrary.
    */
  def globalOrderIndex(
      df: DataFrame, keyCol: String, seed: Long, tieBreak: String,
      posCol: String = "shuffle_pos", bucketBits: Int = 12): DataFrame = {
    require(bucketBits > 0 && bucketBits < 60, "bucketBits in (0, 60)")
    val hash: Column =
      graft.functions.PortableHash.hash60Seeded(lit(seed), col(keyCol))
    val bucketWidth = 1L << (60 - bucketBits)
    val hashed = df.withColumn("__h", hash)
      .withColumn("__bucket", (col("__h") / lit(bucketWidth)).cast("long"))
    // The limit NEVER truncates (distinct buckets <= 2^bucketBits by
    // construction) — it exists so the bound is visible to Catalyst
    // (maxRows) and the unpartitioned offsets window below is provably
    // small at plan time (graft.plans.PlanGuard would flag it otherwise).
    val offsets = hashed.groupBy("__bucket").count()
      .limit(1 << bucketBits)
      .withColumn("__offset",
        coalesce(sum(col("count")).over(
          Window.orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val within = Window.partitionBy("__bucket")
      .orderBy(col("__h"), col(tieBreak))
    hashed.join(broadcast(offsets), "__bucket")
      .withColumn(posCol, (col("__offset") + row_number().over(within)).cast("long"))
      .drop("__bucket", "__h", "__offset")
  }

  /** Attach `posCol` (1-based global rank) ordered by an arbitrary
    * NON-NEGATIVE integer key of known bit width — the same
    * bucket-decomposed rank as [[globalOrderIndex]] (which orders by a
    * seeded hash), for keys the caller supplies directly (e.g. a
    * Z-order value for data-layout sorting). `domainBits` bounds the
    * key (< 2^domainBits); the top `bucketBits` of the key route rows
    * to bounded rank buckets, so no window ever sees more than
    * ~n/2^min(bucketBits, domainBits) rows.
    */
  def globalRankBy(
      df: DataFrame, orderCol: String, domainBits: Int, tieBreak: String,
      posCol: String = "pos", bucketBits: Int = 12): DataFrame = {
    require(domainBits > 0 && domainBits <= 60, "domainBits in (0, 60]")
    require(bucketBits > 0, "bucketBits > 0")
    val shift = math.max(domainBits - bucketBits, 0)
    // integer div (exact), not Column./ (double division)
    val keyed = df.withColumn("__bucket", expr(s"`$orderCol` div ${1L << shift}"))
    val offsets = keyed.groupBy("__bucket").count()
      .limit(1 << math.min(bucketBits, domainBits))
      .withColumn("__offset",
        coalesce(sum(col("count")).over(
          Window.orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val within = Window.partitionBy("__bucket")
      .orderBy(col(orderCol), col(tieBreak))
    keyed.join(broadcast(offsets), "__bucket")
      .withColumn(posCol, (col("__offset") + row_number().over(within)).cast("long"))
      .drop("__bucket", "__offset")
  }

  /** Attach `posCol` (1-based global rank) under the LEXICOGRAPHIC
    * order of `orderCols` — the string-key companion of
    * [[globalRankBy]] (whose bucket decomposition needs an integer
    * domain). Range-repartition supplies ordered, non-overlapping key
    * ranges per partition; each partition ranks only its own rows and
    * a |partitions|-row broadcast of cumulative counts turns local
    * ranks global. The rank is a function of the TOTAL ORDER alone, so
    * where the sampled range bounds fall (which varies with input
    * splits) never changes the output — `orderCols` must be a total
    * order (include a unique tiebreak).
    */
  def rangeOrderIndex(
      df: DataFrame, orderCols: Seq[String],
      posCol: String = "pos", numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val n = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val cols = orderCols.map(col)
    // The checkpoint FREEZES the partition assignment: RangePartitioner
    // seeds its reservoir sampling from the physical RDD id, so two
    // independent evaluations of the same range exchange can pick
    // DIFFERENT bounds — and `parted` has two consumers (the offsets
    // aggregate and the rank join). Exchange reuse usually hides this,
    // but reuse across a broadcast-stage boundary is not guaranteed;
    // inconsistent __pid between the two sides silently corrupts every
    // rank past the first moved row (caught by ScaleSpec's
    // partitioning-equivalence property). Materializing once makes
    // __pid a fact of the data.
    val parted = df.repartitionByRange(n, cols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    // the limit never truncates (pids < n by construction) — it makes
    // the bound visible to Catalyst so the offsets window is provably
    // small at plan time (same idiom as globalOrderIndex)
    val offsets = parted.groupBy("__pid").count().limit(n)
      .withColumn("__offset",
        coalesce(sum(col("count")).over(
          Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val within = Window.partitionBy("__pid").orderBy(cols: _*)
    parted.join(broadcast(offsets), "__pid")
      .withColumn(posCol, (col("__offset") + row_number().over(within)).cast("long"))
      .drop("__pid")
  }

  /** PER-GROUP running sum of `value` under the (groupCols, orderCols)
    * order — the scale-safe replacement for
    * `sum(v) OVER (PARTITION BY group ORDER BY o ROWS UNBOUNDED
    * PRECEDING)` when `group` is LOW-CARDINALITY (lang / source /
    * split) and the input is document-grain: the naive window funnels
    * every row of a group onto ONE task (a multi-TB serial sort at
    * 100 TB), while this decomposition never sorts more than one range
    * partition per task.
    *
    *   1. range-repartition on (groupCols ++ orderCols) — contiguous,
    *      non-overlapping key ranges per partition;
    *   2. per-(partition, group) local running sum — each task sorts
    *      only its own rows;
    *   3. per-(partition, group) totals — because ranges are contiguous
    *      in (group, order) sort order, this table holds at most
    *      `numParts + |groups| − 1` rows;
    *   4. per-group offsets = prefix sum of the totals over partition
    *      id (a window PARTITIONED BY group over the tiny totals
    *      table — ≤ numParts rows per group), broadcast-joined back.
    *
    * The result is a function of the TOTAL ORDER alone — where the
    * sampled range bounds fall never changes it — so `orderCols` must
    * be a total order within each group (include a unique tiebreak).
    * Contract: |groups| must stay broadcast-sized (the offsets table is
    * broadcast); for high-cardinality groups a plain partitioned window
    * is already scale-safe — use that instead.
    *
    * `materializeInput` (default true): the range partitioner SAMPLES
    * its child plan before shuffling it, so the caller's per-row
    * compute (token counts, quality scores) would run twice; an eager
    * local checkpoint of the projected input makes both passes read
    * materialized rows. Pass false when the input still carries
    * corpus-width columns (full text) — there a second cheap pass
    * beats materializing a corpus copy.
    */
  def groupedRunningSum(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      value: Column, outCol: String, numParts: Int = 0,
      materializeInput: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderCols.nonEmpty, "need at least one order column")
    val n = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val keyCols = (groupCols ++ orderCols).map(col)
    val src0 = df.withColumn("__v", value)
    val src = if (materializeInput) src0.localCheckpoint(true) else src0
    // checkpoint AFTER the shuffle as well: RangePartitioner seeds its
    // sampling from the physical RDD id, so the two consumers of
    // `parted` (local window + totals aggregate) could otherwise see
    // DIFFERENT range bounds — inconsistent __pid corrupts the offsets
    // join (see rangeOrderIndex's note; ScaleSpec proves the property)
    val parted = src.repartitionByRange(n, keyCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(true)
    val localW = Window.partitionBy(("__pid" +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = parted.withColumn("__lcum", sum(col("__v")).over(localW))
    val totals = parted.groupBy(("__pid" +: groupCols).map(col): _*)
      .agg(sum(col("__v")).as("__ptot"))
    val offW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__goff", coalesce(sum(col("__ptot")).over(offW), lit(0L)))
      .select(col("__pid").as("__opid") +:
        groupCols.map(c => col(c).as(s"__og_$c")) :+ col("__goff"): _*)
    // NULL-SAFE group equality (<=>): the per-group window this
    // decomposition replaces ranks a NULL group like any other, and a
    // plain equi-join would silently DROP those rows (NULL = NULL is
    // not true) — e.g. docs whose language-ID failed
    val joinCond = (Seq(col("__pid") === col("__opid")) ++
      groupCols.map(c => col(c) <=> col(s"__og_$c"))).reduce(_ && _)
    withLocal.join(broadcast(offsets), joinCond)
      .withColumn(outCol, (col("__goff") + col("__lcum")).cast("long"))
      .drop("__pid" +: "__v" +: "__lcum" +: "__goff" +: "__opid" +:
        groupCols.map(c => s"__og_$c"): _*)
  }

  /** PER-GROUP 1-based `row_number` under the (groupCols, orderCols)
    * order — [[groupedRunningSum]] of the constant 1; the scale-safe
    * replacement for `row_number() OVER (PARTITION BY group ORDER BY
    * o)` on low-cardinality groups over document-grain rows. Same
    * contract: `orderCols` total within each group, |groups|
    * broadcast-sized.
    */
  def groupedRank(
      df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      rankCol: String, numParts: Int = 0,
      materializeInput: Boolean = true): DataFrame =
    groupedRunningSum(df, groupCols, orderCols, lit(1L), rankCol, numParts,
      materializeInput)
}

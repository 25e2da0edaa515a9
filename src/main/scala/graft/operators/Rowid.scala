package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable 1-based row identity (SURVEY §2.7).
  *
  * SQLite assigns `rowid` in insert order = CSV line order
  * (`utils.py:359`), and the reference's tests and FTS populate rely on
  * it (`tests/test_csvs_to_sqlite.py:104`).
  *
  * Implementation: pure-DataFrame two-pass.
  * `monotonically_increasing_id()` packs (partitionId << 33 | counter)
  * with the counter incrementing in row order WITHIN a partition — so a
  * cheap first pass collecting per-partition row counts gives global
  * offsets, and `rowid = offset(pid) + counter + 1` is computed entirely
  * inside whole-stage codegen. No RDD boundary (an earlier zipWithIndex
  * version deserialized every row to a boxed Row and back — measurably
  * slower and an optimizer fence).
  *
  * Determinism: file-split order is stable for a given input, so both
  * passes see identical partitioning. Scale: pass 1 is a column-pruned
  * count per partition (driver holds one Long per partition).
  */
object Rowid {

  val ColName = "rowid"

  /** The two-pass scheme requires that both passes observe the SAME
    * row→partition assignment — true for file scans and narrow chains
    * over them, NOT true above operators that re-distribute rows:
    * round-robin `repartition` (order within a partition is not a
    * function of the input), range sort (partition boundaries are
    * re-sampled per job), aggregates/windows/distinct (shuffle). Fail
    * fast with a clear error instead of silently mis-numbering rows.
    * (A cached upstream is exempt: once materialized, every pass reads
    * the same cached partitions.)
    */
  private def unstableOrderOp(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collectFirst {
      case _: Repartition             => "repartition/coalesce"
      case _: RepartitionByExpression => "repartitionByExpression"
      case s: Sort if s.global        => "global sort"
      case _: Aggregate               => "aggregate"
      case _: Window                  => "window"
      case _: Deduplicate             => "distinct"
    }
  }

  def attach(df: DataFrame, colName: String = ColName): DataFrame = {
    require(!df.columns.contains(colName),
      s"Rowid.attach: column '$colName' already exists in the input schema")
    unstableOrderOp(df).foreach { op =>
      throw new IllegalArgumentException(
        s"Rowid.attach requires a scan-stable row order, but the upstream plan " +
        s"contains a $op, whose row-to-partition assignment can differ between " +
        s"the offset pass and the id pass. Attach rowid at scan time (before " +
        s"any shuffle), persist the upstream first, or use Rowid.attachZip.")
    }
    val counts = df
      .select(spark_partition_id().as("pid"))
      .groupBy("pid").count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetByPid: Map[Int, Long] = counts.map(_._1).zip(offsets).toMap

    val spark = df.sparkSession
    val offsetsDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsetByPid.toSeq.map { case (p, o) => Row(p, o) }, 1),
      StructType(Seq(
        StructField("__pid", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("__offset", LongType, nullable = false)))))

    val counterMask = (1L << 33) - 1L
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .join(offsetsDf, Seq("__pid"))
      .withColumn(colName, col("__offset") + col("__mid").bitwiseAND(lit(counterMask)) + 1L)
      .drop("__pid", "__mid", "__offset")
  }

  /** Rowid via `zipWithIndex` over the DataFrame's execution RDD — the
    * escape hatch for upstreams [[attach]] rejects (e.g. a global sort).
    * `df.rdd` builds ONE physical RDD chain; `zipWithIndex`'s two jobs
    * (partition-size count, then emit) share that chain's shuffle
    * dependencies, and Spark reuses shuffle map output across jobs, so
    * both passes observe the same row→partition assignment even above a
    * range-partitioned sort (whose boundary sampling runs once, at RDD
    * construction). Ids are assigned partition-by-partition in order, so
    * for a sorted upstream rowid == global sort rank, computed in
    * parallel (no single-partition window). Cost: one RDD boundary
    * (row deserialization + an optimizer fence) — prefer [[attach]] for
    * scan-stable upstreams.
    */
  def attachZip(df: DataFrame, colName: String = ColName): DataFrame = {
    require(!df.columns.contains(colName),
      s"Rowid.attachZip: column '$colName' already exists in the input schema")
    val spark = df.sparkSession
    val schema = df.schema.add(StructField(colName, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }
}

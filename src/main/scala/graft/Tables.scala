package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All graded queries receive `(spark, sfDir)` and read parquet from
  * `sfDir`; this helper centralizes that so predicate pushdown / column
  * pruning stay visible in one place.
  *
  * `events.ts` has varied across driver regenerations of the testdata:
  * TIMESTAMP(NANOS) (which Spark rejects by default — sessions we
  * control set `spark.sql.legacy.parquet.nanosAsLong=true`, and the
  * loader converts nanos -> micros with exact integer division; the
  * values are ~1.7e18, beyond double precision, so `/ 1000` via doubles
  * would corrupt them) and naive micros (which Spark 4 infers as
  * TIMESTAMP_NTZ — cast back to TIMESTAMP, identical instants under the
  * UTC session timezone, and required by watermarks/`unix_micros`/every
  * graded event query). The loader normalizes every variant to
  * TIMESTAMP so downstream operators see ONE type.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load + spread across the session's parallelism. The testdata tables
    * are single small parquet files, which Spark reads as ONE partition —
    * fine for scans, catastrophic for compute-heavy per-row operators
    * (minhash, simhash, dot products) that would otherwise run on a
    * single core. On a real cluster the scan is already split; the
    * round-robin repartition reproduces that property locally. Callers
    * that depend on row order must (and do) sort explicitly.
    *
    * The repartition is CONDITIONAL on the scan actually being
    * under-split: a 100 TB input already arrives in thousands of
    * partitions and a blanket repartition would be a full-corpus shuffle
    * for nothing.
    */
  def loadSpread(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = load(spark, sfDir, table)
    val target = spark.sparkContext.defaultParallelism
    // Under-split probe via file-size metadata, NOT `df.rdd` — building
    // the RDD lineage forces physical planning (and AQE stage prep) on
    // every call just to read a partition count. The scan's split count
    // is bytes / maxPartitionBytes; a 100 TB input (many large files)
    // clears `target` and skips the shuffle, a single small test file
    // does not and gets spread.
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val splits = df.inputFiles.length match {
      case 0 => target // empty relation: nothing to spread
      case _ =>
        val totalBytes = df.inputFiles.map { f =>
          try new java.io.File(new java.net.URI(f).getPath).length
          catch { case _: Exception => 0L }
        }.sum
        math.max(df.inputFiles.length.toLong,
          (totalBytes + maxPartitionBytes - 1) / maxPartitionBytes)
    }
    if (splits < target) df.repartition(target) else df
  }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }
}

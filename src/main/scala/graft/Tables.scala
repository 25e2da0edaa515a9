package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All graded queries receive `(spark, sfDir)` and read parquet from
  * `sfDir`; this helper centralizes that so predicate pushdown / column
  * pruning stay visible in one place.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
  * default (PARQUET_TYPE_ILLEGAL). Sessions we control set
  * `spark.sql.legacy.parquet.nanosAsLong=true`; the loader then converts
  * nanos -> micros with exact integer division (the values are ~1.7e18,
  * beyond double precision, so `/ 1000` via doubles would corrupt them).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df
    } else df
  }
}

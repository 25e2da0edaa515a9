package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable 1-based row identity (SURVEY §2.7).
  *
  * SQLite assigns `rowid` in insert order = CSV line order
  * (`utils.py:359`), and the reference's tests and FTS populate rely on
  * it (`tests/test_csvs_to_sqlite.py:104`). Spark's
  * `monotonically_increasing_id` is partition-skewed and NOT contiguous,
  * so rowid is derived from `zipWithIndex` over the current partition
  * order: deterministic for a given input order (single-file CSV reads
  * preserve line order; multi-file follows file enumeration order).
  *
  * Scale note: `zipWithIndex` costs one extra pass to count per-partition
  * sizes but never shuffles and never collects data to the driver — it
  * holds only one Long per partition. Safe at 100 TB.
  */
object Rowid {

  val ColName = "rowid"

  def attach(df: DataFrame, colName: String = ColName): DataFrame = {
    val spark = df.sparkSession
    val withId = df.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    val schema = StructType(df.schema.fields :+ StructField(colName, LongType, nullable = false))
    spark.createDataFrame(withId, schema)
  }
}

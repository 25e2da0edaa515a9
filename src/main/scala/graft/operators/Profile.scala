package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Column profiling (extension — SURVEY §7.2.8): the
  * expectations/validation table every ingest pipeline computes before
  * trusting a new corpus drop — per column: row count, null count,
  * exact distinct count, and min/max (numeric columns) or min/max
  * LENGTH (string columns).
  *
  * One aggregation pass over the table produces every cell (Spark
  * plans the multi-distinct via Expand — one shuffle, rows × profiled
  * columns intermediate). Exact distincts are the right default at
  * audit scale; for very wide tables or when exactness is not needed,
  * [[Kmv.distinctSketch]] is the O(k)-state estimate with the same
  * hash contract. The single result row is then unpivoted driver-free
  * (literal struct array → explode) into one row per column.
  */
object Profile {

  /** Profile `cols` (LongType or StringType) of `df`. Output:
    * (column, n_rows, n_nulls, n_distinct, min_value, max_value,
    * min_length, max_length) — value bounds null for strings, length
    * bounds null for numerics.
    */
  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs: Seq[Column] = count(lit(1)).cast(LongType).as("__rows") +: cols.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast(LongType).as(s"__${c}__nulls"),
        countDistinct(col(c)).cast(LongType).as(s"__${c}__distinct"))
      df.schema(c).dataType match {
        case LongType => base ++ Seq(
          min(col(c)).cast(LongType).as(s"__${c}__min"),
          max(col(c)).cast(LongType).as(s"__${c}__max"))
        case StringType => base ++ Seq(
          min(length(col(c))).cast(LongType).as(s"__${c}__minlen"),
          max(length(col(c))).cast(LongType).as(s"__${c}__maxlen"))
        case dt => throw new IllegalArgumentException(
          s"Profile.table supports LongType and StringType, $c is $dt")
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows: Seq[Column] = cols.map { c =>
      val isLong = df.schema(c).dataType == LongType
      struct(
        lit(c).as("column"),
        col("__rows").as("n_rows"),
        col(s"__${c}__nulls").as("n_nulls"),
        col(s"__${c}__distinct").as("n_distinct"),
        (if (isLong) col(s"__${c}__min") else lit(null).cast(LongType)).as("min_value"),
        (if (isLong) col(s"__${c}__max") else lit(null).cast(LongType)).as("max_value"),
        (if (isLong) lit(null).cast(LongType) else col(s"__${c}__minlen")).as("min_length"),
        (if (isLong) lit(null).cast(LongType) else col(s"__${c}__maxlen")).as("max_length"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}

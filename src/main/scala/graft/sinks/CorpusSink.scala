package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioned curated-corpus writer (extension — SURVEY §7.2.8): the
  * output side of the curation chain, laying a corpus out as
  * `path/split=…/lang=…/part-*.parquet` with bounded file sizes.
  *
  * Two output-hygiene failure modes at 100 TB, both avoided here:
  *   - the SMALL-FILES explosion: a plain `partitionBy` write emits up
  *     to tasks × |partition values| files (every task holds rows of
  *     every partition). Repartitioning ON the partition columns first
  *     routes each Hive partition's rows to as few tasks as possible, so
  *     file count tracks data volume, not parallelism;
  *   - the single-writer funnel: no `coalesce(1)` anywhere — within a
  *     partition value the write stays distributed, and
  *     `maxRecordsPerFile` rolls oversized outputs into bounded pieces
  *     (the reference's CLI-parity SQLite sink is the only deliberate
  *     single-writer path in this repo).
  *
  * `spark.sql.files.maxRecordsPerFile` is the documented public knob;
  * the per-write option spelling used here scopes it to this write only.
  */
object CorpusSink {

  /** Supported columnar formats: parquet (default) and orc — both
    * splittable, compressed, predicate-pushdown-capable; the choice is
    * an ecosystem decision, not a capability one.
    */
  def writeCurated(
      df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 1000000L, format: String = "parquet"): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(Set("parquet", "orc")(format), s"unsupported format: $format")
    df.repartition(partitionCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .format(format)
      .save(path)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus source/sink (extension — SURVEY §7.2.8): newline-
  * delimited JSON is the interchange format most LLM training corpora
  * ship in (one document object per line), so the engine speaks it on
  * both ends.
  *
  * Scale rules baked in:
  *  - The schema is REQUIRED on read. Schema inference scans the whole
  *    input once before the real read — a free 100 TB pass nobody
  *    ordered. Callers declare the document shape up front.
  *  - JSONL is line-splittable, so the scan parallelizes like CSV:
  *    `maxPartitionBytes`-sized splits, no coordination. (Multi-line
  *    JSON arrays are NOT splittable — the format choice is the scale
  *    decision, which is why this wrapper exists and `multiLine` is
  *    deliberately not exposed.)
  *  - Bad lines don't kill the job: PERMISSIVE parse with the corrupt
  *    record captured in [[CorruptCol]], so ingest QA is a filter, not
  *    a re-run ([[corruptLines]] — same philosophy as the CSV loader's
  *    bad-line handling, SURVEY §2.1).
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL at `path` with the declared document schema; parsed
    * rows carry a null [[CorruptCol]], unparseable lines survive as
    * their raw text in it.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains(CorruptCol)) schema
      else schema.add(CorruptCol, StringType, nullable = true)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The rows that failed to parse, as (raw_line). Spark refuses a
    * query that touches ONLY the corrupt column of a raw JSON scan
    * (the parser would skip parsing entirely and report nothing as
    * corrupt), so the scan is materialized behind a lazy local
    * checkpoint first — blocks are freed by the ContextCleaner, and
    * callers doing full ingest QA should checkpoint upstream once and
    * pass the same frame here and to [[goodRows]].
    */
  def corruptLines(df: DataFrame): DataFrame =
    df.localCheckpoint(false)
      .filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  /** Parsed rows only, corrupt column dropped. */
  def goodRows(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Write `df` as JSONL under `dir` (one file per partition — upstream
    * partitioning controls file count, same contract as
    * [[graft.sinks.CorpusSink]]).
    */
  def write(df: DataFrame, dir: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(dir)
}

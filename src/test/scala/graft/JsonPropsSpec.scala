package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** x_events_props contract: typed JSON extraction must be total —
  * malformed payloads become NULL (and are excluded from typed stats),
  * never a job-killing parse error.
  */
class JsonPropsSpec extends SparkSpec {
  import spark.implicits._

  test("get_json_object: null on malformed/missing, typed on valid") {
    val rows = Seq(
      (1L, """{"k": 42}"""),
      (2L, """{"other": 1}"""), // key missing
      (3L, "not json at all"),  // malformed
      (4L, """{"k": "7"}"""),   // string-typed number still casts
      (5L, null)
    ).toDF("id", "props")
    val out = rows
      .select($"id", get_json_object($"props", "$.k").cast(LongType).as("k"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(1L -> Some(42L), 2L -> None, 3L -> None, 4L -> Some(7L), 5L -> None))
  }
}

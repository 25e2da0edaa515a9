package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Built from md5-of-UTF8 so the same value hashes identically in Spark
  * and in the DuckDB oracle (`CAST('0x' || substring(md5(x),1,15) AS
  * BIGINT)`). 15 hex chars = 60 bits, so the value always fits a signed
  * 64-bit integer in both engines — never negative, no overflow
  * ambiguity. All of this is built-in Catalyst expressions (md5 / conv /
  * substring), fully codegen'd: no UDF in the hot path.
  */
object PortableHash {

  /** 60-bit non-negative hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: prepends "seed:" so k independent hash families can
    * be derived for MinHash ("0:shingle", "1:shingle", ...).
    */
  def hash60Seeded(seed: Column, c: Column): Column =
    hash60(concat(seed.cast("string"), lit(":"), c))

  /** DuckDB SQL fragment equivalent of [[hash60]] for oracle queries. */
  def duckdbHash60(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"

  def duckdbHash60Seeded(seedExpr: String, expr: String): String =
    duckdbHash60(s"CAST($seedExpr AS VARCHAR) || ':' || $expr")
}

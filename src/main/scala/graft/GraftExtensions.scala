package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{FuzzyDateParse, GFormat, IntVecDot, RollingHash, SimHash60}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL users:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT rolling_hash(text), simhash60(hashes) FROM docs")
  * }}}
  *
  * Registered functions: `rolling_hash(str)`, `g_format(double)`,
  * `int_vec_dot(arr, arr)`, `simhash60(arr)`,
  * `fuzzy_date(str)`, `fuzzy_datetime(str)`.
  */
object GraftExtensions {
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> (args => RollingHash(args.head)),
    "g_format" -> (args => GFormat(args.head)),
    "int_vec_dot" -> (args => IntVecDot(args(0), args(1))),
    "simhash60" -> (args => SimHash60(args.head)),
    "fuzzy_date" -> (args => FuzzyDateParse(args.head, Nil, dateOnly = true)),
    "fuzzy_datetime" -> (args => FuzzyDateParse(args.head, Nil, dateOnly = false)))

  /** Register on an already-running session (temp functions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graftshim.GraftShim.registerFunction(spark, name, b)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str) - polynomial fingerprint mod 1e9+7"),
      (args: Seq[Expression]) => RollingHash(args.head)))
    ext.injectFunction((FunctionIdentifier("g_format"),
      info("g_format", "g_format(x) - C-printf %g canonicalization"),
      (args: Seq[Expression]) => GFormat(args.head)))
    ext.injectFunction((FunctionIdentifier("int_vec_dot"),
      info("int_vec_dot", "int_vec_dot(a, b) - exact integer dot product"),
      (args: Seq[Expression]) => IntVecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(hashes) - 60-bit simhash of a hash array"),
      (args: Seq[Expression]) => SimHash60(args.head)))
    ext.injectFunction((FunctionIdentifier("fuzzy_date"),
      info("fuzzy_date", "fuzzy_date(str) - natural-language date -> ISO yyyy-MM-dd"),
      (args: Seq[Expression]) => FuzzyDateParse(args.head, Nil, dateOnly = true)))
    ext.injectFunction((FunctionIdentifier("fuzzy_datetime"),
      info("fuzzy_datetime", "fuzzy_datetime(str) - natural-language datetime -> ISO"),
      (args: Seq[Expression]) => FuzzyDateParse(args.head, Nil, dateOnly = false)))
  }
}

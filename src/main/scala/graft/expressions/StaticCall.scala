package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for graft's hot-path scalar functions.
  *
  * These wrap static JVM calls in `doGenCode`, replacing Scala UDFs on
  * the fact-table path. A UDF costs catalyst<->scala row conversion,
  * closure serialization, and an optimizer fence (no pushdown through
  * it); a codegen'd static call is just an invoke inside the generated
  * loop, and Catalyst can still prune/push around it.
  */

/** C-printf `%g` canonicalization ([[graft.functions.Canon.gFormat]]) —
  * runs once per fact cell during dictionary encode (E2).
  */
case class GFormat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.functions.Canon.gFormat(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Canon.gFormat($c));")

  override protected def withNewChildInternal(newChild: Expression): GFormat =
    copy(child = newChild)
}

object GFormat {
  def g_format(c: Column): Column =
    GraftShim.column(GFormat(GraftShim.expression(c)))
}

/** Fuzzy date/datetime parse to ISO string
  * ([[graft.functions.DateParse]], P5). `formats` and the date/datetime
  * mode are plan-time constants (CLI flags), baked into the expression.
  */
case class FuzzyDateParse(child: Expression, formats: Seq[String], dateOnly: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out =
      if (dateOnly) graft.functions.DateParse.parseDateIso(s, formats)
      else graft.functions.DateParse.parseDatetimeIso(s, formats)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmtsRef = ctx.addReferenceObj("formats", formats, "scala.collection.immutable.Seq")
    val call = if (dateOnly) "parseDateIso" else "parseDatetimeIso"
    val out = ctx.freshName("iso")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |String $out = graft.functions.DateParse.$call($c.toString(), $fmtsRef);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($out); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyDateParse =
    copy(child = newChild)
}

object FuzzyDateParse {
  def parse_date(c: Column, formats: Seq[String] = Nil): Column =
    GraftShim.column(FuzzyDateParse(GraftShim.expression(c), formats, dateOnly = true))
  def parse_datetime(c: Column, formats: Seq[String] = Nil): Column =
    GraftShim.column(FuzzyDateParse(GraftShim.expression(c), formats, dateOnly = false))
}

/** Unicode NFC normalization (`java.text.Normalizer`, Form.NFC) —
  * the corpus-cleaning canonicalization pass
  * ([[graft.operators.Normalize]]). Codegen'd static call; DuckDB's
  * `nfc_normalize` is the oracle twin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expressions.NfcNormalize.normalize($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  def nfc_normalize(c: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(c)))
}

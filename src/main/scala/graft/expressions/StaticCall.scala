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
  * ([[graft.functions.DateParse]], P5). `formats`, the date/datetime
  * mode, and the relative-date base clock are plan-time constants (CLI
  * flags), baked into the expression. When `relativeBaseIso` is unset,
  * the base resolves to `now()` ONCE per plan (at codegen/eval setup) —
  * dateparser's default behavior, but consistent across every row and
  * partition of the job; pin it explicitly for replayable pipelines.
  */
case class FuzzyDateParse(child: Expression, formats: Seq[String], dateOnly: Boolean,
    relativeBaseIso: Option[String] = None)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val base: java.time.LocalDateTime =
    relativeBaseIso.map(java.time.LocalDateTime.parse)
      .getOrElse(java.time.LocalDateTime.now())

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out =
      if (dateOnly) graft.functions.DateParse.parseDateIso(s, formats, base)
      else graft.functions.DateParse.parseDatetimeIso(s, formats, base)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmtsRef = ctx.addReferenceObj("formats", formats, "scala.collection.immutable.Seq")
    val baseRef = ctx.addReferenceObj("relBase", base, "java.time.LocalDateTime")
    val call = if (dateOnly) "parseDateIso" else "parseDatetimeIso"
    val out = ctx.freshName("iso")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |String $out = graft.functions.DateParse.$call($c.toString(), $fmtsRef, $baseRef);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($out); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyDateParse =
    copy(child = newChild)
}

object FuzzyDateParse {
  def parse_date(c: Column, formats: Seq[String] = Nil,
      relativeBase: Option[java.time.LocalDateTime] = None): Column =
    GraftShim.column(FuzzyDateParse(GraftShim.expression(c), formats,
      dateOnly = true, relativeBase.map(_.toString)))
  def parse_datetime(c: Column, formats: Seq[String] = Nil,
      relativeBase: Option[java.time.LocalDateTime] = None): Column =
    GraftShim.column(FuzzyDateParse(GraftShim.expression(c), formats,
      dateOnly = false, relativeBase.map(_.toString)))
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

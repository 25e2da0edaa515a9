package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** `quantize_vec(emb)` = `transform(emb, x -> cast(round(cast(x as
  * double) * 1000) as bigint))` as one native pass — the corpus-side
  * hot expression of every similarity operator; the HOF spelling is
  * CodegenFallback (interpreted + boxed per element).
  *
  * Rounding parity: Spark's `round` on DOUBLE is
  * `BigDecimal.valueOf(v).setScale(0, HALF_UP)` — ties away from zero,
  * decided on the double's shortest decimal representation. The kernel
  * replicates exactly that (NOT `Math.round`, which rounds -0.5 to 0),
  * keeping the DuckDB oracle hash-exact.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  // def, not val: child.dataType is only known once resolved
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"quantize_vec expects array<float|double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (elemIsFloat) QuantizeVec.computeF(arr) else QuantizeVec.computeD(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = if (elemIsFloat) "computeF" else "computeD"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.QuantizeVec.$call($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {

  private def roundHalfUp(v: Double): Long =
    // BigDecimal.valueOf throws on NaN/Inf (and under ANSI mode the HOF
    // twin's cast throws too). Degrade with the legacy double→long cast
    // instead (NaN→0, ±Inf→Long.Max/MinValue): one bad embedding
    // component must not kill a 100 TB job.
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v.toLong
    else java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  // Output declares containsNull=false, so a null element can't be
  // propagated and must not be silently read as 0.0 — fail with a
  // diagnosable message instead.
  private def rejectNull(arr: ArrayData, i: Int): Unit =
    if (arr.isNullAt(i)) throw new IllegalArgumentException(
      s"quantize_vec: null element at index $i — embeddings must be dense")

  def computeF(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      rejectNull(arr, i)
      out(i) = roundHalfUp(arr.getFloat(i).toDouble * 1000.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  def computeD(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      rejectNull(arr, i)
      out(i) = roundHalfUp(arr.getDouble(i) * 1000.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantize_vec(emb: Column): Column =
    GraftShim.column(QuantizeVec(GraftShim.expression(emb)))
}

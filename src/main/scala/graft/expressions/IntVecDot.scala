package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two BIGINT arrays — the hot inner loop
  * of every similarity operator.
  *
  * `zip_with` + `aggregate` express the same thing but are
  * `CodegenFallback` higher-order functions: every row allocates a
  * zipped ArrayData and boxes each element through the interpreter. This
  * native `BinaryExpression` generates a primitive `long` loop inside
  * whole-stage codegen — no allocation, no boxing. On the 100 TB target
  * the difference is the whole similarity stage's throughput.
  *
  * Nulls: null array -> null result; arrays are assumed element-complete
  * (quantized embeddings never carry null elements). Lengths may differ;
  * the loop runs over the shorter prefix (same as `zip_with` + `+` with
  * null absorption would effectively produce for our fixed-dim inputs).
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}

object IntVecDot {
  def int_vec_dot(a: Column, b: Column): Column =
    GraftShim.column(IntVecDot(GraftShim.expression(a), GraftShim.expression(b)))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import org.apache.spark.sql.graftshim.GraftShim

/** Johnson–Lindenstrauss sign projection kernel (Achlioptas 2003:
  * ±1 entries preserve pairwise distances like Gaussian projections,
  * with integer-only arithmetic).
  *
  * The projection matrix is DERIVED, not stored: entry `(j, k)` is the
  * parity of the portable 60-bit hash of `"rp:j:k"` — so every
  * executor, every engine, and every oracle reconstructs the identical
  * matrix from nothing but the two dims. Matrices are memoized per
  * (inDim, outDim) config.
  */
object SignProjectKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  /** `+1` where hash60("rp:<j>:<k>") is even, `-1` where odd. */
  def matrix(inDim: Int, outDim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((inDim, outDim), { case (d, m) =>
      Array.tabulate(m, d)((k, j) =>
        if (MinHashKernel.hash60(s"rp:$j:$k") % 2 == 0) 1L else -1L)
    })

  /** `y[k] = Σ_j sign(j,k) · qv[j]` — exact BIGINT on the quantized
    * grid. Vectors shorter than `inDim` project their prefix (missing
    * dims contribute 0), matching SQL's out-of-range list index → NULL
    * dropped by sum.
    */
  def project(qv: ArrayData, inDim: Int, outDim: Int): ArrayData = {
    val mat = matrix(inDim, outDim)
    val n = math.min(qv.numElements(), inDim)
    val out = new Array[Long](outDim)
    var k = 0
    while (k < outDim) {
      val row = mat(k)
      var acc = 0L
      var j = 0
      while (j < n) { acc += row(j) * qv.getLong(j); j += 1 }
      out(k) = acc
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `sign_project(qv, inDim, outDim)` — see [[SignProjectKernel.project]]. */
case class SignProject(child: Expression, inDim: Int, outDim: Int)
    extends UnaryExpression {
  require(inDim >= 1 && outDim >= 1, "projection dims must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignProjectKernel.project(input.asInstanceOf[ArrayData], inDim, outDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SignProjectKernel.project($c, $inDim, $outDim);")

  override protected def withNewChildInternal(newChild: Expression): SignProject =
    copy(child = newChild)
}

object SignProject {
  def sign_project(qv: Column, inDim: Int, outDim: Int): Column =
    GraftShim.column(SignProject(GraftShim.expression(qv), inDim, outDim))
}

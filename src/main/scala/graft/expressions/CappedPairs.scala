package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** `capped_pairs(sortedMembers, cap)` — skew-capped unordered pair
  * expansion of one LSH bucket of long ids, as a single native pass.
  *
  * Pair-set semantics are identical to
  * [[graft.operators.TextDedup.cappedBucketPairs]] (the HOF spelling,
  * kept as the parity reference and still used for struct-typed
  * members): the sorted member list is split into ceil(n/cap) slices;
  * all (a < b) pairs within each slice, plus one chain link between
  * consecutive slice heads — O(n·cap) pairs with connectivity to the
  * bucket keeper preserved. Buckets at or under the cap expand to ALL
  * pairs, byte-identical to uncapped behavior (which is what the
  * uncapped DuckDB oracles rely on at test scale).
  *
  * The HOF tree (transform ∘ flatten ∘ filter ∘ slice, nested twice) is
  * CodegenFallback — every bucket pays an interpreted expression walk
  * per CANDIDATE pair with boxed struct allocation, and the tree
  * dominates cold codegen compile time in the dedup queries.
  */
case class CappedLongPairs(child: Expression, cap: Int) extends UnaryExpression {
  require(cap >= 2, "cap must be >= 2")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CappedLongPairs.compute(input.asInstanceOf[ArrayData], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CappedLongPairs.compute($c, $cap);")

  override protected def withNewChildInternal(newChild: Expression): CappedLongPairs =
    copy(child = newChild)
}

object CappedLongPairs {

  def compute(sorted: ArrayData, cap: Int): ArrayData = {
    val n = sorted.numElements()
    val nSlices = (n + cap - 1) / cap
    var total = 0
    var s = 0
    while (s < nSlices) {
      val len = math.min(cap, n - s * cap)
      total += len * (len - 1) / 2
      s += 1
    }
    if (nSlices > 1) total += nSlices - 1 // chain links
    val out = new Array[Any](total)
    var k = 0
    s = 0
    while (s < nSlices) {
      val start = s * cap
      val len = math.min(cap, n - start)
      var i = 0
      while (i < len) {
        val a = sorted.getLong(start + i)
        var j = i + 1
        while (j < len) {
          out(k) = new GenericInternalRow(Array[Any](a, sorted.getLong(start + j)))
          k += 1
          j += 1
        }
        i += 1
      }
      if (s < nSlices - 1) {
        out(k) = new GenericInternalRow(
          Array[Any](sorted.getLong(start), sorted.getLong(start + cap)))
        k += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  def capped_pairs(sortedMembers: Column, cap: Int): Column =
    GraftShim.column(CappedLongPairs(GraftShim.expression(sortedMembers), cap))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (extension operator).
  *
  * `h = fold(chars)(acc => (acc * 31 + codepoint) mod 1_000_000_007)` —
  * deterministic, order-sensitive, cheap. Implemented as a native
  * Catalyst `UnaryExpression` WITH `doGenCode` so it stays inside
  * whole-stage codegen (no UDF serialization, no boxing in the hot
  * loop); this is the preferred extension point for scalar functions
  * (SURVEY §7.5).
  *
  * The modulus fits intermediate products in a signed 64-bit integer
  * (acc < 1e9+7, *31 + 0x10FFFF < 2^35), and iteration is over Unicode
  * code points so the DuckDB oracle
  * `list_reduce(list_transform(string_split(text,''), c -> ord(c)), ...)`
  * computes the identical value for any text.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + (long) $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def compute(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-level API. */
  def rolling_hash(c: Column): Column =
    GraftShim.column(RollingHash(GraftShim.expression(c)))
}

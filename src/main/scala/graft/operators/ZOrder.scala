package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout
  * (extension; SURVEY §2.10) — the clustering key behind data-skipping
  * file layouts: sorting a corpus by the bit-interleave of two
  * dimensions co-locates rows that are close in BOTH, so min/max
  * footer stats prune scans filtered on either dimension (the same
  * layout idea popularized by Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Pure integer bit arithmetic — `zvalue` and [[zvalueSql]] are
  * generated from the same loop, so Spark and DuckDB agree bit for
  * bit. Inputs must already be bucketed to `[0, 2^bits)`; the caller
  * owns dimension quantization (ranks, hash buckets, width-capped
  * divisions).
  */
object ZOrder {

  /** Interleave two `bits`-wide non-negative ints: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1. Output fits in 2×bits.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 30, "bits in (0, 30]")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _).cast("long")
  }

  /** DuckDB twin of [[zvalue]] — keep in lockstep. */
  def zvalueSql(a: String, b: String, bits: Int): String = {
    require(bits > 0 && bits <= 30, "bits in (0, 30]")
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((($a) >> $i) & 1) << ${2 * i})",
        s"(((($b) >> $i) & 1) << ${2 * i + 1})")
    }
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `nearest_centroids(vec, n2, model, topN)` — the cluster ids of the
  * `topN` nearest literal centroids by rounded cosine (ties to the
  * LOWEST cluster id), in rank order.
  *
  * Replaces the `greatest(k × struct(cosine(idot(v, lit(cent))), ...))`
  * spelling that every literal-centroid assignment (k-means assign,
  * IVF probe, PQ encode) built per call: that tree is ~15·k Catalyst
  * nodes PER assignment column — the PQ encode carried m=8 of them
  * (~2,000 nodes), and the driver re-paid analysis/optimization of the
  * tree on every job plus a multi-second Janino compile whenever the
  * generated source changed. This expression is ONE node whose
  * centroid data rides the references array (source text independent
  * of k, dim and the centroid values), with the scoring loop in
  * precompiled code.
  *
  * EXACTNESS (oracle-pinned): scores replicate the expression spelling
  * bit-for-bit — wrapping long dot product ([[IntVecDot]] semantics),
  * `dot.toDouble / (sqrt(n2v) * sqrt(n2c))` in that association,
  * Spark's `round(_, 6)` double semantics (NaN/Infinity pass through,
  * else `BigDecimal.valueOf(d).setScale(6, HALF_UP)`), and Spark's
  * double ordering for the ranking (`java.lang.Double.compare`: NaN
  * greatest, -0.0 < 0.0) with ties to the lowest cluster id — exactly
  * the `greatest`/`sort_array` order over (cos, -cluster) structs.
  *
  * Nulls: null vec or n2 -> null (the struct spelling would yield a
  * null-laden struct; callers never feed nulls — quantized corpora are
  * null-free by construction).
  */
case class NearestCentroids(
    left: Expression, right: Expression,
    cents: Array[Array[Long]], cn2s: Array[Long], clusters: Array[Long],
    topN: Int) extends BinaryExpression {
  require(cents.length == cn2s.length && cents.length == clusters.length
    && cents.nonEmpty, "model arrays must align and be non-empty")
  require(topN >= 1, "topN must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any, n2: Any): Any =
    NearestCentroids.compute(v.asInstanceOf[ArrayData],
      n2.asInstanceOf[Long], cents, cn2s, clusters, topN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("nnCents", cents, "long[][]")
    val n2sRef = ctx.addReferenceObj("nnN2s", cn2s, "long[]")
    val clRef = ctx.addReferenceObj("nnClusters", clusters, "long[]")
    nullSafeCodeGen(ctx, ev, (v, n2) =>
      s"""${ev.value} = graft.expressions.NearestCentroids.compute(
         |  $v, $n2, $centsRef, $n2sRef, $clRef, $topN);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)
}

object NearestCentroids {

  /** Spark `round(d, 6)` for doubles: NaN/Infinity pass through. */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData, n2: Long, cents: Array[Array[Long]],
      cn2s: Array[Long], clusters: Array[Long], topN: Int): ArrayData = {
    val k = clusters.length
    val sqn = math.sqrt(n2.toDouble)
    val cos = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = cents(i)
      val n = math.min(v.numElements(), c.length)
      var dot = 0L
      var j = 0
      while (j < n) { dot += v.getLong(j) * c(j); j += 1 }
      cos(i) = round6(dot.toDouble / (sqn * math.sqrt(cn2s(i).toDouble)))
      i += 1
    }
    // rank: cos desc (Spark double order), ties to lowest cluster id
    val order = new Array[Integer](k)
    i = 0
    while (i < k) { order(i) = i; i += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Double.compare(cos(b.intValue), cos(a.intValue))
        if (c != 0) c
        else java.lang.Long.compare(clusters(a.intValue), clusters(b.intValue))
      }
    })
    val m = math.min(topN, k)
    val out = new Array[Long](m)
    i = 0
    while (i < m) { out(i) = clusters(order(i).intValue); i += 1 }
    new GenericArrayData(out)
  }

  /** `(cluster, cent, n2)` triples must be passed pre-sorted by the
    * caller's convention; ranking ignores input order entirely.
    */
  def nearest_centroids(vec: Column, n2: Column,
      model: Seq[(Long, Seq[Long], Long)], topN: Int): Column =
    GraftShim.column(NearestCentroids(
      GraftShim.expression(vec), GraftShim.expression(n2),
      model.map(_._2.toArray).toArray, model.map(_._3).toArray,
      model.map(_._1).toArray, topN))
}

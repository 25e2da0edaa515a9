package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered membership (extension — SURVEY §7.2.8): "which
  * corpus rows match a benchmark/blocklist set?" at a scale where the
  * raw set no longer broadcasts.
  *
  * A plain broadcast semi-join dies when the membership set outgrows
  * the broadcast budget (1B 60-bit hashes ≈ 8 GB raw), but a Bloom
  * filter at 1% fpp is ~1.2 bits/element (~150 MB for 1B) — Spark's own
  * runtime row-level filtering uses exactly this trick. The pattern:
  *
  *   1. aggregate the set into a [[BloomFilter]] (distributed
  *      `BloomFilterAggregate`-style merge via `treeAggregate`-like
  *      RDD fold — each executor builds a partial, partials OR
  *      together);
  *   2. broadcast the filter and prefilter the corpus with
  *      `mightContain` (narrow, no shuffle — drops ~all non-members);
  *   3. exact-confirm the tiny survivor set with a real semi-join, so
  *      false positives never reach the output. The RESULT is exact;
  *      only the PRUNING is probabilistic.
  */
object Bloom {

  /** Build a Bloom filter over a LongType column, distributed:
    * per-partition partials merged with `mergeInPlace` (bitwise OR —
    * associative and commutative, so partition order is irrelevant).
    */
  def buildLong(df: DataFrame, c: String, expectedItems: Long, fpp: Double): BloomFilter =
    df.select(col(c).cast("long")).na.drop().rdd
      .mapPartitions { it =>
        val bf = BloomFilter.create(expectedItems, fpp)
        it.foreach(r => bf.putLong(r.getLong(0)))
        Iterator.single(bf)
      }
      .fold(BloomFilter.create(expectedItems, fpp))((a, b) => a.mergeInPlace(b))

  /** `mightContain` as a Column predicate: Catalyst's own
    * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * (SQL `might_contain`, the expression Spark's runtime row-level
    * filtering injects) over the serialized filter as a literal — the
    * exact mechanism Spark uses for its own injected bloom filters, so
    * the probe stays inside whole-stage codegen with zero UDF serde.
    * The wire format matches: [[BloomFilter.writeTo]] is what
    * `BloomFilterAggregate` serializes and `might_contain`
    * deserializes. NULL values read as false (a NULL key is never a
    * member), matching the prior UDF's contract.
    */
  def mightContainLong(bf: BloomFilter, c: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val shim = org.apache.spark.sql.graftshim.GraftShim
    val probe = shim.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        shim.expression(lit(bos.toByteArray)),
        shim.expression(c.cast("long"))))
    coalesce(probe, lit(false))
  }

  /** Persist a built filter (the cross-run artifact: a pipeline builds
    * the blocklist/benchmark bloom once, every later run loads it in
    * milliseconds instead of re-aggregating the set). Spark's
    * [[BloomFilter]] wire format via writeTo/readFrom.
    */
  def save(bf: BloomFilter, path: String): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try bf.writeTo(out) finally out.close()
  }

  def load(path: String): BloomFilter = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(path))
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Exact membership rows of `corpus` whose `keyCol` appears in
    * `set.setKeyCol`, with the bloom prefilter ahead of the confirming
    * left-semi join.
    */
  def membership(
      corpus: DataFrame, keyCol: String,
      set: DataFrame, setKeyCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = buildLong(set, setKeyCol, expectedItems, fpp)
    val pre = corpus.filter(mightContainLong(bf, col(keyCol)))
    pre.join(set.select(col(setKeyCol).as(keyCol)).distinct(), Seq(keyCol), "left_semi")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash

/** Document deduplication operators for large-scale training-data
  * pipelines (extension beyond the reference — SURVEY §7.2.8).
  *
  * Scale design (100 TB corpus):
  *   - exact dedup: one shuffle keyed by content hash with map-side
  *     partial aggregation; never materializes full texts on one node.
  *   - MinHash+LSH: per-row signature computation (narrow), then a
  *     shuffle keyed by (band, bandSignature) whose fan-in is bounded by
  *     bucket size; candidate verification touches only bucket pairs,
  *     never the n² cross product.
  *   - SimHash: per-row 60-bit fingerprint (narrow); near-dup blocking
  *     by 15-bit chunk equality (pigeonhole: hamming<=3 pairs must share
  *     a chunk), so the join is again bucket-bounded.
  *
  * All hashing is [[PortableHash.hash60]] (md5-based) so every step has
  * an exact DuckDB oracle.
  */
object TextDedup {

  /** Tokenize with the engine-wide tokenizer (lower + non-alphanumeric
    * split, no empties).
    */
  def tokensCol(text: Column): Column = Fts.tokens(Seq(text))

  /** w-word shingles as space-joined strings. Documents with fewer than
    * `w` tokens produce one shingle = the whole token list.
    */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokensCol(text)
    when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(w)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Exact dedup: keep the lowest id per identical text. Grouping is on
    * the 60-bit content hash + the text itself (hash only would risk
    * collisions; including text keeps correctness while the hash gives
    * the shuffle a well-distributed key).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(PortableHash.hash60(col(textCol)).as("content_hash"), col(textCol))
      .agg(min(col(idCol)).cast(LongType).as("keep_id"),
        count(lit(1)).cast(LongType).as("n_copies"))
      .select(col("keep_id"), col("content_hash"), col("n_copies"))

  /** MinHash signature: `numPerms` independent 60-bit hash families via
    * seed-prefixed md5; one `array_min` per family over the shingle set.
    * Pure per-row computation — md5 is evaluated once per (seed,shingle)
    * inside codegen'd builtins, no UDF, no shuffle.
    */
  def minhashSignature(text: Column, numPerms: Int = 16, w: Int = 3): Column = {
    val sh = shingles(text, w)
    transform(sequence(lit(0), lit(numPerms - 1)),
      s => array_min(transform(sh, x => PortableHash.hash60Seeded(s, x))))
  }

  /** LSH bands: split the signature into bands of `r` rows; the band key
    * is the 60-bit hash of the concatenated member hashes. Two documents
    * are candidates iff they agree on at least one full band.
    */
  def lshBands(sig: Column, numPerms: Int, r: Int = 2): Column = {
    require(numPerms % r == 0, "numPerms must divide into bands of r")
    transform(sequence(lit(0), lit(numPerms / r - 1)),
      b => struct(b.as("band"),
        PortableHash.hash60(concat_ws(",",
          transform(slice(sig, b * lit(r) + lit(1), lit(r)),
            x => x.cast(StringType)))).as("sig")))
  }

  /** Candidate pairs sharing >= 1 LSH band, verified with exact Jaccard
    * over distinct shingle sets. Returns (id_a, id_b, jaccard) with
    * id_a < id_b, one row per pair.
    *
    * The self-join is keyed on (band, bandSig) — the shuffle partitions
    * by bucket, so cost scales with sum(bucketSize²), not n².
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 16, r: Int = 2, w: Int = 3,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val withSig = df.select(
      col(idCol).cast(LongType).as("id"),
      array_distinct(shingles(col(textCol), w)).as("shingle_set"),
      minhashSignature(col(textCol), numPerms, w).as("sig"))
    val bands = withSig.select(col("id"), col("shingle_set"),
      explode(lshBands(col("sig"), numPerms, r)).as("b"))
      .select(col("id"), col("shingle_set"), col("b.band").as("band"), col("b.sig").as("bsig"))
    val a = bands.as("a")
    val b = bands.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.shingle_set").as("sh_a"), col("b.shingle_set").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast(DoubleType) - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash bit-fold given an already-materialized token-hash array
    * column. The 60 per-bit folds reference that stored array, so md5
    * cost is O(tokens), not O(tokens * bits) — see [[withSimhash]],
    * which inserts the projection boundary that materializes it.
    */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 60).map { b =>
      when(
        aggregate(hashes, lit(0L),
          (s, h) => s + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)) > 0L,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  /** SimHash: 60-bit fingerprint appended as `outCol`. Bit b is set iff
    * the frequency-weighted sum of (+1 / -1) over token-hash bit b is
    * positive.
    */
  def withSimhash(df: DataFrame, textCol: String, outCol: String = "sim"): DataFrame =
    df.withColumn("__tok_hashes", transform(tokensCol(col(textCol)), t => PortableHash.hash60(t)))
      .withColumn(outCol, simhashFromHashes(col("__tok_hashes")))
      .drop("__tok_hashes")

  /** SimHash near-dup pairs with hamming distance <= `maxHamming`,
    * blocked on equality of one of four 15-bit chunks (pigeonhole: any
    * pair within hamming 3 shares at least one chunk; `maxHamming` above
    * 3 trades recall for the same bounded join).
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = withSimhash(
      df.select(col(idCol).cast(LongType).as("id"), col(textCol)), textCol)
      .select(col("id"), col("sim"))
    val chunkStructs = (0 until 4).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(col("sim"), 15 * i).bitwiseAND(lit(0x7FFFL)).as("ckey"))
    }
    val chunked = withSim.select(col("id"), col("sim"),
      explode(array(chunkStructs: _*)).as("c"))
      .select(col("id"), col("sim"), col("c.chunk").as("chunk"), col("c.ckey").as("ckey"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).cast(LongType).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}

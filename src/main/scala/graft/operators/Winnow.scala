package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.expressions.{ShingleHashSeq60, WinnowPos}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03; the MOSS algorithm). Extension beyond the reference
  * (whose FTS surface stops at MATCH): position-robust fingerprint
  * selection for copy/plagiarism detection and local-overlap dedup —
  * unlike MinHash (a global-similarity sketch), winnowing GUARANTEES
  * any shared run of `k + w - 1` tokens contributes at least one shared
  * fingerprint, so short verbatim overlaps in otherwise-different
  * documents are caught.
  *
  * Per document: positional k-token shingle hashes (one native kernel
  * pass, [[graft.expressions.ShingleHashSeq60]]), then the winnowing
  * selection — in every window of `w` consecutive hashes select the
  * minimum, rightmost on ties ([[graft.expressions.WinnowPos]], O(P)
  * monotonic deque). Density is 2/(w+1) of positions — ~5x smaller than
  * the full shingle set at w=4, which is the index-size win.
  *
  * 100 TB shape: fingerprint selection is PER-ROW native compute inside
  * whole-stage codegen — no shuffle, no w-times candidate explode; only
  * selected fingerprints (a ~2/(w+1) fraction) leave the scan. The
  * pair join shuffles once keyed by fingerprint with the same
  * skew-capped bucket expansion as MinHash-LSH
  * ([[TextDedup.cappedBucketPairsLong]]).
  *
  * SQL replay (the oracle twin) expresses the same selection as a
  * per-window group-by with packed keys `h*w + (w-1-offset)` — pack
  * safety: `(2^60-1)*w + w-1 <= Long.MaxValue` exactly at `w = 8`, so
  * replayed configurations keep `w <= 8`. The kernel itself has no such
  * bound.
  */
object Winnow {

  /** Selected fingerprints, one row per (doc, selected position):
    * `(doc_id, pos, fp)` with `pos` 1-based over shingle positions.
    */
  def fingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
      ShingleHashSeq60.shingle_hash_seq60(col(textCol), k).as("hs"))
    base
      .select(col("doc_id"),
        explode(transform(WinnowPos.winnow_pos(col("hs"), w),
          p => struct(p.as("pos"),
            element_at(col("hs"), p.cast(IntegerType)).as("fp")))).as("sel"))
      .select(col("doc_id"), col("sel.pos").as("pos"), col("sel.fp").as("fp"))
  }

  /** Document pairs sharing at least `minShared` distinct winnow
    * fingerprints — the local-overlap detection join. One shuffle keyed
    * by fingerprint; buckets above `maxBucket` degrade to sliced pairs
    * + chain links (connectivity preserved, candidates O(n·cap)) like
    * the MinHash band join.
    */
  def sharedPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, minShared: Long = 6L,
      maxBucket: Int = 256): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp"))
      .distinct() // a fp selected at several positions counts once
    // identical-FINGERPRINT-SET pre-collapse (the skew-round contract
    // shared with the minhash family): fp buckets and shared counts run
    // over one representative per distinct fp set — a 2500-copy
    // boilerplate cluster otherwise makes every one of its fps a hot
    // bucket. Same-content copies emit identity star pairs with
    // shared = |fp set| (they share every fingerprint by definition).
    // The per-doc fp array is bounded by the doc's token count.
    val docSets = fps.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("fp"))).as("sset"))
      .select(col("doc_id").as("id"), col("sset"))
      .localCheckpoint(true) // collapseIdenticalSets requires a
      // materialized input (it projects it once per consumer)
    val (members, reps, collapsed) = TextDedup.collapseIdenticalSetsTagged(docSets)
    // bounded member rows (TextDedup.bucketedPairs): identical pair
    // multiset per fp-bucket, so the shared-fp counts are unchanged
    val repPairs = TextDedup.bucketedPairs(
        reps.select(col("id"), explode(col("sset")).as("fp")), Seq("fp"), maxBucket)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast(LongType).as("shared"))
      .filter(col("shared") >= minShared)
    // identity star pairs are EMPTY when nothing collapsed — skip the union
    if (!collapsed) repPairs
    else repPairs.unionByName(
      TextDedup.identityStarPairs(members)
        .join(reps.select(col("id").as("id_a"),
          size(col("sset")).cast(LongType).as("shared")), Seq("id_a"))
        .filter(col("shared") >= minShared)
        .select(col("id_a"), col("id_b"), col("shared")))
  }
}

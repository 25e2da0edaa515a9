package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.TextDedup

/** Streaming near-duplicate detection (extension — SURVEY §7.2.8): the
  * continuous twin of [[graft.operators.TextDedup.minhashPairs]].
  * Each arriving document is flagged against previously-seen documents
  * that share an LSH band bucket, with a similarity estimate from full
  * MinHash signature agreement — the ingest-time "have we seen this
  * before" filter a training-data pipeline runs on its crawl stream.
  *
  * Scale design:
  *  - The per-document signature pipeline (shingle hashes → MinHash →
  *    band keys) is the SAME narrow native-expression chain as the
  *    batch operator — no per-row state, stream-safe.
  *  - State lives per (band, bandSignature) bucket via
  *    `flatMapGroupsWithState`: at most `cap` members of (id, 16-long
  *    signature) each — O(buckets × cap) bounded memory, and the stream
  *    shuffles once on the bucket key exactly like the batch band join.
  *  - A new arrival compares against only its bucket's stored members
  *    (≤ cap), never the corpus: per-doc cost is O(bands × cap).
  *  - Estimated Jaccard = matching-component fraction of the two full
  *    signatures (the standard MinHash estimator, ±1/sqrt(numPerms));
  *    exact verification, when required, is a downstream join against
  *    the stored shingle sets — kept out of the hot stream on purpose.
  *
  * A pair sharing k bands is emitted k times with an identical estimate
  * (the estimate depends only on the signatures); consumers that need
  * one row per pair `distinct()` or `dropDuplicates("id_a","id_b")`
  * downstream. Within a micro-batch, bucket members are processed in
  * ascending id order, so emitted pairs always have id_a < id_b and the
  * "previously seen" relation is deterministic on replay.
  */
object StreamNearDup {

  case class BandDoc(band: Int, bsig: Long, doc_id: Long, sig: Array[Long])
  case class BucketState(ids: Array[Long], sigs: Array[Array[Long]])
  case class NearDupHit(id_a: Long, id_b: Long, band: Int, est_jaccard: Double)

  /** Narrow prep: one row per (band, document) with the full signature
    * attached. Works on batch and streaming DataFrames alike.
    */
  def bandDocs(
      df: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 16, r: Int = 2, w: Int = 3): Dataset[BandDoc] = {
    implicit val enc: Encoder[BandDoc] = Encoders.product[BandDoc]
    df.select(col(idCol).cast(LongType).as("doc_id"),
        TextDedup.minhashSignature(col(textCol), numPerms, w).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(TextDedup.lshBands(col("sig"), numPerms, r)).as("b"))
      .select(col("b.band").cast(IntegerType).as("band"),
        col("b.sig").as("bsig"), col("doc_id"), col("sig"))
      .as[BandDoc]
  }

  /** Stateful detection over a prepared band stream: emits a
    * [[NearDupHit]] for every (new doc, stored bucket member) whose
    * signature agreement is at least `minEstJaccard`. Buckets store the
    * FIRST `cap` members (skew guard, same rationale as the batch
    * per-bucket cap); later arrivals still probe but are not stored.
    */
  def detect(
      bands: Dataset[BandDoc], numPerms: Int = 16,
      minEstJaccard: Double = 0.5, cap: Int = 256): Dataset[NearDupHit] = {

    def update(key: (Int, Long), rows: Iterator[BandDoc],
        state: GroupState[BucketState]): Iterator[NearDupHit] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
      var ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
      var sigs = state.getOption.map(_.sigs).getOrElse(Array.empty[Array[Long]])
      rows.toSeq.sortBy(_.doc_id).foreach { d =>
        var i = 0
        while (i < ids.length) {
          if (ids(i) != d.doc_id) {
            var m = 0
            var j = 0
            while (j < numPerms) {
              if (sigs(i)(j) == d.sig(j)) m += 1
              j += 1
            }
            val est = m.toDouble / numPerms
            if (est >= minEstJaccard) {
              val (a, b) = if (ids(i) < d.doc_id) (ids(i), d.doc_id) else (d.doc_id, ids(i))
              out += NearDupHit(a, b, key._1, est)
            }
          }
          i += 1
        }
        if (ids.length < cap && !ids.contains(d.doc_id)) {
          ids = ids :+ d.doc_id
          sigs = sigs :+ d.sig
        }
      }
      state.update(BucketState(ids, sigs))
      out.iterator
    }

    implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val outEnc: Encoder[NearDupHit] = Encoders.product[NearDupHit]
    implicit val keyEnc: Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    bands.groupByKey(d => (d.band, d.bsig))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Convenience: text stream in, near-dup hits out. */
  def nearDupStream(
      df: DataFrame, idCol: String, textCol: String,
      numPerms: Int = 16, r: Int = 2, w: Int = 3,
      minEstJaccard: Double = 0.5, cap: Int = 256): Dataset[NearDupHit] =
    detect(bandDocs(df, idCol, textCol, numPerms, r, w), numPerms, minEstJaccard, cap)
}

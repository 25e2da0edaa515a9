package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling / dataset splitting for training pipelines
  * (extension — SURVEY §7.2.8).
  *
  * Assignment is keyed on a CONTENT hash, not row position: stable under
  * re-sharding, repartitioning, and incremental corpus growth — the
  * property a train/val/test split must have so a document never
  * migrates between splits across pipeline runs. Pure narrow codegen
  * per-row compute; no shuffle at any corpus size.
  */
object Sampling {

  /** Stable bucket in [0, nBuckets) from any string key. */
  def hashBucket(key: Column, nBuckets: Int): Column = {
    require(nBuckets > 0, "nBuckets must be positive")
    PortableHash.hash60(key) % nBuckets
  }

  /** train/validation/test label from a bucket: first `trainPct`% of
    * buckets are train, next `valPct`% validation, rest test.
    */
  def splitLabel(bucket: Column, trainPct: Int, valPct: Int, nBuckets: Int = 1000): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be non-negative and sum to <= 100")
    when(bucket < nBuckets * trainPct / 100, "train")
      .when(bucket < nBuckets * (trainPct + valPct) / 100, "validation")
      .otherwise("test")
  }

  /** Deterministic ~pct% sample predicate over a string key. */
  def samplePredicate(key: Column, pct: Int, nBuckets: Int = 1000): Column =
    hashBucket(key, nBuckets) < nBuckets * pct / 100
}

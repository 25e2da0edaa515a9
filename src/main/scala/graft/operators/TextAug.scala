package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** Seeded text augmentation (extension): deterministic token dropout —
  * the SimCSE/word-dropout family used to make augmented views for
  * contrastive training and regularization. Each token survives iff
  * `hash60(seed:doc:pos) % denom >= numer` (~numer/denom drop rate), so
  * one (corpus, seed) pair always yields the same view and a new seed
  * redraws it — reproducible epochs, no RNG state to ship (same policy
  * as [[Multimodal]]'s seeded crops).
  *
  * Pure per-row compute (a filter HOF over the token array with one
  * codegen'd hash per token) — no shuffle, stateless, streaming-safe.
  */
object TextAug {

  def tokenDropout(df: DataFrame, idCol: String, textCol: String,
      seed: Long, numer: Int = 1, denom: Int = 10): DataFrame = {
    require(numer >= 0 && numer < denom, "drop rate must be in [0,1)")
    val toks = Fts.tokens(Seq(col(textCol)))
    df.select(col(idCol).cast(LongType).as("doc_id"), toks.as("toks"))
      .withColumn("kept", filter(col("toks"), (t, i) =>
        PortableHash.hash60(
          concat(lit(s"$seed:"), col("doc_id").cast("string"),
            lit(":"), (i + 1).cast("string")))
          % denom >= numer))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        size(col("kept")).cast(LongType).as("n_kept"),
        array_join(col("kept"), " ").as("aug_text"))
  }
}

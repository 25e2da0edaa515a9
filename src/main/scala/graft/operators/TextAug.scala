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

  /** FIM — fill-in-the-middle transformation (Bavarian et al., "
    * Efficient Training of Language Models to Fill in the Middle",
    * 2022): reorder each document into PSM form
    * `<PRE> prefix <SUF> suffix <MID> middle` so a causal LM learns
    * infilling. Cut points are two seeded hash draws over [0, n]
    * (sorted), so the same (corpus, seed) always produces the same
    * split and a new seed redraws it — per-row compute, no shuffle,
    * streaming-safe.
    */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      seed: Long): DataFrame = {
    val toks = Fts.tokens(Seq(col(textCol)))
    def cut(tag: String) = PortableHash.hash60(
      concat(lit(s"$seed:"), col("doc_id").cast("string"), lit(s":$tag")))
    df.select(col(idCol).cast(LongType).as("doc_id"), toks.as("toks"))
      .withColumn("n", size(col("toks")).cast(LongType))
      .withColumn("a", pmod(cut("a"), col("n") + 1))
      .withColumn("b", pmod(cut("b"), col("n") + 1))
      .withColumn("lo", least(col("a"), col("b")))
      .withColumn("hi", greatest(col("a"), col("b")))
      .withColumn("pre", slice(col("toks"), lit(1), col("lo").cast("int")))
      .withColumn("mid", slice(col("toks"), (col("lo") + 1).cast("int"),
        (col("hi") - col("lo")).cast("int")))
      .withColumn("suf", slice(col("toks"), (col("hi") + 1).cast("int"),
        (col("n") - col("hi")).cast("int")))
      .select(col("doc_id"),
        size(col("pre")).cast(LongType).as("n_prefix"),
        size(col("mid")).cast(LongType).as("n_middle"),
        size(col("suf")).cast(LongType).as("n_suffix"),
        array_join(concat(
          array(lit("<PRE>")), col("pre"),
          array(lit("<SUF>")), col("suf"),
          array(lit("<MID>")), col("mid")), " ").as("fim_text"))
  }
}

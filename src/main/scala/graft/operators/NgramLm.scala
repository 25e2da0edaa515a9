package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CCNet-style n-gram language-model quality scoring (Wenzek et al.
  * 2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data", arXiv:1911.00359), integer-exact variant.
  *
  * CCNet scores web documents by the perplexity of a KenLM n-gram model
  * trained on a curated target corpus (Wikipedia) and keeps the
  * low-perplexity head of the distribution. This keeps that
  * architecture — an add-one-smoothed bigram model trained on marked
  * target exemplars, applied to every document — but replaces the float
  * log-probability with the integer per-bigram likelihood
  *
  *   p_ppm(w1 w2) = 1e6 * (c2(w1,w2) + 1) div (c1(w1) + V)
  *
  * where `c2` is the bigram's target count, `c1` the target count of
  * contexts starting with `w1` (so `sum_w2 c2 = c1` and the smoothed
  * distribution normalizes over the V-successor vocabulary), and V the
  * number of distinct successor tokens in the target. A document scores
  * the mean of its bigrams' `p_ppm` — high = target-like fluent text,
  * low = out-of-domain or garbled — and every value is exactly
  * reproducible cross-engine (the DuckDB oracle hash-matches), unlike
  * a float log-sum whose value depends on accumulation order.
  *
  * Complements [[Dsir]]: DSIR is a discriminative target-vs-raw
  * importance weight over hashed unigrams; this is a generative LM
  * likelihood over exact bigrams — the two disagree exactly where a
  * quality pipeline wants two opinions (rare-vocabulary target docs,
  * fluent-but-off-domain raw docs).
  *
  * 100 TB shape: ONE tokenize+bigram pass pre-aggregated to
  * `(doc_id, w1, w2, tf)` and materialized once for its two consumers
  * (model counts from the target slice, scoring over everything). The
  * model is vocabulary-bounded, not corpus-bounded; scoring joins are
  * keyed shuffles on `(w1, w2)` and `w1` with map-side partial
  * aggregation, and the scalar V rides a broadcast. Nothing
  * corpus-sized is ever broadcast or re-tokenized.
  */
object NgramLm {

  /** Compact `(doc_id, is_target, w1, w2, tf)` bigram table — the one
    * tokenize pass everything else reads. Documents with fewer than two
    * tokens contribute no rows (a bigram LM is undefined on them).
    */
  private def bigramTf(docs: DataFrame, isTarget: Column): DataFrame =
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"), isTarget.as("is_target"),
        Fts.tokens(Seq(col("text"))).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("is_target"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("bg"))
      .groupBy(col("doc_id"), col("is_target"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("tf"))

  /** Train the bigram model `(w1, w2, c2)` from a corpus with marked
    * target exemplars — the persistable artifact (same cross-run
    * contract as [[Dsir.weights]]): write with `.write.parquet(...)`,
    * reload, and score future batches with [[applyModel]] without
    * re-reading the reference corpus. Context counts and the successor
    * vocabulary are derived from it at apply time, so one table IS the
    * whole model.
    */
  def train(docs: DataFrame, isTarget: Column): DataFrame =
    bigramTf(docs.filter(isTarget), lit(true))
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).cast(LongType).as("c2"))

  /** Merge trained models (cross-run incremental training): the model
    * is a plain count table — a sufficient statistic — so counts ADD
    * and `merge(train(A), train(B)) == train(A ∪ B)` exactly (the spec
    * proves equality). Train per corpus drop, persist each, merge at
    * apply time; no drop ever re-reads another's data.
    */
  def mergeModels(models: Seq[DataFrame]): DataFrame = {
    require(models.nonEmpty, "merge at least one model")
    models.reduce(_ unionAll _)
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("c2")).cast(LongType).as("c2"))
  }

  /** Score a batch against a trained model: per document, the mean
    * integer bigram likelihood `lm_ppm` and the bigram count. Unseen
    * bigrams fall back to the smoothed floor `1e6 div (c1 + V)`; unseen
    * contexts to `1e6 div V`. Documents with < 2 tokens drop.
    */
  def applyModel(batch: DataFrame, model: DataFrame): DataFrame = {
    val m = model.localCheckpoint(true)
    val ctx = m.groupBy(col("w1")).agg(sum(col("c2")).cast(LongType).as("c1"))
    // V >= 1 keeps the smoothed divisor nonzero on an empty model
    // (every doc then scores the neutral 1e6).
    val v = m.agg(greatest(countDistinct(col("w2")), lit(1L)).cast(LongType).as("v"))
    bigramTf(batch, lit(false)).drop("is_target")
      .join(m, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("p_ppm",
        expr("1000000 * (coalesce(c2, 0) + 1) div (coalesce(c1, 0) + v)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_bigrams"),
        sum(col("tf") * col("p_ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").cast(LongType).as("lm_ppm"))
      .orderBy("doc_id")
  }

  /** Score pre-computed `(doc_id, w1, w2, tf)` bigrams against a count
    * model — the shared kernel behind [[score]]'s single-model path and
    * [[contrastScore]]'s two-model path.
    */
  private def applyCounts(bg: DataFrame, model: DataFrame,
      outCol: String): DataFrame = {
    val m = model.localCheckpoint(true)
    val ctx = m.groupBy(col("w1")).agg(sum(col("c2")).cast(LongType).as("c1"))
    val v = m.agg(greatest(countDistinct(col("w2")), lit(1L)).cast(LongType).as("v"))
    bg.join(m, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("p_ppm",
        expr("1000000 * (coalesce(c2, 0) + 1) div (coalesce(c1, 0) + v)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_bigrams"),
        sum(col("tf") * col("p_ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").cast(LongType).as(outCol))
  }

  /** Moore–Lewis cross-entropy-difference selection (Moore & Lewis
    * 2010, "Intelligent Selection of Language Model Training Data",
    * ACL): a document is worth keeping for a domain when the IN-DOMAIN
    * LM likes it MORE than a general LM trained on the whole pool —
    * the difference cancels generic fluency and leaves domain fit,
    * which a single-model score ([[score]]) conflates. Classic
    * data-selection for adapting a corpus to a target domain.
    *
    * Integer-exact rendering: both models are the same add-one-smoothed
    * bigram families as [[score]]; per document the mean likelihoods
    * `lm_in_ppm` / `lm_gen_ppm` and their difference `ml_delta_ppm`
    * (positive = select). ONE tokenize+bigram pass is materialized and
    * feeds both model builds and both scoring joins; everything
    * downstream is model-bounded keyed shuffles, nothing corpus-sized
    * broadcasts.
    */
  def contrastScore(docs: DataFrame, isInDomain: Column): DataFrame = {
    val bg = bigramTf(docs, isInDomain).localCheckpoint(true)
    // Both models in ONE (w1,w2)-keyed aggregation (r19, guide §2.4):
    // the general model is the sum over every row, the in-domain model
    // the sum over target rows — a conditional sum inside the same agg.
    // `c2_in = 0` reproduces the separate spelling's missed left join
    // exactly (coalesce(null, 0)); same for `c1_in` and the distinct
    // successor count, which only counts w2 with a positive target
    // count. Halves the model build (2 shuffles -> 1), the scoring
    // joins (4 -> 2), and the per-doc aggregations (2 + a doc_id join
    // -> 1), at byte-identical output.
    val m = bg.groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).cast(LongType).as("c2_gen"),
        coalesce(sum(when(col("is_target"), col("tf"))), lit(0L))
          .cast(LongType).as("c2_in"))
      .localCheckpoint(true) // feeds ctx + v + the scoring join
    val ctx = m.groupBy(col("w1"))
      .agg(sum(col("c2_gen")).cast(LongType).as("c1_gen"),
        sum(col("c2_in")).cast(LongType).as("c1_in"))
    val v = m.agg(
      greatest(countDistinct(col("w2")), lit(1L)).cast(LongType).as("v_gen"),
      greatest(countDistinct(when(col("c2_in") > 0, col("w2"))), lit(1L))
        .cast(LongType).as("v_in"))
    bg.drop("is_target")
      .join(m, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("p_in",
        expr("1000000 * (coalesce(c2_in, 0) + 1) div (coalesce(c1_in, 0) + v_in)"))
      .withColumn("p_gen",
        expr("1000000 * (coalesce(c2_gen, 0) + 1) div (coalesce(c1_gen, 0) + v_gen)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_bigrams"),
        sum(col("tf") * col("p_in")).as("s_in"),
        sum(col("tf") * col("p_gen")).as("s_gen"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s_in div n_bigrams").cast(LongType).as("lm_in_ppm"),
        expr("s_gen div n_bigrams").cast(LongType).as("lm_gen_ppm"))
      .withColumn("ml_delta_ppm", col("lm_in_ppm") - col("lm_gen_ppm"))
      .orderBy("doc_id")
  }

  /** Apply two FROZEN models — in-domain and general — to a batch: the
    * Moore–Lewis delta from persisted artifacts. [[contrastScore]]
    * trains both in-line from the pool being scored; this is the
    * incremental form (train once, persist both count tables, score
    * every future drop without re-reading the reference corpora).
    * ONE tokenize+bigram pass feeds both scoring joins.
    */
  def applyContrast(batch: DataFrame, inModel: DataFrame,
      genModel: DataFrame): DataFrame = {
    val bg = bigramTf(batch, lit(false)).drop("is_target").localCheckpoint(true)
    applyCounts(bg, inModel, "lm_in_ppm")
      .join(applyCounts(bg, genModel, "lm_gen_ppm").drop("n_bigrams"),
        Seq("doc_id"))
      .withColumn("ml_delta_ppm", col("lm_in_ppm") - col("lm_gen_ppm"))
      .orderBy("doc_id")
  }

  /** Train on the target slice and score the whole corpus in one call
    * (one materialized bigram pass feeds both).
    */
  def score(docs: DataFrame, isTarget: Column): DataFrame = {
    val bg = bigramTf(docs, isTarget).localCheckpoint(true)
    val model = bg.filter(col("is_target"))
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).cast(LongType).as("c2"))
      .localCheckpoint(true)
    val ctx = model.groupBy(col("w1")).agg(sum(col("c2")).cast(LongType).as("c1"))
    val v = model.agg(greatest(countDistinct(col("w2")), lit(1L)).cast(LongType).as("v"))
    bg.drop("is_target")
      .join(model, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("p_ppm",
        expr("1000000 * (coalesce(c2, 0) + 1) div (coalesce(c1, 0) + v)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_bigrams"),
        sum(col("tf") * col("p_ppm")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("s div n_bigrams").cast(LongType).as("lm_ppm"))
      .orderBy("doc_id")
  }
}

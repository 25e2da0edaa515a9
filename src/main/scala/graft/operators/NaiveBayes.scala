package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multinomial Naive-Bayes document classifier (McCallum & Nigam 1998,
  * "A Comparison of Event Models for Naive Bayes Text Classification"),
  * integer-exact variant — the supervised sibling of [[Dsir]] (binary
  * importance weights) and [[NgramLm]] (generative target likelihood):
  * train on labeled exemplars, predict a label for every document.
  * The pipeline use is domain tagging — classify unlabeled crawl text
  * against known source domains to route it into the training mixture.
  *
  * Per-label scoring follows the repo's ppm idiom instead of a float
  * log-sum: each token instance contributes the add-one-smoothed
  * integer likelihood
  *
  *   p_ppm(w | l) = 1e6 * (c(l,w) + 1) div (C(l) + V)
  *
  * where `c(l,w)` is the token's training count under label `l`,
  * `C(l) = sum_w c(l,w)`, and V the distinct training vocabulary — so
  * the smoothed distribution normalizes over V. A document's score for
  * `l` is the mean over its token instances (tokens absent from the
  * model fall back to the smoothed floor `1e6 div (C(l)+V)`), and the
  * prediction is the argmax with a deterministic label-ascending tie
  * break. The mean-likelihood rule is the linear (uniform-prior)
  * decision; every value is exactly reproducible cross-engine, which a
  * float log-posterior is not.
  *
  * The model is one `(label, w, c)` count table — a sufficient
  * statistic: persist with `.write.parquet`, reload anywhere, and
  * counts ADD across corpus drops ([[mergeModels]]; the spec proves
  * `merge(train(A), train(B)) == train(A ∪ B)` exactly).
  *
  * 100 TB shape: ONE tokenize pass pre-aggregated to `(doc_id, w, tf)`
  * and materialized once. The model is vocabulary × labels bounded, not
  * corpus bounded; scoring is a vocab-keyed join plus a per-doc
  * aggregation, and the per-label grid rides a broadcast of the
  * label-count table (|labels| rows). Nothing corpus-sized is
  * broadcast, re-tokenized, or collected.
  */
object NaiveBayes {

  /** `(doc_id, w, tf)` — the one tokenize pass. Documents with zero
    * tokens contribute no rows and receive no prediction.
    */
  private def tokenTf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(Fts.tokens(Seq(col("text")))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))

  /** Train the `(label, w, c)` count model from labeled documents. */
  def train(docs: DataFrame, labelCol: Column): DataFrame =
    docs.select(labelCol.cast("string").as("label"),
        explode(Fts.tokens(Seq(col("text")))).as("w"))
      .groupBy(col("label"), col("w"))
      .agg(count(lit(1)).cast(LongType).as("c"))

  /** Merge trained models: counts are sufficient statistics, so
    * `merge(train(A), train(B)) == train(A ∪ B)` exactly. Train per
    * corpus drop, persist each, merge at apply time.
    */
  def mergeModels(models: Seq[DataFrame]): DataFrame = {
    require(models.nonEmpty, "merge at least one model")
    models.reduce(_ unionAll _)
      .groupBy(col("label"), col("w"))
      .agg(sum(col("c")).cast(LongType).as("c"))
  }

  /** Classify a batch against a trained model: per document (>= 1
    * token) the argmax label, its mean token likelihood `score_ppm`,
    * and the runner-up margin `margin_ppm` (0 when the model has one
    * label — margin against itself is meaningless but keeps the schema
    * total).
    */
  def classify(batch: DataFrame, model: DataFrame): DataFrame =
    classifyTf(tokenTf(batch), model)

  /** Train on the labeled slice and classify every document in one
    * call (one materialized token pass feeds both). `labelCol` must be
    * non-null exactly on the training slice.
    */
  def classifySplit(docs: DataFrame, labelCol: Column): DataFrame = {
    val tf = docs
      .select(col("doc_id").cast(LongType).as("doc_id"),
        labelCol.cast("string").as("label"),
        explode(Fts.tokens(Seq(col("text")))).as("w"))
      .groupBy(col("doc_id"), col("label"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val model = tf.filter(col("label").isNotNull)
      .groupBy(col("label"), col("w"))
      .agg(sum(col("tf")).cast(LongType).as("c"))
    classifyTf(tf.drop("label"), model)
  }

  private def classifyTf(tf: DataFrame, model: DataFrame): DataFrame = {
    val m = model.localCheckpoint(true)
    // (label, cl): per-label token mass — |labels| rows, broadcastable.
    val lab = m.groupBy(col("label")).agg(sum(col("c")).cast(LongType).as("cl"))
    // V >= 1 keeps the smoothed divisor nonzero on an empty model.
    val v = m.agg(greatest(countDistinct(col("w")), lit(1L)).cast(LongType).as("v"))
    val labV = broadcast(lab.crossJoin(v))
    // Per-doc totals and the per-(doc, label) present-token partial sum;
    // tokens the model lacks for a label contribute the smoothed floor.
    val tot = tf.groupBy(col("doc_id")).agg(sum(col("tf")).cast(LongType).as("t"))
    val present = tf
      .join(m, Seq("w"))
      .join(broadcast(lab), Seq("label"))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * expr("1000000 * (c + 1) div (cl + v)")).as("sp"),
        sum(col("tf")).cast(LongType).as("tfp"))
    val scored = tot.crossJoin(labV)
      .join(present, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"), col("t"),
        (coalesce(col("sp"), lit(0L)) +
          (col("t") - coalesce(col("tfp"), lit(0L))) * expr("1000000 div (cl + v)"))
          .as("s"))
      .select(col("doc_id"), col("label"),
        expr("s div t").cast(LongType).as("score_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("label").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("margin_ppm",
        coalesce(col("score_ppm") - lead(col("score_ppm"), 1).over(w), lit(0L)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("score_ppm"), col("margin_ppm").cast(LongType).as("margin_ppm"))
  }
}

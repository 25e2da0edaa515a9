package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** T5-style span-corruption preprocessing (Raffel et al., JMLR 2020
  * §3.1.4): mask token spans, replace each span with a sentinel in the
  * encoder input, and emit the dropped spans keyed by the same
  * sentinels as the decoder target — the denoising objective's data
  * prep, run corpus-wide before pretraining.
  *
  * Deterministic re-expression: each position is masked iff
  * `hash60(seed:doc:pos) % denom < numer` (i.i.d. ~numer/denom rate);
  * maximal RUNS of masked positions are the spans (runs of an i.i.d.
  * mask have geometric lengths — the paper's mean-3 spans come from the
  * same family), numbered 0-based by start for `<extra_id_k>`
  * sentinels. Same (corpus, seed) → byte-identical pairs on any
  * engine; a new seed redraws the masks.
  *
  * Shape: posexplode to (doc, pos, token), mask = one codegen hash per
  * token, run starts via `lag`, sentinel ids via a running sum — every
  * window is PARTITIONED BY doc (no global window), then one per-doc
  * re-aggregation builds the (input, target) strings in position
  * order. Two keyed shuffles total, both on doc_id.
  *
  * Target convention: `<extra_id_k> span tokens...` per span,
  * concatenated in order (the paper's form, minus the terminal
  * sentinel — pinned here for engine parity).
  */
object SpanCorrupt {

  def corrupt(df: DataFrame, idCol: String, textCol: String,
      seed: Long, numer: Int = 3, denom: Int = 20): DataFrame = {
    require(numer >= 1 && numer < denom, "mask rate must be in (0,1)")
    val toks = Fts.tokens(Seq(col(textCol)))
    val pos = df
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(toks).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"), col("tok"))
      .withColumn("masked",
        PortableHash.hash60(
          concat(lit(s"$seed:"), col("doc_id").cast("string"),
            lit(":"), col("pos").cast("string")))
          % denom < numer)
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = pos
      .withColumn("run_start",
        col("masked") && !coalesce(lag(col("masked"), 1).over(byPos), lit(false)))
      .withColumn("span_k",
        sum(col("run_start").cast(LongType)).over(byPos) - 1) // 0-based span id
    val pieces = marked.select(col("doc_id"), col("pos"), col("masked"),
      col("run_start"), col("tok"),
      when(col("run_start"),
          concat(lit("<extra_id_"), col("span_k").cast("string"), lit(">")))
        .when(!col("masked"), col("tok"))
        .as("in_piece"), // masked non-start: absent from the input
      when(col("run_start"),
          concat(lit("<extra_id_"), col("span_k").cast("string"), lit("> "), col("tok")))
        .when(col("masked"), col("tok"))
        .as("tgt_piece")) // unmasked: absent from the target
    def joined(piece: String): Column =
      array_join(transform(
        array_sort(collect_list(when(col(piece).isNotNull,
          struct(col("pos"), col(piece).as("p"))))),
        x => x.getField("p")), " ")
    pieces.groupBy(col("doc_id"))
      .agg(sum(col("run_start").cast(LongType)).as("n_spans"),
        sum(col("masked").cast(LongType)).as("n_corrupted"),
        joined("in_piece").as("input_text"),
        joined("tgt_piece").as("target_text"))
  }
}

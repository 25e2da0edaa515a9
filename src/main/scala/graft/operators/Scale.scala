package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale join utilities (extension — builder-prompt scale
  * checklist): bucketing for shuffle-free co-located joins, salting for
  * skewed keys.
  */
object Scale {

  /** Write `df` as a bucketed+sorted managed table: rows are
    * hash-bucketed on `keys` into `numBuckets` files per partition, so
    * a subsequent join or aggregation on `keys` between tables bucketed
    * the same way runs with NO shuffle on either side — the join reads
    * co-located buckets directly (Spark requires
    * `spark.sql.sources.bucketing.enabled`, on by default).
    *
    * This is the materialized co-location strategy for repeatedly
    * joined 100 TB fact tables, where paying one bucketed write
    * amortizes every later shuffle.
    */
  def writeBucketed(
      df: DataFrame, tableName: String,
      keys: Seq[String], numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)

  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Salted equi-join for a skewed key distribution: the (large,
    * skewed) left side gets a deterministic salt in [0, salts) derived
    * from a high-cardinality discriminator column, the (smaller) right
    * side is replicated `salts` times, and the join runs on
    * (key, salt) — splitting each hot key's rows across `salts` tasks
    * instead of funnelling them into one.
    *
    * Results are exactly a plain inner equi-join on `key` (the salt is
    * internal). AQE's skew-join handles moderate skew at runtime;
    * explicit salting is the deterministic fallback for extreme
    * single-key skew where one key exceeds what any single task can
    * hold.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, discriminator: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val l = left.withColumn("__salt",
      pmod(hash(col(discriminator)), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Rank-order used by BOTH phases of [[topKPerGroup]]: `orderCol`
    * descending, `tieBreak` ascending, nulls last. The phase-1 pruner
    * and the phase-2 window MUST agree on this total order — with any
    * weaker phase-1 order, a row tied on `orderCol` but winning on
    * `tieBreak` could be pruned before the exact phase sees it.
    */
  private def rankOrdering(oi: Int, ti: Int): Ordering[org.apache.spark.sql.Row] =
    new Ordering[org.apache.spark.sql.Row] {
      @annotation.nowarn("cat=unchecked")
      private def cmp(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _) => 1 // nulls last
        case (_, null) => -1
        case (x: Comparable[Any] @unchecked, y) => x.compareTo(y)
        case _ => throw new IllegalArgumentException(
          s"topKPerGroup: non-comparable column value ${a.getClass}")
      }
      def compare(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Int = {
        val c = cmp(b.get(oi), a.get(oi)) // orderCol DESC
        if (c != 0) c else cmp(a.get(ti), b.get(ti)) // tieBreak ASC
      }
    }

  /** Phase 1 of [[topKPerGroup]]: per-PARTITION top-k per group via a
    * bounded heap — no shuffle, emits at most `partitions × groups × k`
    * rows. Exposed for the spec's shuffle-volume assertion.
    */
  private[graft] def partitionTopK(
      df: DataFrame, groupCol: String, orderCol: String, tieBreak: String,
      k: Int): DataFrame = {
    val schema = df.schema
    val gi = schema.fieldIndex(groupCol)
    val ord = rankOrdering(schema.fieldIndex(orderCol), schema.fieldIndex(tieBreak))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { it =>
      // head of each queue = the WORST currently-kept row (max under
      // the rank order), so admission is one compare + O(log k)
      val best = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[org.apache.spark.sql.Row]]
      it.foreach { r =>
        val pq = best.getOrElseUpdate(r.get(gi),
          scala.collection.mutable.PriorityQueue.empty(ord))
        if (pq.size < k) pq.enqueue(r)
        else if (ord.compare(r, pq.head) < 0) { pq.dequeue(); pq.enqueue(r) }
      }
      best.valuesIterator.flatMap(_.iterator)
    }
  }

  /** EXACT two-phase top-k per group: per-partition bounded-heap
    * pruning ([[partitionTopK]]), then the usual group-partitioned
    * window over the survivors. Semantically identical to
    * `row_number() OVER (PARTITION BY group ORDER BY order DESC, tie)
    * <= k` — the global winners necessarily survive phase 1 because
    * top-k of a union is contained in the union of per-part top-k's —
    * but the shuffle carries at most `partitions × groups × k` rows
    * instead of EVERY row. At 100 TB this is the difference between
    * shuffling the corpus to rank it and shuffling a rounding error of
    * it; it also deflates skew (a billion-row hot group arrives at its
    * window task pre-pruned to `partitions × k`). Appends 1-based
    * `rank`.
    */
  def topKPerGroup(
      df: DataFrame, groupCol: String, orderCol: String, tieBreak: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc_nulls_last, col(tieBreak).asc_nulls_last)
    partitionTopK(df, groupCol, orderCol, tieBreak, k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}

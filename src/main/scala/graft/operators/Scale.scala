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
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Scale-technique proofs: bucketed joins must drop the shuffle,
  * salted joins must equal their unsalted twins.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join runs with no exchange on either side") {
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 2)).toDF("key", "a", "b")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("key", "name")
    Scale.writeBucketed(facts, "graft_bucketed_facts", Seq("key"), 8)
    Scale.writeBucketed(dims, "graft_bucketed_dims", Seq("key"), 8)
    try {
      val f = Scale.readTable(spark, "graft_bucketed_facts")
      val d = Scale.readTable(spark, "graft_bucketed_dims")
      // disable broadcast so the join would OTHERWISE be a shuffle join
      val joined = f.hint("merge").join(d.hint("merge"), "key")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle either side:\n" + plan)
      assert(joined.count() === 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }

  test("salted join equals the plain join and spreads the hot key across salts") {
    // extreme skew: 90% of left rows share key 7
    val left = (1L to 1000L)
      .map(i => (if (i <= 900) 7L else i % 20, i))
      .toDF("key", "row_id")
    val right = (0L until 20L).map(i => (i, s"r_$i")).toDF("key", "payload")
    val plain = left.join(right, Seq("key"))
      .select("key", "row_id", "payload").collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(left, right, "key", "row_id", salts = 8)
      .select("key", "row_id", "payload").collect().map(_.toSeq).toSet
    assert(salted === plain)
    // the hot key's rows really do carry several distinct salts
    val saltSpread = left.filter($"key" === 7L)
      .withColumn("__salt", pmod(hash($"row_id"), lit(8)))
      .select("__salt").distinct().count()
    assert(saltSpread > 4, s"expected hot key spread over >4 salts, got $saltSpread")
  }
}

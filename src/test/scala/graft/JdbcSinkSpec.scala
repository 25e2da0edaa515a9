package graft

import graft.sinks.JdbcSink

/** K2/K3/K4 against embedded Derby — the only JDBC target in the
  * offline image. Proves DDL-then-distributed-append round-trips;
  * sqlite-jdbc would slot into the same calls.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  val url = "jdbc:derby:memory:graftdb;create=true"

  test("create + append + read back (K2), append again (K3), replace (K4)") {
    val df = Seq((1L, "President"), (2L, "Proposition 51")).toDF("id", "value")
    JdbcSink.createAndWrite(df, url, "office",
      "CREATE TABLE office (id BIGINT, value VARCHAR(100))")
    val back = spark.read.jdbc(url, "office", new java.util.Properties)
    assert(back.count() === 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ===
      Seq("President", "Proposition 51"))

    // K3: plain append, no DDL
    JdbcSink.append(Seq((3L, "State Assembly")).toDF("id", "value"), url, "office")
    assert(spark.read.jdbc(url, "office", new java.util.Properties).count() === 3)

    // K4: replace drops and recreates
    JdbcSink.replace(Seq((1L, "only")).toDF("id", "value"), url, "office",
      "CREATE TABLE office (id BIGINT, value VARCHAR(100))")
    val replaced = spark.read.jdbc(url, "office", new java.util.Properties)
    assert(replaced.collect().map(_.getString(1)).toSeq === Seq("only"))
  }

  test("tableExists probe (utils.py:257-264)") {
    assert(JdbcSink.tableExists(url, "office"))
    assert(!JdbcSink.tableExists(url, "nonexistent"))
  }
}

package graft

/** SQL-surface smoke: graft functions usable from spark.sql. Uses the
  * live-session registration path (the `withExtensions` builder hook is
  * equivalent but only applies to NEW sessions — `getOrCreate` ignores
  * it when one exists, as in a shared test JVM).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("SQL functions: rolling_hash, g_format, int_vec_dot, simhash60, fuzzy dates") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  rolling_hash('abc') AS rh,
        |  g_format(CAST(7.0 AS DOUBLE)) AS gf,
        |  int_vec_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
        |  fuzzy_date('3rd May 2017') AS fd,
        |  fuzzy_datetime('10pm on April 4 1938') AS fdt
      """.stripMargin).head
    assert(row.getAs[Long]("rh") === graft.expressions.RollingHash.compute("abc"))
    assert(row.getAs[String]("gf") === "7")
    assert(row.getAs[Long]("dot") === 32L)
    assert(row.getAs[String]("fd") === "2017-05-03")
    assert(row.getAs[String]("fdt") === "1938-04-04T22:00:00")
  }
}

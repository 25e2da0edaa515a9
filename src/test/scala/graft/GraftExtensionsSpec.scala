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

  test("SQL functions: dedup/similarity kernels usable with literal params") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  token_hash60('the quick fox') AS th,
        |  shingle_hash60('the quick brown fox', 3) AS sh,
        |  minhash_sig(shingle_hash60('the quick brown fox', 3), 4) AS sig,
        |  quantize_vec(array(CAST(0.5 AS DOUBLE), CAST(-0.25 AS DOUBLE))) AS qv,
        |  size(capped_pairs(array(1L, 2L, 3L), 64)) AS np,
        |  stopword_hits('the cat and the dog', array('the', 'and')) AS hits
      """.stripMargin).head
    assert(row.getSeq[Long](0).length === 3)
    assert(row.getSeq[Long](1).length === 2) // 4 tokens -> 2 shingles
    assert(row.getSeq[Long](2).length === 4)
    assert(row.getSeq[Long](3) === Seq(500L, -250L))
    assert(row.getAs[Int]("np") === 3) // all pairs of 3 ids
    assert(row.getAs[Long]("hits") === 3L)
  }

  test("SQL function: fts_match compiles the full MATCH grammar at plan time") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox", "news"),
      (2L, "a quick dog", "web"),
      (3L, "brown bears fish", "web")
    ).toDF("id", "txt", "src").createOrReplaceTempView("fts_docs")
    def ids(q: String): Seq[Long] =
      spark.sql(s"SELECT id FROM fts_docs WHERE fts_match(txt, '$q') ORDER BY id")
        .as[Long].collect().toSeq
    assert(ids("quick AND brown") === Seq(1L))
    assert(ids("\"quick brown\" OR bears") === Seq(1L, 3L))
    assert(ids("qui*") === Seq(1L, 2L))
    assert(ids("^brown") === Seq(3L))
    assert(ids("NEAR(quick fox, 1)") === Seq(1L))
    assert(ids("quick+brown") === Seq(1L))
    // multi-column form: terms may hit different columns of the row
    val multi = spark.sql(
      "SELECT id FROM fts_docs WHERE fts_match(txt, src, 'quick web') ORDER BY id")
      .as[Long].collect().toSeq
    assert(multi === Seq(2L))
    // a non-literal query is rejected at plan time with the DESIGNED
    // message, not an opaque eval-on-unresolved crash (column and
    // foldable-expression arguments both take this path)
    val nonLit = intercept[Exception] {
      spark.sql("SELECT fts_match(txt, txt) FROM fts_docs").collect()
    }
    assert(exceptionChain(nonLit).exists(_.getMessage != null) &&
      exceptionChain(nonLit).exists(e =>
        Option(e.getMessage).exists(_.contains("FTS query must be a string literal"))))
    val foldable = intercept[Exception] {
      spark.sql("SELECT fts_match(txt, concat('qui', 'ck')) FROM fts_docs").collect()
    }
    assert(exceptionChain(foldable).exists(e =>
      Option(e.getMessage).exists(_.contains("FTS query must be a string literal"))))
    // column filters need names - loud from SQL
    intercept[Exception] {
      spark.sql("SELECT fts_match(txt, 'txt:quick') FROM fts_docs").collect()
    }
    // the trigram twin: same grammar, SUBSTRING leaves ('row' crosses
    // the token boundary in 'brown', which token FTS cannot hit)
    def tids(q: String): Seq[Long] =
      spark.sql(s"SELECT id FROM fts_docs WHERE fts_trigram_match(txt, '$q') ORDER BY id")
        .as[Long].collect().toSeq
    assert(tids("row") === Seq(1L, 3L))
    assert(tids("\"ck bro\"") === Seq(1L))
    assert(tids("row NOT bears") === Seq(1L))
    assert(tids("^bro") === Seq(3L))
  }

  test("SQL function: nfc_normalize composes decomposed accents") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT nfc_normalize('Café') AS s").head.getString(0)
    assert(got === "Café" && got.length === 4)
  }
}

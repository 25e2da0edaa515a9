package graft

import org.apache.spark.sql.types._

import graft.sources.CsvLoader
import graft.sources.CsvLoader.CsvOptions

/** S1/S2 golden behavior (`tests/test_csvs_to_sqlite.py:41-71` schema and
  * row goldens; `utils.py:58-90` discovery).
  */
class CsvLoaderSpec extends SparkSpec {

  test("flat load infers the golden schema incl. the int-or-null rule") {
    val path = tempCsv("test.csv", Fixtures.CSV)
    val df = CsvLoader.load(spark, path)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("county") === StringType)
    assert(types("precinct") === IntegerType || types("precinct") === LongType)
    assert(types("office") === StringType)
    // ints + blanks must be integer, not double (SURVEY §1.2)
    assert(types("district") === IntegerType || types("district") === LongType)
    assert(types("votes") === IntegerType || types("votes") === LongType)
  }

  test("flat load preserves row order via rowid and NULLs blanks") {
    val path = tempCsv("test.csv", Fixtures.CSV)
    val rows = CsvLoader.load(spark, path).orderBy("rowid").collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[Long]("rowid")).toSeq === (1L to 6L))
    assert(rows(0).getAs[String]("candidate") === "Gary Johnson")
    assert(rows(0).isNullAt(rows(0).fieldIndex("district"))) // blank -> NULL
    assert(rows(2).isNullAt(rows(2).fieldIndex("party")))
    assert(rows(4).getAs[Number]("district").longValue === 7L)
    assert(rows(5).getAs[String]("candidate") === "Ryan K. Brown")
  }

  test("just_strings loads every column as TEXT (golden :661-669)") {
    val path = tempCsv("test.csv", Fixtures.CSV)
    val df = CsvLoader.load(spark, path, CsvOptions(justStrings = true))
    val nonRowid = df.schema.fields.filterNot(_.name == "rowid")
    assert(nonRowid.forall(_.dataType === StringType))
    val row = df.orderBy("rowid").collect()(4)
    assert(row.getAs[String]("district") === "7")
    assert(row.getAs[String]("votes") === "572")
  }

  test("discovery dedups colliding table names with -N suffixes (utils.py:62-71)") {
    val a = tempCsv("test.csv", Fixtures.CSV)
    val b = tempCsv("test.csv", Fixtures.CSV_MULTI)
    val names = CsvLoader.discover(Seq(a, b)).map(_._1)
    assert(names === Seq("test", "test-1"))
  }

  test("directory discovery walks recursively; table name = relative path sans ext") {
    val dir = java.nio.file.Files.createTempDirectory("graft-walk")
    java.nio.file.Files.writeString(dir.resolve("top.csv"), Fixtures.CSV)
    val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.writeString(sub.resolve("nested.csv"), Fixtures.CSV_MULTI)
    java.nio.file.Files.writeString(dir.resolve("ignored.txt"), "nope")
    val found = CsvLoader.discover(Seq(dir.toString)).toMap
    // reference naming: top-level files keep a "./" prefix (golden :328-339)
    assert(found.keySet === Set("sub/nested", "./top"))
  }

  test("latin-1 fallback loads a non-utf8 file (utils.py:28,36-49)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enc")
    val f = dir.resolve("latin.csv")
    val content = "name,place\ncafé,Zürich\n"
    java.nio.file.Files.write(f, content.getBytes("ISO-8859-1"))
    val df = CsvLoader.load(spark, f.toString)
    val row = df.collect()(0)
    assert(row.getAs[String]("name") === "café")
    assert(row.getAs[String]("place") === "Zürich")
  }

  test("gzipped CSV loads with encoding detection through the codec (pandas compression parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gz")
    def gz(name: String, bytes: Array[Byte]): String = {
      val f = dir.resolve(name)
      val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
      try out.write(bytes) finally out.close()
      f.toString
    }
    // UTF-8 content: must load as UTF-8 (not fall through to latin-1
    // because the probe saw gzip container bytes)
    val utf8 = gz("data.csv.gz", "name,place\ncafé,Zürich\n".getBytes("UTF-8"))
    val r1 = CsvLoader.load(spark, utf8).collect()(0)
    assert(r1.getAs[String]("name") === "café")
    // latin-1 content inside gzip: the fallback chain must still engage
    val lat = gz("lat.csv.gz", "name,place\ncafé,Zürich\n".getBytes("ISO-8859-1"))
    val r2 = CsvLoader.load(spark, lat).collect()(0)
    assert(r2.getAs[String]("place") === "Zürich")
    // naming parity: one splitext, like the reference (foo.csv.gz -> foo.csv)
    val found = CsvLoader.discover(Seq(utf8)).toMap
    assert(found.keySet === Set("data.csv"))
  }

  test("zip/xz/zst CSVs spool driver-side and load (pandas compression parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-codec")
    val content = "a,b\n1,x\n2,y\n".getBytes("UTF-8")
    def check(path: String): Unit = {
      val df = CsvLoader.load(spark, path)
      assert(df.columns.toSeq === Seq("a", "b", "rowid"))
      assert(df.orderBy("rowid").collect().map(_.getAs[String]("b")).toSeq === Seq("x", "y"))
    }
    val zipF = dir.resolve("z.csv.zip")
    val zo = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(zipF))
    zo.putNextEntry(new java.util.zip.ZipEntry("z.csv")); zo.write(content); zo.closeEntry(); zo.close()
    check(zipF.toString)
    val xzF = dir.resolve("x.csv.xz")
    val xo = new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(
      java.nio.file.Files.newOutputStream(xzF))
    try xo.write(content) finally xo.close()
    check(xzF.toString)
    val zstF = dir.resolve("s.csv.zst")
    val so = new org.apache.commons.compress.compressors.zstandard.ZstdCompressorOutputStream(
      java.nio.file.Files.newOutputStream(zstF))
    try so.write(content) finally so.close()
    check(zstF.toString)
  }

  test("custom separator (-s '|')") {
    val path = tempCsv("pipe.csv", "a|b\n1|x\n2|y\n")
    val df = CsvLoader.load(spark, path, CsvOptions(separator = "|"))
    assert(df.columns.toSeq === Seq("a", "b", "rowid"))
    assert(df.orderBy("rowid").collect()(1).getAs[String]("b") === "y")
  }

  test("quoted fields with embedded separators and quotes (QUOTE_MINIMAL)") {
    val path = tempCsv("q.csv", "name,desc\nx,\"has, comma\"\ny,\"has \"\"quote\"\"\"\n")
    val rows = CsvLoader.load(spark, path).orderBy("rowid").collect()
    assert(rows(0).getAs[String]("desc") === "has, comma")
    assert(rows(1).getAs[String]("desc") === "has \"quote\"")
  }

  test("QUOTE_NONE treats quotes as data") {
    val path = tempCsv("qn.csv", "a,b\n1,\"raw\n")
    val rows = CsvLoader.load(spark, path,
      CsvOptions(quoting = CsvLoader.QuoteMode.None, justStrings = true)).collect()
    assert(rows(0).getAs[String]("b") === "\"raw")
  }

  test("QUOTE_NONNUMERIC re-types integral columns to DOUBLE/REAL (utils.py:40)") {
    // Python csv QUOTE_NONNUMERIC converts unquoted fields to float on
    // read, so pandas under -q 2 yields float64 (sink REAL) where a
    // minimal-mode read infers int64 (sink INTEGER); quoted text stays
    // TEXT either way.
    val content = "id,count,name\n1,10,\"alpha\"\n2,20,\"beta\"\n"
    val minimal = CsvLoader.load(spark, tempCsv("q2.csv", content))
    val mtypes = minimal.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(mtypes("id") === IntegerType || mtypes("id") === LongType)
    assert(mtypes("count") === IntegerType || mtypes("count") === LongType)
    assert(mtypes("name") === StringType)

    val nonNum = CsvLoader.load(spark, tempCsv("q2.csv", content),
      CsvOptions(quoting = CsvLoader.QuoteMode.NonNumeric))
    val ntypes = nonNum.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(ntypes("id") === DoubleType)
    assert(ntypes("count") === DoubleType)
    assert(ntypes("name") === StringType) // quoted strings stay TEXT
    val row = nonNum.orderBy("rowid").collect()(1)
    assert(row.getAs[Double]("count") === 20.0)
    // and the SQLite DDL projection flips INTEGER -> REAL
    import graft.sinks.SqliteDdl
    assert(SqliteDdl.sqliteType(ntypes("count")) === "REAL")
    assert(SqliteDdl.sqliteType(mtypes("count")) === "INTEGER")
  }

  test("skip-errors drops malformed lines; default FAILFAST raises (utils.py:42)") {
    val path = tempCsv("bad.csv", "a,b\n1,x\n2,y,EXTRA,COLS\n3,z\n")
    val ok = CsvLoader.load(spark, path,
      CsvOptions(skipErrors = true, justStrings = true))
    assert(ok.select("a").collect().map(_.getString(0)).toSet === Set("1", "3"))
    val strict = CsvLoader.load(spark, path, CsvOptions(justStrings = true))
    intercept[Exception] { strict.collect() }
  }

  test("URL detection (utils.py:93-100)") {
    assert(CsvLoader.isUrl("https://example.com/data.csv"))
    assert(CsvLoader.isUrl("HTTP://x/y.csv"))
    assert(!CsvLoader.isUrl("/tmp/file.csv"))
    assert(!CsvLoader.isUrl("file.csv"))
  }

  test("URL load end-to-end over loopback HTTP: discovery name, rows, encoding fallback") {
    // A 127.0.0.1 fixture server (JDK HttpServer, zero egress): the S3
    // path — download, spool, S1 load — exercised against a REAL HTTP
    // endpoint instead of spec-verified-only plumbing.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, bytes: Array[Byte]): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          ex.sendResponseHeaders(200, bytes.length.toLong)
          try ex.getResponseBody.write(bytes) finally ex.close()
        }
      })
    val utf8Csv = "city,pop\nOakland,433000\nZürich,415000\n"
    serve("/data/cities.csv", utf8Csv.getBytes("UTF-8"))
    // latin-1 bytes (0xE9 = é) are INVALID utf-8: the loader must fall
    // back to the latin-1 leg of the encoding chain (utils.py's
    // pandas fallback), same as the local-file path
    serve("/enc/latin.csv", "name,n\ncafé,1\n".getBytes("ISO-8859-1"))
    server.start()
    try {
      val port = server.getAddress.getPort
      val citiesUrl = s"http://127.0.0.1:$port/data/cities.csv"
      // S2 discovery derives the table name from the URL path basename
      val discovered = CsvLoader.discover(Seq(citiesUrl))
      assert(discovered === Seq("cities" -> citiesUrl))
      val df = CsvLoader.loadUrl(spark, citiesUrl)
      val rows = df.orderBy("rowid").collect()
      assert(rows.map(_.getAs[String]("city")).toSeq === Seq("Oakland", "Zürich"))
      assert(rows.map(_.getAs[Number]("pop").longValue).toSeq === Seq(433000L, 415000L))
      val latin = CsvLoader.loadUrl(spark, s"http://127.0.0.1:$port/enc/latin.csv")
      assert(latin.collect().map(_.getAs[String]("name")).toSeq === Seq("café"))
    } finally server.stop(0)
  }
}

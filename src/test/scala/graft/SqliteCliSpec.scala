package graft

import java.nio.file.Files

import graft.sinks.SqliteCli

/** The reference's ACTUAL output surface — a SQLite `.db` file —
  * exercised against real SQLite through the `sqlite3` CLI (no JDBC
  * jar exists in this offline env; the binary ships with miniconda).
  * Goldens mirror the reference's own end-to-end tests byte-for-byte
  * (`tests/test_csvs_to_sqlite.py` test_flat :41-71, test_fts
  * :167-188, test_fts_and_extract_columns :200-229).
  */
class SqliteCliSpec extends SparkSpec {

  private def dbFile(): String =
    Files.createTempDirectory("graft-realdb").resolve("test.db").toString

  private def cfg(paths: Seq[String]) =
    Pipeline.Config(paths = paths, dbName = "test.db")

  test("real .db: golden PRAGMA table_info incl. the int-or-null district (test_flat)") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val csv = tempCsv("test.csv", Fixtures.CSV)
    val r = Pipeline.run(spark, cfg(Seq(csv)))
    val f = dbFile()
    SqliteCli.writeDb(f, r)
    val info = SqliteCli.query(f, "PRAGMA table_info([test]);")
      .map(row => (row(1).get, row(2).get))
    assert(info === Seq(
      "county" -> "TEXT", "precinct" -> "INTEGER", "office" -> "TEXT",
      "district" -> "INTEGER", "party" -> "TEXT", "candidate" -> "TEXT",
      "votes" -> "INTEGER"))
    val rows = SqliteCli.query(f,
      "SELECT county, precinct, office, district, party, candidate, votes FROM [test];")
    assert(rows.length === 6)
    assert(rows.head === Seq(Some("Yolo"), Some("100001"), Some("President"),
      None, Some("LIB"), Some("Gary Johnson"), Some("41")))
    assert(rows.last === Seq(Some("Yolo"), Some("100001"), Some("State Assembly"),
      Some("7"), Some("REP"), Some("Ryan K. Brown"), Some("291")))
  }

  test("real .db: FTS5 MATCH 'president gloria' finds exactly the reference row (test_fts)") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val csv = tempCsv("test.csv", Fixtures.CSV)
    val r = Pipeline.run(spark, cfg(Seq(csv))
      .copy(ftsColumns = Seq("office", "party", "candidate")))
    val f = dbFile()
    SqliteCli.writeDb(f, r)
    val hits = SqliteCli.query(f,
      """SELECT county, precinct, office, party, candidate
        |FROM test
        |WHERE rowid IN (
        |  SELECT rowid FROM test_fts WHERE test_fts MATCH 'president gloria'
        |);""".stripMargin)
    assert(hits === Seq(Seq(Some("Yolo"), Some("100001"), Some("President"),
      Some("PAF"), Some("Gloria Estela La Riva"))))
  }

  test("real .db: custom indexes land in sqlite_master with golden names (test_custom_indexes)") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val csv = tempCsv("test.csv", Fixtures.CSV)
    val r = Pipeline.run(spark, cfg(Seq(csv))
      .copy(indexes = Seq("county", "party,candidate")))
    val f = dbFile()
    SqliteCli.writeDb(f, r)
    val idx = SqliteCli.query(f,
      """SELECT name, tbl_name FROM sqlite_master
        |WHERE type = 'index' ORDER BY name;""".stripMargin)
      .map(row => (row(0).get, row(1).get))
    // The reference brackets an already-quoted name (`utils.py:496`), so the
    // stored index name includes literal double quotes — its own golden
    // (`tests/test_csvs_to_sqlite.py:567-569`) asserts exactly that.
    assert(idx === Seq("\"test_county\"" -> "test", "\"test_party_candidate\"" -> "test"))
  }

  test("real .db: -pk columns become real PRIMARY KEY columns (test_custom_primary_keys)") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val csv = tempCsv("pks.csv", Fixtures.CSV_CUSTOM_PRIMARY_KEYS)
    val r = Pipeline.run(spark, cfg(Seq(csv))
      .copy(primaryKeys = Seq("pk1", "pk2")))
    val f = dbFile()
    SqliteCli.writeDb(f, r)
    val pks = SqliteCli.query(f, "PRAGMA table_info([pks]);")
      .filter(row => row.last.get != "0").map(_(1).get)
    assert(pks === Seq("pk1", "pk2"))
  }

  test("real .db: incremental append extends facts, reuses lookup ids, syncs shadow FTS") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val out = Files.createTempDirectory("graft-realdb-out").toString
    val f = dbFile()
    val csv1 = tempCsv("test.csv", Fixtures.CSV_MULTI)
    val base = cfg(Seq(csv1)).copy(
      extractColumns = Seq("actor_1:actors:name", "actor_2:actors:name"),
      outputDir = Some(out))
    SqliteCli.writeDb(f, Pipeline.run(spark, base))
    // second run against the SAME db: one known actor, one new
    val csv2 = tempCsv("test.csv",
      "film,actor_1,actor_2\nSeven,Brad Pitt,Nicolas Cage\n")
    SqliteCli.writeDb(f, Pipeline.run(spark, base.copy(paths = Seq(csv2))))

    assert(SqliteCli.query(f, "SELECT count(*) FROM [test];")
      === Seq(Seq(Some("4"))))
    val actors = SqliteCli.query(f, "SELECT id, name FROM [actors] ORDER BY id;")
      .map(r => (r(0).get, r(1).get))
    assert(actors === Seq("1" -> "Sean Connery", "2" -> "Nicolas Cage",
      "3" -> "Diane Kruger", "4" -> "Orlando Bloom", "5" -> "Brad Pitt"))
    // the appended fact row encodes the reused id (2) and the new id (5)
    assert(SqliteCli.query(f,
      "SELECT actor_1, actor_2 FROM [test] WHERE film = 'Seven';")
      === Seq(Seq(Some("5"), Some("2"))))
    // shadow FTS extended with exactly the new value at rowid 5
    assert(SqliteCli.query(f,
      "SELECT rowid FROM [actors_name_fts] WHERE actors_name_fts MATCH 'Pitt';")
      === Seq(Seq(Some("5"))))
  }

  test("real .db: FTS over EXTRACTED columns matches original strings through lookups") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val csv = tempCsv("test.csv", Fixtures.CSV)
    val r = Pipeline.run(spark, cfg(Seq(csv)).copy(
      extractColumns = Seq("office", "party", "candidate"),
      ftsColumns = Seq("office", "party", "candidate")))
    val f = dbFile()
    SqliteCli.writeDb(f, r)
    // the fact table now stores integer ids; the FTS populate SQL
    // (byte-parity with utils.py:374-438) joined the lookup strings —
    // a MATCH on original text must resolve through real SQLite
    val hits = SqliteCli.query(f,
      """SELECT county,
        |  (SELECT value FROM candidate WHERE id = test.candidate)
        |FROM test
        |WHERE rowid IN (
        |  SELECT rowid FROM test_fts WHERE test_fts MATCH 'president gloria'
        |);""".stripMargin)
    assert(hits === Seq(Seq(Some("Yolo"), Some("Gloria Estela La Riva"))))
  }
}

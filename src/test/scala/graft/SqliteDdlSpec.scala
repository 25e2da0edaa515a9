package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Shape.SqliteType
import graft.sinks.SqliteDdl

/** K1–K5/E3/S8 goldens — emitted DDL strings
  * (`tests/test_utils.py:21-31`, `tests/test_csvs_to_sqlite.py:632-644`).
  */
class SqliteDdlSpec extends AnyFunSuite {

  val helloSchema = StructType(Seq(
    StructField("number", LongType), StructField("letter", StringType)))

  test("CREATE TABLE golden format (test_utils.py:21-31, index=False layout)") {
    val sql = SqliteDdl.createTableSql("hello", helloSchema)
    assert(sql ===
      "CREATE TABLE \"hello\" (\n\"number\" INTEGER,\n  \"letter\" TEXT\n)")
  }

  test("type mapping: long->INTEGER double->REAL string->TEXT binary->BLOB") {
    assert(SqliteDdl.sqliteType(LongType) === "INTEGER")
    assert(SqliteDdl.sqliteType(IntegerType) === "INTEGER")
    assert(SqliteDdl.sqliteType(DoubleType) === "REAL")
    assert(SqliteDdl.sqliteType(StringType) === "TEXT")
    assert(SqliteDdl.sqliteType(BinaryType) === "BLOB")
  }

  test("type overrides win over inference (utils.py:305; golden :295-298)") {
    val sql = SqliteDdl.createTableSql("t", helloSchema,
      typeOverrides = Map("number" -> SqliteType.Real))
    assert(sql.contains("\"number\" REAL"))
  }

  test("composite primary key appended by rewriting trailing paren (golden :632-644)") {
    val schema = StructType(Seq(
      StructField("pk1", StringType), StructField("pk2", StringType),
      StructField("name", LongType)))
    val sql = SqliteDdl.createTableSql("t", schema, primaryKeys = Seq("pk1", "pk2"))
    assert(sql.endsWith("  ,PRIMARY KEY ([pk1], [pk2])\n)"))
  }

  test("FK clauses + per-FK index (utils.py:337-357)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("office", LongType)))
    val sql = SqliteDdl.createTableWithForeignKeys(
      "test", schema, Map("office" -> ("office", "value")))
    assert(sql.contains("FOREIGN KEY (\"office\") REFERENCES [office](id)"))
    assert(sql.contains("CREATE INDEX [\"test_office\"] ON [test](\"office\");"))
    val noIdx = SqliteDdl.createTableWithForeignKeys(
      "test", schema, Map("office" -> ("office", "value")), indexFks = false)
    assert(!noIdx.contains("CREATE INDEX"))
  }

  test("FK for a column not in the table is skipped (utils.py:341)") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val sql = SqliteDdl.createTableWithForeignKeys(
      "test", schema, Map("missing" -> ("lookup", "value")))
    assert(!sql.contains("FOREIGN KEY"))
  }

  test("lookup table DDL (utils.py:161-169)") {
    assert(SqliteDdl.lookupTableSql("office", "value") ===
      "CREATE TABLE \"office\" (\n    \"id\" INTEGER PRIMARY KEY,\n    \"value\" TEXT\n);")
  }

  test("secondary index silently skipped when a column is missing (utils.py:490-502)") {
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", LongType)))
    assert(SqliteDdl.createIndexSql("t", schema, Seq("a", "b")) ===
      Some("CREATE INDEX [\"t_a_b\"] ON [t](\"a\", \"b\");"))
    assert(SqliteDdl.createIndexSql("t", schema, Seq("a", "nope")) === None)
  }

  test("db-name normalization (cli.py:184-187)") {
    assert(SqliteDdl.normalizeDbName("mydb") === "mydb.db")
    assert(SqliteDdl.normalizeDbName("mydb.sqlite") === "mydb.sqlite")
    intercept[IllegalArgumentException] { SqliteDdl.normalizeDbName("oops.csv") }
  }

  test("FTS virtual table DDL (utils.py:374-393)") {
    assert(SqliteDdl.ftsCreateSql("test", Seq("office", "party")) ===
      "CREATE VIRTUAL TABLE \"test_fts\" USING FTS5 (\"office\", \"party\", content=\"test\");")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvLoader.QuoteMode

class CliSpec extends AnyFunSuite {

  test("parses the reference's flag surface") {
    val c = Cli.parse(Seq(
      "a.csv", "b.csv", "out.db",
      "-s", "|", "-q", "3", "--skip-errors", "--replace-tables",
      "-t", "mytable",
      "-c", "office", "-c", "actor_1:actors:name",
      "-d", "date", "-dt", "datetime", "-df", "%y/%d/%m",
      "-pk", "pk1", "-pk", "pk2",
      "-f", "office", "-i", "col1,col2",
      "--shape", "county:Cty,votes:Vts(REAL)",
      "--filename-column", "src",
      "--fixed-column", "k", "v", "--fixed-column-int", "n", "7",
      "--fixed-column-float", "w", "1.5",
      "--no-index-fks", "--no-fulltext-fks", "--just-strings"))
    assert(c.paths === Seq("a.csv", "b.csv"))
    assert(c.dbName === "out.db")
    assert(c.separator === "|")
    assert(c.quoting === QuoteMode.None)
    assert(c.skipErrors && c.replaceTables && c.justStrings)
    assert(c.tableName === Some("mytable"))
    assert(c.extractColumns === Seq("office", "actor_1:actors:name"))
    assert(c.dateCols === Seq("date") && c.datetimeCols === Seq("datetime"))
    assert(c.datetimeFormats === Seq("%y/%d/%m"))
    assert(c.primaryKeys === Seq("pk1", "pk2"))
    assert(c.ftsColumns === Seq("office") && c.indexes === Seq("col1,col2"))
    assert(c.shape === Some("county:Cty,votes:Vts(REAL)"))
    assert(c.filenameColumn === Some("src"))
    assert(c.fixedColumns === Seq("k" -> "v"))
    assert(c.fixedColumnsInt === Seq("n" -> 7L))
    assert(c.fixedColumnsFloat === Seq("w" -> 1.5))
    assert(!c.indexFks && !c.fulltextFks)
  }

  test("rejects unknown options and missing positionals") {
    intercept[IllegalArgumentException] { Cli.parse(Seq("a.csv", "db", "--bogus")) }
    intercept[IllegalArgumentException] { Cli.parse(Seq("onlyone")) }
  }
}

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

  test("--version: click version_option shape, pinned to the mirrored reference release") {
    // cli.py:148 @click.version_option(); setup.py:5 VERSION = "1.3.1"
    assert(Cli.VersionLine === "graft.Cli, version 1.3.1-graft (csvs-to-sqlite-compatible)")
    assert(Cli.Version.startsWith("1.3.1"))
  }

  test("README help block matches Cli.HelpText (the reference's cog freshness test)") {
    // tests/test_csvs_to_sqlite.py:769-778 asserts README's embedded
    // --help output is current; same gate here, byte-for-byte
    val readme = java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))
    assert(readme.contains("```\n" + Cli.HelpText + "\n```"),
      "README's graft.Cli --help block is stale — paste Cli.HelpText into README.md")
    // every parsed option must appear in the help text, so a new flag
    // cannot land without documentation
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/Cli.scala"))
    val flags = "\"(--[a-z-]+)\"".r.findAllMatchIn(src).map(_.group(1)).toSet
    val undocumented = flags.filterNot(f => Cli.HelpText.contains(f))
    assert(undocumented.isEmpty, s"flags missing from HelpText: $undocumented")
  }
}

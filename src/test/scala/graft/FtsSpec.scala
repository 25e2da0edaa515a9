package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Extract, Fts}
import graft.operators.Extract.Source
import graft.sources.CsvLoader

/** S10–S13 goldens — MATCH semantics (implicit AND, case-insensitive,
  * cross-column), extracted-column reconstruction before indexing, and
  * the inverted-index path
  * (`tests/test_csvs_to_sqlite.py:167-188, 200-229, 263-281`).
  */
class FtsSpec extends SparkSpec {

  lazy val election = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV))
  val ftsCols = Seq("office", "party", "candidate")

  test("match 'president gloria': implicit AND across columns, case-insensitive (golden :176-188)") {
    val hits = election
      .filter(Fts.matches(ftsCols.map(col), "president gloria"))
      .select("county", "precinct", "office", "party", "candidate")
    assert(hits.collect().toSeq === Seq(
      Row("Yolo", 100001, "President", "PAF", "Gloria Estela La Riva")))
  }

  test("extracted columns are indexed through reconstruction joins (golden :200-229)") {
    val dicts = Seq("office", "party", "candidate").map { c =>
      c -> Extract.buildDictionary(Seq(Source(election, c)))
    }.toMap
    val encoded = dicts.foldLeft(election) { case (df, (c, d)) => Extract.encode(df, c, d) }
    // the reference LEFT JOINs each lookup to index ORIGINAL strings (utils.py:400-432)
    val reconstructed = dicts.foldLeft(encoded) { case (df, (c, d)) =>
      Extract.reconstruct(df, c, d)
    }
    val hits = reconstructed
      .filter(Fts.matches(ftsCols.map(col), "paf gloria"))
      .select("county", "precinct", "office", "party", "candidate")
    assert(hits.collect().toSeq === Seq(
      Row("Yolo", 100001, "President", "PAF", "Gloria Estela La Riva")))
  }

  test("multi-alias shared dictionary + match (golden :263-281)") {
    val films = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV_MULTI))
    val hits = films
      .filter(Fts.matches(Seq(col("film"), col("actor_1"), col("actor_2")), "kruger"))
      .orderBy("rowid").select("film", "actor_1", "actor_2")
    assert(hits.collect().toSeq === Seq(
      Row("National Treasure", "Nicolas Cage", "Diane Kruger"),
      Row("Troy", "Diane Kruger", "Orlando Bloom")))
  }

  test("no match when any term is absent (implicit AND)") {
    val hits = election.filter(Fts.matches(ftsCols.map(col), "president kruger"))
    assert(hits.count() === 0)
  }

  test("inverted index + matchRowids agrees with the predicate path") {
    val idx = Fts.invertedIndex(election, ftsCols)
    val viaIndex = Fts.matchRowids(idx, "president gloria").collect().map(_.getLong(0)).toSet
    val viaPred = election.filter(Fts.matches(ftsCols.map(col), "president gloria"))
      .select("rowid").collect().map(_.getLong(0)).toSet
    assert(viaIndex === viaPred)
    assert(viaIndex === Set(2L))
  }

  test("validateFtsColumns raises on missing column (golden :191-197)") {
    intercept[IllegalArgumentException] {
      Fts.validateFtsColumns(Map("test" -> election), Seq("badcolumn"))
    }
    Fts.validateFtsColumns(Map("test" -> election), Seq("office")) // no throw
  }

  test("fts version probe is constant FTS5 (utils.py:362-371)") {
    assert(Fts.bestFtsVersion === "FTS5")
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Extract
import graft.operators.Extract.Source
import graft.sources.CsvLoader

/** E1/E2 goldens — dictionary id order, %g canonicalization, shared
  * lookup tables, incremental reuse
  * (`tests/test_csvs_to_sqlite.py:74-146, 232-281`; `tests/test_utils.py:34-54`).
  */
class ExtractSpec extends SparkSpec {

  test("extract-spec grammar (cli.py:229-238)") {
    assert(Extract.parseSpec("office") === Extract.ExtractSpec("office", "office", "value"))
    assert(Extract.parseSpec("col:Table") === Extract.ExtractSpec("col", "Table", "value"))
    assert(Extract.parseSpec("actor_1:actors:name") ===
      Extract.ExtractSpec("actor_1", "actors", "name"))
  }

  lazy val election = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV))

  test("dictionary ids are 1-based in first-occurrence order (golden :130-146)") {
    val office = Extract.buildDictionary(Seq(Source(election, "office")))
    assert(office.orderBy("id").collect().toSeq === Seq(
      Row(1L, "President"), Row(2L, "Proposition 51"), Row(3L, "State Assembly")))
    val party = Extract.buildDictionary(Seq(Source(election, "party")))
    assert(party.orderBy("id").collect().toSeq === Seq(
      Row(1L, "LIB"), Row(2L, "PAF"), Row(3L, "DEM"), Row(4L, "REP")))
    val candidate = Extract.buildDictionary(Seq(Source(election, "candidate")))
    assert(candidate.count() === 6)
    assert(candidate.orderBy("id").collect()(0) === Row(1L, "Gary Johnson"))
    assert(candidate.orderBy("id").collect()(5) === Row(6L, "Ryan K. Brown"))
  }

  test("numeric column canonicalizes via %g: district -> [(1, '7')] (golden :112-113)") {
    // force the pandas situation: ints+nulls as DOUBLE, then extract
    val asFloat = election.withColumn("district", col("district").cast("double"))
    val district = Extract.buildDictionary(Seq(Source(asFloat, "district")))
    assert(district.collect().toSeq === Seq(Row(1L, "7")))
  }

  test("encode replaces values with ids, NULLs pass through (golden :104-110)") {
    val dict = Extract.buildDictionary(Seq(Source(election, "party")))
    val encoded = Extract.encode(election, "party", dict).orderBy("rowid")
    val vals = encoded.select("party").collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(vals.toSeq === Seq(1L, 2L, null, null, 3L, 4L))
  }

  test("two source columns share one lookup table (actors golden :252-261)") {
    val films = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV_MULTI))
    val actors = Extract.buildDictionary(
      Seq(Source(films, "actor_1"), Source(films, "actor_2")), valueColName = "name")
    assert(actors.orderBy("id").collect().toSeq === Seq(
      Row(1L, "Sean Connery"), Row(2L, "Nicolas Cage"),
      Row(3L, "Diane Kruger"), Row(4L, "Orlando Bloom")))
    // self-aliased reconstruction join (golden :256-259)
    val enc1 = Extract.encode(films, "actor_1", actors, valueColName = "name")
    val enc = Extract.encode(enc1, "actor_2", actors, valueColName = "name")
    val rec1 = Extract.reconstruct(enc, "actor_1", actors, valueColName = "name")
    val rec = Extract.reconstruct(rec1, "actor_2", actors, valueColName = "name")
      .orderBy("rowid").select("film", "actor_1", "actor_2")
    assert(rec.collect().toSeq === Seq(
      Row("The Rock", "Sean Connery", "Nicolas Cage"),
      Row("National Treasure", "Nicolas Cage", "Diane Kruger"),
      Row("Troy", "Diane Kruger", "Orlando Bloom")))
  }

  test("float scores dictionary (test_utils.py:34-54 golden)") {
    import spark.implicits._
    val df = Seq(("Terry", 0.5), ("Terry", 0.8), ("Owen", 0.7))
      .toDF("name", "score").withColumn("rowid", monotonically_increasing_id() + 1)
    val people = Extract.buildDictionary(Seq(Source(df, "name")), valueColName = "first_name")
    assert(people.orderBy("id").collect().toSeq === Seq(Row(1L, "Terry"), Row(2L, "Owen")))
    val encoded = Extract.encode(df, "name", people, valueColName = "first_name")
    assert(encoded.orderBy("rowid").select("name", "score").collect().toSeq ===
      Seq(Row(1L, 0.5), Row(1L, 0.8), Row(2L, 0.7)))
  }

  test("incremental: existing dictionary ids are reused, new values appended (utils.py:210-223)") {
    val existing = Extract.buildDictionary(Seq(Source(election, "office")))
    import spark.implicits._
    val more = Seq(("State Assembly", 1L), ("Senate", 2L), ("President", 3L))
      .toDF("office", "rowid")
    val extended = Extract.buildDictionary(Seq(Source(more, "office")), existing = Some(existing))
    assert(extended.orderBy("id").collect().toSeq === Seq(
      Row(1L, "President"), Row(2L, "Proposition 51"), Row(3L, "State Assembly"),
      Row(4L, "Senate")))
  }
}

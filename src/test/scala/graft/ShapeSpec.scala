package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Shape
import graft.operators.Shape._
import graft.sources.CsvLoader

/** P1/P2 goldens (`tests/test_csvs_to_sqlite.py:284-315` shape test;
  * `utils.py:441-487` grammar).
  */
class ShapeSpec extends SparkSpec {

  test("parse grammar: rename, type override, bare column") {
    assert(Shape.parseShape("county:Cty,votes:Vts(REAL)") === Seq(
      ShapeDefn("county", "Cty", None),
      ShapeDefn("votes", "Vts", Some(SqliteType.Real))))
    assert(Shape.parseShape("a") === Seq(ShapeDefn("a", "a", None)))
    assert(Shape.parseShape("a(integer)") === Seq(ShapeDefn("a", "a", Some(SqliteType.Integer))))
    assert(Shape.parseShape("a:b(TeXt)") === Seq(ShapeDefn("a", "b", Some(SqliteType.Text))))
  }

  test("apply shape prunes, renames and casts (golden: Vts REAL 41.0)") {
    val df = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV))
    val (shaped, overrides) = Shape.applyShape(df, Shape.parseShape("county:Cty,votes:Vts(REAL)"))
    assert(shaped.columns.toSeq === Seq("Cty", "Vts"))
    assert(shaped.schema("Vts").dataType === DoubleType)
    assert(overrides === Map("Vts" -> SqliteType.Real))
    val rows = shaped.collect()
    assert(rows(0) === Row("Yolo", 41.0))
  }

  test("shape REAL cast re-types a just-strings column (golden :694-732)") {
    val df = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV),
      CsvLoader.CsvOptions(justStrings = true))
    val (shaped, _) = Shape.applyShape(df, Shape.parseShape("county:Cty,votes:Vts(REAL)"))
    assert(shaped.schema("Vts").dataType === DoubleType)
    assert(shaped.collect()(0).getDouble(1) === 41.0)
  }

  test("filename column carries the derived table name (golden :328-339)") {
    val df = CsvLoader.load(spark, tempCsv("test1.csv", Fixtures.CSV))
    val out = Shape.withFilenameColumn(df, "filename", "test1")
    assert(out.select("filename").distinct.collect().map(_.getString(0)).toSeq === Seq("test1"))
  }

  test("fixed columns keep their declared types (golden :401-404)") {
    val df = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV))
    val out = Shape.withFixedColumns(df, Seq(
      "col_s" -> FixedStr("text"), "col_i" -> FixedInt(3L), "col_f" -> FixedFloat(1.4)))
    assert(out.schema("col_s").dataType === StringType)
    assert(out.schema("col_i").dataType === LongType)
    assert(out.schema("col_f").dataType === DoubleType)
    val r = out.select("col_s", "col_i", "col_f").head
    assert(r === Row("text", 3L, 1.4))
  }
}

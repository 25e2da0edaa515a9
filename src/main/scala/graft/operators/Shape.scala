package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shape specs: parse (P1, `utils.py:441-466`) and apply (P2,
  * `utils.py:469-487`).
  *
  * Grammar: comma-separated `csvcol:dbcol(TYPE)` where `:dbcol` and
  * `(TYPE)` are both optional and TYPE is one of SQLite's five storage
  * classes, case-insensitive.
  */
object Shape {

  sealed abstract class SqliteType(val name: String) {
    /** Spark type this storage class maps to (SURVEY §1.2). */
    def spark: DataType = this match {
      case SqliteType.Integer => LongType
      case SqliteType.Real    => DoubleType
      case _                  => StringType // TEXT, BLOB, NUMERIC stay textual
    }
  }
  object SqliteType {
    case object Text extends SqliteType("TEXT")
    case object Integer extends SqliteType("INTEGER")
    case object Real extends SqliteType("REAL")
    case object Blob extends SqliteType("BLOB")
    case object Numeric extends SqliteType("NUMERIC")
    val all: Seq[SqliteType] = Seq(Text, Integer, Real, Blob, Numeric)
    def parse(s: String): SqliteType =
      all.find(_.name.equalsIgnoreCase(s)).getOrElse(
        throw new IllegalArgumentException(s"Unknown SQLite type: $s"))
  }

  case class ShapeDefn(csvName: String, dbName: String, typeOverride: Option[SqliteType])

  private val typeRe = "(?i)\\((real|integer|text|blob|numeric)\\)$".r

  /** Parse `"county:Cty,votes:Vts(REAL)"`. */
  def parseShape(shape: String): Seq[ShapeDefn] =
    shape.split(",").toSeq.filter(_.nonEmpty).map { item0 =>
      val item = item0.trim
      val (base, tpe) = typeRe.findFirstMatchIn(item) match {
        case Some(m) => (item.substring(0, m.start), Some(SqliteType.parse(m.group(1))))
        case None    => (item, None)
      }
      base.split(":", 2) match {
        case Array(csv, db) => ShapeDefn(csv, db, tpe)
        case Array(csv)     => ShapeDefn(csv, csv, tpe)
      }
    }

  /** Apply a shape: keep only shaped columns (in shape order), rename,
    * and cast per type override. Returns the shaped frame plus the
    * override map the sink threads into DDL generation
    * (`apply_shape` returns `sql_type_overrides`, `utils.py:469-487`).
    */
  def applyShape(df: DataFrame, shape: Seq[ShapeDefn]): (DataFrame, Map[String, SqliteType]) = {
    val cols: Seq[Column] = shape.map { d =>
      val c = col(d.csvName)
      d.typeOverride.map(t => c.cast(t.spark)).getOrElse(c).as(d.dbName)
    }
    val overrides = shape.flatMap(d => d.typeOverride.map(d.dbName -> _)).toMap
    (df.select(cols: _*), overrides)
  }

  /** P3: constant filename column — the value is the derived table name,
    * not the physical path (`cli.py:202-205`; golden
    * `tests/test_csvs_to_sqlite.py:328-339`).
    */
  def withFilenameColumn(df: DataFrame, colName: String, tableName: String): DataFrame =
    df.withColumn(colName, lit(tableName))

  /** P4: typed fixed columns (`cli.py:206-220`). */
  sealed trait FixedValue { def toLit: Column }
  case class FixedStr(v: String) extends FixedValue { def toLit: Column = lit(v) }
  case class FixedInt(v: Long) extends FixedValue { def toLit: Column = lit(v) }
  case class FixedFloat(v: Double) extends FixedValue { def toLit: Column = lit(v) }

  def withFixedColumns(df: DataFrame, fixed: Seq[(String, FixedValue)]): DataFrame =
    fixed.foldLeft(df) { case (acc, (name, v)) => acc.withColumn(name, v.toLit) }
}

package graft.sinks

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Relational sink via JDBC (reference K2/K3/K4: create + bulk append /
  * append to existing / drop + recreate — `utils.py:357-359`,
  * `cli.py:245-261`).
  *
  * The reference's target is SQLite; this environment ships no
  * sqlite-jdbc jar (SURVEY §7.2.6 risk), so the write path is
  * target-agnostic: driver-side DDL through a plain JDBC `Statement`,
  * rows through `df.write.jdbc` (which distributes the INSERT work
  * across executors — each partition opens its own connection). The
  * spec exercises it against embedded Derby; with sqlite-jdbc on the
  * classpath the same calls hit a .db file, using
  * [[SqliteDdl.createTableSql]] output as the DDL.
  */
object JdbcSink {

  /** Execute one DDL statement driver-side. */
  def executeDdl(url: String, ddl: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
    } finally conn.close()
  }

  def tableExists(url: String, table: String): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      val any = rs.next()
      rs.close()
      any
    } finally conn.close()
  }

  /** K3: append rows to an existing table (no DDL work). */
  def append(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("append").jdbc(url, table, new Properties)

  /** K2: create (caller-provided DDL) then append. */
  def createAndWrite(df: DataFrame, url: String, table: String, ddl: String): Unit = {
    executeDdl(url, ddl)
    append(df, url, table)
  }

  /** K4: drop + recreate (`--replace-tables`). */
  def replace(df: DataFrame, url: String, table: String, ddl: String): Unit = {
    if (tableExists(url, table)) executeDdl(url, s"DROP TABLE $table")
    createAndWrite(df, url, table, ddl)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.CsvLoader

object Scratch {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scratch] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count()
    val csv = "/tmp/h2h/lineitem.csv"
    t("raw read justStrings no rowid")(
      CsvLoader.load(spark, csv, CsvLoader.CsvOptions(justStrings = true, attachRowid = false)).count())
    t("raw read inferSchema no rowid")(
      CsvLoader.load(spark, csv, CsvLoader.CsvOptions(attachRowid = false)).count())
    t("read + rowid")(
      CsvLoader.load(spark, csv).count())
    val df = CsvLoader.load(spark, csv)
    t("rowid + persist")(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count())
    t("dict build x2 from persisted") {
      import graft.operators.Extract
      Extract.buildDictionary(Seq(Extract.Source(df, "l_returnflag"))).count() +
      Extract.buildDictionary(Seq(Extract.Source(df, "l_linestatus"))).count()
    }
    t("encode + write") {
      import graft.operators.Extract
      val d1 = Extract.buildDictionary(Seq(Extract.Source(df, "l_returnflag")))
      val enc = Extract.encode(df, "l_returnflag", d1)
      enc.write.mode("overwrite").parquet("/tmp/h2h/scratch.parquet")
      0L
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Row-count probe for output-bound scale analysis (dev probe):
  * `sbt "runMain graft.tools.PairCount <query> <dirA> <dirB>"`.
  */
object PairCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.drop(1))
      println(s"[paircount] $name @ $dir rows=${graft.SparkEntry.queries(name)(spark, dir).count()}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump one graded query's executed plan (dev probe).
  * `sbt "runMain graft.tools.PlanDump <query> [sfDir]"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.count()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

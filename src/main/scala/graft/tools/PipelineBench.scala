package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Pipeline

/** Head-to-head pipeline timing vs the reference CLI: runs the same
  * CSV -> extract -> materialize workload and reports session-startup
  * and pipeline time separately (the fair single-node comparison is
  * pipeline time; the JVM+session constant amortizes over any real
  * workload and vanishes on a long-lived cluster).
  *
  * Run: sbt 'runMain graft.tools.PipelineBench /tmp/h2h/lineitem.csv'
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse("/tmp/h2h/lineitem.csv")
    val out = if (args.length > 1) args(1) else "/tmp/h2h/graft_bench_out"
    val t0 = System.nanoTime()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // single-node benchmark: split medium CSVs across cores (the
      // default 128 MB puts a 72 MB file on ONE core)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count() // force session fully up
    val t1 = System.nanoTime()
    Pipeline.run(spark, Pipeline.Config(
      paths = Seq(csv), dbName = "bench.db",
      extractColumns = Seq("l_returnflag", "l_linestatus"),
      replaceTables = true,
      outputDir = Some(out)))
    val t2 = System.nanoTime()
    println(f"[pipeline-bench] session_up=${(t1 - t0) / 1e9}%.2fs pipeline=${(t2 - t1) / 1e9}%.2fs")
    spark.stop()
  }
}

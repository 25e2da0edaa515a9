package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: explain(formatted) audit of the round-8 restructured
  * queries — confirms single evaluation (scans appear once per intended
  * pass) and broadcast joins where hinted.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("x_oov_rate", "x_approx_length_quantiles",
        "x_heavy_hitters_sketch", "x_approx_distinct_parts", "x_ppjoin_pairs")) {
      println(s"===== $name =====")
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // compress: keep operator lines only
      plan.linesIterator.filter(l => l.contains("(") && !l.trim.startsWith("Output")
        && !l.trim.startsWith("Arguments") && !l.trim.startsWith("Input")
        && !l.trim.startsWith("Functions") && !l.trim.startsWith("Keys")
        && !l.trim.startsWith("Aggregate Attributes") && !l.trim.startsWith("Results")
        && !l.trim.startsWith("Condition") && !l.trim.startsWith("Join condition")
        && !l.trim.startsWith("Left keys") && !l.trim.startsWith("Right keys"))
        .take(60).foreach(println)
    }
    spark.stop()
  }
}

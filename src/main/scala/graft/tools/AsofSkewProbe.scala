package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Dev-only: hot-key A/B of the composed (union+window) vs custom-exec
  * as-of forms. Run: sbt 'runMain graft.tools.AsofSkewProbe'
  */
object AsofSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // ONE hot key: every row lands in a single shuffle partition
    val left = spark.range(n).select(lit(1L).as("k"), (col("id") * 2).as("ts"),
      col("id").as("lid"))
    val right = spark.range(n).select(lit(1L).as("k"), (col("id") * 2 + 1).as("ts"),
      col("id").as("payload"), (col("id") % 97).cast("double").as("v"))
    def time(label: String)(f: => Long): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[asof-skew] $label%-12s min=${reps.map(_._1).min}%6.2fs rows=${reps.head._2}")
    }
    // warmup both paths on tiny data
    AsOf.joinPrior(left.limit(10), right.limit(10), "k", "ts", Seq("payload", "v")).count()
    AsOf.joinPriorMerge(left.limit(10), right.limit(10), "k", "ts", Seq("payload", "v")).count()
    time("composed")(AsOf.joinPrior(left, right, "k", "ts", Seq("payload", "v"))
      .filter(col("asof").isNotNull).count())
    time("exec")(AsOf.joinPriorMerge(left, right, "k", "ts", Seq("payload", "v"))
      .filter(col("asof").isNotNull).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only oscillator probe (VERDICT r16 #3): run named graded queries
  * N times IN-PROCESS and print every rep, to separate code-path
  * variance from box/JVM state. Same session config as graft.Bench.
  *
  * Run: sbt 'runMain graft.tools.OscProbe x_ngram_jaccard,x_vocab_coverage 20 [sfDir]'
  */
object OscProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("x_ngram_jaccard").split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.load(spark, dir, "lineitem").count() // session warmup

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[osc] $name rep$i%02d ${s}%6.3fs")
        s
      }
      val sorted = times.sorted
      println(f"[osc] $name SUMMARY min=${sorted.head}%.3f " +
        f"median=${sorted((reps - 1) / 2)}%.3f max=${sorted.last}%.3f " +
        f"spread=${sorted.last / sorted.head}%.2fx " +
        f"firstRep=${times.head}%.3f restMin=${sorted.tail.headOption.getOrElse(0.0)}%.3f")
    }
    spark.stop()
  }
}

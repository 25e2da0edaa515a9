package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run one graded query N times in-session and print per-rep
  * wall plus cumulative JVM GC time — separates compute from collector
  * pressure when a rep sequence degrades (r18: rep2 of the CC chain ran
  * 3x rep1 inside one session).
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    (1 to reps).foreach { i =>
      val g0 = gcMs
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[rep] $name rep$i%02d ${wall}%6.2fs  gc=${(gcMs - g0) / 1000.0}%5.2fs  blocks=${spark.sparkContext.getPersistentRDDs.size}")
    }
    spark.stop()
  }
}

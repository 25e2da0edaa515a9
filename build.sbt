ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "csvstosqlitespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ {
  // Heap sizing for the forked driver+executor JVM (local mode: one
  // process does both jobs). The old 8g default left a 32-core session
  // GC-bound once a few hundred queries' checkpoint blocks accumulated
  // (r18 A/B: the full sf0.1 board dropped 263s -> 221s from the heap
  // bump alone; allocation-heavy queries like x_chunk_docs ran 15x
  // slower under the 8g heap's GC). Xms == Xmx + AlwaysPreTouch so the
  // heap is committed up front — growing it lazily made every
  // first-touch query pay page-fault storms (measured: cold canary
  // queries 3x slower on a lazily-grown 24g heap). On a real cluster
  // this is ordinary executor memory sizing; locally it is
  // parameterized by SPARK_DRIVER_MEM with a default sized to the
  // sandbox (128 GiB box; 24g keeps well clear of other tenants).
  val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
  Seq(
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    s"-Xmx$mem", s"-Xms$mem", "-XX:+AlwaysPreTouch",
    // Throughput collector: batch analytics with no latency SLO; G1's
    // concurrent mark competes with 32 busy worker threads (measured:
    // steady 4s on the first timed query while G1 marked a 24g heap).
    "-XX:+UseParallelGC",
  )
} ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+"))

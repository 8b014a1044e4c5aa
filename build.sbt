ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "doclingserverspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
scalacOptions ++= Seq("-deprecation")
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Default heap 48g (was 8g; still SPARK_DRIVER_MEM-overridable): local[32]
  // with the session-cached pages/extraction corpora measured ~2.4x slower
  // per cached x_ query at 8g (storage-fraction eviction + GC pressure —
  // BENCH.md round-6 A/B), and the sandbox has 128 GiB. Linux commits heap
  // pages lazily, so small runs don't pay for the headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ParallelGC default (was JDK-17 G1): the extraction kernel is
  // allocation-heavy (DOM nodes, decoded strings) and the throughput
  // collector measured the same-calm-window bench total 39.5 -> 35.8 s and
  // the 160k-page extraction headline 2.49 -> 1.07 s (64.2k -> 149.6k
  // pages/s) at local[32]/48g — see BENCH.md round-6. Override with e.g.
  // SPARK_GRAFT_GC=G1 to compare collectors.
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "Parallel")}GC",
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datamanagementservicerunetlimputationsspark"
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
// forked run output goes straight to this process's stdout/stderr instead
// of through sbt's logger: no "[info] " prefix on the Bench JSON line (the
// driver parses raw stdout) and no logger-side truncation of long lines
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // the box has 128 GiB; a small heap makes the pairwise-dedup benches GC
  // noise instead of measurements, and a small -Xms charges the first heavy
  // query for the whole heap ramp
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Measured on this box (BASELINE.md sf10 G1 experiment): the gram-explode
  // and codec families allocate humongous objects (>half a G1 region); at
  // the default region size those are only reclaimed by full GCs, and a
  // long many-query run degrades run-wide (q168 recovered 148 -> 107 s at
  // sf10 with this flag). 32m regions make those allocations regular.
  "-XX:G1HeapRegionSize=32m",
  // NO -Xms: measured on this box (round 3), pre-committing a large initial
  // heap makes the bench 1.4-3x SLOWER with erratic per-query spikes —
  // first-touch page faults on the up-front 16 GiB cost far more than the
  // incremental heap growth they were meant to avoid. Let the heap grow.
)

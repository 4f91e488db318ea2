ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "teledetection_drone_satellitespark"
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
// Pass the forked JVM's stdout through raw — sbt's default run logger
// prefixes every line with "[info] ", which glues onto Bench's one-line
// JSON contract and breaks the driver's parser (BENCH "parsed": null).
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
  // 24g default: a local[32] bench run executes ~120 query plans in one JVM
  // (broadcasts, codegen classes, shuffle buffers accumulate); at 8g the GC
  // tail inflated late queries 5× (q41 measured 7.7s in-bench vs 1.3s in a
  // fresh JVM). The host has 128 GiB; override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 508 gates × 3 iterations of whole-stage codegen in one JVM generates
  // thousands of Janino classes; the 240 MB default code cache forces the
  // sweeper to evict hot methods late in the run (deopt/recompile churn on
  // the iterative gates). Bench's jvm_code_mb channel records actual use.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // ad-hoc JVM flags for diagnosis runs (GC logging, collector A/Bs) —
  // empty in normal runs, so driver invocations are unaffected
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").map(_.split("\\s+").toSeq)
    .getOrElse(Seq.empty)

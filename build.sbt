ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jobetlspark"
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
// Forked output goes STRAIGHT to stdout/stderr, not through sbt's
// logger: the driver parses the bench summary JSON out of the run's
// tail, and the logger's "[info] " prefix is exactly why every
// BENCH_r*.json through r14 has parsed:null — the line was there but
// never started with '{'.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] runs 32 concurrent tasks in ONE JVM: an 8g heap GC-thrashes
  // the window/aggregation stages (measured 10x wall-clock swings on the
  // minhash pipeline). The container has 128 GiB; default generously.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 210-query suite JIT-compiles thousands of distinct janino-generated
  // classes; the JDK-17 default 240 MB code cache fills mid-suite, the
  // sweeper flushes cold methods, and re-executions (every timed rep runs
  // a query whose generated code last ran a full suite-pass ago) start
  // interpreted — the late-suite elevation class measured in round 17.
  // 1 GiB keeps the whole suite's compiled code resident; overridable for
  // A/B measurement.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
)

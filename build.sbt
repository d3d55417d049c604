ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "statlinebqspark"
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
// Forked-run output passes straight through to sbt's own stdout/stderr
// instead of the logger: the logger's "[info] " prefix on every line made
// the bench's final JSON line unparseable for anything scanning stdout for
// a line starting with '{' (the driver's BENCH_r{N}.json carried
// "parsed": null every round because of it).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Sub-second queries are latency-bound; measured on the full bench:
  // G1 ~20.7s vs ParallelGC ~27-30s (multi-second full-GC outliers on
  // random queries) vs ZGC ~41s (allocation stalls). G1's incremental
  // collections keep per-query jitter bounded.
  s"-XX:+${sys.env.getOrElse("SPARK_GC", "UseG1GC")}",
)

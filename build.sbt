ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dekerserveradaptersspark"
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
// pass the forked process' stdout through unlogged: Bench/Verify emit
// machine-read JSON lines that must not carry the sbt "[info] " prefix
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// the driver parses the bench JSON line out of the LAST 2000 chars of
// stdout; sbt's "[success] Total time: ..." trailer (~76 chars) sits
// inside that window behind the line. Suppressing it (verified effective
// on sbt 1.10) buys the per-query map enough room to keep 2-decimal
// timings for the whole 83+-key inventory (see Bench.LineBudget).
Global / showSuccess := false
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
  // local[32] runs all executors in this one JVM; 8g showed sporadic
  // multi-second full-GC stalls on the string-heavy dedup joins
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" "))

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "impetlspark"
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
// Forked `run` output normally goes through sbt's logger, which prefixes
// every stdout line with "[info] " — that breaks line-oriented JSON
// consumers of Bench/Verify (a JSON line must start with '{'). Send the
// forked process's streams straight to sbt's own stdout/stderr instead.
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
  // The harness box has 128 GiB; local[32] with 32 concurrent tasks at
  // sf0.1 needs real execution memory or queries pay spill/GC instead of
  // compute (8g left the BlockManager only 4.6 GiB for 32 threads).
  // 28g stays under the 32 GiB compressed-oops ceiling: a 48g heap
  // measured 2-3x SLOWER on memory-heavy queries (8-byte oops halve
  // cache density) than 28g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)

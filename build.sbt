ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "shifuspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// one suite at a time: a registered (in-flight) sql.Observation on the
// shared session makes ANY concurrent closure serialization fail
// ("Task not serializable: ObservationManager") — e.g. an MLlib fit in
// another suite. Sequential suites keep observation windows exclusive.
Test / parallelExecution := false
run / fork := true
// The bench/verify harness greps a short stdout tail for ONE bare JSON
// line. With the default LoggedOutput strategy sbt prefixes every forked
// line with "[info] " and appends a "[success] Total time" line after it —
// both of which defeat a strict line-oriented JSON parse. Stream the forked
// process's output through verbatim and drop the success banner so the
// program's own final println IS the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
// the run task reads outputStrategy at task scope; the lint just can't see it
Global / excludeLintKeys += run / outputStrategy
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

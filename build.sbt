ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphframesrsspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON. Two sbt behaviours broke that contract for 6+ rounds (parsed: null
// in every BENCH_r14..r19 artifact): the logger prefixes forked-run output
// with "[info] ", and sbt appends "[success] Total time: ..." after the
// program's final println. StdoutOutput passes the forked JVM's stdout
// through unprefixed (Spark's log4j noise goes to stderr and stays out of
// the tail), and showSuccess drops the trailing success line, so the bench
// compact JSON is the literal last stdout line again.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task; the
// unused-key lint can't see that and warns at startup — exclude it.
Global / excludeLintKeys += showSuccess
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
) ++ sys.env.get("SPARK_DRIVER_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)

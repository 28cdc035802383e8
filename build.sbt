ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "snowalertspark"
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
// Forked run output goes straight to this process's stdout/stderr —
// without this, sbt's logger prefixes every line with [info]/[error],
// which breaks machine parsing of Bench's JSON line.
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
  // 16g default: the bench session runs 140 queries x2 in one JVM;
  // localCheckpoint blocks + broadcast relations live in the unified
  // region until the async ContextCleaner catches up, and a tight heap
  // turns that into disk eviction stalls on a contended host.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 156 queries x2 runs of whole-stage-codegen'd plans emit thousands
  // of generated classes; the JDK default 240m code cache fills mid-
  // suite, JIT compilation shuts off ("CodeCache is full"), and later
  // queries run interpreted — showing up as multi-second spikes that
  // move between queries run-to-run. 1g keeps every compiled stage hot.
  "-XX:ReservedCodeCacheSize=1g",
// split() on a set-but-empty var yields Array("") — filter blanks so the
// forked JVM never receives an empty-string option
) ++ sys.env.get("SPARK_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+")).filter(_.nonEmpty)

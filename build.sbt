ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ora_chspark"
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
// Forked run output inherits sbt's stdout DIRECTLY (no [info] logger
// prefix) — the bench driver parses the final stdout line as bare JSON,
// and sbt's default LoggedOutput strategy was prefixing it. showSuccess
// off keeps sbt from appending "[success] Total time..." AFTER that
// line, so the bench JSON is the last stdout line of `sbt runMain`.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
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
  // The 358-query bench JVM JIT-compiles hundreds of whole-stage-
  // codegen classes per interleaved pass; the JDK-17 default 240 MB
  // code cache fills mid-pass and later queries run partially
  // interpreted (measured: q126_margin_mining 1.6 s isolated /
  // back-to-back vs 4.6 s interleaved in BENCH_r10 with an unchanged
  // plan and binding shuffle budget — the round-11 drift
  // investigation). 512 MB keeps the whole pass JIT-resident.
  "-XX:ReservedCodeCacheSize=512m",
)

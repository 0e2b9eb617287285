ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "goconnectspark"
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
// Forward forked program output RAW to stdout — the default LoggedOutput
// prefixes every line with "[info] ", which breaks any consumer parsing
// Bench's one-line JSON from the sbt stdout stream.
run / outputStrategy := Some(StdoutOutput)
// No "[success] Total time: ..." after a run: that trailer lands INSIDE
// the driver's fixed-size stdout tail window right after Bench's one-line
// JSON and can push the line's start out of the capture (BENCH r9 parsed
// null with only ~30 bytes clipped).
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint can't see — exclude it so every build doesn't warn
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
  // pre-session INFO logs go to stdout under Spark's bundled log4j2
  // default profile and can't be silenced by setLogLevel (too late) —
  // use a stderr-only ERROR-level config so stdout stays parseable
  s"-Dlog4j2.configurationFile=${baseDirectory.value / "conf" / "log4j2-quiet.properties"}",
)

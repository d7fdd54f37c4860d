ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// The container's platform charset is ASCII — pin the compiler to
// UTF-8 so multilingual string literals (the Unicode-tokenizer gate
// rows/specs) compile byte-exact.
ThisBuild / scalacOptions ++= Seq("-encoding", "UTF-8")
name := "lshrsspark"
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
// Pass the forked JVM's stdout straight through instead of routing it
// via sbt's logger, which prefixes every line with "[info] " — the
// bench driver parses the bare final stdout line as JSON.
run / outputStrategy := Some(StdoutOutput)
// ...and drop the trailing "[success] Total time" banner so the JSON
// really is the last stdout line.
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
  // default heap sized for a 32-core local[*] driver+executor JVM on
  // this round's 128 GiB benchmark box (optimization guide §5: the
  // bench's per-query medians ran 1.5-2× the mins under the old 8g —
  // GC pressure, not compute); still env-overridable for small hosts
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

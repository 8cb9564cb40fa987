ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "psdatalakespark"
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
// Pass the forked JVM's stdout through unprefixed: sbt's default logger
// wraps every line in "[info] ", which breaks machine parsing of
// Bench's single JSON output line.
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
// Default heap scales with the host: a quarter of RAM clamped to
// [8g, 32g], so the big bench box gets its wide margin (8g leaves
// ~4.6g storage memory, which under concurrent load degrades to GC
// thrash on the shuffle-heavy suite) while smaller contributor/CI
// machines stay inside a bounded JVM instead of swapping.
// SPARK_DRIVER_MEM overrides either way.
val defaultHeapGb: Int = {
  val memTotalKb = try {
    scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") => l.split("\\s+")(1).toLong }
      .getOrElse(0L)
  } catch { case _: Throwable => 0L }
  if (memTotalKb <= 0) 8 else math.max(8L, math.min(32L, memTotalKb / 1024 / 1024 / 4)).toInt
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "optiprismspark"
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
// Forked run output goes straight to stdout (no "[info] " logger
// prefix): the driver tail-captures ~2000 chars and parses the bench
// contract line as JSON — a logger prefix or re-wrapped line breaks it.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// Host-RAM-aware heap default (see javaOptions below): MemTotal from
// /proc/meminfo when available (Linux), else fall back to 8g.
val defaultDriverHeap: String = {
  val memTotalKb =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().collectFirst {
        case l if l.startsWith("MemTotal:") => l.split("\\s+")(1).toLong
      } finally src.close()
    } catch { case _: Throwable => None }
  if (memTotalKb.exists(_ >= 64L * 1024 * 1024)) "24g" else "8g"
}
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
  // Heap default sized to the host: 24g on the 128 GiB bench machine
  // (at 8g the 119-query bench accumulated localCheckpoint blocks
  // until GC churn added up to 70% run-to-run swings on the
  // allocation-heavy dedup queries), but a conservative 8g on smaller
  // dev hosts so the default invocation can't swap or get OOM-killed.
  // SPARK_DRIVER_MEM overrides either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultDriverHeap)}",
)

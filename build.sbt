ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nrrfcdischargeobsspark"
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
// The round driver parses ONE bare JSON line from `runMain graft.Bench`
// stdout. With fork:=true sbt's default outputStrategy is LoggedOutput,
// which prefixes every forked-stdout line with "[info] " — that prefix is
// what made BENCH_r01..r05 unparseable ("parsed": null every round).
// StdoutOutput passes the forked process's stdout/stderr through verbatim.
run / outputStrategy := Some(StdoutOutput)
// ...and keep sbt's own "[success] Total time" trailer off stdout so the
// bench summary stays the LAST stdout line.
Global / showSuccess := false
Global / showTiming := false
// consumed by the command loop, not by tasks — lintUnused can't see that
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // G1 GCLocker starvation fix (r13, VERDICT r12 #3): the ×1000 graph
  // spot OOM'd at default heap with "Retried waiting for GCLocker too
  // often allocating 5 words" — 32 executor threads in JNI-critical
  // LZ4 shuffle compression hold the GCLocker almost continuously, so
  // under heap pressure ordinary allocations exhaust the DEFAULT 2
  // retries before a GC can run and throw a spurious heap-space OOM
  // (JDK-8192647 class). Raising the retry budget lets the allocation
  // wait for the locker instead of dying; real exhaustion still OOMs.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)

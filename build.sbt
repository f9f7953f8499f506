ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "polarsexpressspark"
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
// Pass forked-run output through verbatim: sbt's default logger prefixes
// every stdout line with "[info] ", which breaks any harness that parses
// a program's JSON output line (the bench driver json.loads each line —
// "[info] {...}" never parses). StdoutOutput inherits the parent streams.
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
  // 24g on a 128 GiB box: the round-2 driver bench hit a 25s G1 full GC
  // and 68s time-to-safepoint stalls under the old 8g heap with 32
  // concurrent tasks (evidence: -Xlog flight-recorder, documented in
  // IMPLEMENTATION.md). Headroom is cheaper than a stop-the-world.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Pin AND pre-fault the heap. G1 uncommits regions between cycles;
  // re-committed pages fault in on first touch, and with 32
  // allocation-heavy executor threads the fault storm serializes on the
  // process memory-map lock — kernel time billed to the faulting task
  // threads. Observed: identical codec passes at sf3 ran bimodally,
  // 25-50s vs up to 1700s of executor CPU (jcmd per-thread deltas showed
  // the burn inside Deflater on unchanged input). -Xms=-Xmx stops the
  // uncommit cycle, AlwaysPreTouch pays every fault once at JVM start;
  // with both, the runaway mode is gone (worst pass = JIT warmup).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // Whole-stage codegen loads one Janino class per stage; across a
  // 42-query catalog the default 240m code cache fills, the JIT stops
  // compiling, and late queries run interpreted (observed 10-50×
  // slowdowns contained to long-lived sessions). Spark's own build
  // reserves 1g for the same reason.
  "-XX:ReservedCodeCacheSize=1g",
  // Flight recorder for the multi-10s stalls observed mid-catalog: gc +
  // safepoint unified logging is near-zero-cost and tells GC pause vs
  // safepoint stall vs neither (= external/system) after the fact.
  "-Xlog:gc*=info,safepoint=info:file=/tmp/graft_jvm_%p.log:time,uptime",
)

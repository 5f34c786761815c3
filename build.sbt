ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqlqueryenginersspark"
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
// The driver's bench harvester parses a tail of sbt's stdout looking for
// Bench's final compact JSON line. Two things have defeated it every round
// so far: sbt's logger prefixes forked-run output with "[info] ", and the
// "[success] Total time…" epilogue lands after the JSON. StdoutOutput
// passes the forked JVM's stdout straight through (no prefix), and
// showSuccess := false drops the epilogue, so Bench's last line IS the
// process's last stdout line.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task — the
// unused-key lint can't see that (it IS working: no [success] epilogue).
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
  // Pin the heap: Xms = Xmx + pre-touch every page at JVM start.
  // Root-caused r18 (ProbeR18 s17, per-thread /proc/self/task split):
  // the two-round-old "checkpoint-heavy variance family" (s17 reading
  // 14.5–376 s for IDENTICAL work on a stamped-quiet box) was task
  // threads burning up to 10x their user CPU in KERNEL time (run 3:
  // 76 s utime vs 1013 s stime) — page-fault/reclaim storms as 32
  // threads concurrently fault heap pages that G1 grew or re-committed
  // mid-query against a page cache full of parquet/shuffle data. With
  // the heap committed and faulted ONCE at startup the storms are gone:
  // same probe reads 33.8→8.8 s monotonically (JIT warm-up curve),
  // sys time ≤ 36 s. Costs ~0.3 s/GiB at JVM start, outside any timed
  // region (the bench warms up first).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)

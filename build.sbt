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
// Default heap scales with the core grant (r18 VERDICT item 2): the 8-core
// scaling bench was SIGKILLed with the full 8 GiB pre-touched heap resident
// on a shared box. Per-task execution memory stays at least as roomy as the
// 32-core config (8g/32 threads ≈ 4g/8 threads per task). SPARK_DRIVER_MEM
// still overrides everything.
val benchHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
    .getOrElse(java.lang.Runtime.getRuntime.availableProcessors())
  s"${math.max(4, math.min(8, cpus / 4))}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$benchHeap",
)
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
//
// SCOPED to Compile/run only (r18 VERDICT item 1): the unscoped version
// made the sbt Test fork pre-commit and fault 8 GiB it never needed, and
// the driver box OOM-killed it (VERIFY_r18 tests_ok:false, ForkMain exit
// 137). Tests keep the lazy -Xmx above; Bench/Verify/probes (run task)
// keep the pinned pre-touched heap that fixed the variance.
Compile / run / javaOptions ++= Seq(
  s"-Xms$benchHeap",
  "-XX:+AlwaysPreTouch",
  // The bench JVM compiles fresh whole-stage-codegen classes for every one
  // of ~135 query plans × 2-5 runs; the JDK 17 default 240 MB reserved
  // code cache saturates mid-series (the r18 s17 probe read 66/240 MB from
  // ONE query's 5 runs), after which the sweeper flushes hot methods or
  // the JIT stops compiling and expression-heavy queries run interpreted —
  // a silent 10x CPU inflation late in the series (the r19 t22 probe reads
  // the same query at 12.3 s cold / 1.5 s JIT-warm). Reserve enough that
  // the whole series stays compiled; per-run occupancy is stamped in the
  // artifact (BenchGate.codeCacheMb) so this claim is checkable.
  "-XX:ReservedCodeCacheSize=512m",
)

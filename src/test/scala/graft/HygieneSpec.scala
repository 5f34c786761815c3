package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Source-level hygiene gates — properties of the CODE, not of query
  * results, enforced by grepping `src/main` (the r15 VERDICT item 7
  * pattern: a rule that a ScanAudit sweep silently depends on should be
  * a loud compile-adjacent gate, not a convention).
  */
class HygieneSpec extends AnyFunSuite {

  private def mainSources: Seq[(Path, String)] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => p -> Files.readString(p))
      .toSeq
  }

  test("GraftSession.tune is called only from entry points and tools") {
    // Query engines mutating global session conf made every conf-pinning
    // caller order-dependent (it blinded ScanAudit for five rounds —
    // EventsOps.ev() flipped AQE back on mid-sweep). Session tuning is an
    // entry-point responsibility; query paths are conf-read-only.
    val allowed = Set(
      "src/main/scala/graft/Bench.scala",
      "src/main/scala/graft/Verify.scala",
      "src/main/scala/graft/SparkEntry.scala",
      "src/main/scala/graft/engine/GraftSession.scala", // the definition
      "src/main/scala/graft/streaming/Streams.scala",   // streaming entry points
    )
    val offenders = mainSources.collect {
      case (p, text)
          if text.contains("GraftSession.tune(") &&
            !allowed.contains(p.toString) &&
            !p.toString.startsWith("src/main/scala/graft/tools/") =>
        p.toString
    }
    assert(offenders.isEmpty,
      s"query paths must not mutate session conf; tune() called from: $offenders")
  }

  test("query engines do not set session conf") {
    // Same rule, wider net: `.conf.set(` inside graft.queries would make
    // results depend on which query ran first in a shared session.
    val offenders = mainSources.collect {
      case (p, text)
          if p.toString.startsWith("src/main/scala/graft/queries/") &&
            text.contains(".conf.set(") =>
        p.toString
    }
    assert(offenders.isEmpty,
      s"graft.queries must be conf-read-only; .conf.set found in: $offenders")
  }
}

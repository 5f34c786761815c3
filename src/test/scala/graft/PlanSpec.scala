package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates — the properties that decide whether a query
  * survives a 100× scale-up. These are assertions, not aspirations: if a
  * refactor un-broadcasts a dim join or breaks parquet pushdown, this suite
  * fails even though results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.explainString(FormattedMode)

  test("filters reach the parquet scan (q02)") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_shipdate), " +
      "GreaterThan(l_quantity,30.0), LessThan(l_shipdate,"), p)
  }

  test("column pruning reaches the scan — only needed columns are read") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_returnflag:string>"), p)
    val t = plan("t01_token_stats")
    assert(t.contains("ReadSchema: struct<doc_id:bigint,text:string>"), t)
  }

  test("dimension joins broadcast instead of shuffling (q11, q13)") {
    assert(plan("q11_join_broadcast").contains("BroadcastHashJoin"))
    val q5 = plan("q13_tpch_q5")
    assert(q5.contains("BroadcastHashJoin"), q5)
  }

  test("aggregation is partial+final (map-side combine) (q10)") {
    val p = plan("q10_tpch_q1")
    // partial_* functions before the exchange = map-side combine; the
    // exchange moves only per-group partial states, not rows
    assert(p.contains("partial_sum"), p)
    assert(p.contains("hashpartitioning(l_returnflag"), p)
  }

  test("top-K uses TakeOrderedAndProject, not a global sort (q17)") {
    val p = plan("q17_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti (q14, q15)") {
    assert(plan("q14_semi_join").contains("LeftSemi"))
    assert(plan("q15_anti_join").contains("LeftAnti"))
  }

  test("scan-heavy queries run inside whole-stage codegen (q10)") {
    // codegen ids are assigned at execution (AQE) - run, then inspect
    val df = Registry.byName("q10_tpch_q1").run(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("codegen id"), p)
  }

  test("AQE coalesces shuffle partitions at runtime (q05)") {
    val df = Registry.byName("q05_group_agg").run(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // 3 groups through a 4-partition shuffle → AQE folds them into one read
    assert(p.contains("AQEShuffleRead"), p)
  }

  test("custom Fnv1a64 expression does not break codegen (t04 fingerprint)") {
    val df: DataFrame = Registry.byName("t04_fingerprint").run(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("codegen id"), p)
  }
}

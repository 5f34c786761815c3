package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates on the synthesized partsupp table (queries/Partsupp.scala) — the
  * properties the q80–q83 oracles rely on but don't themselves assert.
  */
class PartsuppSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("every part gets exactly 4 DISTINCT suppliers (TPC-H key spreading)") {
    val ps = graft.queries.Partsupp.table(spark, sf)
    val bad = ps.groupBy("ps_partkey")
      .agg(count(lit(1)).as("n"), countDistinct(col("ps_suppkey")).as("nd"))
      .filter(col("n") =!= 4 || col("nd") =!= 4)
      .count()
    assert(bad == 0, s"$bad parts without 4 distinct suppliers")
  }

  test("ps_suppkey always lands on a real supplier; value domains hold") {
    val ps = graft.queries.Partsupp.table(spark, sf)
    val orphans = ps.join(
      graft.engine.Tables(spark, sf, "supplier"),
      col("ps_suppkey") === col("s_suppkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans partsupp rows reference no supplier")
    val dom = ps.agg(
      min("ps_availqty"), max("ps_availqty"),
      min("ps_supplycost"), max("ps_supplycost")).head()
    assert(dom.getLong(0) >= 1 && dom.getLong(1) <= 8192, dom.toString)
    assert(dom.getDouble(2) >= 1.0 && dom.getDouble(3) <= 656.35, dom.toString)
  }

  test("derivation is deterministic and filter-pushdown-equivalent") {
    // deriving from a filtered part frame == deriving from all parts then
    // filtering — the property q80/q81/q83 lean on to prune generation
    val part = graft.engine.Tables(spark, sf, "part")
    val supp = graft.engine.Tables(spark, sf, "supplier")
    val filtered = graft.queries.Partsupp
      .derive(part.filter(col("p_partkey") % 7 === 0), supp)
    val full = graft.queries.Partsupp.derive(part, supp)
      .filter(col("ps_partkey") % 7 === 0)
    assert(filtered.exceptAll(full).count() == 0 &&
      full.exceptAll(filtered).count() == 0)
  }
}

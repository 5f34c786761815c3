package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

class StatsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("q39 HLL approx distinct is within tolerance of exact q38") {
    val exact = Registry.byName("q38_count_distinct").run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Registry.byName("q39_approx_distinct").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      // the oracled exact count must BE the exact count (same as q38)
      assert(r.getLong(1) == exact(k), s"flag=$k exact mismatch")
      // and the engine-side HLL estimate must have landed within 5%
      assert(r.getBoolean(3), s"flag=$k HLL estimate outside 5% tolerance")
    }
  }

  test("decimal-moment variance agrees with Spark's built-in var_samp") {
    val ours = Registry.byName("q35_stats_exact").run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = Tables(spark, sf, "orders")
      .groupBy("o_orderstatus").agg(var_samp(col("o_totalprice")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) / builtin(k) < 1e-9,
        s"$k ours=$v builtin=${builtin(k)}")
    }
  }

  test("pivot row totals equal the group counts") {
    val piv = Registry.byName("q37_pivot").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(2))).toMap
    val n = Tables(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(piv == n)
  }

  test("q84 z-order ranges are narrow in BOTH dimensions (data-skipping claim)") {
    val rows = Registry.byName("q84_zorder_layout").run(spark, sf).collect()
    // each leading-bit z-range fixes the top 3 bits of each dimension, so
    // a file written from it covers ≤ 32 of 256 values per dim — the
    // property that lets parquet min/max stats prune 2-D predicates
    rows.foreach { r =>
      val (qxs, pys) = (r.getLong(r.fieldIndex("qx_span")), r.getLong(r.fieldIndex("py_span")))
      assert(qxs <= 31, s"zbucket ${r.getLong(0)} qx_span $qxs")
      assert(pys <= 31, s"zbucket ${r.getLong(0)} py_span $pys")
    }
    // the z-ranges partition the table
    val total = rows.map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(total == Tables(spark, sf, "lineitem").count())
  }
}

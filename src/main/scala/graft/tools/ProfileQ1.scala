package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.{Exact, GraftSession, Tables}

/** Dev utility: is single-row-group parquet the q10 bottleneck, and does an
  * explicit post-scan repartition pay for itself at this layout?
  */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("profile-q1")
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min match { case t => println(s"== $label: ${t}s") }
    }
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
    val li = Tables(spark, dir, "lineitem")
    time("q1 as-is (single row group)")(agg(li).write.format("noop").mode("overwrite").save())
    time("q1 repartition(32) post-scan")(
      agg(li.repartition(32)).write.format("noop").mode("overwrite").save())
    time("q1 double sums (baseline, non-exact)")(
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

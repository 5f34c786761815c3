package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: replicate the driver's t1 smoke — a bare session (none of
  * GraftSession's confs) calling SparkEntry.entry, expecting rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"== entry rows: $n")
    df.show(5, truncate = false)
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}

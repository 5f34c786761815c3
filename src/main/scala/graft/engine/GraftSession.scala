package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the role of the reference's `Database::new_on_csv` entry point
  * (reference: src/db.rs:27-40) — one place that wires storage + catalog +
  * execution — except here "execution" is Spark itself.
  *
  * Scale posture: shuffle partitions default to the core count (local mode),
  * AQE is on so skewed shuffles re-plan at runtime, and the session timezone
  * is pinned to UTC so timestamp semantics are cluster-invariant.
  */
object GraftSession {

  def build(
      appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors(),
      extraConf: Map[String, String] = Map.empty,
  ): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores ns-precision timestamps; Spark's TimestampType
      // is micros. Reading nanos as LongType keeps the raw value lossless and
      // we convert explicitly where needed.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft-recommended runtime confs to an externally-built session
    * (the driver's Verify/Bench sessions). Only touches dynamic SQL confs.
    */
  def tune(spark: SparkSession): SparkSession = {
    try spark.conf.set("spark.sql.adaptive.enabled", "true")
    catch { case _: Throwable => () }
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark
  }
}

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
      // lz4 shuffle/spill codec, kept after the r19 full-bench A/B (zstd
      // lost the suite 1.225× geomean — see Bench.scala); env override
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
    spark
  }
}

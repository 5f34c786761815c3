package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Sources, sinks, and physical data layout — the pieces that shape 100 TB
  * I/O: partitioned writes with partition pruning at read, bucketed tables
  * that pre-shuffle a join key once so every later join is exchange-free,
  * and the standard format round-trips (parquet/csv/json).
  * The reference has CSV-read only and no sinks at all (SURVEY.md §2.4:
  * results are collected and pretty-printed).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned parquet sink + partition pruning at read") {
    val out = tmp("graft-part")
    Tables(spark, sf, "lineitem")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val back = spark.read.parquet(out).filter(col("l_returnflag") === "A")
    val plan = back.queryExecution.explainString(FormattedMode)
    // pruning happens at the partition level, not via row filters
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    val expected = Tables(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "A").count()
    assert(back.count() == expected)
  }

  test("z-order layout prunes files for a 2-D box predicate") {
    // the q84 layout put to work: write lineitem partitioned by its
    // leading-bit z-range, then answer a 2-D box query reading ONLY the
    // z-ranges that intersect the box — the file-skipping a 1-D sort
    // cannot give for the second dimension. The box here is aligned to
    // the top-3-bit grid, so it maps to exactly one z-range.
    def spread(c: org.apache.spark.sql.Column) = {
      val v0 = c.bitwiseAND(lit(255L))
      val v1 = v0.bitwiseOR(shiftleft(v0, 4)).bitwiseAND(lit(0x0F0FL))
      val v2 = v1.bitwiseOR(shiftleft(v1, 2)).bitwiseAND(lit(0x3333L))
      v2.bitwiseOR(shiftleft(v2, 1)).bitwiseAND(lit(0x5555L))
    }
    val qx = col("l_quantity").cast("long") - 1
    val py = least(floor(col("l_extendedprice") / lit(409.0)), lit(255L))
    val z = spread(qx).bitwiseOR(shiftleft(spread(py), 1))
    val out = tmp("graft-zorder")
    Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), qx.as("qx"), py.as("py"),
        shiftrightunsigned(z, 10).as("zbucket"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(out)
    // box: qx in [0,31] x py in [64,95] — aligned to the top-3-bit grid, so
    // every cell in it lands in ONE z-range; derive it with the same spread
    // math from the box corner rather than by hand
    def spreadL(v: Long): Long = {
      var x = v & 255L
      x = (x | (x << 4)) & 0x0F0FL
      x = (x | (x << 2)) & 0x3333L
      (x | (x << 1)) & 0x5555L
    }
    val zb = (((spreadL(0) | (spreadL(64) << 1)) >> 10)).toInt
    val pruned = spark.read.parquet(out)
      .filter(col("zbucket") === zb &&
        col("qx").between(0, 31) && col("py").between(64, 95))
    val full = spark.read.parquet(out)
      .filter(col("qx").between(0, 31) && col("py").between(64, 95))
    // correctness: the box is fully contained in that z-range
    assert(pruned.count() == full.count() && full.count() > 0)
    // the equality on the partition column reaches PartitionFilters…
    val plan = pruned.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(zbucket"), plan)
    // …and that z-range holds a fraction of the data files on disk
    def filesUnder(p: java.io.File): Int =
      Option(p.listFiles()).getOrElse(Array.empty).map { f =>
        if (f.isDirectory) filesUnder(f)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      }.sum
    val prunedFiles = filesUnder(new java.io.File(s"$out/zbucket=$zb"))
    val allFiles = filesUnder(new java.io.File(out))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles — no file skipping")
  }

  test("bucketed tables join without any exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previous JVM's crash can leave the location without the metastore
    // entry — clear it so CREATE TABLE doesn't trip over the orphan dir
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get("/tmp/graft-warehouse", t)
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    Tables(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    // at sf0.001 broadcast would win and hide the bucketed plan — disable it
    // so the test exercises the big-big join shape bucketing exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-bucketed join: SortMergeJoin directly over the bucketed scans, no
      // shuffle on either side (the only exchange is the post-join agg)
      assert(plan.contains("SortMergeJoin"), plan)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), plan)
      // and results match the unbucketed join
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("output file count is controllable (small-files hygiene)") {
    val out = tmp("graft-files")
    val li = Tables(spark, sf, "lineitem")
    // repartition governs file count; maxRecordsPerFile caps file size
    li.repartition(4).write.mode("overwrite").parquet(s"$out/by4")
    val files4 = new java.io.File(s"$out/by4").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files4 == 4, s"got $files4 files")
    li.repartition(1).write.mode("overwrite")
      .option("maxRecordsPerFile", 1000).parquet(s"$out/capped")
    val capped = new java.io.File(s"$out/capped").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(capped == math.ceil(li.count() / 1000.0).toInt, s"got $capped files")
  }

  test("streaming file sink recovers from its checkpoint without duplicates") {
    import graft.streaming.Streams
    val ckpt = tmp("graft-ckpt")
    val out = tmp("graft-sink")
    def start() = Streams.readEvents(spark, sf)
      .selectExpr("event_id", "user_id", "value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // restart against the same checkpoint: no new input → no new output
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val written = spark.read.parquet(out)
    assert(written.count() == 1000) // sf0.001 events table size, exactly once
    assert(written.select("event_id").distinct().count() == 1000)
  }

  test("csv and json sinks round-trip a query result") {
    val result = Registry.byName("q05_group_agg").run(spark, sf)
    val csvOut = tmp("graft-csv")
    val jsonOut = tmp("graft-json")
    result.write.mode("overwrite").option("header", "true").csv(csvOut)
    result.write.mode("overwrite").json(jsonOut)
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true").csv(csvOut)
    val fromJson = spark.read.json(jsonOut)
    assert(fromCsv.count() == result.count())
    assert(fromJson.count() == result.count())
    // spot-check a value survives the round trip
    val orig = result.filter(col("l_returnflag") === "A").head().getDouble(1)
    val rt = fromJson.filter(col("l_returnflag") === "A").head()
      .getAs[Double]("sum_qty")
    assert(rt == orig)
  }
}

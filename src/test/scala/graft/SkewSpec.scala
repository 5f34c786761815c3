package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Skew

/** Skew handling — the two tools for hot keys at 100 TB:
  * AQE's reactive skew-join split (no code change, runtime re-plan) and
  * explicit salting (Skew.saltedJoin) when the skew is known ahead of time.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("AQE observes the skewed shuffle at runtime (accurate per-partition stats)") {
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one celebrity key carries ~83% of the fact side; md5 payloads keep
      // the hot shuffle partition big after compression
      val fact = spark.range(0, 300000)
        .select(when(col("id") < 250000, 0L).otherwise(col("id")).as("k"),
          md5(concat(col("id").cast("string"), lit("pad"))).as("v"))
      val dim = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      joined.collect()
      // walk the finalized adaptive plan and read the map-output statistics
      // AQE's skew/coalesce decisions are driven by — the hot partition must
      // stand out sharply against the median (these are the numbers a
      // cluster-sized run would split on; the local byte sizes sit below
      // the production skewedPartitionThresholdBytes by design)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      val inner = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      var partitionSizes = Seq.empty[Seq[Long]]
      def walk(p: SparkPlan): Unit = {
        p match {
          case s: ShuffleQueryStageExec =>
            s.mapStats.foreach(m => partitionSizes :+= m.bytesByPartitionId.toSeq)
            walk(s.plan)
          case q: QueryStageExec => walk(q.plan)
          case _ => ()
        }
        p.children.foreach(walk)
      }
      walk(inner)
      assert(inner.toString.contains("AQEShuffleRead"), "AQE did not re-plan the read")
      val factSizes = partitionSizes.maxBy(_.sum) // the big (fact) shuffle
      val sorted = factSizes.sorted
      val median = sorted(sorted.size / 2).max(1L)
      assert(factSizes.max > 5 * median,
        s"expected a skewed partition in map stats, got $factSizes")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted join spreads the hot key over nSalts sub-keys with identical results") {
    val fact = spark.range(0, 50000)
      .select(when(col("id") < 40000, 7L).otherwise(col("id")).as("k"), col("id").as("v"))
    val dim = spark.range(0, 1000).select(col("id").as("dk"), (col("id") + 100).as("w"))
    val salted = Skew.saltedJoin(fact, "k", dim, "dk", nSalts = 8, saltSrc = col("v"))
    val plain = fact.join(dim, col("k") === col("dk"))
    assert(salted.count() == plain.count())
    // the hot key's rows really carry all 8 salts (spread across tasks)
    import org.apache.spark.sql.functions.{countDistinct, pmod, hash => shash}
    val nSaltsUsed = fact.filter(col("k") === 7L)
      .select(pmod(shash(col("v")), lit(8)).as("s"))
      .agg(countDistinct(col("s"))).head().getLong(0)
    assert(nSaltsUsed == 8L)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-probe runner for the kNN-graph serve path (the ScaleProbe s10
  * corpus, without the other 22 probes): measures the graph build at n
  * vectors so serve-path changes (r10: TopKPerKey replacing the
  * row_number window) get a like-for-like wall-time record in
  * dev/scaleprobe_r10.jsonl. Corpus construction is copied verbatim from
  * ScaleProbe's s03/s10 section — hash-derived near-orthogonal vectors,
  * every-100th near-copy, a 5000-vector mega-bucket.
  */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseEmb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
          .cast("double") / 1000.0).cast("float")).as("embedding"))
    val near = baseEmb.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"),
        transform(col("embedding"),
          v => (v.cast("double") * 0.98 + 0.01).cast("float")).as("embedding"))
    val spamVec = array((0 until 64).map(i =>
      lit((math.sin(i + 1) * 0.5).toFloat)): _*)
    val spam = spark.range(5000).select((col("id") + 2000000000L).as("vec_id"),
      spamVec.as("embedding"))
    val embCorpus = baseEmb.unionByName(near).unionByName(spam)
    val t0 = System.nanoTime()
    val top1 = {
      val g = graft.queries.Similarity.knnGraph(embCorpus, nTables = 2,
        nBits = 16, k = 3, cap = 100)
      g.filter(col("rank") === 1 &&
          col("q_id") < 1000000000L && col("q_id") % 100 === 0 &&
          col("neighbor_id") === col("q_id") + 1000000000L)
        .count()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val planted = n / 100
    println(s"""{"probe":"s10","vectors":${n + planted + 5000},""" +
      s""""planted":$planted,"top1_wired":$top1,"sec":$sec,""" +
      s""""s10_ok":${top1 >= (planted * 85) / 100}}""")
    spark.stop()
  }
}

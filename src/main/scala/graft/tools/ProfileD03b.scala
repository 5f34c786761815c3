package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.functions.ghash
import graft.queries.Dedup

/** Dev utility: compare materialization strategies for the d03 LSH pipeline
  * at full core count — shingle-array checkpoint (big blocks, no recompute)
  * vs signature-only checkpoint (tiny blocks, shingles recomputed for
  * candidate docs only).
  */
object ProfileD03b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/local/sf1")
    val spark = GraftSession.build("profile-d03b")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val corpus = Dedup.plantedCorpus(spark, dir)
    // (a) checkpoint of the shingle arrays (current shape)
    val shA = time("ckpt shingle arrays") {
      corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
        .localCheckpoint(true)
    }
    time("  reread arrays (count)")(println(shA.select(sum(size(col("sh")))).head()))
    // (b) checkpoint of signatures only (fused shingle->sig pass)
    val sigB = time("ckpt sigs only") {
      corpus.select(col("doc_id"),
        ghash.minhashSig(Dedup.shingles(col("text")), 32).as("sig"))
        .localCheckpoint(true)
    }
    time("  reread sigs (count)")(println(sigB.select(sum(size(col("sig")))).head()))
    // (c) shingle recompute for a candidate-sized subset via broadcast join
    val ids = spark.range(0, 30000).select((col("id") * 2).as("doc_id"))
    time("re-shingle 30k candidate docs") {
      println(corpus.join(ids, "doc_id")
        .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
        .select(sum(size(col("sh")))).head())
    }
    spark.stop()
  }
}

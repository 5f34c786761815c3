package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Scale probe: run the production dedup pipeline on a corpus far past the
  * test SFs, generated file-lessly by the graft-gen source — evidence that
  * the LSH shapes hold as data grows, not just at sf0.1.
  *
  *   sbt "runMain graft.tools.ScaleProbe 200000"
  *
  * Plants exact dups (+1 copy per 100 docs) and near dups (one token
  * swapped), then runs exact dedup and MinHash-LSH near-dup with the
  * hot-bucket guard, printing one JSON line of timings + candidate counts.
  * The corpus never touches disk: generation is part of the scan.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.format("graft-gen")
      .option("rows", n.toString).option("parts", "64").load()
      .select(col("doc_id"), col("text"), col("lang"))
    // plant: every 100th doc gets an exact copy (+1B) and a near copy with
    // its first token dropped (+2B)
    val tenth = base.filter(col("doc_id") % 100 === 0)
    val corpus = base
      .unionByName(tenth.select((col("doc_id") + 1000000000L).as("doc_id"),
        col("text"), col("lang")))
      .unionByName(tenth.select((col("doc_id") + 2000000000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 2, 10000)).as("text"),
        col("lang")))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val (nExact, tExact) = time {
      corpus.groupBy(md5(col("text")).as("digest"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    }
    val (nPairs, tLsh) = time {
      Dedup.lshJaccardPairs(corpus, k = 32, bands = 8, cap = 200,
        threshold = 0.3).count()
    }
    val planted = n / 100
    println(s"""{"docs":${n + 2 * planted},"exact_groups":$nExact,""" +
      s""""exact_sec":$tExact,"lsh_pairs":$nPairs,"lsh_sec":$tLsh,""" +
      s""""planted_exact":$planted}""")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.ghash
import graft.queries.Dedup

/** Scale probe: run the production dedup pipeline on a corpus far past the
  * test SFs, generated file-lessly by the graft-gen source — evidence that
  * the LSH shapes hold as data grows, not just at sf0.1.
  *
  *   sbt "runMain graft.tools.ScaleProbe 1000000"
  *
  * Plants exact dups (+1 copy per 100 docs) and near dups (first token
  * dropped), then runs exact dedup and MinHash-LSH near-dup with the
  * hot-bucket guard, printing one JSON line with CUMULATIVE per-stage
  * timings (each stage includes its upstream cost — marginals are the
  * deltas): sig_sec = shingle+signature, band_sec = +banding,
  * cand_sec = +candidate pairs, lsh_sec = the full pipeline incl. exact-
  * Jaccard verify. Exactness is asserted, not assumed: exact_groups must
  * equal the planted count and every planted near pair must be recalled.
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val (nExact, tExact) = time {
      corpus.groupBy(md5(col("text")).as("digest"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    }

    // stage timings for the LSH path (cumulative; same parameters as the
    // timed full pipeline below: k=32, 8 bands x 4 rows, cap 200)
    val shingled = corpus.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val sig = shingled.withColumn("sig", ghash.minhashSig(col("sh"), 32))
      .select(col("doc_id"), col("sig"))
    val (_, tSig) = time(noop(sig))
    val buckets = sig.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(7)),
          b => ghash.fnv1a64(concat_ws(",",
            transform(slice(col("sig"), b * 4 + 1, lit(4)), x => x.cast("string")))))
      ).as(Seq("band", "bucket")))
    val (_, tBand) = time(noop(buckets))
    val (nCand, tCand) = time {
      Dedup.bucketCandidates(buckets, Seq("band", "bucket"), cap = 200).count()
    }

    val pairs = Dedup.lshJaccardPairs(corpus, k = 32, bands = 8, cap = 200,
      threshold = 0.3).persist()
    val (nPairs, tLsh) = time(pairs.count())

    // exactness: every planted near pair (d, d+2B) must be recalled
    val plantedNear = tenth.select(col("doc_id").as("a_id"),
      (col("doc_id") + 2000000000L).as("b_id"))
    val nearFound = pairs.join(plantedNear, Seq("a_id", "b_id")).count()

    val planted = n / 100
    println(s"""{"docs":${n + 2 * planted},"exact_groups":$nExact,""" +
      s""""exact_sec":$tExact,"sig_sec":$tSig,"band_sec":$tBand,""" +
      s""""cand_pairs":$nCand,"cand_sec":$tCand,""" +
      s""""lsh_pairs":$nPairs,"lsh_sec":$tLsh,""" +
      s""""planted_exact":$planted,"planted_near_found":$nearFound,""" +
      s""""exact_ok":${nExact == planted},"near_ok":${nearFound == planted}}""")
    spark.stop()
  }
}

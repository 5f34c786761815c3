package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 scale probes (one JSONL line per section, the ScaleProbe
  * format — append output to dev/scaleprobe_r16.jsonl). House rule
  * (ProbeR15 lesson, §7.14): ONE section per JVM — co-resident probe
  * legs contaminate each other's walls.
  *
  *   runMain graft.tools.ProbeR16 <section> [n]
  *
  * Sections:
  *   - `c32` (n=200k default, then 1M): Kneser–Ney trigram scoring over
  *     n generated docs — times the trigram model build + scoring join
  *     and reports the trigram-type count (the model's true size knob);
  *     asserts every ≥3-token doc scores.
  *
  * Run with SPARK_DRIVER_MEM=48g (build.sbt forwards it to -Xmx).
  */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("c32")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def gen(n: Long): DataFrame = spark.read.format("graft-gen")
      .option("rows", n.toString).option("parts", "64").load()
      .select(col("doc_id"), col("text"), col("lang"))

    section match {
      case "c32" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val scorable = docs
          .filter(size(split(col("text"), " ")) >= 3).count()
        val nTypes = graft.queries.Corpus.knTrigramStream(docs)
          .groupBy("u", "v", "w").count().count()
        val (scored, t) = time {
          graft.queries.Corpus.knTrigramScore(docs).count()
        }
        println(s"""{"probe":"c32","n":$n,"trigram_types":$nTypes,""" +
          s""""scored":$scored,"scorable":$scorable,"sec":$t,""" +
          s""""c32_ok":${scored == scorable}}""")

      case "s18" =>
        // composed IVF-PQ at corpus scale: k grows with n (the IVF rule —
        // cells ~ sqrt-ish so each list stays bounded), nprobe fixed at
        // k/4; the probe times the full build+serve and reports the
        // candidate volume actually scanned per query vs the corpus.
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val e = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
              .cast("double") / 1000.0).cast("float")).as("embedding"))
          .localCheckpoint(true)
        val k = math.max(16, (math.sqrt(n.toDouble) / 4).toInt)
        // deployment configuration: quantizers trained on a bounded
        // prefix sample (ids are hash-derived, so a prefix IS a random
        // sample here; ~40·k points, the FAISS training-budget rule),
        // serve corpus-wide — the exact full-corpus training is the
        // oracle contract's job, not the 1M probe's
        val trainN = math.min(n, 40L * k)
        val (out, t) = time {
          graft.queries.Similarity.ivfPqAnn(e,
            k = k, nprobe = math.max(4, k / 4), ivfIters = 3,
            m = 4, subDim = 16, ksub = 8, pqIters = 2,
            nQ = 5, shortlist = 32, topK = 5,
            trainPred = Some(col("vec_id") < trainN)).count()
        }
        println(s"""{"probe":"s18","n":$n,"k":$k,"nprobe":${math.max(4, k / 4)},""" +
          s""""train_n":$trainN,"rows":$out,"sec":$t,"s18_ok":${out == 25}}""")

      case "t25" =>
        // ensemble decision layer at corpus scale: one signal scan +
        // c13's model shuffle + two 1-row stat aggs; asserts every doc
        // gets a decision
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val (kept, t) = time {
          val out = graft.queries.TextOps.qualityEnsemble(docs)
            .agg(count(lit(1)).as("n"),
              sum(when(col("keep"), 1L).otherwise(0L)).as("k")).head
          (out.getLong(0), out.getLong(1))
        }
        println(s"""{"probe":"t25","n":$n,"decided":${kept._1},""" +
          s""""kept":${kept._2},"sec":$t,"t25_ok":${kept._1 == n}}""")

      case "s19" =>
        // residual IVFPQ at corpus scale in the deployment shape:
        // quantizers (coarse + residual codebooks) trained on a ~40·k
        // prefix sample, assignment/encode/serve corpus-wide — the
        // extra cost vs s18 is one residual zip per row + nprobe qc
        // scalars per query
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val e = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
              .cast("double") / 1000.0).cast("float")).as("embedding"))
          .localCheckpoint(true)
        val k = math.max(16, (math.sqrt(n.toDouble) / 4).toInt)
        val trainN = math.min(n, 40L * k)
        val (out, t) = time {
          graft.queries.Similarity.ivfPqResidualAnn(e,
            k = k, nprobe = math.max(4, k / 4), ivfIters = 3,
            m = 4, subDim = 16, ksub = 8, pqIters = 2,
            nQ = 5, shortlist = 32, topK = 5,
            trainPred = Some(col("vec_id") < trainN)).count()
        }
        println(s"""{"probe":"s19","n":$n,"k":$k,"train_n":$trainN,""" +
          s""""rows":$out,"sec":$t,"s19_ok":${out == 25}}""")

      case other =>
        System.err.println(s"unknown section: $other")
    }
    spark.stop()
  }
}

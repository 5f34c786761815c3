package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 scale probes (one JSONL line per section, appended to
  * dev/scaleprobe_r17.jsonl). House rule: ONE section per JVM.
  *
  *   runMain graft.tools.ProbeR17 <section> [n]
  *
  * Sections:
  *   - `s20` (n=200k, then 1M): incremental ANN maintenance — builds the
  *     frozen-quantizer base index, then times (a) encoding only the 20%
  *     append batch vs (b) a full re-encode. The maintenance claim is
  *     the RATIO: append cost tracks the batch, not the standing index.
  *   - `c35` (n=200k, then 1M): order-5 KN scoring over generated docs —
  *     the 5-gram model build + scoring join; reports the 5-gram type
  *     count (the model's true size knob) and that every ≥5-token doc
  *     scores.
  *   - `p16` (n=200k, then 1M): the ensemble-gated publish chain
  *     end-to-end (line dedup + serve-mode ensemble + exact dedup).
  *
  * Run with SPARK_DRIVER_MEM=48g.
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("s20")
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
    def vecs(n: Long): DataFrame = spark.range(n)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
            .cast("double") / 1000.0).cast("float")).as("embedding"))
      .localCheckpoint(true)

    section match {
      case "s20" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val e = vecs(n)
        val cut = (n - 1) * 4 / 5
        val k = math.max(16, (math.sqrt(n.toDouble) / 4).toInt)
        val base = e.filter(col("vec_id") <= cut)
        val delta = e.filter(col("vec_id") > cut)
        // frozen quantizers, sampled training (the deployment config)
        val trainN = math.min(cut, 40L * k)
        val (q, tTrain) = time {
          val (cA, cR) = graft.queries.Similarity.ivfPqQuantizers(
            base.filter(col("vec_id") < trainN), k, 3, 4, 16, 8, 2)
          (cA.localCheckpoint(true), cR.localCheckpoint(true))
        }
        val (_, tBase) = time {
          graft.queries.Similarity.ivfPqEncode(base, q._1, q._2, 4, 16)
            .write.format("noop").mode("overwrite").save()
        }
        val (_, tDelta) = time {
          graft.queries.Similarity.ivfPqEncode(delta, q._1, q._2, 4, 16)
            .write.format("noop").mode("overwrite").save()
        }
        val (_, tFull) = time {
          graft.queries.Similarity.ivfPqEncode(e, q._1, q._2, 4, 16)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"""{"probe":"s20","n":$n,"k":$k,"train_n":$trainN,""" +
          s""""train_sec":$tTrain,"base_encode_sec":$tBase,""" +
          s""""delta_encode_sec":$tDelta,"full_encode_sec":$tFull,""" +
          s""""delta_frac":${(n - 1 - cut).toDouble / n},""" +
          s""""s20_ok":${tDelta < tFull}}""")

      case "c35" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val scorable = docs
          .filter(size(split(col("text"), " ")) >= 5).count()
        val nTypes = graft.queries.Corpus.knNgramHashStream(docs, 5)
          .groupBy("h").count().count()
        val (scored, t) = time {
          graft.queries.Corpus.knNgramScore(docs, 5).count()
        }
        println(s"""{"probe":"c35","n":$n,"gram5_types":$nTypes,""" +
          s""""scored":$scored,"scorable":$scorable,"sec":$t,""" +
          s""""c35_ok":${scored == scorable}}""")

      case "p16" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n)
          .select(col("doc_id"), col("lang").as("source"), col("text"))
          .localCheckpoint(true)
        import graft.queries.{Dedup, LineDedup, TextOps}
        val (rows, t) = time {
          val planted = docs.select(col("doc_id"), col("source"),
            LineDedup.plantText(col("doc_id"), col("text")).as("text"))
          val cleaned = Dedup.lineKeep(planted.select("doc_id", "text"))
            .groupBy("doc_id")
            .agg(LineDedup.keptTextAgg.as("text"))
            .join(planted.select("doc_id", "source"), "doc_id")
            .localCheckpoint(true)
          val ens = TextOps.qualityEnsembleServe(
              cleaned.select(col("doc_id"), col("text")))
            .filter(col("keep")).select(col("doc_id"), col("ens"))
          val kept = cleaned.join(ens, "doc_id")
          val keeper = kept.groupBy(md5(col("text")).as("digest"))
            .agg(min(col("doc_id")).as("doc_id"))
          kept.join(keeper, Seq("doc_id")).count()
        }
        println(s"""{"probe":"p16","n":$n,"manifest_rows":$rows,"sec":$t,""" +
          s""""p16_ok":${rows > 0 && rows <= n}}""")

      case "c36" =>
        // incremental count maintenance at scale: the claim is that the
        // per-append work (delta re-tokenize + keyed SUM merge) tracks
        // the BATCH, so time the merge-maintained scoring against the
        // one-shot recount on the same corpus
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val (_, tOne) = time {
          graft.queries.Corpus.knNgramScore(docs, 5).count()
        }
        val (_, tInc) = time {
          graft.queries.Corpus.knNgramScoreIncremental(docs, 5).count()
        }
        println(s"""{"probe":"c36","n":$n,"oneshot_sec":$tOne,""" +
          s""""incremental_sec":$tInc,"c36_ok":${tInc < 2.5 * tOne}}""")

      case other =>
        System.err.println(s"unknown section: $other")
    }
    spark.stop()
  }
}

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

      case other =>
        System.err.println(s"unknown section: $other")
    }
    spark.stop()
  }
}

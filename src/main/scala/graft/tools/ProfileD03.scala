package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.functions.ghash
import graft.queries.Dedup

/** Dev utility: stage-by-stage timing of the minhash LSH pipeline. */
object ProfileD03 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("profile-d03", cores = 8)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"== $label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val shingled = Dedup.plantedCorpus(spark, dir)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("corpus+shingles count")(println(shingled.count()))
    val sig = shingled.withColumn("sig", ghash.minhashSig(col("sh"), 32))
      .select("doc_id", "sig")
    time("minhash sig compute")(println(sig.write.format("noop").mode("overwrite").save()))
    val buckets = sig.select(
      col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(7)),
          b => ghash.fnv1a64(concat_ws(",",
            transform(slice(col("sig"), b * 4 + 1, lit(4)), x => x.cast("string")))))
      ).as(Seq("band", "bucket")))
    time("buckets")(println(buckets.count()))
    val candidates = buckets.as("a").join(buckets.as("b"), Seq("band", "bucket"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .filter(col("a_id") < col("b_id"))
    time("raw candidate pairs")(println(candidates.count()))
    time("distinct candidates")(println(candidates.distinct().count()))
    time("full d03")(println(
      graft.Registry.byName("d03_minhash_lsh_pairs").run(spark, dir).count()))
    spark.stop()
  }
}

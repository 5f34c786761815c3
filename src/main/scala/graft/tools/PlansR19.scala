package graft.tools

import java.nio.file.{Files, Paths}

import graft.Registry
import graft.engine.GraftSession
import org.apache.spark.sql.functions.col

/** Dump the round-19 plan evidence into plans/r19/ (sf0.001, AQE off for
  * stable shapes — the r18 convention). Touched surfaces:
  *   - c36b_kn5_bucketed_merge (new row) — full plan, plus the MERGE STEP
  *     in isolation (the contract row localCheckpoints the merged counts,
  *     which truncates the committed plan to the scoring tail — the same
  *     caveat r18 recorded for c36; the isolated merge plan is where the
  *     "base side has no exchange" claim is checkable).
  *   - c36_kn5_count_merge — the checkpoint-based row's merge step, for
  *     contrast (base side re-exchanged).
  *   - c37 completeness path at broadcastTypesMax=0 — before (serveChain,
  *     the pre-r19 9-join chain) and after (compacted probe join).
  *   - t22_host_prior_filter — examined this round (r18 VERDICT item 4);
  *     plan unchanged, committed so the broadcast-join claim is on file.
  */
object PlansR19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = Paths.get("plans/r19")
    Files.createDirectories(out)
    val spark = GraftSession.build("graft-plans-r19", cores = 4,
      extraConf = Map("spark.sql.adaptive.enabled" -> "false"))
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    def dump(name: String, body: String): Unit = {
      Files.writeString(out.resolve(name), body)
      println(s"[plans] wrote plans/r19/$name")
    }
    for (q <- Seq("c36b_kn5_bucketed_merge", "c36_kn5_count_merge",
        "t22_host_prior_filter", "c37_kn5_ref_trained"))
      dump(s"${q}_after.txt", fmt(Registry.byName(q).run(spark, dir)))

    // isolated merge steps (pre-checkpoint, where the join shape lives)
    import graft.queries.{Corpus, Pipeline}
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head.getLong(0)
    val cut = mx * 4 / 5
    val baseCkpt = Corpus.knGramHashCountsPublic(
      docs.filter(col("doc_id") <= cut), 5).localCheckpoint(true)
    dump("c36_merge_step_after.txt",
      fmt(Corpus.knCountsMerge(baseCkpt, docs.filter(col("doc_id") > cut), 5)))
    Pipeline.bucketedWriteBy(spark, "plans_c36b_base", baseCkpt,
      spark.conf.get("spark.sql.shuffle.partitions").toInt, "h")
    dump("c36b_merge_step_after.txt",
      fmt(Corpus.knCountsMerge(spark.table("plans_c36b_base"),
        docs.filter(col("doc_id") > cut), 5)))

    // c37 completeness path (beyond-broadcast), before vs after
    val train = col("doc_id") % 5 === 0
    dump("c37_completeness_before.txt",
      fmt(Corpus.knNgramScoreOpenVocab(docs, 5, train,
        broadcastTypesMax = 0L, serveChain = true)))
    dump("c37_completeness_after.txt",
      fmt(Corpus.knNgramScoreOpenVocab(docs, 5, train,
        broadcastTypesMax = 0L)))
    spark.stop()
  }
}

package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 scale probes (one JSONL line per section, appended to
  * dev/scaleprobe_r19.jsonl). House rule: ONE section per JVM.
  *
  *   runMain graft.tools.ProbeR19 <section> [arg]
  *
  * Sections:
  *   - `t22` [dir]: stage-level breakdown of the heaviest never-optimized
  *     row (r18 VERDICT item 4). t13 scores the same corpus map-side in
  *     1.9 s at sf1 while t22 reads 14.4 s — this isolates score pass /
  *     checkpoint / prior agg / join+sort to find the missing 12 s.
  *   - `codec` [dir]: the KN shuffle family (c35 one-shot score) under
  *     the session's spark.io.compression.codec — run once per JVM with
  *     PROBE_CODEC=lz4 and =zstd (SparkContext-static conf; r18 VERDICT
  *     item 3). Reports wall + shuffle-write bytes (compressed, so the
  *     ratio shows directly) + quiet stamps.
  *   - `c37chain` [n]: the beyond-broadcast completeness path (gate
  *     forced to 0) — current 9-deep sequential left-join chain vs the
  *     compacted serve, wall + shuffle bytes + rows-agree (r18 VERDICT
  *     item 6).
  *   - `c36bucket` [dir]: the c36 scenario with the base count table
  *     written bucketed-by-h and merged from storage (the p14 pattern,
  *     all inside the timed region) vs the current localCheckpoint row
  *     (r18 VERDICT item 5).
  *   - `kn3` [dir]: string-keyed trigram scorer (c32 shape) vs the
  *     hash-keyed order-3 chain — the c33/c34/c32b scorer decision, with
  *     exact-agreement fingerprints for the full and pruned variants.
  */
object ProbeR19 {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("t22")
    val codec = sys.env.getOrElse("PROBE_CODEC", "lz4")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.io.compression.codec", codec)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong
    // per-stage log: (id, name, wall ms, task cpu ms, tasks, spill bytes)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, String, Long, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        val si = sc.stageInfo
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(-1L)
        stageLog.add((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          wall, si.taskMetrics.executorRunTime, si.numTasks,
          si.taskMetrics.memoryBytesSpilled +
            si.taskMetrics.diskBytesSpilled))
      }
    })
    def timeSb[A](f: => A): (A, Double, Long) = {
      Thread.sleep(1500)
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      (a, sec, shuffleBytes.get() - sb0)
    }
    // JSON-safe stage name (ADVICE r18: escape rather than hope)
    def esc(s: String): String = s.replaceAll("[^A-Za-z0-9 _.:()\\[\\]=#-]", "_")
    def slowStages(k: Int): String = {
      import scala.jdk.CollectionConverters._
      stageLog.asScala.toVector.sortBy(-_._3).take(k)
        .map { case (id, nm, w, rt, nt, sp) =>
          s"""["$id ${esc(nm)}",${w / 1000.0},${rt / 1000.0},$nt,${sp / 1048576}]"""
        }.mkString("[", ",", "]")
    }
    def gen(n: Long): DataFrame = spark.read.format("graft-gen")
      .option("rows", n.toString).option("parts", "64").load()
      .select(col("doc_id"), col("text"), col("lang"))

    section match {
      case "t22" =>
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        import graft.queries.{TextOps, Dedup}
        // (a) the full contract row
        stageLog.clear()
        val (_, tFull, sbFull) = timeSb {
          TextOps.hostPriorFilter(docs)
            .write.format("noop").mode("overwrite").save()
        }
        val fullStages = slowStages(6)
        // (b) the base frame alone, no checkpoint (t13-shaped map pass)
        val baseExpr = docs.select(col("doc_id"),
          regexp_extract(Dedup.canonicalUrl(Dedup.syntheticUrl),
            "^https://([^/]+)", 1).as("host"),
          TextOps.classifierScore(col("text")).as("score"))
        stageLog.clear()
        val (_, tBase, _) = timeSb {
          baseExpr.write.format("noop").mode("overwrite").save()
        }
        // (c) score column alone (t13's serve shape — the reference point)
        val (_, tScore, _) = timeSb {
          docs.select(col("doc_id"),
            TextOps.classifierScore(col("text")).as("score"))
            .write.format("noop").mode("overwrite").save()
        }
        // (d) host column alone (URL synth + canon regex chain)
        val (_, tHost, _) = timeSb {
          docs.select(col("doc_id"),
            regexp_extract(Dedup.canonicalUrl(Dedup.syntheticUrl),
              "^https://([^/]+)", 1).as("host"))
            .write.format("noop").mode("overwrite").save()
        }
        // (e) base WITH eager checkpoint (what the row actually does)
        stageLog.clear()
        val (ck, tCk, _) = timeSb { baseExpr.localCheckpoint(true) }
        // (f) downstream from the checkpoint: prior agg + gate count +
        // broadcast join + final orderBy
        stageLog.clear()
        val (_, tTail, sbTail) = timeSb {
          import graft.engine.Exact
          val prior = ck.groupBy("host")
            .agg((Exact.dsum(col("score")) /
              count(lit(1)).cast("double")).as("host_prior"))
            .localCheckpoint(true)
          val joined =
            if (prior.count() <= (1L << 20)) ck.join(broadcast(prior), "host")
            else ck.join(prior, "host")
          joined
            .select(col("doc_id"), col("host"), col("score"),
              col("host_prior"),
              (lit(0.5) * col("score") + lit(0.5) * col("host_prior"))
                .as("combined"))
            .withColumn("keep", col("combined") > 0.0)
            .withColumn("flipped", col("keep") =!= (col("score") > 0.0))
            .orderBy("doc_id")
            .write.format("noop").mode("overwrite").save()
        }
        val tailStages = slowStages(6)
        println(s"""{"probe":"t22","dir":"$dir","full_sec":$tFull,""" +
          s""""full_shuffle_mb":${sbFull / 1048576},""" +
          s""""base_noop_sec":$tBase,"score_only_sec":$tScore,""" +
          s""""host_only_sec":$tHost,"base_ckpt_sec":$tCk,""" +
          s""""tail_sec":$tTail,"tail_shuffle_mb":${sbTail / 1048576},""" +
          s""""full_stages":$fullStages,"tail_stages":$tailStages}""")

      case "codec" =>
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        import graft.BenchGate.fmt2
        // two passes: run 1 pays codegen/JIT, run 2 is the comparable
        // number (cross-JVM comparison, so both are stamped)
        val runs = (1 to 2).map { i =>
          Thread.sleep(1500); val sb0 = shuffleBytes.get()
          val st = graft.BenchGate.stampRun {
            graft.queries.Corpus.knNgramScore(docs, 5)
              .write.format("noop").mode("overwrite").save()
          }
          Thread.sleep(1500)
          (st, shuffleBytes.get() - sb0)
        }
        val rJson = runs.map { case (st, sb) =>
          s"""{"sec":${fmt2(st.sec)},"shuffle_mb":${sb / 1048576},""" +
            s""""otherCores":${fmt2(st.otherCores)},""" +
            s""""foreignMbps":${fmt2(st.foreignMbps)},""" +
            s""""devBusy":${fmt2(st.devBusy)}}"""
        }.mkString("[", ",", "]")
        println(s"""{"probe":"codec","codec":"$codec","dir":"$dir",""" +
          s""""runs":$rJson}""")

      case "c37chain" =>
        // beyond-broadcast completeness path: gate forced to 0 so every
        // model join SHUFFLES. Rows must agree with the broadcast path
        // (the declared config) — that equivalence is the optimization's
        // safety net, additionally pinned by CorpusSpec.
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val train = col("doc_id") % 5 === 0
        // warm-up + deployment reference: the broadcast path (first in
        // the JVM, pays JIT — its wall is not the comparison number)
        val (rowsB, tB, sbB) = timeSb {
          graft.queries.Corpus.knNgramScoreOpenVocab(docs, 5, train)
            .count()
        }
        // the PRE-r19 completeness serve: 2n−1 sequential shuffled
        // left-joins of the corpus stream (serveChain escape hatch)
        val (rowsC, tC, sbC) = timeSb {
          graft.queries.Corpus.knNgramScoreOpenVocab(docs, 5, train,
            broadcastTypesMax = 0L, serveChain = true).count()
        }
        // the r19 compacted serve: union'd model, one probe join + pivot
        stageLog.clear()
        val (rowsS, tS, sbS) = timeSb {
          graft.queries.Corpus.knNgramScoreOpenVocab(docs, 5, train,
            broadcastTypesMax = 0L).count()
        }
        println(s"""{"probe":"c37chain","n":$n,""" +
          s""""bcast_sec":$tB,"bcast_shuffle_mb":${sbB / 1048576},""" +
          s""""chain_sec":$tC,"chain_shuffle_mb":${sbC / 1048576},""" +
          s""""compacted_sec":$tS,"compacted_shuffle_mb":${sbS / 1048576},""" +
          s""""rows_bcast":$rowsB,"rows_chain":$rowsC,"rows_compacted":$rowsS,""" +
          s""""rows_agree":${rowsB == rowsS && rowsC == rowsS},""" +
          s""""stages":${slowStages(8)}}""")

      case "c36bucket" =>
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        // current contract row (checkpointed in-memory base)
        val (_, tCur, sbCur) = timeSb {
          graft.queries.Corpus.knNgramScoreIncremental(docs, 5)
            .write.format("noop").mode("overwrite").save()
        }
        // bucketed-base scenario: base written bucketed-by-h, merge
        // reads it back — all inside the timed region
        stageLog.clear()
        val (_, tBk, sbBk) = timeSb {
          graft.queries.Corpus.knNgramScoreBucketed(spark, docs, 5,
            s"probe_c36b_${graft.queries.Pipeline.dirTag(dir)}")
            .write.format("noop").mode("overwrite").save()
        }
        println(s"""{"probe":"c36bucket","dir":"$dir",""" +
          s""""current_sec":$tCur,"current_shuffle_mb":${sbCur / 1048576},""" +
          s""""bucketed_sec":$tBk,"bucketed_shuffle_mb":${sbBk / 1048576},""" +
          s""""stages":${slowStages(8)}}""")

      case "bucketsteps" =>
        // byte-level attribution of the c36b trade: from ONE prebuilt base
        // count table, isolate (1) the bucketed WRITE's own shuffle, (2)
        // the merge-from-storage shuffle, (3) the merge-from-checkpoint
        // shuffle (the r18 partcheck result says localCheckpoint loses
        // partitioning, so this leg re-exchanges the base)
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
        val cut = mx * 4 / 5
        import graft.queries.Corpus
        val (base, tBase, sbBase) = timeSb {
          Corpus.knGramHashCountsPublic(
            docs.filter(col("doc_id") <= cut), 5).localCheckpoint(true)
        }
        val delta = docs.filter(col("doc_id") > cut)
        val (_, tW, sbW) = timeSb {
          graft.queries.Pipeline.bucketedWriteBy(spark, "probe_c36steps",
            base, spark.conf.get("spark.sql.shuffle.partitions").toInt, "h")
        }
        val (_, tMT, sbMT) = timeSb {
          Corpus.knCountsMerge(spark.table("probe_c36steps"), delta, 5)
            .write.format("noop").mode("overwrite").save()
        }
        val (_, tMC, sbMC) = timeSb {
          Corpus.knCountsMerge(base, delta, 5)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"""{"probe":"bucketsteps","dir":"$dir",""" +
          s""""base_build_sec":$tBase,"base_build_shuffle_mb":${sbBase / 1048576},""" +
          s""""bucket_write_sec":$tW,"bucket_write_shuffle_mb":${sbW / 1048576},""" +
          s""""merge_from_table_sec":$tMT,"merge_from_table_shuffle_mb":${sbMT / 1048576},""" +
          s""""merge_from_ckpt_sec":$tMC,"merge_from_ckpt_shuffle_mb":${sbMC / 1048576}}""")

      case "kn3" =>
        // the c33/c34/c32b scorer decision (guide §2.3, the r18 c35keys
        // experiment one order down): the string-keyed trigram scorer
        // (knTrigramScore — c32's anchor shape) vs the hash-keyed generic
        // chain at order 3 (knNgramScore(_, 3) — CorpusSpec pins them
        // bit-for-bit). Two alternating rounds per leg so both report a
        // JIT-warm number; exact-agreement fingerprints (xxhash64 sum over
        // every row) for the full AND pruned (minCount=2) variants.
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        import graft.queries.Corpus
        def leg(df: => DataFrame): (Double, Long) = {
          val (_, t, sb) = timeSb {
            df.write.format("noop").mode("overwrite").save()
          }
          (t, sb)
        }
        val s1 = leg(Corpus.knTrigramScore(docs))
        val h1 = leg(Corpus.knNgramScore(docs, 3))
        val s2 = leg(Corpus.knTrigramScore(docs))
        val h2 = leg(Corpus.knNgramScore(docs, 3))
        def fp(df: DataFrame): Long =
          df.toDF("doc_id", "n", "avg_nll")
            .select(xxhash64(col("doc_id"), col("n"), col("avg_nll")).as("x"))
            .agg(expr("bit_xor(x)")).head.getLong(0)
        val fpStr = fp(Corpus.knTrigramScore(docs))
        val fpHash = fp(Corpus.knNgramScore(docs, 3))
        val fpStrP = fp(Corpus.knTrigramScore(docs, minCount = 2))
        val fpHashP = fp(Corpus.knNgramScore(docs, 3, minCount = 2))
        println(s"""{"probe":"kn3","dir":"$dir",""" +
          s""""string_sec":[${s1._1},${s2._1}],""" +
          s""""string_shuffle_mb":[${s1._2 / 1048576},${s2._2 / 1048576}],""" +
          s""""hash_sec":[${h1._1},${h2._1}],""" +
          s""""hash_shuffle_mb":[${h1._2 / 1048576},${h2._2 / 1048576}],""" +
          s""""rows_agree":${fpStr == fpHash},""" +
          s""""pruned_rows_agree":${fpStrP == fpHashP},""" +
          s""""stages":${slowStages(8)}}""")

      case "ivfpq" =>
        // stage attribution for the never-optimized IVF-PQ family (s18-
        // s20b, ~66 s of the sf1 ext series): is the time in the
        // contract-pinned training rounds (3 Lloyd + 2 PQ iterations the
        // oracle unrolls — irreducible without changing results), the
        // encode pass, or the serve tail? s19 (residual, the slowest
        // full-train row) decomposed; every piece noop-sunk in order.
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")).localCheckpoint(true)
        import graft.queries.Similarity
        val (centArr, tCent, sbCent) = timeSb {
          Similarity.ivfCentroids(e, 16, 3).localCheckpoint(true)
        }
        // s18-shaped quantizers: PQ codebooks on raw vectors
        val (cbRow, tPq, sbPq) = timeSb {
          Similarity.pqCodebooks(e, 4, 16, 8, 2)
            .agg(array_sort(collect_list(struct(col("sub"), col("codes"))))
              .as("cb")).localCheckpoint(true)
        }
        val (idx, tEnc, sbEnc) = timeSb {
          Similarity.ivfPqEncode(e, centArr, cbRow, 4, 16)
            .localCheckpoint(true)
        }
        val (_, tServe, sbServe) = timeSb {
          Similarity.ivfPqServe(e, idx, centArr, cbRow, 4, 16, 8, 4, 5, 32, 5)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"""{"probe":"ivfpq","dir":"$dir",""" +
          s""""lloyd3_sec":$tCent,"lloyd3_shuffle_mb":${sbCent / 1048576},""" +
          s""""pqtrain_sec":$tPq,"pqtrain_shuffle_mb":${sbPq / 1048576},""" +
          s""""encode_sec":$tEnc,"encode_shuffle_mb":${sbEnc / 1048576},""" +
          s""""serve_sec":$tServe,"serve_shuffle_mb":${sbServe / 1048576},""" +
          s""""stages":${slowStages(10)}}""")

      case other =>
        System.err.println(s"unknown section: $other")
    }
    spark.stop()
  }
}

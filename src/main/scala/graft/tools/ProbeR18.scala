package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 scale probes (one JSONL line per section, appended to
  * dev/scaleprobe_r18.jsonl). House rule: ONE section per JVM.
  *
  *   runMain graft.tools.ProbeR18 <section> [n]
  *
  * Sections:
  *   - `c35` (n=200k, then 1M): order-5 KN scoring, now HASH-KEYED
  *     (r17 item 1) — wall time to compare against
  *     scaleprobe_r17.jsonl's string-keyed 53.7 s / 295.3 s, plus total
  *     shuffle-write bytes from a stage listener.
  *   - `c36` (n=200k, then 1M): incremental count maintenance, same
  *     comparison vs r17's 93.4 s / 169.3 s.
  *   - `c35keys` (n=200k, then 1M): the isolated key-width experiment —
  *     the count shuffle + scoring join SKELETON (no model math) run
  *     once keyed on the five gram STRINGS (the r17 shape) and once on
  *     the fused 8-byte hash, reporting each variant's wall time and
  *     shuffle-write bytes. This is the like-for-like shuffle-byte
  *     drop the r17 verdict's done-criterion asks for (the full-path
  *     c35 numbers fold in model-build changes too).
  *
  * Run with SPARK_DRIVER_MEM=48g.
  */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("c35")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // total shuffle-write bytes across completed stages (listener events
    // are async: snapshot after a short drain sleep)
    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timeSb[A](f: => A): (A, Double, Long) = {
      Thread.sleep(1500)
      val sb0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // drain listener queue
      (a, sec, shuffleBytes.get() - sb0)
    }
    def gen(n: Long): DataFrame = spark.read.format("graft-gen")
      .option("rows", n.toString).option("parts", "64").load()
      .select(col("doc_id"), col("text"), col("lang"))

    section match {
      case "c35" =>
        // this family writes ~20 GB of shuffle per pass: a PREDECESSOR
        // JVM's exiting shuffle files flush as foreign writeback under
        // the next timed run (up to ~3x wall inflation, the same
        // blind spot BenchGate closed for the bench) — so each pass
        // carries a full quiet stamp and cross-JVM comparisons must
        // read them
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val scorable = docs
          .filter(size(split(col("text"), " ")) >= 5).count()
        var scored = 0L
        var sb0 = 0L
        Thread.sleep(1500); val sbA = shuffleBytes.get()
        val st = graft.BenchGate.stampRun {
          scored = graft.queries.Corpus.knNgramScore(docs, 5).count()
        }
        Thread.sleep(1500); sb0 = shuffleBytes.get() - sbA
        import graft.BenchGate.fmt2
        println(s"""{"probe":"c35","n":$n,"scored":$scored,""" +
          s""""scorable":$scorable,"sec":${st.sec},""" +
          s""""shuffle_mb":${sb0 / 1048576},""" +
          s""""foreignMbps":${fmt2(st.foreignMbps)},""" +
          s""""devBusy":${fmt2(st.devBusy)},""" +
          s""""otherCores":${fmt2(st.otherCores)},""" +
          s""""r17_string_sec":${if (n >= 1000000) 295.3 else 53.7},""" +
          s""""c35_ok":${scored == scorable}}""")

      case "c36" =>
        // same-JVM ordered pair (oneshot first): the incremental pass
        // absorbs the oneshot's writeback, so tInc < tOne is evidence
        // DESPITE interference, and the stamps say how much there was
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        Thread.sleep(1500); val sbA = shuffleBytes.get()
        val stOne = graft.BenchGate.stampRun {
          graft.queries.Corpus.knNgramScore(docs, 5).count(): Unit
        }
        Thread.sleep(1500); val sbOne = shuffleBytes.get() - sbA
        val stInc = graft.BenchGate.stampRun {
          graft.queries.Corpus.knNgramScoreIncremental(docs, 5).count(): Unit
        }
        Thread.sleep(1500); val sbInc = shuffleBytes.get() - sbA - sbOne
        import graft.BenchGate.fmt2
        println(s"""{"probe":"c36","n":$n,"oneshot_sec":${stOne.sec},""" +
          s""""incremental_sec":${stInc.sec},""" +
          s""""oneshot_shuffle_mb":${sbOne / 1048576},""" +
          s""""incremental_shuffle_mb":${sbInc / 1048576},""" +
          s""""oneshot_foreignMbps":${fmt2(stOne.foreignMbps)},""" +
          s""""inc_foreignMbps":${fmt2(stInc.foreignMbps)},""" +
          s""""oneshot_devBusy":${fmt2(stOne.devBusy)},""" +
          s""""inc_devBusy":${fmt2(stInc.devBusy)},""" +
          s""""r17_string_inc_sec":${if (n >= 1000000) 169.3 else 93.4},""" +
          s""""c36_ok":${stInc.sec < 2.5 * stOne.sec}}""")

      case "c36counts" =>
        // the maintained ARTIFACT is the count table — the stamped c36
        // pair showed the corpus-wide scoring tail (identical work in
        // both configs) dominating at ~50M types and masking the
        // count-phase asymmetry, so this measures count maintenance
        // alone: stored base counts absorbing a 50k batch by one SUM
        // merge vs recounting the whole corpus
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val batch = 50000L
        val docs = gen(n).localCheckpoint(true)
        val cut = n - batch
        val base = graft.queries.Corpus.knGramHashCountsPublic(
            docs.filter(col("doc_id") <= cut), 5)
          .localCheckpoint(true) // the persisted model counts
        Thread.sleep(1500); val sbA = shuffleBytes.get()
        val stM = graft.BenchGate.stampRun {
          graft.queries.Corpus.knCountsMerge(base,
            docs.filter(col("doc_id") > cut), 5).count(): Unit
        }
        Thread.sleep(1500); val sbM = shuffleBytes.get() - sbA
        val stR = graft.BenchGate.stampRun {
          graft.queries.Corpus.knGramHashCountsPublic(docs, 5)
            .count(): Unit
        }
        Thread.sleep(1500); val sbR = shuffleBytes.get() - sbA - sbM
        // production layout: the stored count table is BUCKETED BY h
        // (localCheckpoint does not carry HashPartitioning into
        // Catalyst — the partcheck section measures an Exchange over
        // Scan ExistingRDD — but a bucketed parquet table does), so
        // the join-form merge moves ONLY the delta
        spark.sql("DROP TABLE IF EXISTS c36_base_counts")
        try {
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), "c36_base_counts")
          val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(loc)) fs.delete(loc, true)
        } catch { case _: Throwable => () }
        base.write.mode("overwrite").format("parquet")
          .bucketBy(64, "h").saveAsTable("c36_base_counts")
        val baseT = spark.table("c36_base_counts")
        Thread.sleep(1500); val sbB0 = shuffleBytes.get()
        val stB = graft.BenchGate.stampRun {
          graft.queries.Corpus.knCountsMerge(baseT,
            docs.filter(col("doc_id") > cut), 5).count(): Unit
        }
        Thread.sleep(1500); val sbB = shuffleBytes.get() - sbB0
        import graft.BenchGate.fmt2
        println(s"""{"probe":"c36counts","n":$n,"batch":$batch,""" +
          s""""merge_sec":${stM.sec},"recount_sec":${stR.sec},""" +
          s""""bucketed_merge_sec":${stB.sec},""" +
          s""""merge_shuffle_mb":${sbM / 1048576},""" +
          s""""recount_shuffle_mb":${sbR / 1048576},""" +
          s""""bucketed_merge_shuffle_mb":${sbB / 1048576},""" +
          s""""merge_foreignMbps":${fmt2(stM.foreignMbps)},""" +
          s""""recount_foreignMbps":${fmt2(stR.foreignMbps)},""" +
          s""""bucketed_foreignMbps":${fmt2(stB.foreignMbps)},""" +
          s""""c36counts_ok":${stB.sec < stR.sec && sbB < sbR / 4}}""")

      case "partcheck" =>
        // does a localCheckpoint carry HashPartitioning into a later
        // join under AQE? (decides whether the c36counts merge can
        // dodge re-shuffling the stored base in-JVM, or whether that
        // claim belongs to bucketed parquet storage only)
        val base0 = spark.range(1000000)
          .select((col("id") % 100000).as("k"), col("id").as("v"))
          .groupBy("k").agg(sum(col("v")).as("s")).localCheckpoint(true)
        val delta0 = spark.range(1000)
          .select(col("id").as("k2"), lit(1L).as("w"))
          .groupBy("k2").agg(sum(col("w")).as("t"))
        val j = base0.join(delta0, col("k") === col("k2"), "full_outer")
        val plan = j.queryExecution.executedPlan.toString
        Thread.sleep(500); val sb1 = shuffleBytes.get()
        j.count()
        Thread.sleep(1500)
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        println(s"""{"probe":"partcheck","exchanges":$exchanges,""" +
          s""""shuffle_kb":${(shuffleBytes.get() - sb1) / 1024}}""")
        System.err.println(plan.take(4000))

      case "c35keys" =>
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        // string-keyed skeleton: the r17 stream shape (struct zip of the
        // token array with its tails), count shuffle + scoring join on
        // five string columns
        val ts = split(col("text"), " ")
        val cnt = greatest(size(ts) - 4, lit(0))
        val first = transform(slice(ts, lit(1), cnt), x => struct(x.as("g1")))
        val grams = (2 to 5).foldLeft(first) { (acc, i) =>
          zip_with(acc, slice(ts, lit(i), cnt), (p, c) =>
            struct(((1 until i).map(j => p.getField(s"g$j").as(s"g$j")) :+
              c.as(s"g$i")): _*))
        }
        val tgStr = docs.select(col("doc_id"), explode(grams).as("g"))
          .select(col("doc_id") +: (1 to 5).map(i =>
            col(s"g.g$i").as(s"g$i")): _*)
        val gk = (1 to 5).map(i => s"g$i")
        val (rs, tStr, sbStr) = timeSb {
          val tc = tgStr.groupBy(gk.map(col): _*)
            .agg(count(lit(1)).as("c")).localCheckpoint(true)
          tgStr.join(tc, gk).groupBy("doc_id")
            .agg(sum(col("c")).as("s")).count()
        }
        // hash-keyed skeleton: same shuffles keyed on the fused hash
        val tgHash = graft.queries.Corpus.knNgramHashStream(docs, 5)
          .select("doc_id", "h")
        val (rh, tHash, sbHash) = timeSb {
          val tc = tgHash.groupBy("h").agg(count(lit(1)).as("c"))
            .localCheckpoint(true)
          tgHash.join(tc, Seq("h")).groupBy("doc_id")
            .agg(sum(col("c")).as("s")).count()
        }
        println(s"""{"probe":"c35keys","n":$n,"string_sec":$tStr,""" +
          s""""hash_sec":$tHash,"string_shuffle_mb":${sbStr / 1048576},""" +
          s""""hash_shuffle_mb":${sbHash / 1048576},""" +
          s""""rows_agree":${rs == rh},""" +
          s""""keys_ok":${sbHash < sbStr}}""")

      case "c37" =>
        // reference-trained open-vocab scoring: model cost tracks the
        // 20% clean slice; serving cost is the corpus-wide left-join
        // chain (broadcast path — the deployment config)
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val (scored, t, sb) = timeSb {
          graft.queries.Corpus.knNgramScoreOpenVocab(docs, 5,
            col("doc_id") % 5 === 0).count()
        }
        println(s"""{"probe":"c37","n":$n,"scored":$scored,"sec":$t,""" +
          s""""shuffle_mb":${sb / 1048576}}""")

      case "c38" =>
        // takedown retraction: only the ~4% delete list re-tokenizes;
        // compare against rebuilding the model over the survivors
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val del = col("doc_id") % 23 === 7
        val (_, tRe, _) = timeSb {
          graft.queries.Corpus.knNgramScore(docs.filter(!del), 5).count()
        }
        val (_, tRet, _) = timeSb {
          graft.queries.Corpus.knNgramScoreRetract(docs, 5, del).count()
        }
        println(s"""{"probe":"c38","n":$n,"retract_sec":$tRet,""" +
          s""""rebuild_sec":$tRe}""")

      case "c39" =>
        // incremental index maintenance: delta build + merge vs full
        // rebuild. Batch-proportionality is a FIXED batch against a
        // growing corpus — merge cost tracks the 50k batch (plus an
        // index scan) while rebuild re-tokenizes everything; scaling
        // the batch with n (the first cut of this probe) conflates the
        // two and at probe scale job overhead hides the asymmetry.
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val batch = 50000L
        val docs = gen(n).localCheckpoint(true)
        val cut = n - batch
        val base = graft.queries.Corpus.invertedIndexRows(
            docs.filter(col("doc_id") <= cut), 100L)
          .localCheckpoint(true) // the stored artifact
        // deployment shape: only re-aggregated shards are written
        // (dynamic partition overwrite leaves untouched partitions on
        // disk), so the maintenance job is delta-build + touched-shard
        // merge — NOT a full index rewrite
        val (_, tInc, sbInc) = timeSb {
          graft.queries.Corpus.invertedIndexMergeDelta(base,
            graft.queries.Corpus.invertedIndexRows(
              docs.filter(col("doc_id") > cut), 100L))
            .write.format("noop").mode("overwrite").save()
        }
        // serving/oracle shape: the full logical view (untouched ∪
        // merged) — shuffle stays batch-proportional but the noop sink
        // re-streams the whole index, so wall time reads as an index
        // scan, not maintenance cost
        val (_, tView, sbView) = timeSb {
          graft.queries.Corpus.invertedIndexMerge(base,
            graft.queries.Corpus.invertedIndexRows(
              docs.filter(col("doc_id") > cut), 100L))
            .write.format("noop").mode("overwrite").save()
        }
        val (_, tFull, sbFull) = timeSb {
          graft.queries.Corpus.invertedIndexRows(docs, 100L)
            .write.format("noop").mode("overwrite").save()
        }
        println(s"""{"probe":"c39","n":$n,"batch":$batch,""" +
          s""""merge_write_sec":$tInc,"full_view_sec":$tView,""" +
          s""""rebuild_sec":$tFull,"merge_shuffle_mb":${sbInc / 1048576},""" +
          s""""view_shuffle_mb":${sbView / 1048576},""" +
          s""""rebuild_shuffle_mb":${sbFull / 1048576},""" +
          s""""c39_ok":${tInc < tFull && sbView < sbFull}}""")

      case "p1718" =>
        // takedown correction of zone manifest + publish manifest vs
        // rebuild-over-survivors at scale (events surrogate: synthetic
        // shards over generated docs' ids; publish over generated docs)
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val docs = gen(n).localCheckpoint(true)
        val delPred = col("doc_id") % 5 === 0
        val scored = graft.queries.Pipeline.gateScored(
          docs.select(col("doc_id"), col("lang").as("source"), col("text")))
          .localCheckpoint(true)
        val manifest = graft.queries.Pipeline.manifestFrom(scored)
          .localCheckpoint(true)
        val (_, tCor, _) = timeSb {
          graft.queries.Pipeline.manifestDelete(manifest, scored, delPred)
            .write.format("noop").mode("overwrite").save()
        }
        val (_, tReb, _) = timeSb {
          graft.queries.Pipeline.manifestFrom(scored.filter(!delPred))
            .write.format("noop").mode("overwrite").save()
        }
        println(s"""{"probe":"p1718","n":$n,"correct_sec":$tCor,""" +
          s""""rebuild_sec":$tReb,"p18_ok":${tCor < 2.0 * tReb}}""")

      case "s17" =>
        // r17 verdict item 6: pin the s17 exact-CC run variance. Five
        // consecutive runs in ONE JVM with full BenchGate stamps — if the
        // intra-JVM spread is tight on a quiet box, the driver-artifact
        // spread (11.3–25 s across r17 benches, code untouched) is
        // cross-run I/O interference on the localCheckpoint cadence, now
        // visible to the r18-extended gate rather than mysterious.
        // (First run of this section read 14.5–376 s across 5 runs with
        // ZERO foreign CPU/IO — so the variance is INTRINSIC to the
        // JVM/run, not interference. The counters below split wall into
        // own-CPU vs GC vs scheduler idle, and name the slowest stages.)
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val spec = graft.Registry.byName("s17_semantic_survivors")
        import java.lang.management.ManagementFactory
        import scala.jdk.CollectionConverters._
        val osBean = ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
        // per-stage wall + max task time, drained per run
        val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[
          (Int, String, Long, Long, Int, Long)]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onStageCompleted(
              sc: SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (for {
              a <- si.completionTime; b <- si.submissionTime
            } yield a - b).getOrElse(-1L)
            stageLog.add((si.stageId,
              si.name.takeWhile(_ != '\n').take(60), wall,
              si.taskMetrics.executorRunTime, si.numTasks,
              si.taskMetrics.memoryBytesSpilled +
                si.taskMetrics.diskBytesSpilled))
          }
        })
        // JIT visibility: codegen classes are new per query plan, so a
        // long-lived multi-query JVM can exhaust the reserved code cache
        // (JDK17 default 240 MB) — when that happens the JIT stops
        // compiling and generated code runs INTERPRETED, a silent 10-100x
        // CPU inflation no /proc stamp can see
        def codeCacheMb: (Long, Long) = {
          val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
            .filter(_.getName.startsWith("CodeHeap"))
          (pools.map(_.getUsage.getUsed).sum / 1048576,
            pools.map(_.getUsage.getMax).sum / 1048576)
        }
        val compBean = ManagementFactory.getCompilationMXBean
        // per-THREAD cpu from /proc/self/task, bucketed by comm prefix,
        // split user/sys — tells GC threads from C2 from task workers
        // from kernel time (none of which the MXBeans separate)
        def threadCpu(): Map[String, (Long, Long)] = {
          val tk = new java.io.File("/proc/self/task").listFiles()
          if (tk == null) Map.empty
          else tk.flatMap { t =>
            try {
              val s = java.nio.file.Files.readString(
                java.nio.file.Paths.get(t.getPath, "stat"))
              val comm = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
              val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
              // strip only a TRAILING numeric suffix (r18 ADVICE: the old
              // "[0-9#-]+.*$" truncated 'C2 CompilerThread0' and
              // 'C1 CompilerThread0' both to 'C', merging the JIT tiers)
              val key = comm.replaceAll("[#-]?[0-9]+$", "").trim match {
                case "" => comm.take(12)
                case k => k.take(20)
              }
              Some((key, rest(11).toLong, rest(12).toLong)) // utime, stime
            } catch { case _: Throwable => None }
          }.groupBy(_._1).map { case (k, v) =>
            k -> (v.map(_._2).sum, v.map(_._3).sum) }
        }
        // real USER_HZ, not a hardcoded 100 (r18 ADVICE)
        val clkTck = graft.BenchGate.clkTck
        val secs = (1 to 5).map { i =>
          stageLog.clear()
          val cpu0 = osBean.getProcessCpuTime; val gc0 = gcMs
          val jit0 = compBean.getTotalCompilationTime
          val tc0 = threadCpu()
          val st = graft.BenchGate.stampRun {
            spec.run(spark, dir).write.format("noop")
              .mode("overwrite").save()
          }
          val cpuS = (osBean.getProcessCpuTime - cpu0) / 1e9
          val gcS = (gcMs - gc0) / 1e3
          val jitS = (compBean.getTotalCompilationTime - jit0) / 1e3
          val (ccUsed, ccMax) = codeCacheMb
          val tc1 = threadCpu()
          // top thread-groups by cpu delta; "(u,s)" in seconds
          // JSON-safe names (r18 ADVICE: a quote/backslash in a comm or
          // stage name would emit an invalid JSONL line)
          def esc(x: String): String =
            x.replaceAll("[^A-Za-z0-9 _.:()\\[\\]=#-]", "_")
          val tcTop = tc1.map { case (k, (u, s)) =>
            val (u0, s0) = tc0.getOrElse(k, (0L, 0L))
            (k, (u - u0) / clkTck, (s - s0) / clkTck)
          }.toVector.sortBy(t => -(t._2 + t._3)).take(5)
            .map { case (k, u, s) => s"""["${esc(k)}",${u},${s}]""" }
            .mkString("[", ",", "]")
          Thread.sleep(1500)
          val stages = stageLog.asScala.toVector.sortBy(-_._3)
          // per stage: [id+name, wall s, task-cpu s, numTasks, spilled MB]
          val slow = stages.take(4).map { case (id, nm, w, rt, nt, sp) =>
            s"""["$id ${esc(nm)}",${w / 1000.0},${rt / 1000.0},$nt,${sp / 1048576}]"""
          }.mkString("[", ",", "]")
          import graft.BenchGate.fmt2
          println(s"""{"probe":"s17","run":$i,"sec":${fmt2(st.sec)},""" +
            s""""own_cpu_sec":${fmt2(cpuS)},"gc_sec":${fmt2(gcS)},""" +
            s""""jit_sec":${fmt2(jitS)},""" +
            s""""code_cache_mb":$ccUsed,"code_cache_max_mb":$ccMax,""" +
            s""""thread_cpu_top":$tcTop,""" +
            s""""stage_wall_sum":${fmt2(stages.map(_._3).sum / 1000.0)},""" +
            s""""n_stages":${stages.size},""" +
            s""""otherCores":${fmt2(st.otherCores)},""" +
            s""""foreignMbps":${fmt2(st.foreignMbps)},""" +
            s""""devBusy":${fmt2(st.devBusy)},""" +
            s""""slowest_stages":$slow}""")
          st.sec
        }
        val spread = secs.max / math.max(secs.min, 1e-9)
        println(s"""{"probe":"s17","runs":5,"min_sec":${secs.min},""" +
          s""""max_sec":${secs.max},"spread":$spread,""" +
          s""""within_1p5":${spread <= 1.5}}""")

      case "t20" =>
        // t20 is the slowest non-KN sf1 row (40–90 s across benches).
        // Its training loop joins the corpus-feature frame against the
        // per-doc residual on doc_id every round. Question for the
        // optimizer: does AQE already turn that into a broadcast join at
        // bench scale (residual post-shuffle is ~1 MB at 50k docs), or
        // is the feature frame re-exchanged per round? This measures the
        // 6-round gradient skeleton both ways in ONE JVM (same feature
        // frame, same residual), with shuffle bytes + the final adaptive
        // plan's join node named.
        val dir = args.lift(1).getOrElse("/root/repo/local/sf1")
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        // t13/t20 feature shape: unigrams+bigrams hashed into 2^18 buckets
        val toks = split(col("text"), " ")
        val fc = docs
          .select(col("doc_id"), explode(concat(toks,
            zip_with(slice(toks, lit(1), size(toks) - 1),
              slice(toks, lit(2), size(toks) - 1),
              (a, b) => concat(a, lit(" "), b)))).as("feat"))
          .select(col("doc_id"),
            pmod(graft.functions.ghash.fnv1a64(col("feat")),
              lit(262144L)).as("fid"))
          .groupBy("doc_id", "fid").agg(count(lit(1)).as("c"))
          .select(col("doc_id"), col("fid"),
            col("c").cast("double").as("x"))
          .localCheckpoint(true)
        val resid = docs.select(col("doc_id"),
          (col("doc_id") % 7).cast("double").as("r")).localCheckpoint(true)
        def rounds(bcast: Boolean): (Double, Long, String) = {
          var strategy = ""
          val (_, t, sb) = timeSb {
            for (_ <- 1 to 6) {
              val rhs = if (bcast) broadcast(resid) else resid
              val g = fc.join(rhs, "doc_id").groupBy("fid")
                .agg(sum(col("r") * col("x")).as("g"))
              g.write.format("noop").mode("overwrite").save()
              if (strategy.isEmpty) {
                val p = g.queryExecution.executedPlan.toString
                strategy =
                  if (p.contains("BroadcastHashJoin")) "BroadcastHashJoin"
                  else if (p.contains("SortMergeJoin")) "SortMergeJoin"
                  else if (p.contains("ShuffledHashJoin")) "ShuffledHashJoin"
                  else "?"
              }
            }
          }
          (t, sb, strategy)
        }
        val (tPlain, sbPlain, jPlain) = rounds(bcast = false)
        val (tB, sbB, jB) = rounds(bcast = true)
        println(s"""{"probe":"t20","dir":"$dir",""" +
          s""""plain_sec":$tPlain,"plain_shuffle_mb":${sbPlain / 1048576},""" +
          s""""plain_join":"$jPlain",""" +
          s""""bcast_sec":$tB,"bcast_shuffle_mb":${sbB / 1048576},""" +
          s""""bcast_join":"$jB"}""")

      case other =>
        System.err.println(s"unknown section: $other")
    }
    spark.stop()
  }
}

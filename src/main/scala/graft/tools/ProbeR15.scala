package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale probes (one JSONL line per section, the ScaleProbe
  * format — append output to dev/scaleprobe_r15.jsonl):
  *
  *   runMain graft.tools.ProbeR15 <section> [n]
  *
  * Sections:
  *   - `d23`      (n=1M default): the r14 d23 probe under bench-side
  *     multi-probe ({1},{2},{1,2} lowest-margin flips) — recall gate
  *     raised 90% → 99% (r14 primary-only measured 96.0%).
  *   - `c27skew`  (n=1M): one language at 99% of the corpus — quantifies
  *     where the exact path's single-task per-language score buffer
  *     falls over and that the percentile_approx path holds flat.
  *   - `p01chain` (n=10M): the full publish chain (plant → line-dedup →
  *     Gopher gate → exact dedup → manifest) at n short docs AND at
  *     n/10, asserting the wall scales ~linearly (every 10× so far has
  *     exposed exactly one quadratic: d05 r10, t19 r13+r14).
  *   - `t18t19long` (n=1M): markup extraction and repeated-span strip
  *     on 1M × 1k-word docs (the r14 t19long probe 5× bigger).
  *
  * Run with SPARK_DRIVER_MEM=48g (build.sbt forwards it to -Xmx).
  */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("d23")
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
      case "d23" =>
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val baseEmb = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
              .cast("double") / 1000.0).cast("float")).as("embedding"))
        val (stats, t) = time {
          val train = baseEmb.withColumn("is_new", lit(false))
          val bench = baseEmb.filter(col("vec_id") % 100 === 0)
            .select((col("vec_id") + 1000000000L).as("vec_id"),
              transform(col("embedding"),
                v => (v.cast("double") * 0.95 + 0.02).cast("float"))
                .as("embedding"),
              lit(true).as("is_new"))
          val pairs = graft.queries.Similarity.crossCorpusEmbeddingNearDup(
            train.unionByName(bench), nTables = 2, nBits = 16, cap = 100,
            threshold = 0.98, benchProbes = 2).localCheckpoint(true)
          val found = pairs
            .filter(col("bench_id") === col("train_id") + 1000000000L).count()
          (pairs.count(), found)
        }
        val (pairsN, found) = stats
        val planted = n / 100
        println(s"""{"probe":"d23","train":$n,"bench":$planted,""" +
          s""""pairs":$pairsN,"planted_found":$found,"sec":$t,""" +
          s""""d23_ok":${found >= (planted * 99) / 100}}""")

      case "c27skew" =>
        // one language at 99%: the exact path buffers THAT language's
        // full (avg_nll, doc_id) list in a single aggregation task; the
        // approx path keeps bounded sketch state per language. Walk n
        // up in doublings from the given base to quantify both walls.
        val n0 = args.lift(1).map(_.toLong).getOrElse(1000000L)
        for (n <- Seq(n0, n0 * 2, n0 * 4)) {
          val docs = gen(n).select(col("doc_id"), col("text"),
            when(col("doc_id") % 100 === 0, col("lang"))
              .otherwise(lit("en")).as("lang"))
            .localCheckpoint(true)
          val exact = try {
            val (cnt, tE) = time {
              graft.queries.Corpus.perplexityBuckets(docs).count()
            }
            s""""exact_rows":$cnt,"exact_sec":$tE"""
          } catch {
            case e: Throwable =>
              s""""exact_error":"${e.getClass.getSimpleName}""""
          }
          val (aCnt, tA) = time {
            graft.queries.Corpus.perplexityBucketsApprox(docs).count()
          }
          println(s"""{"probe":"c27skew","docs":$n,"en_share":0.99,""" +
            s"""$exact,"approx_rows":$aCnt,"approx_sec":$tA,""" +
            s""""c27skew_ok":${aCnt == n}}""")
          docs.unpersist()
        }

      case "p01chain" =>
        val n = args.lift(1).map(_.toLong).getOrElse(10000000L)
        import graft.queries.{Dedup, TextOps}
        def chain(nDocs: Long): (Long, Double) = {
          // generator tokens carry no English stopwords and 1/9 of docs
          // sit under Gopher's 20-word floor, so a stopword-bearing
          // prose prefix makes the quality gate a real FUNNEL here
          // (most docs pass, short ones still drop) instead of a
          // drop-everything wall
          val planted = gen(nDocs).select(col("doc_id"),
            concat(lit("src"), pmod(col("doc_id"), lit(4)).cast("string"))
              .as("source"),
            graft.queries.LineDedup.plantText(col("doc_id"),
              concat(lit("the quick data of the stream is here "),
                col("text"))).as("text"))
          time {
            val cleaned = Dedup.lineKeep(planted.select("doc_id", "text"))
              .groupBy("doc_id")
              .agg(graft.queries.LineDedup.keptTextAgg.as("text"))
              .join(planted.select("doc_id", "source"), "doc_id")
            val Seq(nw, mwl, nst, rep) = TextOps.Gopher.signals(col("text"))
            val scored = cleaned
              .withColumn("n_words", nw)
              .withColumn("mwl", mwl)
              .withColumn("n_stop", nst)
              .withColumn("rep", rep)
              .filter(TextOps.Gopher.keep(
                col("n_words"), col("mwl"), col("n_stop"), col("rep")))
            val keeper = scored
              .groupBy(md5(col("text")).as("digest"))
              .agg(min(col("doc_id")).as("doc_id"))
            scored.join(keeper, Seq("doc_id"))
              .select(col("doc_id"), col("source"), col("n_words"),
                md5(col("text")).as("text_md5"))
              .count()
          }
        }
        val (rowsSmall, tSmall) = chain(n / 10)
        val (rowsBig, tBig) = chain(n)
        val ratio = tBig / tSmall
        println(s"""{"probe":"p01chain","docs":$n,"rows":$rowsBig,""" +
          s""""rows_small":$rowsSmall,"sec":$tBig,"sec_small":$tSmall,""" +
          s""""ratio_10x":$ratio,"p01chain_ok":${
            rowsBig > 0 && ratio <= 15.0}}""")

      case "t18t19long" =>
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val longDocs = gen(n)
          .select(col("doc_id"), col("lang"),
            concat_ws(" ", flatten(transform(sequence(lit(0), lit(24)),
              i => array(col("text"), concat(lit("seg"), i.cast("string"))))))
              .as("text"))
          .localCheckpoint(true)
        locally {
          val (stats, t) = time {
            val out = graft.queries.TextOps.markupExtract(
              longDocs.select(col("doc_id"), col("text"), col("lang")))
              .localCheckpoint(true)
            val want = longDocs.select(col("doc_id"), md5(concat(
              col("text"), lit(" more about "), col("lang"),
              lit(" topics see related "), col("doc_id").cast("string"),
              lit(" here"))).as("want"))
            (out.count(),
              out.filter(col("n_kept") =!= 2).count(),
              out.join(want, "doc_id")
                .filter(col("extracted_md5") =!= col("want")).count())
          }
          val (nOut, badKeep, mismatch) = stats
          println(s"""{"probe":"t18long","docs":$n,"extracted":$nOut,""" +
            s""""bad_keeps":$badKeep,"md5_mismatches":$mismatch,"sec":$t,""" +
            s""""t18long_ok":${nOut == n && badKeep == 0 && mismatch == 0}}""")
        }
        locally {
          val (stats, t) = time {
            val out = graft.queries.TextOps.repeatedSpanStrip(
              longDocs.select(col("doc_id"), col("text")))
              .localCheckpoint(true)
            val orig = longDocs.select(col("doc_id"),
              md5(col("text")).as("om"))
            val j = out.join(orig, "doc_id")
            (out.count(),
              j.filter(col("doc_id") % 5 === 0 && col("n_dupes") < 1).count(),
              j.filter(col("doc_id") % 5 =!= 0 && col("n_dupes") === 0 &&
                col("cleaned_md5") =!= col("om")).count(),
              j.agg(avg(col("n_chunks"))).head().getDouble(0))
          }
          val (nOut, plantMiss, idBreak, avgChunks) = stats
          println(s"""{"probe":"t19long","docs":$n,"stripped":$nOut,""" +
            s""""plants_missed":$plantMiss,"identity_breaks":$idBreak,""" +
            s""""avg_chunks":$avgChunks,"sec":$t,""" +
            s""""t19long_ok":${nOut == n && plantMiss == 0 && idBreak == 0}}""")
        }

      case "newops15" =>
        // the second r15 wave at 200k then 1M (house rule: 200k before 1M)
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        for (nn <- Seq(n / 5, n)) {
          val e = spark.range(nn).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
                .cast("double") / 1000.0).cast("float")).as("embedding"))
            .localCheckpoint(true)
          val (s14stats, tS) = time {
            val p = graft.queries.Similarity.pcaProject(e)
            p.agg(count(lit(1)),
              sum(when(isnan(col("p1")) || isnan(col("p4")), 1L)
                .otherwise(0L)),
              avg(abs(col("p1"))), avg(abs(col("p4")))).head()
          }
          println(s"""{"probe":"s14","vectors":$nn,""" +
            s""""rows":${s14stats.getLong(0)},"nans":${s14stats.getLong(1)},""" +
            s""""mean_abs_p1":${s14stats.getDouble(2)},""" +
            s""""mean_abs_p4":${s14stats.getDouble(3)},"sec":$tS,""" +
            s""""s14_ok":${s14stats.getLong(0) == nn &&
              s14stats.getLong(1) == 0L &&
              s14stats.getDouble(2) > s14stats.getDouble(3)}}""")
          e.unpersist()

          val docs = gen(nn).localCheckpoint(true)
          val (t22stats, tT) = time {
            val out = graft.queries.TextOps.hostPriorFilter(
              docs.select(col("doc_id"), col("text")))
            out.agg(count(lit(1)),
              sum(when(col("flipped"), 1L).otherwise(0L)),
              countDistinct(col("host"))).head()
          }
          println(s"""{"probe":"t22","docs":$nn,""" +
            s""""rows":${t22stats.getLong(0)},""" +
            s""""flipped":${t22stats.getLong(1)},""" +
            s""""hosts":${t22stats.getLong(2)},"sec":$tT,""" +
            s""""t22_ok":${t22stats.getLong(0) == nn}}""")

          val (c29stats, tC) = time {
            val rows = graft.queries.Corpus.temperatureMix(docs).collect()
            (rows.length, rows.map(_.getDouble(4)).sum)
          }
          println(s"""{"probe":"c29","docs":$nn,"langs":${c29stats._1},""" +
            s""""sum_q_half":${c29stats._2},"sec":$tC,""" +
            s""""c29_ok":${math.abs(c29stats._2 - 1.0) < 1e-9}}""")
          docs.unpersist()
        }

      case "newops15c" =>
        // the third r15 wave at 200k then 1M (house rule: 200k before 1M).
        // Optional third arg selects one op (p12|c30|p13|s16): the first
        // full-sweep run measured s16 at 207 s/1M purely because three
        // other ops' checkpointed 1M frames were still resident in the
        // same JVM (unpersist is async) — standalone it is 18 s. Probe
        // ops in separate JVMs when the number matters.
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val onlyOp = args.lift(2)
        def want(op: String): Boolean = onlyOp.forall(_ == op)
        for (nn <- Seq(n / 5, n)) {
          if (want("p12") || want("c30")) {
          val docs = gen(nn).localCheckpoint(true)
          if (want("p12")) {
          val (p12stats, tP) = time {
            val out = graft.queries.Pipeline.latestWinsMerge(
              docs.select(col("doc_id"), col("text")))
            out.agg(count(lit(1)), sum(col("n_revs"))).head()
          }
          println(s"""{"probe":"p12","docs":$nn,""" +
            s""""rows":${p12stats.getLong(0)},""" +
            s""""revs":${p12stats.getLong(1)},"sec":$tP,""" +
            s""""p12_ok":${p12stats.getLong(0) == nn}}""")
          }

          if (want("c30")) {
          val (c30stats, tC) = time {
            val rows = graft.queries.Corpus.vocabCoverage(
              docs.select(col("doc_id"), col("text"), col("lang"))).collect()
            val byLang = rows.map(r => r.getString(0) -> r.getDouble(5)).toMap
            (rows.length, byLang)
          }
          val mono = Seq("en", "zh", "es", "fr", "de").map(c30stats._2)
          println(s"""{"probe":"c30","docs":$nn,"langs":${c30stats._1},""" +
            s""""rates":[${mono.mkString(",")}],"sec":$tC,""" +
            s""""c30_ok":${mono == mono.sorted && mono.head == 0.0}}""")
          }
          docs.unpersist()
          }

          if (want("c31")) {
          val docs31 = gen(nn).localCheckpoint(true)
          val (c31stats, tG) = time {
            val rows = graft.queries.Corpus.vocabGrowth(
              docs31.select(col("doc_id"), col("text"))).collect()
            (rows.length, rows.map(_.getDouble(4)).toSeq,
              rows.last.getLong(2))
          }
          println(s"""{"probe":"c31","docs":$nn,"rows":${c31stats._1},""" +
            s""""ttr":[${c31stats._2.mkString(",")}],""" +
            s""""tokens":${c31stats._3},"sec":$tG,""" +
            s""""c31_ok":${c31stats._1 == 4 &&
              c31stats._2 == c31stats._2.sorted.reverse}}""")
          docs31.unpersist()
          }

          if (want("p13")) {
          // events-like frame: ts correlated with id (append-order ingest)
          val ev = spark.range(nn).select(
            expr("id div 4096").as("shard"),
            (lit(1700000000000000L) + col("id") * 1000L +
              pmod(xxhash64(col("id")), lit(997))).as("tsu"),
            (pmod(xxhash64(col("id"), lit(1)), lit(50000)).cast("double")
              / 100.0).as("value")).localCheckpoint(true)
          val (p13stats, tZ) = time {
            val out = graft.queries.Pipeline.zoneMapPrune(ev)
            out.agg(count(lit(1)),
              sum(when(col("skip"), 1L).otherwise(0L)),
              sum(col("n_rows"))).head()
          }
          println(s"""{"probe":"p13","rows":$nn,""" +
            s""""shards":${p13stats.getLong(0)},""" +
            s""""skipped":${p13stats.getLong(1)},"sec":$tZ,""" +
            s""""p13_ok":${p13stats.getLong(2) == nn &&
              p13stats.getLong(1) > 0}}""")
          ev.unpersist()
          }

          if (want("s17")) {
          val e17 = spark.range(nn).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
                .cast("double") / 1000.0).cast("float")).as("embedding"))
            .localCheckpoint(true)
          val (s17stats, tM) = time {
            val out = graft.queries.Similarity.semanticSurvivors(e17,
              nBits = graft.queries.Similarity.scaledBits(nn))
            out.agg(count(lit(1)),
              sum(when(col("keep"), 1L).otherwise(0L)),
              count(col("cluster"))).head()
          }
          println(s"""{"probe":"s17","vectors":$nn,""" +
            s""""rows":${s17stats.getLong(0)},""" +
            s""""kept":${s17stats.getLong(1)},""" +
            s""""clustered":${s17stats.getLong(2)},"sec":$tM,""" +
            s""""s17_ok":${s17stats.getLong(0) == nn &&
              s17stats.getLong(1) <= nn}}""")
          e17.unpersist()
          }

          if (want("p14")) {
          val docs14 = gen(nn).localCheckpoint(true)
          val (p14stats, tB) = time {
            graft.queries.Pipeline.bucketedWrite(spark, "probe_p14_meta",
              docs14.select(col("doc_id"), col("lang")))
            graft.queries.Pipeline.bucketedWrite(spark, "probe_p14_stats",
              docs14.select(col("doc_id"),
                length(col("text")).cast("long").as("nc")))
            spark.table("probe_p14_meta")
              .join(spark.table("probe_p14_stats").hint("merge"), "doc_id")
              .groupBy("lang").agg(count(lit(1)), sum(col("nc")))
              .collect().map(_.getLong(1)).sum
          }
          println(s"""{"probe":"p14","docs":$nn,""" +
            s""""joined":$p14stats,"sec":$tB,""" +
            s""""p14_ok":${p14stats == nn}}""")
          docs14.unpersist()
          }

          if (want("s16")) {
          val e = spark.range(nn).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
                .cast("double") / 1000.0).cast("float")).as("embedding"))
            .localCheckpoint(true)
          val (s16stats, tQ) = time {
            val out = graft.queries.Similarity.sq8Quantize(e)
            out.agg(count(lit(1)), max(col("sse")),
              sum(when(col("code_first") < 0 || col("code_first") > 255,
                1L).otherwise(0L))).head()
          }
          println(s"""{"probe":"s16","vectors":$nn,""" +
            s""""rows":${s16stats.getLong(0)},""" +
            s""""max_sse":${s16stats.getDouble(1)},"sec":$tQ,""" +
            s""""s16_ok":${s16stats.getLong(0) == nn &&
              s16stats.getLong(2) == 0L}}""")
          e.unpersist()
          }
        }

      case "s14fast" =>
        // the deployable Gram-buffer fit at the same sizes as the exact
        // probe — the number that justifies the twin's existence
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        for (nn <- Seq(n / 5, n)) {
          val e = spark.range(nn).select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)), i =>
              ((pmod(xxhash64(col("id"), i), lit(2001)) - 1000)
                .cast("double") / 1000.0).cast("float")).as("embedding"))
            .localCheckpoint(true)
          val (stats, t) = time {
            val p = graft.queries.Similarity.pcaProjectFast(e)
            p.agg(count(lit(1)),
              sum(when(isnan(col("p1")) || isnan(col("p4")), 1L)
                .otherwise(0L))).head()
          }
          println(s"""{"probe":"s14fast","vectors":$nn,""" +
            s""""rows":${stats.getLong(0)},"nans":${stats.getLong(1)},""" +
            s""""sec":$t,"s14fast_ok":${stats.getLong(0) == nn &&
              stats.getLong(1) == 0L}}""")
          e.unpersist()
        }

      case other =>
        println(s"""{"probe":"$other","error":"unknown section"}""")
    }
    spark.stop()
  }
}

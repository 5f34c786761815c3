package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Pipeline composition invariants the per-query oracles can't express. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("p05 funnel is monotone and consistent with the p01 manifest") {
    val out = Registry.byName("p05_stage_funnel").run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val bySource = out.groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      val byStage = rows.map(r => r._2 -> r).toMap
      assert(byStage.keySet ==
        Set("0_raw", "1_line_dedup", "2_quality", "3_exact_dedup"), src)
      // line dedup never drops documents, only lines/tokens
      assert(byStage("1_line_dedup")._3 == byStage("0_raw")._3, src)
      assert(byStage("1_line_dedup")._4 < byStage("0_raw")._4,
        s"$src: planted banners not removed")
      // each later stage only loses mass
      assert(byStage("2_quality")._3 <= byStage("1_line_dedup")._3, src)
      assert(byStage("3_exact_dedup")._3 <= byStage("2_quality")._3, src)
      // retention is docs relative to raw
      rows.foreach { r =>
        assert(r._5 == r._3.toDouble / byStage("0_raw")._3.toDouble, r)
      }
    }
    // the funnel's terminal stage must equal the p01 manifest it audits
    val manifest = Registry.byName("p01_publish_manifest").run(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      val terminal = rows.find(_._2 == "3_exact_dedup").get._3
      assert(terminal == manifest.getOrElse(src, 0L),
        s"$src: funnel says $terminal docs, manifest says ${manifest.get(src)}")
    }
  }

  test("p16 ensemble publish: stage monotonicity; gate genuinely differs from t09's") {
    val docsN = spark.read.parquet(s"$sf/documents.parquet").count()
    val out = Registry.byName("p16_ensemble_publish").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
    // each stage only shrinks the survivor set: |manifest| <= |corpus|
    // (line dedup is doc-preserving, the ensemble and exact-dedup gates
    // only drop), and something must actually be dropped or the planted
    // chain lost its point
    assert(out.length > 0 && out.length < docsN,
      s"manifest ${out.length} of $docsN")
    // exact-dedup stage: the published digests are unique by construction
    // (keeper = min doc_id per digest)
    assert(out.map(_._5).distinct.length == out.length, "dup digest published")
    // every published row passed the ensemble gate
    assert(out.forall(_._4 > 0.0), "manifest row with ens <= 0")
    // the ensemble gate must actually differ from p01's t09 rule gate —
    // if the two manifests kept identical doc sets, swapping the filter
    // changed nothing and p16 is p01
    val p01 = Registry.byName("p01_publish_manifest").run(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet != p01,
      "ensemble gate kept exactly the t09 set — decision-irrelevant")
  }

  test("p04 reuse rows are byte-valid: manifest equals a from-scratch v2 rebuild") {
    // from-scratch v2 manifest (rebuild EVERY shard — the thing p04 avoids)
    val docs = graft.engine.Tables(spark, sf, "documents")
    val v2 = docs.filter(col("doc_id") >= 100)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text"))).as("dg"))
    val full = v2.withColumn("shard", expr("doc_id div 64"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("doc_id"), col("dg")))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("dg"))))).as("shard_md5"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    val out = Registry.byName("p04_incremental_publish").run(spark, sf).collect()
    val incremental = out.filter(_.getString(1) != "drop")
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(incremental == full,
      "incremental manifest diverges from the from-scratch rebuild")
    // drop rows must be exactly the v1-only shards with no v2 member
    val dropShards = out.filter(_.getString(1) == "drop").map(_.getLong(0)).toSet
    assert(dropShards.intersect(full.keySet).isEmpty)
    // and the publish must actually be incremental at this carving:
    // reuse rows exist (doc_ids 128..399 not divisible by 11 sit in
    // untouched shards only if the whole shard is untouched — shards
    // fully inside [100, 400) with no %11 edit are none at width 64, so
    // assert instead that SOME shard is rewritten and counts add up)
    val actions = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(actions.getOrElse("rewrite", 0) > 0)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "duplicate shard rows")
  }

  test("p08: allocation runs on c25's UNIQUE counts, not raw epochs-inflated mass") {
    val p08 = Registry.byName("p08_mixing_manifest").run(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val c25 = Registry.byName("c25_effective_tokens").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(p08.keySet == c25.keySet)
    p08.foreach { case (src, (uniq, dup, cap, alloc, epochs)) =>
      // the stage-coupling cross-gate: the manifest's inputs are exactly
      // the accounting stage's outputs, per source
      assert(uniq == c25(src)._1, s"$src unique tokens")
      assert(dup == c25(src)._2, s"$src dup factor")
      assert(alloc <= cap && alloc >= 0.0, s"$src alloc within cap")
      assert(epochs == alloc / uniq.toDouble, s"$src epochs")
      // cap is 1.4 epochs over UNIQUE tokens — allocating over raw
      // counts would let a 50%-duplicated source exceed it
      assert(cap == 1.4 * uniq.toDouble, s"$src cap basis")
    }
    val unfilled = Registry.byName("p08_mixing_manifest").run(spark, sf)
      .collect().head.getDouble(6)
    assert(unfilled >= -1e-9, "over-allocated past the budget")
  }

  test("p11 walk round-trips records and survives header-lookalike payloads") {
    import graft.queries.Pipeline.walkContainer
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def rec(id: Long, t: String) = s"REC $id ${t.length}\n$t\n"
    // round-trip: N records in, N records out, offsets/lengths/digests exact
    val texts = Seq(3L -> "alpha beta", 7L -> "", 9L -> "gamma")
    val container = texts.map { case (i, t) => rec(i, t) }.mkString
    val out = walkContainer(42L, container)
    assert(out.map(_.rec_doc_id) == Seq(3L, 7L, 9L))
    assert(out.map(_.declared_len) == texts.map(_._2.length.toLong))
    assert(out.map(_.payload_md5) == texts.map(t => md5(t._2)))
    assert(out.head.rec_off == 0L &&
      out(1).rec_off == rec(3L, "alpha beta").length.toLong)
    // the honesty test a line-splitter fails: a payload that CONTAINS a
    // valid-looking record header must stay one payload — the declared
    // length, not the content, drives the walk
    val tricky = "aaa\nREC 999 4\nbbbb"
    val out2 = walkContainer(1L, rec(5L, tricky))
    assert(out2.map(r => (r.rec_doc_id, r.declared_len, r.payload_md5)) ==
      Seq((5L, tricky.length.toLong, md5(tricky))))
    // a corrupted declared length fails the parse instead of desyncing
    val bad = s"REC 5 ${tricky.length + 1}\n$tricky\n"
    intercept[IllegalArgumentException](walkContainer(2L, bad))
    // truncated container (payload cut short) fails too
    intercept[IllegalArgumentException](
      walkContainer(3L, rec(5L, "full payload").dropRight(3)))
    // a declared length near Int.MaxValue must fail the REQUIRE (Long
    // bounds math), not overflow start+len and throw StringIndexOOB
    intercept[IllegalArgumentException](
      walkContainer(4L, s"REC 5 ${Int.MaxValue - 2}\nxx\n"))
    intercept[IllegalArgumentException](
      walkContainer(5L, s"REC 5 ${Long.MaxValue - 2}\nxx\n"))
    // exactly Long.MaxValue: start+len wraps to Long.MinValue+nl, which
    // passes `< s.length` (negative) and (start+len).toInt lands on the
    // header's own '\n' — the one value the old bounds let through to a
    // StringIndexOutOfBounds; the len < s.length bound catches it first
    intercept[IllegalArgumentException](
      walkContainer(6L, s"REC 5 ${Long.MaxValue}\nxx\n"))
  }

  test("p12 latest-wins agg equals the window form; one row per key") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Registry.byName("p12_latest_wins_merge").run(spark, sf)
    // one surviving row per key, and the revision count is the plant's
    assert(out.count() == docs.count())
    out.collect().foreach { r =>
      val (id, nRevs, rev, ts) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nRevs == id % 3 + 1, s"doc $id")
      assert(ts == (rev * 7919 + id) % 10007, s"doc $id: ts/rev inconsistent")
    }
    // the scale claim: max(struct(...)) computes the SAME answer as the
    // ROW_NUMBER() OVER (ORDER BY ts DESC) form it replaces — equivalence
    // proven here so the engine is free to ship the partial-agg shape
    import org.apache.spark.sql.expressions.Window
    val revs = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), pmod(col("doc_id"), lit(3L)))).as("rev"))
      .select(col("doc_id"), col("rev"),
        pmod(col("rev") * 7919L + col("doc_id"), lit(10007L)).as("ts"),
        md5(concat(col("text"), lit("|"), col("rev").cast("string")))
          .as("digest"))
    val win = revs
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("ts").desc, col("rev").desc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("rev").as("latest_rev"),
        col("ts").as("latest_ts"), col("digest").as("latest_md5"))
    assert(out.select("doc_id", "latest_rev", "latest_ts", "latest_md5")
      .exceptAll(win).isEmpty && win.exceptAll(
        out.select("doc_id", "latest_rev", "latest_ts", "latest_md5")).isEmpty)
  }

  test("p13 zone-map pruning is sound: no in-window row lives in a skipped shard") {
    val out = Registry.byName("p13_zone_map_prune").run(spark, sf).collect()
    assert(out.exists(_.getBoolean(8)) && out.exists(!_.getBoolean(8)),
      "window must make some shards skippable and keep others (corr plant)")
    val (lo, hi) = (out.head.getLong(6), out.head.getLong(7))
    // brute-force ground truth: rows actually inside the window, per shard
    val truth = spark.read.parquet(s"$sf/events.parquet")
      .select(expr("event_id div 256").as("shard"),
        expr(graft.queries.EventsOps.TsUsSql).as("tsu"))
      .filter(col("tsu") >= lo && col("tsu") < hi)
      .groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (shard, skip) = (r.getLong(0), r.getBoolean(8))
      if (skip)
        assert(truth.getOrElse(shard, 0L) == 0L,
          s"shard $shard skipped but holds in-window rows — pruning lost data")
    }
    // and the reverse sanity: every in-window row is inside a kept shard
    val kept = out.filterNot(_.getBoolean(8)).map(_.getLong(0)).toSet
    assert(truth.keys.forall(kept.contains), "in-window rows outside kept shards")
  }

  test("p15 incremental zone merge equals full rebuild at ANY append cutoff") {
    // The oracle proves one cutoff (80%); mergeability guarantees ALL of
    // them, including the empty-delta and empty-base edges — pin the
    // theorem at 0%, 37%, and 100% so a future non-mergeable statistic
    // (an avg, a last-value) can't sneak into zoneStats unnoticed.
    import graft.queries.Pipeline
    val ev = spark.read.parquet(s"$sf/events.parquet").select(
      expr("event_id div 256").as("shard"),
      expr(graft.queries.EventsOps.TsUsSql).as("tsu"),
      col("value"), col("event_id"))
    val mx = ev.agg(max(col("event_id"))).head.getLong(0)
    val full = Pipeline.zoneMapPrune(ev.select("shard", "tsu", "value"))
      .collect().map(_.toSeq).toSet
    for (pct <- Seq(0L, 37L, 100L)) {
      val cut = mx * pct / 100
      val base = ev.filter(col("event_id") <= cut).select("shard", "tsu", "value")
      val delta = ev.filter(col("event_id") > cut).select("shard", "tsu", "value")
      val inc = Pipeline.zoneMapMerge(Pipeline.zoneStats(base), delta)
        .collect().map(_.toSeq).toSet
      assert(inc == full, s"cutoff $pct%: incremental != rebuild")
    }
  }

  test("p17: delete ∘ append ≡ rebuild on interleaved zone batches") {
    // the r17 verdict item-3 pin: a manifest maintained through an
    // append merge AND THEN a takedown must equal rebuilding over the
    // final survivor set — deletes hitting base-epoch rows, append-epoch
    // rows, whole zones, and no zone at all are all covered by the
    // clustered pred
    import graft.queries.Pipeline
    val ev = spark.read.parquet(s"$sf/events.parquet").select(
      expr("event_id div 256").as("shard"),
      expr(graft.queries.EventsOps.TsUsSql).as("tsu"),
      col("value"), col("event_id"))
    val mx = ev.agg(max(col("event_id"))).head.getLong(0)
    val cut = mx * 3 / 5
    val delPred = col("event_id") % 4096 < 128
    val base = ev.filter(col("event_id") <= cut)
    val appended = ev.filter(col("event_id") > cut)
    val maintained = Pipeline.zoneVerdict(Pipeline.zoneDeleteRaw(
      Pipeline.zoneMergeRaw(
        Pipeline.zoneStats(base.select("shard", "tsu", "value")),
        appended.select("shard", "tsu", "value")),
      ev, delPred)).collect().map(_.toSeq).toSet
    val rebuilt = Pipeline.zoneMapPrune(
      ev.filter(!delPred).select("shard", "tsu", "value"))
      .collect().map(_.toSeq).toSet
    assert(maintained == rebuilt, "delete∘append diverged from rebuild")
    // and the takedown genuinely removed zone mass somewhere
    val before = Pipeline.zoneMapPrune(ev.select("shard", "tsu", "value"))
      .collect().map(_.toSeq).toSet
    assert(maintained != before, "delete list touched nothing — fixture bug")
  }

  test("p18: keeper re-election fires; delete ≡ rebuild incl. all-dead groups") {
    import spark.implicits._
    import graft.queries.Pipeline
    // 3 duplicate groups of Gopher-passing text + a singleton:
    //  g1 (ids 10,11,12): keeper 10 deleted → must re-elect 11
    //  g2 (ids 20,21):    non-keeper 21 untouched by pred → row unchanged
    //  g3 (ids 30,31):    BOTH deleted → digest vanishes
    //  s  (id 41):        untouched singleton
    val passText = ("the quick brown fox jumps over the lazy dog and then " +
      "it runs far away to find some more food before the night comes")
    def t(seed: Int) = passText + s" variant $seed end of document text here"
    val docs = Seq(
      (10L, "a", t(1)), (11L, "a", t(1)), (12L, "b", t(1)),
      (20L, "a", t(2)), (21L, "b", t(2)),
      (30L, "a", t(3)), (31L, "b", t(3)),
      (41L, "c", t(4))).toDF("doc_id", "source", "text")
    val delPred = col("doc_id").isin(10L, 30L, 31L)
    val scored = Pipeline.gateScored(docs)
    assert(scored.count() == 8, "fixture must pass the Gopher gate")
    val manifest = Pipeline.manifestFrom(scored)
    val corrected = Pipeline.manifestDelete(manifest, scored, delPred)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rebuilt = Pipeline.manifestFrom(
      Pipeline.gateScored(docs.filter(!delPred)))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(corrected == rebuilt)
    assert(corrected.map(_._1) == Set(11L, 20L, 41L),
      s"re-election must promote 11, keep 20/41, drop g3: $corrected")
  }
}

package graft.tools

import graft.Registry
import graft.engine.GraftSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Round-15 registry-wide scan audit (the r9 lever, §7.9): for every
  * registered query, count plan-level parquet scan nodes PER TABLE and
  * flag any table read more than once inside a single query's physical
  * plan. A duplicate scan is only a defect when the two reads could have
  * been one (an undocumented multi-consumer re-execution); self-joins,
  * incremental train/bench splits and planted-corpus unions that
  * genuinely need two passes are expected and listed in the whitelist
  * below with their reason. Checkpointed frames (t20's feature frame,
  * d21's per-doc stats) correctly do NOT show as file scans — which is
  * exactly the property this audit verifies.
  *
  * Usage: runMain graft.tools.ScanAudit [sfDir]
  * Output: one JSONL line per query with >1 scan of any table, then a
  * summary line. Lines with `"unexplained":true` are the action items.
  */
object ScanAudit {

  /** Tables legitimately scanned >1× in one plan, query → (table → why).
    * Reasons are load-bearing documentation: the audit fails loudly when
    * a new duplicate appears that is not listed here.
    */
  val whitelist: Map[String, Map[String, String]] = Map(
    // --- set-operation demos: the two branches ARE the operator under
    // test, each scan carries a different pushed filter/projection ---
    "q19_union" -> Map("orders" -> "two filtered branches (different pushed filters)"),
    "q20_intersect" -> Map("orders" -> "two filtered branches"),
    "q46_full_outer" -> Map("orders" -> "left/right derivations differ by filter"),
    "q47_union_all" -> Map("orders" -> "branches read different columns"),
    // --- scalar/correlated subqueries: the inner aggregate is a different
    // slice of the same table (TPC-H spec shapes) ---
    "q26_subquery_scalar" -> Map("orders" -> "AVG subquery reads 1 column (footer-cheap)"),
    "q48_corr_min" -> Map("part" -> "per-brand MIN subquery vs row filter"),
    "q50_exists_not_exists" -> Map("lineitem" -> "exists + not-exists correlated slices"),
    "q66_tpch_q22" -> Map("customer" -> "global avg balance subquery (1 column)"),
    "q74_tpch_q17" -> Map("lineitem" -> "per-part 0.2*AVG(qty) subquery — spec shape"),
    "q75_tpch_q21" -> Map("lineitem" -> "l1/l2/l3 self-join (exists + not-exists)"),
    // --- multi-role dimension reads (different join roles, tiny tables) ---
    "q78_tpch_q8" -> Map("nation" -> "n1 customer-region vs n2 supplier-share roles"),
    "q80_tpch_q2" -> Map(
      "nation" -> "outer join vs min-cost subquery role",
      "part" -> "outer filter vs subquery correlation (3 pruned scans)",
      "supplier" -> "outer join, subquery join, and a count-only scan"),
    "q81_tpch_q9" -> Map(
      "part" -> "green-part filter reused across profit branches",
      "supplier" -> "join role + count-only scan"),
    "q83_tpch_q20" -> Map(
      "part" -> "forest-part filter in semi-join + qty subquery",
      "supplier" -> "join role + count-only scan"),
    // --- two-pass corpus shapes: pass 1 builds corpus-wide state that is
    // TOKEN/GRAM-sized (materializing it would cost more than re-scanning
    // parquet at 100 TB), pass 2 applies it per doc ---
    "c22_bigram_lm_score" -> Map("documents" -> "LM train pass + score pass (token-sized state)"),
    "t15_gram_novelty" -> Map("documents" -> "gram-frequency pass + per-doc novelty pass"),
    "d12_line_dedup" -> Map("documents" -> "line-frequency pass + per-doc filter pass (CCNet shape)"),
    "d22_paragraph_dedup" -> Map("documents" -> "paragraph-frequency pass + filter pass"),
    "d19_boilerplate_lines" -> Map("documents" -> "doc_id-only scan + text pass"),
    "d15_substr_span_dedup" -> Map("documents" -> "gram-hash pass + span-reconstruction pass"),
    "d18_substr_strip" -> Map("documents" -> "gram-hash pass + dup-span pass + strip pass"),
    // --- role-based splits: the same table plays train/bench or old/new
    // snapshot via different doc_id slices (pushed filters differ) ---
    "d06_dedup_incremental" -> Map("documents" -> "old-snapshot vs new-batch slices"),
    "d16_dedup_bloom_incremental" -> Map("documents" -> "history build + filter probe + survivor read"),
    "d09_contamination" -> Map("documents" -> "train corpus vs benchmark slice"),
    "d14_snapshot_diff" -> Map("documents" -> "snapshot A vs snapshot B derivations"),
    // --- sketch-vs-exact comparison queries: both arms read by design ---
    "c08_quantile_sketch" -> Map("lineitem" -> "exact quantile arm vs sketch arm"),
    // tf branch carries the PUSHED doc_id<10 filter (reads ~10 docs); the
    // df branch must read the full corpus — different slices, optimal plan
    "c05_tf_idf" -> Map("documents" -> "pruned tf branch (pushed filter) vs full df branch"),
    // PCA's canonical fit+transform dataflow: mean pass, covariance pass,
    // projection pass — the fit passes cannot merge (covariance needs the
    // completed mean), and the intermediates are corpus-sized only in the
    // final (output) pass
    "s14_pca_project" -> Map("embeddings" -> "mean pass + covariance pass + projection pass"),
    // SQ8's canonical two-pass shape: the per-dim bounds must complete
    // before any row can encode; the stats pass reads only the vector
    // column and collapses map-side to one 128-value row
    "s16_sq8_quantize" -> Map("embeddings" -> "per-dim bounds pass + encode pass"),
    // doc-grain token counts vs exploded type table — sharing them would
    // materialize occurrence-level state (the c22/t15 re-scan precedent)
    "c31_vocab_growth" -> Map("documents" -> "per-doc token-count pass + first-seen type pass"),
    // --- surfaced by the r15 AQE-pin fix: EventsOps' ev() calls
    // GraftSession.tune() (AQE back on) as a side effect, and an
    // AdaptiveSparkPlanExec hides its subtree from collect — so every
    // query AFTER the first e-query had audited as zero scans and the
    // s/m/p groups were never actually audited. All 15 newly visible
    // duplicates adjudicated below; none is a mergeable re-read ---
    "e13_anomaly_zscore" -> Map("events" -> "per-type stats pass + row scoring pass (z-score needs completed moments)"),
    "s01_ann_brute" -> Map("embeddings" -> "query slice (pushed vec_id filter) vs corpus scan"),
    "s02_ann_lsh" -> Map("embeddings" -> "query slice vs bucketed corpus"),
    "s03_embedding_neardup" -> Map("embeddings" -> "planted perturbed-corpus union branches (the plant IS a second read)"),
    "s05_label_centroid_score" -> Map("embeddings" -> "centroid fit pass + scoring pass"),
    "s08_pq_adc" -> Map("embeddings" -> "codebook train pass + encode pass + query slice"),
    "s09_range_search" -> Map("embeddings" -> "broadcast query rows vs corpus scan"),
    "s10_knn_graph" -> Map("embeddings" -> "query-set read vs corpus read"),
    "s12_hybrid_rrf" -> Map("embeddings" -> "dense-arm query slice vs corpus"),
    "s13_knn_graph_scaled" -> Map("embeddings" -> "query-set read vs corpus read"),
    "d23_semantic_decontam" -> Map("embeddings" -> "train/bench roles of the planted union"),
    "p01_publish_manifest" -> Map("documents" -> "stage-chain prefix; AQE exchange reuse collapses it at runtime (measured at sf1 — see p01 comment)"),
    "p02_corpus_card" -> Map("documents" -> "corpus-global digest pass + per-source rollup"),
    "p04_incremental_publish" -> Map("documents" -> "old-snapshot vs new-batch slices + rebuild branches"),
    "p05_stage_funnel" -> Map("documents" -> "funnel re-derives each stage BY DESIGN (it audits the chain)"),
    // --- r16 additions ---
    "p15_zone_map_incremental" -> Map("events" -> "base-manifest vs appended-delta role slices (+1 bounded max scan for the cutoff literal) — the incremental contract IS the split"),
    "s18_ivfpq_ann" -> Map("embeddings" -> "corpus index pass vs query slice (LUT+probes) vs rerank re-attach — the s08 role split with IVF routing added"),
    "s19_ivfpq_residual" -> Map("embeddings" -> "corpus assign+encode pass vs query slice vs rerank re-attach — s18's split on the residual encoding"),
    "s18b_ivfpq_sampled" -> Map("embeddings" -> "s18's role split plus the TRAIN slice (pushed vec_id < 200 sample filter) — sampled training IS a fourth role"),
    "s19b_ivfpq_residual_sampled" -> Map("embeddings" -> "s19's role split plus the train-sample slice (pushed vec_id < 200)"),
    "s20_ann_index_append" -> Map("embeddings" -> "base slice (vec_id <= cut) vs append slice (> cut) vs query slice vs rerank — the base/delta partition is the operator under test (p15's split, vectors)"),
    "s20b_ann_index_delete" -> Map("embeddings" -> "s20's split plus the tombstone-list slice (pushed vec_id % 17 filter) — the delete list is a fifth role"),
    // surfaced once the r16 tuning hoist un-blinded the e-group: the
    // range join's two sides carry DIFFERENT pushed filters (chunked
    // probe slice vs value scan) — a role split, not a mergeable re-read
    "e15_range_join" -> Map("events" -> "probe-side chunk slice vs build-side value scan of the decomposed range join"),
  )

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // AQE off: the non-adaptive preparation pipeline applies ReuseExchange
    // / ReuseSubquery STATICALLY, so executedPlan shows a ReusedExchangeExec
    // leaf where two identical scans would collapse at runtime — counting
    // FileSourceScanExec there measures true I/O, not plan-tree shape.
    val spark = GraftSession.build("graft-scan-audit", cores = 8,
      extraConf = Map("spark.sql.adaptive.enabled" -> "false"))
    spark.sparkContext.setLogLevel("ERROR")

    def tableOf(f: FileSourceScanExec): String =
      f.relation.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("?")

    var flagged = 0
    var unexplained = 0
    // optional second arg: comma-separated name prefixes (dev bisection)
    val names = args.lift(1) match {
      case Some(p) =>
        val ps = p.split(",")
        Registry.specs.map(_.name).filter(n => ps.exists(n.startsWith))
      case None => Registry.specs.map(_.name)
    }
    names.foreach { n =>
      try {
        // No per-query conf re-pin needed since r16: query paths are
        // conf-read-only (GraftSession.tune callers are entry points +
        // tools only — HygieneSpec grep-gates it). The r15 blinder was
        // EventsOps.ev() flipping AQE back on mid-sweep, which made an
        // AdaptiveSparkPlanExec HIDE its subtree from collect; the
        // assertion below turns any regression into a loud failure
        // instead of a silently blind audit.
        assert(spark.conf.get("spark.sql.adaptive.enabled") == "false",
          s"AQE was re-enabled before $n — a query path mutated session conf")
        val df = Registry.byName(n).run(spark, dir)
        val plan: SparkPlan = df.queryExecution.executedPlan
        val scans = plan.collectWithSubqueries {
          case f: FileSourceScanExec =>
            (tableOf(f), f.requiredSchema.fieldNames.mkString("+"))
        }
        val byTable = scans.groupBy(_._1).map { case (t, xs) =>
          t -> (xs.size, xs.map(x => if (x._2.isEmpty) "(count)" else x._2)) }
        val dups = byTable.filter(_._2._1 > 1)
        if (dups.nonEmpty) {
          flagged += 1
          val wl = whitelist.getOrElse(n, Map.empty)
          val bad = dups.keys.filterNot(wl.contains).toSeq.sorted
          if (bad.nonEmpty) unexplained += 1
          val dupStr = dups.toSeq.sortBy(_._1)
            .map { case (t, (c, schemas)) =>
              s""""$t":${schemas.sorted.mkString("[\"", "\",\"", "\"]")}""" }
            .mkString(",")
          println(s"""{"query":"$n","dups":{$dupStr},""" +
            s""""unexplained":${bad.nonEmpty}""" +
            (if (bad.nonEmpty) s""","tables":${bad.mkString("[\"", "\",\"", "\"]")}}"""
             else "}"))
        }
      } catch {
        case e: Throwable =>
          unexplained += 1
          println(s"""{"query":"$n","error":"${e.getClass.getSimpleName}"}""")
      }
    }
    println(s"""{"audit":"scans","queries":${names.size},""" +
      s""""multi_scan":$flagged,"unexplained":$unexplained,""" +
      s""""scan_audit_ok":${unexplained == 0}}""")
    spark.stop()
  }
}

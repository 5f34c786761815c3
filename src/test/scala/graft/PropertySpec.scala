package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Exact, Tables}

/** Property-based invariants (SURVEY.md §5.3), checked over seeded samples —
  * cheap laws the reference never tested. The partitioning-invariance law is
  * the load-bearing one: it is exactly the property that makes results
  * reproducible when the same query runs on 4 local threads or 1000
  * executors.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf
  private def rng = new scala.util.Random(42)

  test("decimal-exact aggregation is invariant under repartitioning") {
    val li = Tables(spark, sf, "lineitem")
    val base = li.agg(Exact.dsum(col("l_extendedprice"))).head().getDouble(0)
    val r = rng
    (1 to 6).foreach { _ =>
      val n = 1 + r.nextInt(17)
      val got = li.repartition(n)
        .agg(Exact.dsum(col("l_extendedprice"))).head().getDouble(0)
      assert(got == base, s"partitions=$n")
    }
  }

  test("filter composition: filter(a).filter(b) == filter(a && b)") {
    val li = Tables(spark, sf, "lineitem")
    val r = rng
    (1 to 6).foreach { _ =>
      val q = 1.0 + r.nextDouble() * 49.0
      val f = Seq("A", "N", "R")(r.nextInt(3))
      val chained = li.filter(col("l_quantity") > q).filter(col("l_returnflag") === f).count()
      val combined = li.filter(col("l_quantity") > q && col("l_returnflag") === f).count()
      assert(chained == combined, s"q=$q f=$f")
    }
  }

  test("group-by sums partition the global sum") {
    val li = Tables(spark, sf, "lineitem")
    val global = li.agg(Exact.dsum(col("l_quantity"))).head().getDouble(0)
    val grouped = li.groupBy("l_returnflag")
      .agg(Exact.dsum(col("l_quantity")).as("s"))
      .agg(Exact.dsum(col("s"))).head().getDouble(0)
    assert(grouped == global)
  }

  test("limit(n) returns exactly min(n, total) rows") {
    val o = Tables(spark, sf, "orders")
    val total = o.count()
    val r = rng
    (1 to 6).foreach { _ =>
      val n = r.nextInt(3000)
      assert(o.limit(n).count() == math.min(n.toLong, total), s"n=$n")
    }
  }

  test("minhash LSH pair set is stable across runs") {
    val d03 = Registry.byName("d03_minhash_lsh_pairs")
    val a = d03.run(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = d03.run(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("lineKeep segmentation partitions the text exactly (any width)") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    Seq(5, 12, 64).foreach { w =>
      val rebuilt = graft.queries.Dedup.lineKeep(docs, w)
        .groupBy("doc_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), " ").as("re"))
        .join(docs, "doc_id")
        .filter(col("re") =!= col("text"))
        .count()
      assert(rebuilt == 0, s"width $w: $rebuilt docs fail round-trip")
    }
  }

  test("substrSpans output is invariant under repartitioning") {
    import graft.queries.{Dedup, SubstrDedup}
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        SubstrDedup.plantText(col("doc_id"), col("text")).as("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.substrSpans(df, SubstrDedup.W).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val base = run(docs)
    val r = rng
    (1 to 3).foreach { _ =>
      val n = 1 + r.nextInt(17)
      assert(run(docs.repartition(n)) == base, s"partitions=$n")
    }
  }

  test("t13 classifier scores are invariant under repartitioning") {
    // the decimal fold is associative+commutative exactly, so the score
    // must be BIT-identical however the docs are split across tasks —
    // the reproducibility property an fp sum would not have
    val docs = Tables(spark, sf, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          graft.queries.TextOps.classifierScore(col("text")).as("score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = run(docs)
    val r = rng
    (1 to 3).foreach { _ =>
      val n = 1 + r.nextInt(17)
      assert(run(docs.repartition(n)) == base, s"partitions=$n")
    }
  }

  test("e15 range-join counts are invariant under repartitioning and chunk width") {
    import graft.queries.EventsOps
    val ev = Tables(spark, sf, "events")
    def counts(df: org.apache.spark.sql.DataFrame) =
      EventsOps.rangeMatches(df, EventsOps.incidentWindows(ev))
        .groupBy("window_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = counts(ev)
    val r = rng
    (1 to 3).foreach { _ =>
      val n = 1 + r.nextInt(17)
      assert(counts(ev.repartition(n)) == base, s"partitions=$n")
    }
  }

  test("bloom-guarded new rows are invariant under bloom sizing and partitioning") {
    import graft.queries.Dedup
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val hist = docs.filter(col("doc_id") < 300)
      .select(md5(col("text")).as("digest")).distinct()
    val batch = docs.filter(col("doc_id") >= 300)
      .withColumn("digest", md5(col("text")))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val base = ids(Dedup.bloomGuardedNewRows(batch, hist, "digest"))
    // a bloom 100× undersized (worst-case FP pressure) and a 4× oversized
    // one must produce the identical row set — FPs only shift work, never
    // results — and so must any partitioning of either side
    Seq(1L << 9, 1L << 18).foreach { items =>
      assert(ids(Dedup.bloomGuardedNewRows(batch, hist, "digest", items)) == base,
        s"expectedItems=$items")
    }
    assert(ids(Dedup.bloomGuardedNewRows(
      batch.repartition(7), hist.repartition(3), "digest")) == base)
  }

  test("star-contraction CC equals driver-side union-find on random graphs") {
    import spark.implicits._
    // the algorithmic gate for connectedComponents: on seeded random
    // graphs spanning sparse-to-dense and long-chain regimes, the
    // distributed star contraction must produce EXACTLY the partition a
    // textbook union-find computes, with labels = component minima
    val r = rng
    val shapes = Seq(
      (60, 30),   // sparse: mostly singleton edges + small trees
      (60, 90),   // dense-ish: cycles, merged clusters
      (200, 120), // mid density at more vertices
      (40, 200))  // multigraph density: many parallel/self edges
    shapes.foreach { case (nv, ne) =>
      val edges = Seq.fill(ne)((r.nextInt(nv).toLong, r.nextInt(nv).toLong))
      // union-find ground truth (path compression, min as representative)
      val parent = Array.tabulate(nv)(identity)
      def find(x: Int): Int = {
        var p = x; while (parent(p) != p) p = parent(p)
        var q = x; while (parent(q) != p) { val nx = parent(q); parent(q) = p; q = nx }
        p
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val (lo, hi) = (ra min rb, ra max rb); parent(hi) = lo }
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = touched.map(v => v -> {
        // representative chosen by union order isn't necessarily the min;
        // normalize: min vertex of the component
        val root = find(v.toInt)
        touched.filter(u => find(u.toInt) == root).min
      }).toMap
      // localThreshold = 0: this test exists to pin the DISTRIBUTED star
      // contraction against union-find (the default gate would route these
      // small graphs to the driver fast path, which IS a union-find)
      val got = graft.queries.Dedup.connectedComponents(
          edges.toDF("a_id", "b_id"), localThreshold = 0)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == expected, s"nv=$nv ne=$ne: " +
        s"diff=${(got.toSet diff expected.toSet).take(5)}")
    }
  }

  test("registry contract is well-formed: unique names, prefixed ids, oracle coverage") {
    val specs = Registry.specs
    val names = specs.map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct)}")
    // every name carries a family prefix the driver/judge can bucket by;
    // an optional trailing letter marks a companion/disambiguated row
    // (r12: c17a/c18a/c26a tokenizer companions, v21b = d21's slice row
    // beside c21's v21)
    val nameRe = "^[a-z][0-9]{2}[a-z]?_[a-z0-9_]+$"
    assert(names.forall(_.matches(nameRe)),
      names.filterNot(_.matches(nameRe)).mkString(","))
    // rows-only queries are the three tokenizer-training ops (chained
    // re-segmentation state SQL can't carry; each carries an
    // independent-reference parity spec) and s14b's fp-Gram PCA twin
    // (partition-order-dependent accumulation; subspace quality is
    // spec-pinned against the oracled exact s14) BY DESIGN — any new
    // oracle-less query must be a deliberate decision, not an omission
    val rowsOnly = specs.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly == Set("c17_bpe_merges", "c18_bpe_encode",
      "c26_unigram_lm_train", "s14b_pca_fast"),
      s"unexpected rows-only queries: $rowsOnly")
    assert(Registry.headline.nonEmpty)
  }

  test("c25 effective-token accounting is invariant under input partitioning") {
    val c = queries.Corpus.dupPlantedCorpus(spark, sf)
    val a = queries.Corpus.effectiveTokens(c).collect().toSeq
    val b = queries.Corpus.effectiveTokens(c.repartition(13)).collect().toSeq
    assert(a == b, "integer counts + fixed survivor rule must be layout-blind")
    assert(a.nonEmpty)
  }
}

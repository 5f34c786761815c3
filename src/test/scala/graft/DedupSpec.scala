package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  /** Ground truth: every doc_id % 10 == 0 has an exact copy (+2M) and a
    * near copy (+1M, last 2 tokens dropped).
    */
  lazy val plantedIds: Set[Long] = {
    import org.apache.spark.sql.functions._
    graft.engine.Tables(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
  }

  test("d01 exact dedup finds exactly the planted exact-dup groups") {
    val got = Registry.byName("d01_dedup_exact").run(spark, sf).collect()
    val keepers = got.map(r => r.getLong(r.fieldIndex("keeper"))).toSet
    assert(keepers == plantedIds)
    // groups are ≥2; a natural near-dup in the corpus (a doc that equals
    // another doc minus its last 2 tokens) makes one group of 3.
    assert(got.forall(_.getLong(2) >= 2))
  }

  test("d03 minhash LSH recovers planted near-dup pairs with high recall") {
    val got = Registry.byName("d03_minhash_lsh_pairs").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-dup pair (id, id+1M); docs with very few tokens legitimately drop
    // below the jaccard threshold, so require recall, not exactness.
    val expected = plantedIds.map(id => (id, id + 1000000L))
    val recall = expected.count(got.contains).toDouble / expected.size
    assert(recall >= 0.8, s"minhash near-dup recall $recall")
    // exact pairs (id, id+2M) are jaccard 1.0 — must all be present
    val exactPairs = plantedIds.map(id => (id, id + 2000000L))
    assert(exactPairs.forall(got.contains), "exact-dup pairs missed by LSH")
  }

  test("d04 simhash recovers planted near-dup pairs") {
    val got = Registry.byName("d04_simhash_pairs").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = plantedIds.map(id => (id, id + 1000000L))
    val recall = expected.count(got.contains).toDouble / expected.size
    assert(recall >= 0.8, s"simhash near-dup recall $recall")
  }

  test("hot-bucket guard bounds a planted mega-bucket without losing normal pairs") {
    import spark.implicits._
    // 300 identical boilerplate docs — the degenerate real-corpus case. They
    // share EVERY (band, bucket), so without the guard the bucket self-join
    // would generate 300·299/2 ≈ 45k candidate pairs from this group alone.
    val spamText = Seq.fill(60)("spam").mkString(" ")
    val spam = (0 until 300).map(i => (9000000L + i, spamText, "en"))
      .toDF("doc_id", "text", "lang")
    val corpus = Dedup.plantedCorpus(spark, sf).unionByName(spam)
    val got = Dedup.lshJaccardPairs(corpus, k = 32, bands = 8, cap = 100,
      threshold = 0.3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // guard drops the mega-buckets entirely: zero pairs inside the spam group
    assert(!got.exists(p => p._1 >= 9000000L && p._2 >= 9000000L),
      "mega-bucket pairs leaked past the hot-bucket guard")
    // ...while ordinary planted near-dups are untouched
    val near = plantedIds.map(id => (id, id + 1000000L))
    val recall = near.count(got.contains).toDouble / near.size
    assert(recall >= 0.8, s"near-dup recall with guard active: $recall")
  }

  test("d07 LSH-candidate exact jaccard covers d05's planted pairs (no lang cartesian)") {
    val d07 = Registry.byName("d07_ngram_jaccard_scale").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d05 = Registry.byName("d05_ngram_jaccard").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the production path must reproduce the oracle baseline on the planted
    // ground truth: exact (+2M, jaccard 1.0) pairs always; near (+1M) pairs
    // at ≥95% of what the exhaustive blocked join found
    val exactPlanted = d05.filter(p => p._2 == p._1 + 2000000L)
    assert(exactPlanted.subsetOf(d07), "exact-dup pairs missing from d07")
    val nearPlanted = d05.filter(p => p._2 == p._1 + 1000000L)
    val recall = nearPlanted.count(d07.contains).toDouble / nearPlanted.size
    assert(recall >= 0.95, s"d07 recall vs d05 planted near pairs: $recall")
  }

  test("d05 exact jaccard join recovers planted pairs (same-lang blocks)") {
    val exact = Registry.byName("d05_ngram_jaccard").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted pairs are same-lang and within the length window by
    // construction, so the blocked exact join must find them
    val near = plantedIds.map(id => (id, id + 1000000L))
    val ex = plantedIds.map(id => (id, id + 2000000L))
    val recallNear = near.count(exact.contains).toDouble / near.size
    assert(recallNear >= 0.8, s"exact-join near-dup recall $recallNear")
    assert(ex.forall(exact.contains), "exact-dup pairs missing from jaccard join")
  }
}

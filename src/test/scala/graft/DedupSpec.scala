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

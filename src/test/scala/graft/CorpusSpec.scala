package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.queries.Corpus

/** Corpus-op contracts that the DuckDB oracle cannot see: the c13 model
  * join's physical gate (broadcast vs shuffle) must not change a single
  * value, and the truncated-LM scale path must track the full model.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  private lazy val docs = Tables(spark, sf, "documents")

  test("c13: broadcast and shuffle-join paths are value-identical") {
    // default threshold → vocab fits → broadcast; 0 → forced shuffle join
    val viaBroadcast = Corpus.unigramLmScore(docs).collect()
    val viaShuffle = Corpus.unigramLmScore(docs, broadcastVocabMax = 0).collect()
    assert(viaBroadcast.length == viaShuffle.length)
    viaBroadcast.zip(viaShuffle).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getLong(1))
      // decimal-exact sum + identical logp per type: bit-equal, not approx
      assert(a.getDouble(2) == b.getDouble(2), s"doc ${a.getLong(0)}")
    }
  }

  test("c13 truncated: no-truncation ranks match the full model exactly") {
    // With topN ≥ vocab nothing folds into OOV and every token's logp
    // shifts by the SAME constant ln((N+v)/(N+v+1)) (the denom gains the
    // reserved OOV type), so avg_nll shifts per-doc by that constant and
    // the doc ordering is identical.
    val full = Corpus.unigramLmScore(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val trunc = Corpus.unigramLmScoreTruncated(docs, topN = 1000000).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(full.map(_._1).sameElements(trunc.map(_._1)))
    val shifts = full.zip(trunc).map { case ((_, a), (_, b)) => b - a }
    assert(shifts.max - shifts.min < 1e-9, s"${shifts.min}..${shifts.max}")
    def ranked(xs: Array[(Long, Double)]) =
      xs.sortBy { case (id, v) => (v, id) }.map(_._1).toSeq
    assert(ranked(full) == ranked(trunc))
  }

  test("c13 truncated: aggressive truncation still scores every doc finitely") {
    val n = docs.count()
    val out = Corpus.unigramLmScoreTruncated(docs, topN = 50).collect()
    assert(out.length == n)
    assert(out.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    // OOV mass dominates at topN=50, so scores must still separate docs
    assert(out.map(_.getDouble(2)).distinct.length > 1)
  }
}

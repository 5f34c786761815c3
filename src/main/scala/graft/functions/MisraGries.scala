package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch: at most `k` counters at every point
  * of the partial/final lifecycle, mergeable (Agarwal et al., "Mergeable
  * Summaries", PODS 2012), with the deterministic guarantee that any item
  * whose true count exceeds n/(k+1) is present in the final sketch —
  * REGARDLESS of partitioning or merge order. That guarantee is what makes
  * the sketch usable in an oracle-gated query: the exact heavy hitters are
  * computable by any engine, and "hitter ∈ sketch" is provably TRUE.
  *
  * This is the 100 TB heavy-hitter shape: one pass, O(k) state per
  * partition, partial sketches merged like any other aggregation buffer —
  * where an exact groupBy-count needs a shuffle keyed by every distinct
  * value, the sketch needs k counters per map task.
  */
object MisraGries {

  class MGAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "misra-gries requires k > 0")

    override def zero: Map[String, Long] = Map.empty

    // nulls are skipped, matching SQL aggregate semantics (count/sum ignore
    // NULL inputs) — and a null key would not survive the Map encoder anyway
    override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) buf
      else buf.get(x) match {
        case Some(c) => buf.updated(x, c + 1)
        case None if buf.size < k => buf.updated(x, 1L)
        // full and x unseen: decrement every counter (x's implicit counter
        // and one unit of each survivor cancel), drop zeros
        case None => buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val s = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
      if (s.size <= k) s
      else {
        // subtract the (k+1)-th largest count from everything, keep > 0:
        // the mergeable-summaries reduction that preserves the n/(k+1) bound
        val cut = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        s.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column aggregate: the Misra-Gries sketch (item → residual count) of a
    * string column with at most k counters.
    */
  def sketch(c: Column, k: Int): Column =
    udaf(new MGAgg(k), Encoders.STRING).apply(c)

  /** Weighted Misra-Gries: each input row carries an item and a weight
    * (e.g. a pre-aggregated count). Inserting (x, w) is EXACTLY the
    * mergeable-summaries merge of the buffer with the one-entry sketch
    * {x → w}, so the n/(k+1) guarantee holds over total WEIGHT — which is
    * what lets a heavy-hitter query run the sketch over a groupBy's
    * (item, cnt) frame instead of re-scanning the raw stream: same
    * sketch semantics, one scan.
    */
  class WMGAgg(k: Int)
      extends Aggregator[(String, Long), Map[String, Long], Map[String, Long]] {
    private val mg = new MGAgg(k)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], xw: (String, Long)): Map[String, Long] =
      if (xw._1 == null || xw._2 <= 0L) buf // null/non-positive: SQL-skip
      else mg.merge(buf, Map(xw._1 -> xw._2))

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mg.merge(a, b)

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column aggregate: weighted Misra-Gries over (item, weight) rows. */
  def weightedSketch(c: Column, w: Column, k: Int): Column =
    udaf(new WMGAgg(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)).apply(c, w)
}

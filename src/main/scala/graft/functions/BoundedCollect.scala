package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded grouped collection: the k smallest longs per group, as a sorted
  * array — `collect_list` with a hard cap on per-key state.
  *
  * Why not `collect_list` + `slice`: collect_list buffers EVERY value of a
  * key before anything can trim it, so one degenerate key (an LSH bucket of
  * boilerplate docs, a bot user_id) holds its whole group in one aggregation
  * buffer. This aggregator's buffer is capped at k slots at every point of
  * the partial/final lifecycle: `reduce` drops anything ≥ the k-th smallest,
  * `merge` is a two-pointer merge of two ≤k runs truncated at k —
  * associative and commutative, so Spark's partial aggregation keeps map-side
  * state bounded too. That is the contract that survives a 100 TB key skew.
  *
  * Used by the LSH dedup pipelines (graft.queries.Dedup) to fold the
  * hot-bucket guard into candidate generation: collect min-(cap+1) ids per
  * bucket; a bucket yielding cap+1 ids provably had > cap members and is
  * dropped whole, while a kept bucket's list is provably complete.
  */
object BoundedCollect {

  class MinKLongAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k > 0, "min-k requires k > 0")

    /** Buffer invariant: sorted ascending, length ≤ k. */
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      if (buf.length < k) {
        val pos = insertionPoint(buf, v)
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, pos)
        out(pos) = v
        System.arraycopy(buf, pos, out, pos + 1, buf.length - pos)
        out
      } else if (v < buf(k - 1)) {
        val pos = insertionPoint(buf, v)
        System.arraycopy(buf, pos, buf, pos + 1, k - pos - 1)
        buf(pos) = v
        buf
      } else buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val n = math.min(k, a.length + b.length)
      val out = new Array[Long](n)
      var i = 0
      var j = 0
      var o = 0
      while (o < n) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    private def insertionPoint(buf: Array[Long], v: Long): Int = {
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < v) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: the k smallest values of `c` per group, ascending. */
  def minK(c: Column, k: Int): Column =
    udaf(new MinKLongAgg(k), Encoders.scalaLong).apply(c)
}

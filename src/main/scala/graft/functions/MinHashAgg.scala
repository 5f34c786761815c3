package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable corpus-level MinHash sketch: aggregates a string column into a
  * k-slot signature. The buffer is a plain Array[Long] and `merge` is a
  * slot-wise min — associative and commutative, so Spark can compute partial
  * sketches per partition and combine them in any order: the contract that
  * makes a sketch work on a 1000-executor cluster.
  *
  * Use cases: one signature per corpus/shard for cross-shard containment
  * estimates (|A∩B|/|A∪B| ≈ matching slots / k), cheap change detection
  * between snapshot versions.
  *
  * Plays the role an HLL sketch plays for count-distinct, but for set
  * SIMILARITY. Built on the same hash kernels as the per-document
  * [[MinHashSig]] expression.
  */
object MinHashAgg {

  class SketchAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

    override def reduce(buf: Array[Long], elem: String): Array[Long] = {
      if (elem != null) {
        val base = HashAlgos.fnv1a64(elem.getBytes("UTF-8"))
        var i = 0
        while (i < k) {
          val h = HashAlgos.mix64(base ^ (i * 0x9e3779b97f4a7c15L))
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: minhash_sketch(tokens…) over the rows of a group. */
  def sketch(c: Column, k: Int = 32): Column = udaf(new SketchAgg(k)).apply(c)

  /** Estimated Jaccard similarity of two sketches = matching-slot fraction. */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}

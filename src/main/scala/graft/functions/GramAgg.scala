package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass Gram accumulation for the DEPLOYABLE PCA fit (s14b): one
  * scan accumulates the count, the per-dim sums, and the upper-triangle
  * raw second moments in one dense double buffer — the treeAggregate
  * shape Spark ML's RowMatrix uses, expressed as a typed Aggregator so
  * it composes with the DataFrame API. The shuffle carries ONE buffer
  * per map partition (1 + d + d(d+1)/2 doubles ≈ 17 KB at d = 64)
  * regardless of corpus size — versus the exact path's n·d² exploded
  * product rows.
  *
  * fp addition here is partition-order-dependent, so this is the
  * deployable twin (rows-only contract, spec-pinned subspace quality);
  * the decimal-exact, fully-oracled path is s14 / Similarity.pcaFit —
  * the c27 exact/approx pairing applied to PCA.
  */
object GramAgg {

  class Gram(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    private val tri = dim * (dim + 1) / 2

    override def zero: Array[Double] = Array.fill(1 + dim + tri)(0.0)

    override def reduce(buf: Array[Double], x: Seq[Float]): Array[Double] = {
      if (x != null && x.length == dim) {
        buf(0) += 1.0
        val xd = new Array[Double](dim)
        var i = 0
        while (i < dim) { xd(i) = x(i).toDouble; buf(1 + i) += xd(i); i += 1 }
        var p = 1 + dim
        i = 0
        while (i < dim) {
          val xi = xd(i)
          var j = i
          while (j < dim) { buf(p) += xi * xd(j); j += 1; p += 1 }
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Column aggregate: gram(embedding) → [n, sums(d), upper-tri M(d(d+1)/2)]. */
  def gram(c: Column, dim: Int): Column =
    udaf(new Gram(dim), ExpressionEncoder[Seq[Float]]()).apply(c)
}

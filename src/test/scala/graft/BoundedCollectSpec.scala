package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedCollect
import graft.functions.BoundedCollect.MinKLongAgg

/** The bounded grouped-collection aggregator behind the LSH hot-bucket
  * guard (Dedup.bucketCandidates). The contract that matters at scale:
  * the buffer NEVER exceeds k slots at any point of the partial/final
  * lifecycle, and merge is associative+commutative so Spark may combine
  * partials in any order/grouping.
  */
class BoundedCollectSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def agg(k: Int) = new MinKLongAgg(k)

  test("reduce keeps the k smallest, sorted, buffer never above k slots") {
    val a = agg(3)
    var buf = a.zero
    val seen = Seq(9L, 1L, 7L, 3L, 8L, 2L, 2L, 10L)
    for (v <- seen) {
      buf = a.reduce(buf, v)
      assert(buf.length <= 3, s"buffer grew past k: ${buf.toSeq}")
      assert(buf.sameElements(buf.sorted), s"buffer unsorted: ${buf.toSeq}")
    }
    assert(a.finish(buf) == Seq(1L, 2L, 2L))
  }

  test("merge is associative and commutative and truncates at k") {
    val a = agg(4)
    def fold(vs: Seq[Long]) = vs.foldLeft(a.zero)(a.reduce)
    val x = fold(Seq(5L, 1L, 9L))
    val y = fold(Seq(2L, 8L))
    val z = fold(Seq(3L, 7L, 4L, 6L, 0L))
    val abc = a.merge(a.merge(x, y), z).toSeq
    val acb = a.merge(a.merge(x, z), y).toSeq
    val cba = a.merge(z, a.merge(y, x)).toSeq
    assert(abc == acb && acb == cba, s"$abc / $acb / $cba")
    assert(abc == Seq(0L, 1L, 2L, 3L)) // global 4 smallest, merged truncated
    assert(a.merge(a.zero, x).toSeq == x.toSeq)
    assert(a.merge(x, a.zero).toSeq == x.toSeq)
  }

  test("minK over a skewed multi-partition frame equals sort-ascending take-k") {
    import spark.implicits._
    // key "hot" gets 10_000 values, others a handful — the hot key must not
    // change the answer, and per-key state stays O(k) by construction
    val rows = (0L until 10000L).map(i => ("hot", 10000L - i)) ++
      Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 42L))
    val df = rows.toDF("k", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(BoundedCollect.minK(col("v"), 3).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("hot") == Seq(1L, 2L, 3L))
    assert(got("a") == Seq(1L, 2L, 3L))
    assert(got("b") == Seq(42L))
  }

  test("minK with duplicates and k exceeding group size") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", 5L), ("a", 1L)).toDF("k", "v")
    val got = df.groupBy("k").agg(BoundedCollect.minK(col("v"), 10).as("ids"))
      .collect().head.getSeq[Long](1)
    assert(got == Seq(1L, 5L, 5L))
  }
}

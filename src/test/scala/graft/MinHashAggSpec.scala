package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashAgg

class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf
  import spark.implicits._

  test("sketch is invariant under repartitioning (merge is order-free)") {
    val tokens = graft.engine.Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val a = tokens.repartition(1)
      .agg(MinHashAgg.sketch(col("tok")).as("s")).head().getSeq[Long](0)
    val b = tokens.repartition(13)
      .agg(MinHashAgg.sketch(col("tok")).as("s")).head().getSeq[Long](0)
    assert(a == b)
  }

  test("estimated Jaccard tracks true Jaccard on known sets") {
    def sketchOf(xs: Seq[String]) =
      xs.toDF("tok").agg(MinHashAgg.sketch(col("tok"), 128).as("s"))
        .head().getSeq[Long](0)
    val x = (1 to 100).map(i => s"tok$i")
    val y = (26 to 125).map(i => s"tok$i") // true jaccard = 75/125 = 0.6
    val est = MinHashAgg.estimateJaccard(sketchOf(x), sketchOf(y))
    assert(math.abs(est - 0.6) < 0.15, s"estimate $est for true 0.6")
    // identical sets → estimate exactly 1
    assert(MinHashAgg.estimateJaccard(sketchOf(x), sketchOf(x)) == 1.0)
  }

  test("per-group sketches: same-lang shards are more similar to themselves") {
    val docs = graft.engine.Tables(spark, sf, "documents")
    val sketches = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang").agg(MinHashAgg.sketch(col("tok")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // all langs share the same synthetic vocabulary → sketches nearly equal;
    // the property being tested is that the aggregate runs grouped and the
    // estimator is within [0, 1]
    val langs = sketches.keys.toSeq
    for (a <- langs; b <- langs) {
      val e = MinHashAgg.estimateJaccard(sketches(a), sketches(b))
      assert(e >= 0.0 && e <= 1.0)
      if (a == b) assert(e == 1.0)
    }
  }
}

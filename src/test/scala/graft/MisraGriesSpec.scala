package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries
import graft.functions.MisraGries.MGAgg

class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("buffer never exceeds k counters through reduce and merge") {
    val a = new MGAgg(3)
    var buf = a.zero
    val stream = Seq("a", "b", "c", "d", "e", "a", "a", "f", "g", "a", "b")
    for (x <- stream) {
      buf = a.reduce(buf, x)
      assert(buf.size <= 3, s"buffer grew past k: $buf")
      assert(buf.values.forall(_ > 0), s"zero counter retained: $buf")
    }
    val other = Seq("a", "h", "h", "h").foldLeft(a.zero)(a.reduce)
    val merged = a.merge(buf, other)
    assert(merged.size <= 3, s"merged buffer past k: $merged")
  }

  test("guarantee: any item with count > n/(k+1) survives every merge order") {
    val a = new MGAgg(3)
    // n = 40, hot appears 15 > 40/4 = 10; the rest is adversarial filler
    val hot = Seq.fill(15)("hot")
    val filler = (0 until 25).map(i => s"f${i % 10}")
    val stream = (hot ++ filler)
    // simulate arbitrary partitionings and merge orders
    for (seed <- 1 to 5; parts <- Seq(2, 3, 5)) {
      val shuffled = new scala.util.Random(seed).shuffle(stream)
      val chunks = shuffled.grouped(math.max(1, shuffled.size / parts)).toSeq
      val partials = chunks.map(_.foldLeft(a.zero)(a.reduce))
      val leftFold = partials.reduceLeft(a.merge)
      val rightFold = partials.reduceRight(a.merge)
      assert(leftFold.contains("hot"), s"hot lost (left fold, seed=$seed): $leftFold")
      assert(rightFold.contains("hot"), s"hot lost (right fold, seed=$seed): $rightFold")
    }
  }

  test("sketch over a multi-partition frame contains the exact heavy hitters") {
    import spark.implicits._
    // 3 heavy values (>n/5 each) + a uniform tail, scattered over 8 partitions
    val rows = Seq.fill(300)("x") ++ Seq.fill(280)("y") ++ Seq.fill(260)("z") ++
      (0 until 400).map(i => s"t${i % 40}")
    val df = rows.toDF("v").repartition(8)
    val mg = df.agg(MisraGries.sketch(col("v"), 4).as("mg"))
      .head().getMap[String, Long](0)
    val n = rows.size
    val exactHitters = rows.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > n / 5.0).keys.toSet
    assert(exactHitters == Set("x", "y", "z"))
    assert(exactHitters.subsetOf(mg.keySet.toSet), s"hitters missing from $mg")
    assert(mg.size <= 4)
  }

  test("weighted guarantee: weight > W/(k+1) survives every merge order") {
    val a = new MisraGries.WMGAgg(3)
    // total weight W = 100, hot carries 30 > 100/4 = 25, split into small
    // increments so no single insert dominates; adversarial filler
    val items = Seq.fill(10)(("hot", 3L)) ++
      (0 until 35).map(i => (s"f${i % 9}", 2L))
    for (seed <- 1 to 5; parts <- Seq(2, 3, 5)) {
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val chunks = shuffled.grouped(math.max(1, shuffled.size / parts)).toSeq
      val partials = chunks.map(_.foldLeft(a.zero)(a.reduce))
      val leftFold = partials.reduceLeft(a.merge)
      val rightFold = partials.reduceRight(a.merge)
      assert(leftFold.contains("hot"), s"hot lost (left, seed=$seed): $leftFold")
      assert(rightFold.contains("hot"), s"hot lost (right, seed=$seed): $rightFold")
      (leftFold ++ rightFold).foreach { case (_, c) => assert(c > 0) }
      assert(leftFold.size <= 3 && rightFold.size <= 3)
    }
    // null item and non-positive weights are SQL-skipped
    val b = a.reduce(a.reduce(a.reduce(a.zero, (null, 5L)), ("x", 0L)), ("x", -2L))
    assert(b.isEmpty)
  }

  test("weighted sketch over a pre-aggregated frame finds the raw-stream hitters") {
    import spark.implicits._
    // same corpus as the unweighted test, but the sketch consumes the
    // exact (item, cnt) rollup — the one-scan e11 shape
    val rows = Seq.fill(300)("x") ++ Seq.fill(280)("y") ++ Seq.fill(260)("z") ++
      (0 until 400).map(i => s"t${i % 40}")
    val counts = rows.toDF("v").repartition(8)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val mg = counts
      .agg(MisraGries.weightedSketch(col("v"), col("cnt"), 4).as("mg"))
      .head().getMap[String, Long](0)
    assert(Set("x", "y", "z").subsetOf(mg.keySet.toSet), s"hitters missing from $mg")
    assert(mg.size <= 4)
  }
}

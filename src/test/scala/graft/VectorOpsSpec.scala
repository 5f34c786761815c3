package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.gvec
import graft.queries.Similarity

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  /** The composed specification form the kernel must match bit-for-bit. */
  private def composedCos(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def ddot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    ddot(a, b) / (sqrt(ddot(a, a)) * sqrt(ddot(b, b)))
  }

  test("CosineSim is bit-identical to the composed fold over real embeddings (float x float)") {
    val e = Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(broadcast(e.limit(7)
        .select(col("vec_id").as("b_id"), col("embedding").as("b"))))
    val diff = pairs
      .select(gvec.cosineSim(col("a"), col("b")).as("fused"),
        composedCos(col("a"), col("b")).as("spec"))
      .filter(col("fused") =!= col("spec"))
      .count()
    assert(diff == 0)
  }

  test("CosineSim handles double arrays and mixed float/double identically") {
    val e = Tables(spark, sf, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding").as("f"),
        transform(col("embedding"), _.cast("double")).as("d"))
    val diff = e.select(
      gvec.cosineSim(col("d"), col("d")).as("dd"),
      gvec.cosineSim(col("f"), col("d")).as("fd"),
      gvec.cosineSim(col("d"), col("f")).as("df"),
      composedCos(col("d"), col("d")).as("sdd"))
      .filter(col("dd") =!= col("sdd") || col("fd") =!= col("sdd") ||
        col("df") =!= col("sdd"))
      .count()
    assert(diff == 0)
  }

  test("CosineSim fails loudly on length-mismatched vectors") {
    // out-of-contract input: without the kernel guard this would either
    // silently truncate the dot product or throw a bare AIOOBE
    val df = spark.range(1).select(
      array(lit(1.0f), lit(2.0f)).as("a"),
      array(lit(1.0f), lit(2.0f), lit(3.0f)).as("b"))
    val thrown = intercept[Throwable] {
      df.select(gvec.cosineSim(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(thrown).exists(_.contains("length mismatch")), thrown)
  }

  test("IntersectCountSorted equals size(array_intersect) on real shingle sets") {
    import graft.functions.gvec
    val sh = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.queries.Dedup.shingleHashes(col("text")).as("sh"))
    val pairs = sh.select(col("sh").as("a"))
      .crossJoin(broadcast(sh.limit(9).select(col("sh").as("b"))))
    val diff = pairs.select(
      gvec.intersectCountSorted(col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).as("spec"))
      .filter(col("fused") =!= col("spec")).count()
    assert(diff == 0)
    // edges: empty vs non-empty, identical arrays
    import spark.implicits._
    val e = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 2L), Seq(1L, 2L)))
      .toDF("a", "b")
      .select(gvec.intersectCountSorted(col("a"), col("b")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(e == Seq(0, 2))
  }

  test("Similarity.cosine (now the fused kernel) keeps s01 bit-stable") {
    val a = Registry.byName("s01_ann_brute").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // self-consistency across runs (codegen + interpreted paths may differ
    // in which is exercised; both must produce the same bits)
    val b = Registry.byName("s01_ann_brute").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(a.sameElements(b))
  }
}

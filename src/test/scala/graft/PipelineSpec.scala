package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Pipeline composition invariants the per-query oracles can't express. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("p04 reuse rows are byte-valid: manifest equals a from-scratch v2 rebuild") {
    // from-scratch v2 manifest (rebuild EVERY shard — the thing p04 avoids)
    val docs = graft.engine.Tables(spark, sf, "documents")
    val v2 = docs.filter(col("doc_id") >= 100)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text"))).as("dg"))
    val full = v2.withColumn("shard", expr("doc_id div 64"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("doc_id"), col("dg")))),
          x => concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("dg"))))).as("shard_md5"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    val out = Registry.byName("p04_incremental_publish").run(spark, sf).collect()
    val incremental = out.filter(_.getString(1) != "drop")
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(incremental == full,
      "incremental manifest diverges from the from-scratch rebuild")
    // drop rows must be exactly the v1-only shards with no v2 member
    val dropShards = out.filter(_.getString(1) == "drop").map(_.getLong(0)).toSet
    assert(dropShards.intersect(full.keySet).isEmpty)
    // and the publish must actually be incremental at this carving:
    // reuse rows exist (doc_ids 128..399 not divisible by 11 sit in
    // untouched shards only if the whole shard is untouched — shards
    // fully inside [100, 400) with no %11 edit are none at width 64, so
    // assert instead that SOME shard is rewritten and counts add up)
    val actions = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(actions.getOrElse("rewrite", 0) > 0)
    assert(out.map(_.getLong(0)).distinct.length == out.length, "duplicate shard rows")
  }
}

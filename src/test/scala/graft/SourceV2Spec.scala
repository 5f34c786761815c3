package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GenSource

/** The custom DataSource V2 connector: correctness, column pruning reaching
  * generation, and id-range partition pruning at planning time.
  */
class SourceV2Spec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def gen(rows: Int, parts: Int) =
    spark.read.format("graft-gen")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generator is deterministic and matches the shared kernel") {
    val rows = gen(50, 4).orderBy("doc_id").collect()
    assert(rows.length == 50)
    rows.take(5).foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      assert(r.getString(r.fieldIndex("lang")) == GenSource.lang(id))
      assert(r.getInt(r.fieldIndex("n_tokens")) == GenSource.nTokens(id))
      assert(r.getString(r.fieldIndex("text")) == GenSource.text(id))
    }
    // two reads produce identical corpora (pure function of doc_id)
    val again = gen(50, 2).orderBy("doc_id").collect()
    assert(rows.map(_.getString(3)).toSeq == again.map(_.getString(3)).toSeq)
  }

  test("column pruning reaches generation: no text built when text is pruned") {
    GenSource.textsGenerated.set(0)
    val s = gen(500, 4).agg(sum(col("n_tokens"))).head().getLong(0)
    assert(s > 0)
    assert(GenSource.textsGenerated.get() == 0,
      "pruned 'text' column was still generated")
    GenSource.textsGenerated.set(0)
    gen(500, 4).select(length(col("text"))).agg(sum(col("length(text)"))).head()
    assert(GenSource.textsGenerated.get() == 500)
  }

  test("doc_id range predicates prune input partitions at planning") {
    // 8 partitions of 250 ids; doc_id >= 1900 touches only the last one
    val df = gen(2000, 8).filter(col("doc_id") >= 1900)
    assert(df.count() == 100)
    val scanned = df.select("doc_id").rdd.getNumPartitions
    assert(scanned == 1, s"expected 1 surviving input partition, got $scanned")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("graft-gen"), p)
    assert(p.contains("GreaterThanOrEqual(doc_id,1900)"), p)
  }
}

package graft

import org.apache.spark.sql.types.{BinaryType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf

  test("media table has binary payload + typed metadata struct") {
    val df = Multimodal.mediaTable(spark, sf)
    assert(df.schema("payload").dataType == BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("width", "height", "fmt"))
    assert(df.count() == 500)
  }

  test("feature extraction is deterministic and byte-exact on a known payload") {
    import spark.implicits._
    val df = Seq((1L, "AB", "x", "src", 2L)) // 'A'=65, 'B'=66 → mean 65.5
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("___tmp")
    val media = df.selectExpr("doc_id", "encode(text, 'UTF-8') AS payload",
      "named_struct('width', 10, 'height', 10, 'fmt', 'png') AS meta")
    val got = Multimodal.extractFeatures(media).collect().head
    assert(got.n_bytes == 2L)
    assert(got.mean_byte == 65.5)
  }

  test("m01 features align with the documents table") {
    val rows = Registry.byName("m01_media_features").run(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getDouble(2) > 32.0 && r.getDouble(2) < 127.0))
    // fmt parity rule
    assert(rows.forall(r =>
      r.getString(3) == (if (r.getLong(0) % 2 == 0) "png" else "jpg")))
  }
}

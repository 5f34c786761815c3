package graft.queries

import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.multimodal.Multimodal

/** Driver-facing wrapper of the multimodal pipeline. The payload here is the
  * UTF-8 text (pure ASCII in this corpus), so the byte-level features are
  * expressible in the DuckDB oracle too — the binary plumbing gets a real
  * hash-checked gate, not just a rows-only pass.
  */
object MultimodalOps {

  val specs: Vector[QuerySpec] = Vector(
    QuerySpec(
      "m01_media_features",
      (s, d) =>
        Multimodal.extractFeatures(Multimodal.mediaTable(s, d))
          .orderBy("doc_id")
          .toDF(),
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_bytes,
             |  CAST(list_sum(list_transform(string_split(text, ''),
             |      c -> ascii(c))) AS DOUBLE)
             |    / CAST(length(text) AS DOUBLE) AS mean_byte,
             |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpg' END AS fmt
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
  )
}

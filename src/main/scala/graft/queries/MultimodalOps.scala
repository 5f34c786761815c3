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
    // Frame sampling: fixed-size windows over the payload (the shape a
    // video frame-sampler or audio chunker has), one row per frame with
    // per-frame features. Map-side explode; no shuffle until the ORDER BY.
    QuerySpec(
      "m02_frame_features",
      (s, d) => {
        Multimodal.mediaTable(s, d)
          .select(col("doc_id"), col("payload"),
            explode(sequence(lit(0),
              expr("(length(payload) - 1) div 100").cast("int"))).as("frame_idx"))
          .select(
            col("doc_id"), col("frame_idx"),
            expr("CAST(length(substring(payload, frame_idx * 100 + 1, 100)) AS BIGINT)")
              .as("frame_bytes"),
          )
          .orderBy("doc_id", "frame_idx")
      },
      Some("""SELECT doc_id, u.frame_idx AS frame_idx,
             |  CAST(length(substring(text, u.frame_idx * 100 + 1, 100)) AS BIGINT)
             |    AS frame_bytes
             |FROM documents,
             |  UNNEST(range(0, (length(text) - 1) // 100 + 1)) AS u(frame_idx)
             |ORDER BY doc_id, frame_idx""".stripMargin),
    ),
    // Resize/downsample through the codec seam: dims halved, payload
    // subsampled (every 2nd byte), features recomputed on the result. The
    // ASCII payload keeps the whole transform oracle-able byte-for-byte.
    QuerySpec(
      "m03_resize",
      (s, d) =>
        Multimodal.resize(Multimodal.mediaTable(s, d), factor = 2)
          .orderBy("doc_id")
          .toDF(),
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CAST(n_chars % 640 AS INT) AS w0,
             |    CAST(n_chars % 480 AS INT) AS h0,
             |    list_transform(list_filter(range(0, length(text)), i -> i % 2 = 0),
             |                   i -> ascii(text[i+1])) AS sub
             |  FROM documents)
             |SELECT doc_id,
             |  w0 // 2 AS width, h0 // 2 AS height,
             |  CAST(len(sub) AS BIGINT) AS n_bytes,
             |  CASE WHEN len(sub) = 0 THEN 0.0
             |       ELSE CAST(list_sum(sub) AS DOUBLE) / CAST(len(sub) AS DOUBLE)
             |  END AS mean_byte
             |FROM b ORDER BY doc_id""".stripMargin),
    ),
  )
}

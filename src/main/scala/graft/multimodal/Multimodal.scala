package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed by a partition-mapped decode/featurize stage.
  *
  * The Spark-side mechanics are real and tested: binary column handling,
  * metadata struct schema, typed Dataset pipeline, per-partition batched
  * processing (the shape a Pandas-UDF/mapInPandas stage has in PySpark —
  * in Scala the idiomatic equivalent is mapPartitions over a typed Dataset,
  * which likewise amortizes per-batch setup, e.g. loading a codec once per
  * partition).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): payload bytes are the document text encoded as UTF-8 and
  * [[FakeCodec.decode]] derives deterministic features from raw bytes. The
  * seam to replace is exactly one function.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, fmt: String)
  case class MediaDoc(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, mean_byte: Double, fmt: String)

  /** ======== STUB SEAM ========
    * A real implementation decodes payload → pixels/samples with a codec
    * loaded once per partition. This deterministic fake keeps the pipeline
    * testable: mean byte value stands in for "extracted feature".
    */
  object FakeCodec {
    def decode(payload: Array[Byte], meta: MediaMeta): MediaFeatures0 = {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
      MediaFeatures0(
        nBytes = payload.length.toLong,
        meanByte = if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
    }
  }
  case class MediaFeatures0(nBytes: Long, meanByte: Double)

  /** Attach a fake binary payload + metadata to the documents table —
    * in production this is the column layout (payload: binary, meta: struct)
    * a media table would already have.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        when(col("doc_id") % 2 === 0, "png").otherwise("jpg").as("fmt"),
      ).as("meta"))

  /** Partition-mapped decode/featurize: one codec instance per partition,
    * rows processed in a streaming iterator (constant memory per partition).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaDoc].mapPartitions { rows =>
      // per-partition setup would go here (codec init)
      rows.map { doc =>
        val f = FakeCodec.decode(doc.payload, doc.meta)
        MediaFeatures(doc.doc_id, f.nBytes, f.meanByte, doc.meta.fmt)
      }
    }
  }

  case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, n_bytes: Long, mean_byte: Double)

  /** Partition-mapped "resize": dims divided by `factor`, payload subsampled
    * by keeping every factor-th byte, features recomputed on the resized
    * payload. The real-codec version swaps the subsample for an actual
    * scaler behind the same seam; the Spark mechanics — typed binary
    * transform in, new meta + features out, constant memory per partition —
    * are exactly what ships.
    */
  def resize(media: DataFrame, factor: Int): Dataset[ResizedMedia] = {
    require(factor > 0, "resize factor must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaDoc].mapPartitions { rows =>
      rows.map { doc =>
        val n = (doc.payload.length + factor - 1) / factor
        val sub = new Array[Byte](n)
        var i = 0
        while (i < n) { sub(i) = doc.payload(i * factor); i += 1 }
        val f = FakeCodec.decode(sub, doc.meta)
        ResizedMedia(doc.doc_id, doc.meta.width / factor, doc.meta.height / factor,
          f.nBytes, f.meanByte)
      }
    }
  }
}

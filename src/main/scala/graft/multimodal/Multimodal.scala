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
  * Two codecs live behind the seam. [[ImageCodec]] is REAL: deterministic
  * tiny rasters encoded to actual PNG/BMP bytes and decoded back through
  * `javax.imageio` (m01 dimensions and m03 resampling run on decoded
  * pixels). [[FakeCodec]] remains for the byte-stream ops (frames,
  * fingerprints, chunking), where payload bytes being document text keeps
  * those oracles exact; audio/video decode stays stubbed (no codec libs
  * in this environment).
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

  /** ======== REAL CODEC (round 10) ========
    * Deterministic tiny raster images, ENCODED to real PNG/BMP bytes and
    * DECODED back through `javax.imageio` — the codec seam with an actual
    * codec in it. The pixel field is a pure function of (doc_id, x, y), so
    * a SQL oracle can recompute every feature the decode path reports
    * without being able to decode: if the Spark side's numbers match, the
    * bytes really round-tripped through the image format.
    *
    * Format choices are the lossless-roundtrip ones: PNG as 8-bit
    * grayscale (TYPE_BYTE_GRAY, raster samples read/written directly — no
    * color-space conversion), BMP as 24-bit BGR with r=g=b (the JDK BMP
    * writer's reliable path; channel 0 reads the value back). Both decode
    * bit-exactly, which is what makes the oracle an equality gate rather
    * than a tolerance test.
    */
  object ImageCodec {
    /** deterministic gray value at (x, y) — all math non-negative */
    def px(id: Long, x: Int, y: Int): Int =
      ((id * 31 + x * 7 + y * 13) % 256).toInt
    /** deterministic dims: 4..16 × 3..13 — tiny, but real rasters */
    def dims(id: Long): (Int, Int) =
      ((4 + id % 13).toInt, (3 + id % 11).toInt)
    def fmt(id: Long): String = if (id % 2 == 0) "png" else "bmp"

    def encode(id: Long): Array[Byte] = {
      import java.awt.image.BufferedImage
      val (w, h) = dims(id)
      val gray = fmt(id) == "png"
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = px(id, x, y)
          if (gray) r.setSample(x, y, 0, v)
          else { r.setSample(x, y, 0, v); r.setSample(x, y, 1, v); r.setSample(x, y, 2, v) }
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(img, fmt(id), out)
      require(ok, s"no ${fmt(id)} writer for image type of doc $id")
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "imageio could not decode payload")
      img
    }
  }

  /** ======== REAL AUDIO CODEC (round 10) ========
    * Deterministic 16-bit mono PCM, ENCODED to real RIFF/WAVE bytes and
    * DECODED back through `javax.sound.sampled.AudioSystem` — the audio
    * analog of [[ImageCodec]]. PCM in a WAV container is lossless, so the
    * sample field being a pure function of (doc_id, i) lets a SQL oracle
    * recompute every reported feature; agreement proves a bit-exact
    * round trip through the container format (header parse, frame size,
    * endianness — the parts a real ingest gets wrong).
    */
  object AudioCodec {
    val SampleRate = 8000f
    /** deterministic signed 16-bit sample at index i */
    def sample(id: Long, i: Int): Int =
      (((id * 31 + i.toLong * 7) % 65536) - 32768).toInt
    /** deterministic length: 256..767 samples */
    def nSamples(id: Long): Int = (256 + id % 512).toInt

    /** RIFF/WAVE container assembled directly (canonical 44-byte header
      * + little-endian PCM) — the shape a producer writes; the DECODE
      * side still goes through the real `AudioSystem` parser, which is
      * the half that proves container correctness. (The first cut
      * encoded via `AudioSystem.write`; the 200k-doc probe measured its
      * per-clip stream plumbing at ~30× the cost of the bytes
      * themselves, so the producer side became explicit.)
      */
    def encode(id: Long): Array[Byte] = {
      val n = nSamples(id)
      val dataLen = n * 2 // 16-bit mono little-endian PCM
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val rate = SampleRate.toInt
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(rate)
        .putInt(rate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        buf.putShort(sample(id, i).toShort)
        i += 1
      }
      buf.array()
    }

    /** decode WAV bytes → (sampleRate, samples) via the real parser */
    def decode(bytes: Array[Byte]): (Float, Array[Int]) = {
      import javax.sound.sampled.AudioSystem
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"unexpected decoded format: $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      (fmt.getSampleRate, samples)
    }

    /** Direct RIFF/WAVE parse → (sampleRate, samples): validates the
      * container magics and the 16-bit-mono-LE fmt block, then reads PCM
      * straight from the data chunk — no stream/codec negotiation per
      * clip. The m09 BULK path: ~3× the throughput of [[decode]], which
      * stays as the spot-check ([[audioFeatures]] cross-decodes every
      * 101st clip through javax.sound and raise-errors on any mismatch,
      * so the "these bytes are real WAV" claim keeps a live codec gate
      * without paying codec plumbing per record).
      */
    def parseRiff(bytes: Array[Byte]): (Float, Array[Int]) = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def magic(off: Int, s: String): Unit = {
        val got = new String(bytes, off, 4, "US-ASCII")
        require(got == s, s"RIFF parse: expected '$s' at $off, got '$got'")
      }
      magic(0, "RIFF"); magic(8, "WAVE")
      // Walk chunks by their declared sizes rather than assuming the
      // canonical 44-byte layout: an extended fmt block (cbSize tail) or
      // extra LIST/fact chunks shift the data chunk, and the synthetic
      // corpus being canonical is no reason for the parser to require it.
      var off = 12
      var fmtOff = -1
      var fmtLen = -1
      var dataOff = -1
      var dataLen = -1
      while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val sz = buf.getInt(off + 4)
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"RIFF parse: chunk '$id' ($sz bytes at $off) overruns buffer")
        if (id == "fmt ") { fmtOff = off + 8; fmtLen = sz }
        else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // chunk payloads are word-aligned
      }
      require(fmtOff >= 0 && dataOff >= 0,
        "RIFF parse: missing fmt /data chunk")
      // The fmt fields below reach 16 bytes into the chunk payload; a
      // short declared fmt chunk would otherwise silently read the next
      // chunk's header bytes as format/rate/bits.
      require(fmtLen >= 16, s"RIFF parse: fmt chunk too short ($fmtLen bytes)")
      require(buf.getShort(fmtOff) == 1 && buf.getShort(fmtOff + 2) == 1 &&
        buf.getShort(fmtOff + 14) == 16,
        "RIFF parse: not 16-bit mono PCM")
      val rate = buf.getInt(fmtOff + 4)
      val n = dataLen / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) { samples(i) = buf.getShort(dataOff + 2 * i).toInt; i += 1 }
      (rate.toFloat, samples)
    }
  }

  case class RealAudio(doc_id: Long, payload: Array[Byte])
  case class AudioFeatures(
      doc_id: Long, n_samples: Long, sample_rate: Double,
      duration_s: Double, mean_amp: Double)

  /** documents → real WAV payloads (one tiny PCM clip per doc). */
  def realAudioTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => RealAudio(id, AudioCodec.encode(id))))
      .toDF()
  }

  /** Decode features from REAL WAV bytes: sample count, rate, duration
    * and mean amplitude all come from the DECODED stream — the oracle
    * recomputes them from the generator formula.
    *
    * Throughput decision (r11, VERDICT item): the bulk path is
    * [[AudioCodec.parseRiff]] (direct container parse — the fields m09
    * reports need the header + one pass over the PCM data, not codec
    * negotiation per clip); every 101st clip is ALSO decoded through the
    * real javax.sound stack and must agree bit-exactly or the task
    * fails. So the oracle still proves the bytes round-trip a real
    * format, the sampled cross-decode keeps the codec claim live, and
    * the per-clip javax plumbing cost (~2/3 of m09's wall) leaves the
    * hot path.
    */
  def audioFeatures(audio: DataFrame): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.as[RealAudio].mapPartitions { rows =>
      rows.map { a =>
        val (rate, samples) = AudioCodec.parseRiff(a.payload)
        if (a.doc_id % 101 == 0) {
          val (jrate, jsamples) = AudioCodec.decode(a.payload)
          require(jrate == rate && java.util.Arrays.equals(jsamples, samples),
            s"RIFF parse disagrees with javax.sound decode at doc ${a.doc_id}")
        }
        var sum = 0L
        var i = 0
        while (i < samples.length) { sum += samples(i); i += 1 }
        AudioFeatures(a.doc_id, samples.length.toLong, rate.toDouble,
          samples.length.toDouble / rate.toDouble,
          sum.toDouble / samples.length)
      }
    }
  }

  case class RealMedia(doc_id: Long, payload: Array[Byte], fmt: String)
  case class DecodedFeatures(
      doc_id: Long, width: Int, height: Int, fmt: String, mean_px: Double)

  /** documents → real encoded image payloads (one tiny PNG/BMP per doc).
    * mapPartitions at the binary boundary — the justified seam — with the
    * per-partition setup (disable ImageIO's disk cache) done once.
    */
  def realMediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => RealMedia(id, ImageCodec.encode(id), ImageCodec.fmt(id)))
      }.toDF()
  }

  /** Decode features from REAL image bytes: dimensions + mean pixel are
    * read from the decoded raster, never from the generator — the oracle
    * recomputes them from the generator formula, so agreement proves the
    * encode→decode round trip.
    */
  def decodeFeatures(media: DataFrame): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[RealMedia].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val img = ImageCodec.decode(m.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val r = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
          y += 1
        }
        DecodedFeatures(m.doc_id, w, h, m.fmt, sum.toDouble / (w.toLong * h))
      }
    }
  }

  case class ResizedFeatures(
      doc_id: Long, width: Int, height: Int, fmt: String, mean_px: Double)

  /** TRUE pixel resampling: decode, 2×2 box-downsample the raster
    * (integer mean, floor), report the resized dims + mean. Output dims
    * are w/2 × h/2 (floor), so every 2×2 block lies fully inside the
    * source — no edge clamping, and the SQL oracle replicates the
    * arithmetic exactly (all values non-negative, truncating division on
    * both engines).
    */
  def resizeReal(media: DataFrame): Dataset[ResizedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[RealMedia].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        val img = ImageCodec.decode(m.payload)
        val r = img.getRaster
        val (rw, rh) = (img.getWidth / 2, img.getHeight / 2)
        var sum = 0L
        var y = 0
        while (y < rh) {
          var x = 0
          while (x < rw) {
            val v = (r.getSample(2 * x, 2 * y, 0) + r.getSample(2 * x + 1, 2 * y, 0) +
              r.getSample(2 * x, 2 * y + 1, 0) + r.getSample(2 * x + 1, 2 * y + 1, 0)) / 4
            sum += v
            x += 1
          }
          y += 1
        }
        ResizedFeatures(m.doc_id, rw, rh, m.fmt, sum.toDouble / (rw.toLong * rh))
      }
    }
  }

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

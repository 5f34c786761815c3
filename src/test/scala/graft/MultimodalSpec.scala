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

  test("ImageCodec: PNG and BMP encode→decode round-trips every pixel") {
    for (id <- Seq(0L, 1L, 2L, 7L, 42L, 123L, 1000001L)) {
      val bytes = Multimodal.ImageCodec.encode(id)
      // real magic bytes: PNG signature / 'BM'
      if (id % 2 == 0)
        assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte, s"doc $id")
      else
        assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, s"doc $id")
      val img = Multimodal.ImageCodec.decode(bytes)
      val (w, h) = Multimodal.ImageCodec.dims(id)
      assert(img.getWidth == w && img.getHeight == h, s"doc $id dims")
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        assert(r.getSample(x, y, 0) == Multimodal.ImageCodec.px(id, x, y),
          s"doc $id pixel ($x,$y)")
    }
  }

  test("AudioCodec: WAV encode→decode round-trips every 16-bit sample") {
    for (id <- Seq(0L, 1L, 7L, 255L, 511L, 100003L)) {
      val bytes = Multimodal.AudioCodec.encode(id)
      // real RIFF/WAVE magic
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF", s"doc $id")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE", s"doc $id")
      val (rate, samples) = Multimodal.AudioCodec.decode(bytes)
      assert(rate == 8000f, s"doc $id rate")
      assert(samples.length == Multimodal.AudioCodec.nSamples(id), s"doc $id n")
      samples.indices.foreach { i =>
        assert(samples(i) == Multimodal.AudioCodec.sample(id, i),
          s"doc $id sample $i")
      }
      // negative samples must survive (sign bit through the container)
      assert(samples.exists(_ < 0), s"doc $id sign")
    }
  }

  test("m01 decoded features match the generator formula (real decode)") {
    val rows = Registry.byName("m01_media_features").run(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (id, w, h, fmt, mean) = (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getDouble(4))
      val (ew, eh) = Multimodal.ImageCodec.dims(id)
      assert(w == ew && h == eh, s"doc $id dims")
      assert(fmt == (if (id % 2 == 0) "png" else "bmp"), s"doc $id fmt")
      val es = (for (y <- 0 until eh; x <- 0 until ew)
        yield Multimodal.ImageCodec.px(id, x, y).toLong).sum
      assert(mean == es.toDouble / (ew * eh), s"doc $id mean")
    }
  }

  test("m03 true resample: 2x2 box means of decoded pixels") {
    val rows = Registry.byName("m03_resize").run(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (id, w, h, mean) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(4))
      val (w0, h0) = Multimodal.ImageCodec.dims(id)
      assert(w == w0 / 2 && h == h0 / 2, s"doc $id resized dims")
      def p(x: Int, y: Int) = Multimodal.ImageCodec.px(id, x, y)
      val es = (for (y <- 0 until h; x <- 0 until w)
        yield ((p(2 * x, 2 * y) + p(2 * x + 1, 2 * y) +
          p(2 * x, 2 * y + 1) + p(2 * x + 1, 2 * y + 1)) / 4).toLong).sum
      assert(mean == es.toDouble / (w.toLong * h), s"doc $id mean")
    }
  }

  test("m04 recalls planted perturbed-payload copies; non-planted pairs are rare") {
    import org.apache.spark.sql.functions.col
    val got = Registry.byName("m04_media_neardup").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = graft.engine.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 10 == 0).map(id => (id, id + 3000000L)).toSet
    val recall = planted.count(got.contains).toDouble / planted.size
    // every-31st-byte corruption moves each cell mean by < 1: most planted
    // copies stay within hamming 8 of their original
    assert(recall >= 0.7, s"planted media near-dup recall: $recall")
    // the fingerprint must also SEPARATE: unrelated payloads (random ~32-bit
    // hamming) must not dominate the output
    val nonPlanted = got -- planted
    assert(nonPlanted.size <= got.size / 2,
      s"${nonPlanted.size} non-planted pairs vs ${got.size} total")
  }

  test("m06 magic sniffing: planted headers detected; claims verified") {
    val out = Registry.byName("m06_magic_sniff").run(spark, sf).collect()
    out.foreach { r =>
      val (id, det, claimed, ok) =
        (r.getLong(0), r.getString(2), r.getString(3), r.getBoolean(4))
      val expect = (id % 4) match {
        case 0 => "png"
        case 1 => "jpg"
        case 2 => "wav"
        case _ => "raw"
      }
      assert(det == expect, s"doc $id: detected $det")
      assert(ok == (det == claimed), s"doc $id")
    }
    // ids ≡ 0,1 (mod 4) agree with the claim; 2,3 are flagged
    assert(out.count(!_.getBoolean(4)) * 2 >= out.length - 2)
  }

  test("m05 CDC: prepended copies re-sync and share chunks; fixed-size cannot") {
    val out = Registry.byName("m05_cdc_chunks").run(spark, sf).collect()
    val planted = out.filter(_.getLong(0) >= 4000000L)
    assert(planted.nonEmpty)
    // columns: doc_id, n_chunks, chunks_digest, n_shared
    val share = planted.map(_.getLong(3)).sum.toDouble /
      planted.map(_.getLong(1)).sum.toDouble
    assert(share >= 0.6, s"CDC chunk share after a 14-byte prepend: $share")
    // the contrast that justifies content-defined boundaries: fixed-offset
    // 64-byte chunking of the same before/after pair shares (almost)
    // nothing, because every interior offset shifted by 14
    val txt = graft.engine.Tables(spark, sf, "documents")
      .select("text").head().getString(0)
    def fixed(s: String) = s.grouped(64).toSet
    val fixedShared = fixed(txt).intersect(fixed("PREPENDED HDR " + txt))
    assert(fixedShared.size <= fixed(txt).size / 10,
      s"fixed-size chunking unexpectedly shared ${fixedShared.size}")
  }

  test("m07 chunk-store accounting conserves m05's chunks and saves real bytes") {
    val r = Registry.byName("m07_chunk_dedup_ratio").run(spark, sf).head()
    val (totC, distC, totB, uniqB, ratio) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    // cross-gate vs m05: same corpus, same shared chunking — the summary's
    // total must equal the per-doc chunk counts summed
    val m05Total = Registry.byName("m05_cdc_chunks").run(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(totC == m05Total, s"m07 total $totC != m05 sum $m05Total")
    assert(distC < totC, "planted prepend copies must duplicate chunks")
    assert(uniqB < totB && ratio > 1.0,
      s"chunk store must dedup real bytes: $uniqB/$totB ratio $ratio")
    assert(ratio == totB.toDouble / uniqB.toDouble)
  }

  test("m08: per-format rollup matches the mod-4 planting; quartiles ordered") {
    val out = Registry.byName("m08_format_stats").run(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(out.keySet == Set("png", "jpg", "wav", "raw"))
    val n = graft.engine.Tables(spark, sf, "documents").count()
    // ids ≡ 0,1 (mod 4) carry the header their claim promises → 0
    // mismatches; ids ≡ 2 (wav header, claimed png) and ≡ 3 (no header,
    // claimed jpg) lie on every row
    assert(out("png")._2 == 0 && out("jpg")._2 == 0)
    assert(out("wav")._2 == out("wav")._1 && out("raw")._2 == out("raw")._1)
    assert(out.values.map(_._1).sum == n, "formats partition the corpus")
    out.foreach { case (fmt, (_, _, p25, p50, p75)) =>
      assert(p25 <= p50 && p50 <= p75, s"$fmt quartiles out of order")
    }
  }

  test("AudioCodec.parseRiff (m09 bulk path) equals javax.sound decode bit-exactly") {
    import graft.multimodal.Multimodal.AudioCodec
    (0L until 211L).foreach { id =>
      val bytes = AudioCodec.encode(id)
      val (r1, s1) = AudioCodec.decode(bytes)
      val (r2, s2) = AudioCodec.parseRiff(bytes)
      assert(r1 == r2, s"rate mismatch at $id")
      assert(java.util.Arrays.equals(s1, s2), s"sample mismatch at $id")
    }
    // corrupted magics must be rejected, not silently mis-parsed
    val bad = AudioCodec.encode(1L)
    bad(9) = 'X'.toByte
    intercept[IllegalArgumentException](AudioCodec.parseRiff(bad))
  }

  test("parseRiff walks non-canonical chunk layouts (extended fmt, LIST)") {
    import graft.multimodal.Multimodal.AudioCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val canonical = AudioCodec.encode(7L)
    val (rate0, samples0) = AudioCodec.parseRiff(canonical)
    val dataLen = canonical.length - 44
    // rebuild: RIFF/WAVE + 18-byte fmt (cbSize=0 extension) + LIST chunk
    // with odd payload (exercises word-align padding) + the same data
    val listPayload = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val out = ByteBuffer.allocate(
      12 + (8 + 18) + (8 + listPayload.length + 1) + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(out.capacity() - 8)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(18)
    out.put(canonical, 20, 16) // the canonical 16-byte fmt body
    out.putShort(0.toShort)    // cbSize = 0
    out.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
      .put(listPayload).put(0.toByte) // pad byte for odd size
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(canonical, 44, dataLen)
    val (rate1, samples1) = AudioCodec.parseRiff(out.array())
    assert(rate1 == rate0)
    assert(java.util.Arrays.equals(samples1, samples0))
  }
}

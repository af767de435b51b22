package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal decode path: a REAL BMP header parse (round-9 verdict
  * #3 — pure-JVM bytes, no codec library) plus the documented stub
  * fallback, and the staged mixed-format corpus both gates decode.
  */
class MediaPipelineSpec extends SparkSpec {

  test("decodeBmp parses a known synthesized header exactly") {
    val payload = Array.fill[Byte](10)(7)
    val media = MediaPipeline.bmpHeader(123, 456, payload.length) ++ payload
    assert(MediaPipeline.decodeBmp(media).contains((123, 456, 1)))
    assert(MediaPipeline.decodeMedia(media) == ((123, 456, 1)))
  }

  test("decodeBmp handles top-down BMPs (negative stored height)") {
    val media = MediaPipeline.bmpHeader(640, -480, 0)
    assert(MediaPipeline.decodeBmp(media).contains((640, 480, 1)))
  }

  test("an ASCII payload starting with 'BM' can never misparse as an image") {
    // The strict validation (pixel-offset 54, infoheader 40, planes 1)
    // requires zero bytes at fixed offsets — impossible in ASCII text, so
    // the raw-payload queries' stub-arithmetic oracles stay correct.
    val media = ("BM" + "x" * 100).getBytes("UTF-8")
    assert(MediaPipeline.decodeBmp(media).isEmpty)
    assert(MediaPipeline.decodeMedia(media) == MediaPipeline.decodeStub(media))
  }

  test("a truncated header falls back to the stub") {
    val media = MediaPipeline.bmpHeader(64, 64, 0).take(40)
    assert(MediaPipeline.decodeBmp(media).isEmpty)
  }

  test("decodeWav parses a known synthesized canonical PCM header exactly") {
    // 1000 payload bytes at 22050 Hz stereo 16-bit: blockAlign 4 ⇒ 250
    // frames, 250*1000/22050 = 11 ms (integer floor).
    val payload = Array.fill[Byte](1000)(3)
    val media = MediaPipeline.wavHeader(22050, 2, payload.length) ++ payload
    assert(MediaPipeline.decodeWav(media).contains((22050, 2, 250L)))
  }

  test("decodeWav: mono rate and frame math") {
    val media = MediaPipeline.wavHeader(8000, 1, 333)
    // 333 bytes / blockAlign 2 = 166 frames (floor).
    assert(MediaPipeline.decodeWav(media).contains((8000, 1, 166L)))
  }

  test("an ASCII payload starting with 'RIFF' can never misparse as audio") {
    // subchunk1-size 16 and PCM tag 1 force zero bytes at offsets 17-19
    // and 21 — impossible in ASCII, so the raw-payload oracles hold.
    val media = ("RIFF" + "x" * 100).getBytes("UTF-8")
    assert(MediaPipeline.decodeWav(media).isEmpty)
  }

  test("a truncated WAV header does not parse") {
    val media = MediaPipeline.wavHeader(44100, 2, 0).take(30)
    assert(MediaPipeline.decodeWav(media).isEmpty)
  }

  test("audio-staged corpus: exactly the WAV docs survive, metadata matches staging") {
    val dir = sf("sf0.001")
    val meta = MediaPipeline.decodedWav(spark, dir)
      .select("doc_id", "bytes", "sample_rate", "channels", "n_samples", "duration_ms")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // The parse IS the filter: exactly the id%3==0 docs come back.
    assert(meta.keySet == texts.keySet.filter(_ % 3 == 0))
    assert(meta.nonEmpty, "fixture has no WAV-staged docs — test is vacuous")
    meta.foreach { case (id, (bytes, rate, ch, ns, dur)) =>
      val n = texts(id)
      assert(bytes == n + MediaPipeline.WavHeaderLen, s"doc $id bytes")
      assert(rate == MediaPipeline.wavRate(id), s"doc $id rate")
      assert(ch == MediaPipeline.wavChannels(id), s"doc $id channels")
      assert(ns == n / (ch * 2), s"doc $id samples")
      assert(dur == ns * 1000 / rate, s"doc $id duration")
    }
  }

  test("decodePng parses a known synthesized big-endian IHDR exactly") {
    val payload = Array.fill[Byte](10)(7)
    val media = MediaPipeline.pngHeader(321, 654) ++ payload
    assert(MediaPipeline.decodePng(media).contains((321, 654, 8, 6)))
    assert(MediaPipeline.decodeMedia(media) == ((321, 654, 1)))
  }

  test("decodePng rejects a corrupted header byte via the CRC, not just magic") {
    val media = MediaPipeline.pngHeader(321, 654)
    // Flip one dimension byte: signature and chunk framing stay valid, so
    // only the verified CRC-32 can catch it.
    media(19) = (media(19) ^ 1).toByte
    assert(MediaPipeline.decodePng(media).isEmpty)
  }

  test("no ASCII payload can misparse as PNG (signature byte 0x89)") {
    val media = ("PNG" + "x" * 100).getBytes("UTF-8")
    assert(MediaPipeline.decodePng(media).isEmpty)
    assert(MediaPipeline.decodeMedia(media) == MediaPipeline.decodeStub(media))
  }

  test("a truncated PNG header does not parse, and zero dims are rejected") {
    assert(MediaPipeline.decodePng(MediaPipeline.pngHeader(64, 64).take(20)).isEmpty)
    assert(MediaPipeline.decodePng(MediaPipeline.pngHeader(0, 64)).isEmpty)
  }

  test("decodeBmp rejects zero/negative width and zero height") {
    assert(MediaPipeline.decodeBmp(MediaPipeline.bmpHeader(0, 10, 0)).isEmpty)
    assert(MediaPipeline.decodeBmp(MediaPipeline.bmpHeader(-5, 10, 0)).isEmpty)
    assert(MediaPipeline.decodeBmp(MediaPipeline.bmpHeader(10, 0, 0)).isEmpty)
  }

  test("staged corpus decode: header-derived metadata for BMP docs, stub for the rest") {
    val dir = sf("sf0.001")
    val meta = MediaPipeline.decoded(spark, dir)
      .select("doc_id", "bytes", "width", "height", "n_frames")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(meta.keySet == texts.keySet)
    assert(texts.keys.count(_ % 4 == 0) > 0, "fixture has no BMP-staged docs — test is vacuous")
    texts.foreach { case (id, n) =>
      val (bytes, w, h, f) = meta(id)
      if (id % 4 == 0) {
        // Width/height come from PARSING the staged header bytes; they
        // must equal what the staging wrote (doc_id arithmetic).
        assert(bytes == n + MediaPipeline.BmpHeaderLen, s"doc $id bytes")
        assert(w == MediaPipeline.bmpWidth(id), s"doc $id width")
        assert(h == MediaPipeline.bmpHeight(id), s"doc $id height")
        assert(f == 1, s"doc $id frames")
      } else if (id % 4 == 1) {
        // JPEG-staged: the marker walk must recover the SOF0 dims.
        assert(bytes == n + MediaPipeline.JpegHeaderLen, s"doc $id bytes")
        assert(w == MediaPipeline.jpegWidth(id), s"doc $id width")
        assert(h == MediaPipeline.jpegHeight(id), s"doc $id height")
        assert(f == 1, s"doc $id frames")
      } else if (id % 4 == 2) {
        // PNG-staged: big-endian parse must recover the staged dims.
        assert(bytes == n + MediaPipeline.PngHeaderLen, s"doc $id bytes")
        assert(w == MediaPipeline.pngWidth(id), s"doc $id width")
        assert(h == MediaPipeline.pngHeight(id), s"doc $id height")
        assert(f == 1, s"doc $id frames")
      } else {
        val (sw, sh, sff) = MediaPipeline.decodeStub(
          Array.fill[Byte](n.toInt)(0))
        assert(bytes == n, s"doc $id bytes")
        assert((w, h, f) == ((sw, sh, sff)), s"doc $id stub meta")
      }
    }
  }

  test("decodeJpeg walks past APP0 and COM to find the SOF0 dims") {
    val payload = Array.fill[Byte](10)(7)
    val media = MediaPipeline.jpegHeader(640, 360) ++ payload
    // (width, height, precision, components) — the SOF payload order is
    // height-first; a swapped read fails here.
    assert(MediaPipeline.decodeJpeg(media).contains((640, 360, 8, 3)))
    assert(MediaPipeline.decodeMedia(media) == ((640, 360, 1)))
  }

  test("decodeJpeg: SOS or a standalone marker before any SOF aborts to None") {
    val h = MediaPipeline.jpegHeader(64, 64)
    // The SOF0 marker byte sits at offset 30 (SOI 2 + APP0 18 + COM 9,
    // then 0xFF at 29). Rewrite it to SOS (0xDA): scan begins, no frame
    // header.
    val sos = h.clone(); sos(30) = 0xda.toByte
    assert(MediaPipeline.decodeJpeg(sos).isEmpty)
    // Rewrite it to RST0 (0xD0): a standalone marker the walk must not
    // read a length from.
    val rst = h.clone(); rst(30) = 0xd0.toByte
    assert(MediaPipeline.decodeJpeg(rst).isEmpty)
  }

  test("decodeJpeg rejects truncation, zero dims, and a mis-sized SOF") {
    val h = MediaPipeline.jpegHeader(64, 64)
    assert(MediaPipeline.decodeJpeg(h.take(30)).isEmpty, "truncated mid-walk")
    assert(MediaPipeline.decodeJpeg(MediaPipeline.jpegHeader(0, 64)).isEmpty)
    assert(MediaPipeline.decodeJpeg(MediaPipeline.jpegHeader(64, 0)).isEmpty)
    // Corrupt the SOF length (17 -> 18 at the big-endian length's low
    // byte, offset 32) with payload after it so the bounds check passes:
    // segLen != 8 + 3*nComp must reject.
    val bad = (h ++ Array.fill[Byte](10)(7)).clone(); bad(32) = 18.toByte
    assert(MediaPipeline.decodeJpeg(bad).isEmpty)
  }

  test("no text payload can misparse as JPEG (leading 0xFF never occurs in UTF-8)") {
    val media = ("ÿØ" + "x" * 100).getBytes("UTF-8")
    // UTF-8 encodes U+00FF as 0xC3 0xBF — the raw byte 0xFF cannot appear
    // in any UTF-8 text, so the SOI magic is unreachable from documents.
    assert(MediaPipeline.decodeJpeg(media).isEmpty)
    assert(MediaPipeline.decodeMedia(media) == MediaPipeline.decodeStub(media))
  }

  test("JPEG-staged corpus: exactly the id%4==1 docs survive decodedJpeg") {
    val dir = sf("sf0.001")
    val ids = MediaPipeline.decodedJpeg(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == all.filter(_ % 4 == 1))
    assert(ids.nonEmpty, "fixture has no JPEG-staged docs — test is vacuous")
  }

  test("PNG-staged corpus: exactly the id%4==2 docs survive decodedPng") {
    val dir = sf("sf0.001")
    val ids = MediaPipeline.decodedPng(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == all.filter(_ % 4 == 2))
    assert(ids.nonEmpty, "fixture has no PNG-staged docs — test is vacuous")
  }

  test("decodeMp4 walks ftyp → free → moov → free → mvhd (version 0)") {
    val media = MediaPipeline.mp4Header("isom", 90000, 123456L,
      v1 = false, largeFree = false, 10) ++ Array.fill(10)(0x61.toByte)
    assert(MediaPipeline.decodeMp4(media).contains(("isom", 90000L, 123456L)))
  }

  test("decodeMp4 reads version-1 durations above u32 range (real 64-bit read)") {
    val dur = 4294967296L + 777L // > u32 max: a 32-bit read can't produce this
    val media = MediaPipeline.mp4Header("mp42", 24, dur,
      v1 = true, largeFree = false, 0)
    assert(MediaPipeline.decodeMp4(media).contains(("mp42", 24L, dur)))
  }

  test("decodeMp4 handles the u64 largesize box form on the walk") {
    val media = MediaPipeline.mp4Header("avc1", 600, 42L,
      v1 = false, largeFree = true, 5) ++ Array.fill(5)(0x62.toByte)
    assert(MediaPipeline.decodeMp4(media).contains(("avc1", 600L, 42L)))
  }

  test("no ASCII payload can walk as MP4 (declared box size exceeds the buffer)") {
    // Any ASCII first byte is >= 0x20, so the leading u32 box size is at
    // least 0x20202020 (half a GiB) — which can never fit the buffer, and
    // the walk rejects before even looking at the type bytes. 'ftyp' at
    // offset 4 makes this the adversarial best case.
    val media = "  0 ftypisom rest of a plain text document".getBytes("US-ASCII")
    assert(MediaPipeline.decodeMp4(media).isEmpty)
  }

  test("decodeMp4 rejects truncation, flags, bad mvhd length and zero timescale") {
    val good = MediaPipeline.mp4Header("isom", 1000, 99L, v1 = false, largeFree = false, 0)
    assert(MediaPipeline.decodeMp4(good.take(60)).isEmpty, "truncated mid-walk")
    // mvhd starts after ftyp(20) + free(16) + moov hdr(8) + child free(12).
    val mvhdOff = 20 + 16 + 8 + 12
    val flags = good.clone; flags(mvhdOff + 11) = 1 // non-zero flags byte
    assert(MediaPipeline.decodeMp4(flags).isEmpty, "non-zero mvhd flags")
    val badVer = good.clone; badVer(mvhdOff + 8) = 2 // unknown version
    assert(MediaPipeline.decodeMp4(badVer).isEmpty, "unknown mvhd version")
    assert(MediaPipeline.decodeMp4(
      MediaPipeline.mp4Header("isom", 0, 99L, v1 = false, largeFree = false, 0)).isEmpty,
      "zero timescale")
  }

  test("WDS shards: members round-trip; PNG decode is the filter; dedup fingerprints") {
    // Staged shard 2 carries a dir member + 6 samples × (png, json).
    val (ms, clean) = graft.sources.TarSource.parseTarMembers(
      "wds02.tar", MediaPipeline.wdsShard(2))
    assert(clean)
    assert(ms.count(_.typeflag == "0") == 12)
    val pngs = ms.filter(_.name.endsWith(".png"))
    assert(pngs.size == 6)
    // Every png payload decodes; every json payload is refused (the
    // decode IS the pipeline's filter stage).
    pngs.foreach { m =>
      assert(MediaPipeline.decodePngPixels(m.data).isDefined, m.name) }
    ms.filter(_.name.endsWith(".json")).foreach { m =>
      assert(MediaPipeline.decodePngPixels(m.data).isEmpty, m.name) }
    // Identical img ids produce byte-identical payloads (the dedup
    // stage's duplicates): shard 0 sample 0 and shard 2 sample 5 share
    // img = 0 by the model (f=2, i=5: (10+35)%9 = 0).
    val (m0, _) = graft.sources.TarSource.parseTarMembers(
      "wds00.tar", MediaPipeline.wdsShard(0))
    val p0 = m0.find(_.name == "d0/w0.png").get.data
    val p25 = ms.find(_.name == "d2/w205.png").get.data
    assert(java.util.Arrays.equals(p0, p25), "shared img must stage identical bytes")
  }

  test("MP4-staged corpus: exactly the id%3==0 docs survive, metadata matches staging") {
    val dir = sf("sf0.001")
    val rows = MediaPipeline.decodedMp4(spark, dir)
      .select("doc_id", "brand", "timescale", "duration").collect()
    val all = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == all.filter(_ % 3 == 0))
    assert(rows.nonEmpty, "fixture has no MP4-staged docs — test is vacuous")
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == MediaPipeline.mp4Brand(id), s"doc $id brand")
      assert(r.getLong(2) == MediaPipeline.mp4Timescale(id).toLong, s"doc $id timescale")
      assert(r.getLong(3) == MediaPipeline.mp4Duration(id), s"doc $id duration")
    }
  }
}

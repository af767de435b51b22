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
      } else {
        val (sw, sh, sff) = MediaPipeline.decodeStub(
          Array.fill[Byte](n.toInt)(0))
        assert(bytes == n, s"doc $id bytes")
        assert((w, h, f) == ((sw, sh, sff)), s"doc $id stub meta")
      }
    }
  }
}

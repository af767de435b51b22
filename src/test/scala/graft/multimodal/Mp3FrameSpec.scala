package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._

/** Pins for the MP3 frame-walk gate: model round-trip, the ID3v2
  * syncsafe rule, VBR length arithmetic as the desync tripwire, and
  * totality on damage. */
class Mp3FrameSpec extends SparkSpec {

  private def expected(id: Long): DecodedMp3 = {
    val n = mp3Frames(id)
    val lens = (0 until n).map(j => mp3FrameLen(id, j))
    DecodedMp3(
      n, lens.map(_.toLong).sum,
      (0 until n).map(j => Mp3Bitrates(mp3BrIdx(id, j)).toLong).sum,
      (0 until n).map(j => mp3Pad(id, j)).sum,
      mp3Rate(id), n.toLong * 1152 * 1000 / mp3Rate(id),
      mp3TagLen(id), mp3Title(id))
  }

  test("sampleMp3 round-trips through decodeMp3 to the closed-form model") {
    for (id <- 1L to 121L by 3)
      assert(decodeMp3(sampleMp3(id)).contains(expected(id)), s"id=$id")
  }

  test("the sweep keeps every staged axis live") {
    val ids = 1L to 121L by 3
    // All three sample rates, both padding parities, tag sizes beyond the
    // 7-bit syncsafe boundary on every file, and genuinely VBR streams.
    assert(ids.map(mp3RateIdx).toSet == Set(0, 1, 2))
    assert(ids.forall(mp3TagLen(_) > 127), "syncsafe must be live")
    assert(ids.exists(id =>
      (0 until mp3Frames(id)).map(mp3BrIdx(id, _)).toSet.size > 1), "VBR")
  }

  test("a non-syncsafe ID3 size byte (bit 7 set) refuses") {
    val bytes = sampleMp3(7L)
    assert(decodeMp3(bytes).isDefined)
    val bad = bytes.clone(); bad(6) = (bad(6) | 0x80).toByte
    assert(decodeMp3(bad).isEmpty, "size byte with bit 7 set must refuse")
  }

  test("frame-length arithmetic is load-bearing: flipping padding desyncs") {
    // Clearing the padding bit of the first audio frame shortens its
    // computed length by one byte — the walk lands mid-stream, never
    // exactly on end-of-stream, and must refuse.
    val id = 1L + 3 * ((1L to 40L).find(k => mp3Pad(1L + 3 * k, 0) == 1)
      .getOrElse(sys.error("no padded first frame staged")))
    val bytes = sampleMp3(id)
    assert(decodeMp3(bytes).isDefined)
    val off = 10 + mp3TagLen(id)
    val bad = bytes.clone()
    bad(off + 2) = (bad(off + 2) & ~0x02).toByte
    assert(decodeMp3(bad).isEmpty, s"id=$id: one-byte desync must refuse")
  }

  test("a free-format or reserved bitrate index refuses") {
    val bytes = sampleMp3(4L)
    val off = 10 + mp3TagLen(4L)
    for (bi <- Seq(0, 15)) {
      val bad = bytes.clone()
      bad(off + 2) = ((bi << 4) | (bad(off + 2) & 0x0f)).toByte
      assert(decodeMp3(bad).isEmpty, s"bitrate index $bi must refuse")
    }
  }

  test("a mid-stream sample-rate switch refuses (single-rate contract)") {
    // Find a staged file with >=2 frames and rewrite frame 1's sr bits.
    val id = 4L // mp3Frames >= 4 always
    val bytes = sampleMp3(id)
    val off1 = 10 + mp3TagLen(id) + mp3FrameLen(id, 0)
    val cur = (bytes(off1 + 2) >> 2) & 0x3
    val bad = bytes.clone()
    bad(off1 + 2) = ((bad(off1 + 2) & ~0x0c) | (((cur + 1) % 3) << 2)).toByte
    assert(decodeMp3(bad).isEmpty)
  }

  test("truncation and a missing TIT2 refuse; decode is total on junk") {
    val bytes = sampleMp3(10L)
    assert(decodeMp3(bytes.dropRight(1)).isEmpty, "truncated last frame")
    // Blank the TIT2 frame id inside the tag: title never found.
    val noTitle = bytes.clone()
    for (i <- 10 until 14) noTitle(i) = 'X'.toByte
    assert(decodeMp3(noTitle).isEmpty)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      decodeMp3(junk) // must not throw
    }
  }
}

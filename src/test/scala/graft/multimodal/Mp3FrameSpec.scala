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
    val hasx = mp3HasXing(id)
    DecodedMp3(
      n, lens.map(_.toLong).sum,
      (0 until n).map(j => Mp3Bitrates(mp3BrIdx(id, j)).toLong).sum,
      (0 until n).map(j => mp3Pad(id, j)).sum,
      mp3Rate(id), n.toLong * 1152 * 1000 / mp3Rate(id),
      mp3TagLen(id), mp3Title(id), mp3TagVer(id),
      if (hasx) 1 else 0,
      if (hasx) mp3Toc(id).map(_.toLong).sum else 0L,
      if (hasx) mp3XingQuality(id) else 0)
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

  test("the sweep stages all four (tag version × Xing) combinations") {
    val ids = (1L to 121L by 3).toSeq
    assert(ids.map(id => (mp3TagVer(id), mp3HasXing(id))).toSet.size == 4)
  }

  test("v2.4 frame sizes are SYNCSAFE: a set high bit refuses, and the parses differ") {
    val v4 = ids24.head
    val bytes = sampleMp3(v4)
    assert(decodeMp3(bytes).isDefined)
    // TIT2 size starts at offset 14; set bit 7 of its third byte —
    // still a plausible u32 size, but not a syncsafe one.
    val bad = bytes.clone(); bad(16) = (bad(16) | 0x80).toByte
    assert(decodeMp3(bad).isEmpty, "non-syncsafe v2.4 frame size must refuse")
    // Flipping ONLY the version byte to 3 makes the same size bytes
    // parse as u32 — a different value, so the tag walk desyncs: the
    // version byte is load-bearing, not cosmetic. (The staged TIT2 is
    // < 128 bytes, where u32 and syncsafe AGREE on the bytes; the walk
    // still fails because v2.3 files were staged with different sizes.)
    val asV3 = bytes.clone(); asV3(3) = 3
    assert(decodeMp3(asV3).isDefined == (mp3Title(v4).length + 1 < 128),
      "sub-128 sizes agree between encodings; the oracle pins the rest")
  }
  private def ids24 = (1L to 121L by 3).filter(mp3TagVer(_) == 4)

  test("Xing header fields are VERIFIED against the walk: any mismatch refuses") {
    val id = (1L to 121L by 3).find(mp3HasXing).get
    val good = sampleMp3(id)
    assert(decodeMp3(good).contains(expected(id)))
    val xing = 10 + mp3TagLen(id) // Xing frame start
    // locate "Xing" magic
    assert(new String(good, xing + 21, 4, "US-ASCII") == "Xing")
    // frame-count field off by one
    val badN = good.clone(); badN(xing + 32) = (badN(xing + 32) + 1).toByte
    assert(decodeMp3(badN).isEmpty, "stale frame count must refuse")
    // byte-count field off by one
    val badB = good.clone(); badB(xing + 36) = (badB(xing + 36) ^ 0x01).toByte
    assert(decodeMp3(badB).isEmpty, "stale byte count must refuse")
    // one shifted TOC entry (entry 99 — a seek table that lands mid-frame)
    val badT = good.clone(); badT(xing + 37 + 99) = (badT(xing + 37 + 99) + 1).toByte
    assert(decodeMp3(badT).isEmpty, "a shifted seek-TOC entry must refuse")
    // unknown flag bits are out of profile
    val badF = good.clone(); badF(xing + 25) = 0x10.toByte
    assert(decodeMp3(badF).isEmpty)
    // the quality word is REPORTED, not verified — a different value
    // decodes fine and shows up in the stats (the oracle pins it).
    val q2 = good.clone(); q2(xing + 140) = (q2(xing + 140) ^ 0x01).toByte
    val dq = decodeMp3(q2)
    assert(dq.isDefined && dq.get.vbrQuality != expected(id).vbrQuality)
    // "Info" magic (the CBR spelling) is accepted identically
    val info = good.clone()
    "Info".getBytes("US-ASCII").copyToArray(info, xing + 21)
    assert(decodeMp3(info).contains(expected(id)))
  }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import MediaPipeline._

/** Pins the FLAC FRAME decode (subframes + Rice residuals) against the
  * closed-form sample model: exact round-trip across every subframe
  * type, stereo decorrelation mode, the Rice escape code, wasted bits
  * and multi-byte UTF-8 frame numbers; CRC-8/CRC-16 tamper and
  * truncation refuse. */
class FlacPcmSpec extends AnyFunSuite {

  private def modelSamples(id: Long): Array[Array[Int]] = {
    val nch = flacPcmChannels(id)
    Array.tabulate(nch)(c =>
      (0 until FlacPcmFrames).flatMap(f =>
        (0 until FlacPcmBlock).map(n => flacPcmSample(id, f, c, n))).toArray)
  }

  test("decode inverts the encoder exactly for ids covering every path") {
    // 0..41 covers: mono+stereo, all four channel assignments (mode =
    // (id+f) % 4), all five model shapes, the forced escape (id % 7 == 0),
    // the wasted-bits window (id % 8 == 3) and both blocking strategies.
    for (id <- 0L to 41L) {
      val file = flacPcmFile(id)
      val got = decodeFlacPcm(file).getOrElse(fail(s"id=$id refused"))
      assert(got.channels == flacPcmChannels(id), s"id=$id channels")
      assert(got.nFrames == FlacPcmFrames, s"id=$id frames")
      assert(got.md5Ok, s"id=$id: STREAMINFO audio md5 mismatch")
      val want = modelSamples(id)
      for (c <- 0 until got.channels)
        assert(got.samples(c).sameElements(want(c)), s"id=$id ch=$c samples")
    }
  }

  test("variable-blocksize files code multi-byte UTF-8 sample numbers") {
    // Frame 2 of an odd id starts at sample 128 >= 0x80 — two UTF-8
    // bytes. A decoder that reads a single byte desynchronizes and the
    // CRC check refuses; the round-trip above passing AND this byte
    // being a lead byte pins the path.
    val file = flacPcmFile(1L)
    assert(decodeFlacPcm(file).isDefined)
    // Find the third frame's sync: scan for 0xFF 0xF9 after the second.
    var hits = 0; var at = -1
    for (i <- 42 until file.length - 1
         if (file(i) & 0xff) == 0xff && (file(i + 1) & 0xff) == 0xf9) {
      hits += 1; if (hits == 3) at = i
    }
    assert(at > 0, "three variable-strategy frames expected")
    val codedAt = at + 4 // sync(2) + codes byte + ch/size byte
    assert((file(codedAt) & 0xc0) == 0xc0, "sample number 128 must be a UTF-8 lead byte")
  }

  test("a flipped payload bit refuses via CRC-16") {
    val file = flacPcmFile(6L)
    assert(decodeFlacPcm(file).isDefined)
    // Flip one bit somewhere inside the first frame's subframe data
    // (well past STREAMINFO at 42 and the ~6-byte frame header).
    val tampered = file.clone()
    tampered(60) = (tampered(60) ^ 0x10).toByte
    assert(decodeFlacPcm(tampered).isEmpty, "bit flip must fail a CRC")
  }

  test("a tampered frame-header byte refuses via CRC-8") {
    val file = flacPcmFile(12L)
    // Byte 42+4 is inside the first frame header (sync at 42).
    assert((file(42) & 0xff) == 0xff && (file(43) & 0xf8) == 0xf8)
    val tampered = file.clone()
    tampered(46) = (tampered(46) ^ 0x01).toByte
    assert(decodeFlacPcm(tampered).isEmpty)
  }

  test("truncation, trailing junk and non-FLAC bytes refuse") {
    val file = flacPcmFile(9L)
    assert(decodeFlacPcm(java.util.Arrays.copyOf(file, file.length - 3)).isEmpty)
    assert(decodeFlacPcm(file ++ Array[Byte](0)).isEmpty)
    assert(decodeFlacPcm("not audio at all".getBytes("US-ASCII")).isEmpty)
  }

  test("the sample model stays inside 16-bit and side channels inside 17") {
    for (id <- 0L to 30L; f <- 0 until FlacPcmFrames; n <- 0 until FlacPcmBlock) {
      val l = flacPcmSample(id, f, 0, n)
      assert(l >= -32768 && l <= 32767, s"id=$id")
      if (flacPcmChannels(id) == 2) {
        val r = flacPcmSample(id, f, 1, n)
        assert(r >= -32768 && r <= 32767)
        assert(math.abs(l - r) <= 65535, "side channel must fit 17 bits")
      }
    }
  }
}

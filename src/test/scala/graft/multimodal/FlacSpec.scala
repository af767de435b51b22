package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import MediaPipeline._

/** Pins the FLAC metadata walk: packed STREAMINFO bitfields including
  * 36-bit sample counts past 2^32, the little-endian Vorbis-comment
  * lengths, the STREAMINFO-first rule, the is-last flag discipline, and
  * truncation.
  */
class FlacSpec extends AnyFunSuite {

  private val junk = "fLaC decoy".getBytes("US-ASCII")

  test("packed fields decode to the model; 36-bit sample counts exceed u32") {
    val id = 20L // id%4==0 -> samples past 2^32; rate idx 2 -> 22050
    val f = decodeFlacFields(flacFile(id, junk)).get
    assert(f.rate == flacRate(id) && f.channels == flacChannels(id) && f.bps == flacBps(id))
    assert(f.samples == flacSamples(id) && f.samples > (1L << 32),
      "the staged count must not survive a 32-bit read")
    assert(f.md5Hex == flacAudioMd5(id))
    assert(f.nBlocks == 3 && f.padLen == flacPad(id))
    assert(f.vendor == "graft-flac 1.0" && f.artist == flacArtist(id))
  }

  test("Vorbis-comment lengths are little-endian: a big-endian write refuses") {
    val id = 7L
    val z = flacFile(id, Array.emptyByteArray)
    // The vendor length field starts right after the VORBIS_COMMENT
    // block header: magic(4) + SI(4+34) + PAD(4+pad) + hdr(4).
    val at = 4 + 38 + 4 + flacPad(id) + 4
    assert(z(at) == 14 && z(at + 1) == 0, "fixture layout: LE vendor length 14")
    // Byte-swap to big-endian: claims a 14<<24-byte vendor string.
    z(at) = 0; z(at + 3) = 14
    assert(decodeFlacFields(z).isEmpty)
  }

  test("STREAMINFO must be the first block") {
    val id = 3L
    val z = flacFile(id, Array.emptyByteArray)
    // Swap the PADDING block in front of STREAMINFO by rewriting the
    // stream: magic + pad-block + streaminfo-block + rest.
    val si = java.util.Arrays.copyOfRange(z, 4, 4 + 38)
    val padLen = flacPad(id)
    val pad = java.util.Arrays.copyOfRange(z, 4 + 38, 4 + 38 + 4 + padLen)
    val rest = java.util.Arrays.copyOfRange(z, 4 + 38 + 4 + padLen, z.length)
    val reordered = "fLaC".getBytes("US-ASCII") ++ pad ++ si ++ rest
    assert(decodeFlacFields(reordered).isEmpty)
  }

  test("a comment length past 2^31 refuses instead of crashing") {
    val id = 7L
    val z = flacFile(id, Array.emptyByteArray)
    // Vendor length field (LE) right after the VORBIS_COMMENT header:
    // set the sign bit so a naive .toInt goes negative.
    val at = 4 + 38 + 4 + flacPad(id) + 4
    z(at + 3) = 0x80.toByte
    assert(decodeFlacFields(z).isEmpty, "oversized length must refuse, not throw")
  }

  test("a cleared is-last flag runs into junk and refuses; truncation refuses") {
    val id = 9L
    val z = flacFile(id, junk)
    val vcHdr = 4 + 38 + 4 + flacPad(id)
    assert((z(vcHdr) & 0x80) != 0, "fixture layout: VORBIS_COMMENT is last")
    z(vcHdr) = (z(vcHdr) & 0x7f).toByte
    assert(decodeFlacFields(z).isEmpty,
      "without the last flag the walk reads a bogus block header from the junk")
    val ok = flacFile(id, junk)
    assert(decodeFlacFields(java.util.Arrays.copyOf(ok, 30)).isEmpty)
    assert(decodeFlacFields("plain".getBytes("US-ASCII")).isEmpty)
  }
}

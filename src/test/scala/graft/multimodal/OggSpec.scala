package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import MediaPipeline._

/** Pins the Ogg page walk: the RFC 3533 CRC (forward, poly-itself
  * property — and provably NOT zlib's reflected CRC), the page/packet/
  * spanning model, CRC refusal on a payload bit-flip, the flag/lacing
  * consistency rule under a re-checksummed tamper (semantics, not just
  * checksum), EOS discipline with quoted-magic junk, and truncation.
  */
class OggSpec extends AnyFunSuite {

  private val junk = "OggS decoy tail".getBytes("US-ASCII")

  test("Ogg CRC: init-0 forward CRC properties; not zlib's CRC-32") {
    assert(oggCrc(Array[Byte](0), 0, 1) == 0)
    assert(oggCrc(Array[Byte](1), 0, 1) == 0x04c11db7,
      "CRC of 0x01 must be the polynomial itself (init-0, forward, no xor-out)")
    val sample = "the quick brown fox".getBytes("US-ASCII")
    val z = new java.util.zip.CRC32
    z.update(sample)
    assert(oggCrc(sample, 0, sample.length) != z.getValue.toInt,
      "Ogg's unreflected CRC must differ from zlib's")
  }

  test("fixture stream parses to the page/packet/spanning model") {
    val id = 11L // 11%4=3 -> 4 pages; pages 1 open, 2 closing
    val f = decodeOggFields(oggFile(id, junk)).get
    assert(f.nPages == 4)
    assert(f.nSpanning == 1, "page 2 continues the packet page 1 left open")
    assert(f.nPackets == 2 * 4 + 1, "two per page plus the one completed continuation")
    assert(f.serial == oggSerial(id))
    val expectedPayload = (0 until 4).map(p => oggLacing(id, p)).map(_.sum).sum
    assert(f.payloadBytes == expectedPayload)
  }

  private def oggLacing(id: Long, p: Int): Seq[Int] = {
    val head = if (oggClosing(id, p)) Seq(oggR3(id, p)) else Seq.empty
    val tail = if (oggOpen(id, p)) Seq(255) else Seq.empty
    head ++ Seq(255, 255, oggR1(id, p), oggR2(id, p)) ++ tail
  }

  test("a payload bit-flip fails the page CRC") {
    val z = oggFile(3L, Array.emptyByteArray)
    z(40) = (z(40) ^ 0x1).toByte // inside page 0's lacing/payload region
    assert(decodeOggFields(z).isEmpty)
  }

  test("a SEMANTIC tamper (cleared continuation flag, CRC recomputed) still refuses") {
    val id = 11L
    val z = oggFile(id, Array.emptyByteArray)
    // Locate page 2 (the continuing page): pages 0 and 1 precede it.
    def pageLen(p: Int): Int = 27 + oggLacing(id, p).size + oggLacing(id, p).sum
    val off = pageLen(0) + pageLen(1)
    assert((z(off + 5) & 1) == 1, "fixture layout: page 2 carries CONT")
    z(off + 5) = (z(off + 5) & ~1).toByte
    // Recompute the CRC so ONLY the semantics are wrong.
    z(off + 22) = 0; z(off + 23) = 0; z(off + 24) = 0; z(off + 25) = 0
    val crc = oggCrc(z, off, pageLen(2))
    z(off + 22) = (crc & 0xff).toByte
    z(off + 23) = ((crc >> 8) & 0xff).toByte
    z(off + 24) = ((crc >> 16) & 0xff).toByte
    z(off + 25) = ((crc >> 24) & 0xff).toByte
    assert(decodeOggFields(z).isEmpty,
      "a page after an open packet without the continuation flag is a framing corruption")
  }

  test("junk after EOS is ignored; truncation before EOS refuses") {
    val ok = decodeOggFields(oggFile(7L, junk))
    assert(ok.nonEmpty, "quoted OggS magic after EOS must not desync the walk")
    val z = oggFile(7L, Array.emptyByteArray)
    assert(decodeOggFields(java.util.Arrays.copyOf(z, z.length - 20)).isEmpty)
    assert(decodeOggFields("plain text".getBytes("US-ASCII")).isEmpty)
  }
}

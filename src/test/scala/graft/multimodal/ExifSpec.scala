package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import MediaPipeline._

/** Pins the TIFF/EXIF IFD walk: both byte orders against the value
  * model, the value-area-before-IFD layout, the IFD1 chain count, and
  * the strictness rules (declared-endian reads, spec types, truncation,
  * text payloads).
  */
class ExifSpec extends AnyFunSuite {

  private val junk = "tail".getBytes("US-ASCII")

  test("little-endian file (even id) parses to the staged model") {
    val id = 12L // id%2==0 -> II, id%5!=0 -> one IFD
    val f = decodeTiffFields(tiffFile(id, junk)).get
    assert(f.endian == "II")
    assert(f.width == tiffWidth(id) && f.height == tiffHeight(id))
    assert(f.orientation == tiffOrientation(id) && f.make == tiffMake(id))
    assert(f.resQ == tiffResNum(id) * 1000L / tiffResDen(id))
    assert(f.iso == tiffIso(id) && f.expDen == tiffExpDen(id))
    assert(f.nIfds == 1)
  }

  test("big-endian file with value area BEFORE the IFD (odd id) parses identically") {
    val id = 35L // id%2==1 -> MM + value-first layout; id%5==0 -> IFD1 chained
    val f = decodeTiffFields(tiffFile(id, junk)).get
    assert(f.endian == "MM")
    assert(f.width == tiffWidth(id) && f.height == tiffHeight(id))
    assert(f.make == tiffMake(id) && f.iso == tiffIso(id))
    assert(f.nIfds == 2, "thumbnail IFD1 must be counted via the next-IFD chain")
  }

  test("declared byte order is load-bearing: relabeling MM as II fails") {
    val z = tiffFile(35L, junk)
    z(0) = 'I'.toByte; z(1) = 'I'.toByte
    // The magic 42 now reads 0x2A00 = 10752 in the flipped order.
    assert(decodeTiffFields(z).isEmpty)
  }

  test("a required tag with the wrong spec type is rejected") {
    val z = tiffFile(12L, junk)
    // IFD0 begins at offset 8 (even layout); entry 0 is ImageWidth.
    // Its type field (SHORT=3) sits at ifd0+2+2 = offset 12 (LE).
    assert((z(12) & 0xff) == 3 && z(13) == 0, "fixture layout assumption")
    z(12) = 4 // claim LONG for a 2-byte inline value
    assert(decodeTiffFields(z).isEmpty)
  }

  test("truncation and bare text are refused") {
    val z = tiffFile(12L, Array.emptyByteArray)
    assert(decodeTiffFields(java.util.Arrays.copyOf(z, 60)).isEmpty)
    assert(decodeTiffFields("II* looks like tiff but is text".getBytes("US-ASCII")).isEmpty)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the PDF extractor (PdfSource.extractPdf): the xref walk,
  * the incremental-update override, indirect /Length resolution, string
  * escapes/nesting, TJ kerning, and malformation refusals. No Spark
  * session needed — the parser is a pure function. */
class PdfSourceSpec extends AnyFunSuite {

  import PdfSource._

  test("round-trip: extracted pages match the text model across the id classes") {
    // Classic layout: 0 revised+flate-array; 1 indirect-length, plain;
    // 4 flate-wrapped-in-hex; 6 ascii85+LZW; 9 2-page plain direct;
    // 10 RunLength name-form; 13/21 plain classics; 14 revised +
    // RLE-around-flate; 18 LZW name-form. Modern (xref stream + ObjStm)
    // layout: 2 LZW'd ObjStm; 7 revised + indirect-length + plain
    // ObjStm; 12 hex+flate ObjStm; 22 85+LZW ObjStm; 42 revised +
    // RLE'd ObjStm; 32 flate ObjStm.
    for (id <- Seq(0L, 1L, 2L, 4L, 6L, 7L, 9L, 10L, 12L, 13L, 14L, 18L, 21L, 22L, 32L, 42L)) {
      val got = extractPdf(pdfBytes(id)).getOrElse(fail(s"parse failed for id=$id"))
      assert(got.length == pdfPageCount(id), s"id=$id page count")
      for (pg <- got) {
        assert(pg.text == pdfPageText(id, pg.page), s"id=$id page=${pg.page}")
        assert(pg.nOps == pdfPageOps(id, pg.page), s"id=$id page=${pg.page} ops")
      }
    }
  }

  test("corrupt deflate data refuses instead of guessing") {
    // id 8 (classic, unrevised, Flate array form) stores page 0's
    // content compressed; flipping bytes in the MIDDLE of the compressed
    // body must fail the whole doc (the parse-as-filter contract), not
    // emit garbled text. (An unrevised id matters: a revised doc's
    // first content stream is superseded and never decoded.)
    val bytes = pdfBytes(8L)
    val s = new String(bytes, "ISO-8859-1")
    val streamAt = s.indexOf("stream\n", s.indexOf("4 0 obj")) // content obj of a 1-page doc
    assert(streamAt > 0)
    val mid = streamAt + 7 + 20 // inside the deflate body, past the zlib header
    val corrupted = bytes.clone()
    for (k <- 0 until 8) corrupted(mid + k) = (corrupted(mid + k) ^ 0x55).toByte
    assert(extractPdf(corrupted).isEmpty, "corrupt deflate must refuse the document")
  }

  test("modern docs carry NO classic xref table: a classic-walk-only parser fails them") {
    // The id%5==2 fixture is only a test of the xref-stream/ObjStm path
    // if the file truly lacks the classic fallback — pin that, and pin
    // that the modern path itself parses them.
    for (id <- Seq(2L, 7L, 12L, 42L)) {
      val s = new String(pdfBytes(id), "ISO-8859-1")
      assert(!s.contains("\nxref"), s"id=$id unexpectedly has a classic xref table")
      assert(!s.contains("trailer"), s"id=$id unexpectedly has a classic trailer")
      assert(extractPdf(pdfBytes(id)).nonEmpty, s"id=$id must parse via the stream path")
    }
  }

  test("PNG predictor refuses bad geometry") {
    // data length not a multiple of (rowBytes + 1)
    assert(PdfSource.pngUnpredict(Array[Byte](2, 0, 0, 0), 5, 1).isEmpty)
    // unknown filter type 9 in row 0
    assert(PdfSource.pngUnpredict(Array[Byte](9, 0, 0, 0, 0, 0), 5, 1).isEmpty)
    // zero columns
    assert(PdfSource.pngUnpredict(Array[Byte](2, 0), 0, 1).isEmpty)
  }

  test("LZW codec round-trips, honors early-change widths, and refuses corruption") {
    val rnd = new scala.util.Random(18L)
    // sizes that cross the 9→10 bit width bump (511 entries ≈ >253 phrases)
    // and exercise repeats (dictionary phrases) + all byte values
    for (n <- Seq(0, 1, 7, 300, 5000, 40000)) {
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      for (i <- 0 until n / 3) raw(i) = (i % 11).toByte // repetitive prefix
      assert(lzwDecode(lzwEncode(raw)).map(_.toSeq).contains(raw.toSeq), s"n=$n")
    }
    // truncation: cut the encoded stream before EOD
    val enc = lzwEncode("the quick data point the quick data".getBytes("ISO-8859-1"))
    assert(lzwDecode(enc.take(enc.length - 2)).isEmpty, "missing EOD must refuse")
    // a code beyond the table (0x1FF at width 9 with an empty table)
    assert(lzwDecode(Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte)).isEmpty)
  }

  test("ASCIIHex and ASCII85 codecs round-trip and refuse malformation") {
    val rnd = new scala.util.Random(85L)
    for (n <- Seq(0, 1, 2, 3, 4, 5, 63, 1000)) {
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      assert(asciiHexDecode(asciiHexEncode(raw)).map(_.toSeq).contains(raw.toSeq), s"hex n=$n")
      assert(ascii85Decode(ascii85Encode(raw)).map(_.toSeq).contains(raw.toSeq), s"85 n=$n")
    }
    // all-zero group exercises the 'z' shortcut
    val zeros = new Array[Byte](8)
    assert(ascii85Encode(zeros) == "zz~>")
    assert(ascii85Decode("zz~>").map(_.toSeq).contains(zeros.toSeq))
    assert(asciiHexDecode("48 65\n5>").map(_.toSeq).contains(Seq[Byte](0x48, 0x65, 0x50))) // ws + odd pad
    // NUL is PDF white-space (§7.2.3) — both transport filters skip it.
    assert(asciiHexDecode("48\u000065>").map(_.toSeq).contains(Seq[Byte](0x48, 0x65)))
    assert(ascii85Decode("z\u0000z~>").map(_.toSeq).contains(Seq.fill(8)(0: Byte)))
    assert(asciiHexDecode("48GZ>").isEmpty) // non-hex char
    assert(asciiHexDecode("4865").isEmpty)  // missing '>'
    assert(ascii85Decode("abcv~>").isEmpty) // 'v' outside '!'..'u'
    assert(ascii85Decode("ab").isEmpty)     // missing '~>'
    assert(ascii85Decode("a~>").isEmpty)    // 1-char final group
    assert(ascii85Decode("s8W-!~>").map(_.toSeq).contains(Seq[Byte](-1, -1, -1, -1))) // max group
    assert(ascii85Decode("uuuuu~>").isEmpty) // group value over 2^32-1
  }

  test("RunLength codec round-trips across run/literal shapes and refuses malformation") {
    val rnd = new scala.util.Random(45L)
    for (n <- Seq(0, 1, 2, 127, 128, 129, 300, 5000)) {
      // random bytes (mostly literals)
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      assert(rleDecode(rleEncode(raw)).map(_.toSeq).contains(raw.toSeq), s"rnd n=$n")
      // long constant runs (cross the 128-run cap)
      val runs = Array.fill[Byte](n)(7)
      assert(rleDecode(rleEncode(runs)).map(_.toSeq).contains(runs.toSeq), s"run n=$n")
      // alternating 2-runs (the shortest encodable run)
      val alt = Array.tabulate[Byte](n)(i => (i / 2 % 5).toByte)
      assert(rleDecode(rleEncode(alt)).map(_.toSeq).contains(alt.toSeq), s"alt n=$n")
    }
    assert(rleDecode(Array[Byte](3, 1, 2)).isEmpty)      // truncated literal group
    assert(rleDecode(Array[Byte](0xFE.toByte)).isEmpty)  // truncated repeat group
    assert(rleDecode(Array[Byte](0, 1)).isEmpty)         // missing EOD
    assert(rleDecode(Array[Byte](0x80.toByte)).map(_.length).contains(0)) // bare EOD = empty
  }

  test("a decompression bomb refuses at the output cap") {
    // 80 MiB of zeros deflates to ~80 KiB; the 64 MiB ceiling must trip.
    val bomb = {
      val d = new java.util.zip.Deflater()
      d.setInput(new Array[Byte](80 << 20)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    assert(inflateBytes(bomb).isEmpty, "the 64 MiB output cap must refuse the bomb")
  }

  test("incremental update wins; the pre-update prefix is itself a valid PDF with the stale text") {
    val full = pdfBytes(7L)
    val pages = extractPdf(full).get
    assert(pages.head.text.contains("revised 49 r2"))
    assert(!pages.head.text.contains("the quick data point 49"))
    // A PDF truncated at its first %%EOF is the legal original revision.
    val s = new String(full, "ISO-8859-1")
    val cut = s.indexOf("%%EOF") + "%%EOF".length
    val original = extractPdf(s.substring(0, cut).getBytes("ISO-8859-1")).get
    assert(original.head.text.contains("the quick data point 49 cont"))
    assert(!original.head.text.contains("revised"))
  }

  test("decoy object header inside a string literal is text, not structure") {
    val pages = extractPdf(pdfBytes(4L)).get
    assert(pages.head.text.contains("(nested 9 0 obj) end"))
  }

  test("octal escape decodes and escaped parens balance") {
    val pages = extractPdf(pdfBytes(3L)).get
    assert(pages.head.text.contains("esc (3) A (nested"))
  }

  test("malformations refuse instead of guessing") {
    val good = pdfBytes(5L)
    // truncated mid-stream
    assert(extractPdf(good.take(good.length / 2)).isEmpty)
    // corrupt startxref target
    val s = new String(good, "ISO-8859-1")
    val sxi = s.lastIndexOf("startxref")
    val bad = s.substring(0, sxi) + "startxref\n1\n%%EOF\n"
    assert(extractPdf(bad.getBytes("ISO-8859-1")).isEmpty)
    // xref offset landing on the WRONG object number
    val i3 = s.indexOf("3 0 obj")
    val shifted = s.substring(0, i3) + "8" + s.substring(i3 + 1)
    assert(extractPdf(shifted.getBytes("ISO-8859-1")).isEmpty)
    // no startxref at all
    assert(extractPdf("%PDF-1.4\nhello".getBytes("ISO-8859-1")).isEmpty)
  }
}

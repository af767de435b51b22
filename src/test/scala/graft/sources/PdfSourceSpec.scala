package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the PDF extractor (PdfSource.extractPdf): the xref walk,
  * the incremental-update override, indirect /Length resolution, string
  * escapes/nesting, TJ kerning, and malformation refusals. No Spark
  * session needed — the parser is a pure function. */
class PdfSourceSpec extends AnyFunSuite {

  import PdfSource._

  test("round-trip: extracted pages match the text model across the id classes") {
    // 0: revised + 1 page; 1: indirect length + 2 pages; 7: revised +
    // 2 pages + indirect length; 4: plain 1-page; 9: 2-page direct.
    for (id <- Seq(0L, 1L, 4L, 7L, 9L, 13L, 14L, 21L)) {
      val got = extractPdf(pdfBytes(id)).getOrElse(fail(s"parse failed for id=$id"))
      assert(got.length == pdfPageCount(id), s"id=$id page count")
      for (pg <- got) {
        assert(pg.text == pdfPageText(id, pg.page), s"id=$id page=${pg.page}")
        assert(pg.nOps == pdfPageOps(id, pg.page), s"id=$id page=${pg.page} ops")
      }
    }
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

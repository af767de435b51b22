package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the .pptx extractor: fixture↔truth identity, the
  * numeric-vs-lexical slide ordering trap, each DrawingML rule, and
  * the parse-as-filter refusals. */
class PptxSourceSpec extends AnyFunSuite {

  import PptxSource._

  private def p(body: String): Option[Vector[String]] = extractSlide(
    s"""<p:sld><p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""")

  test("extractPptx(pptxBytes(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val got = extractPptx(s"deck$id.pptx", pptxBytes(id))
      assert(got.isDefined, s"id=$id refused")
      assert(got.get._1 == pptxExpected(id), s"id=$id text")
      assert(got.get._2 == 3 && got.get._3 == ExpectedParas, s"id=$id counts")
    }
  }

  test("slides read in NUMERIC order, not the central directory's lexical order") {
    // The fixture stores slide1, slide10, slide2 lexically; the text
    // must read 1 → 2 → 10. A lexical reader puts 'Closing' before the
    // café line.
    val text = extractPptx("deck7.pptx", pptxBytes(7L)).get._1
    val cafe = text.indexOf("café")
    val closing = text.indexOf("Closing")
    assert(cafe >= 0 && closing >= 0 && cafe < closing)
  }

  test("split runs concatenate; field runs never reach prose; br is a newline") {
    assert(p("<a:p><a:r><a:t>a </a:t></a:r><a:r><a:rPr b=\"1\"/><a:t>b</a:t></a:r></a:p>")
      .get == Vector("a b"))
    assert(p("<a:p><a:fld id=\"x\" type=\"slidenum\"><a:t>7</a:t></a:fld>" +
             "<a:r><a:t>real</a:t></a:r></a:p>").get == Vector("real"))
    assert(p("<a:p><a:r><a:t>x</a:t></a:r><a:br/><a:r><a:t>y</a:t></a:r></a:p>")
      .get == Vector("x\ny"))
    assert(p("<a:p><a:r><a:t>a &amp; &#233;</a:t></a:r></a:p>").get == Vector("a & é"))
    // ALL the break forms real PowerPoint emits map to '\n' (round-19
    // review finding — only the bare self-closed form was handled):
    assert(p("<a:p><a:r><a:t>x</a:t></a:r><a:br><a:rPr lang=\"en\"/></a:br>" +
             "<a:r><a:t>y</a:t></a:r></a:p>").get == Vector("x\ny"))
    assert(p("<a:p><a:r><a:t>x</a:t></a:r><a:br kern=\"0\"/>" +
             "<a:r><a:t>y</a:t></a:r></a:p>").get == Vector("x\ny"))
    // …and the boundary check keeps a hypothetical `<a:brX>` out of it
    // (unknown tag → generic skip, no newline):
    assert(p("<a:p><a:r><a:t>x</a:t></a:r><a:brX/><a:r><a:t>y</a:t></a:r></a:p>")
      .get == Vector("xy"))
    // An open a:br never closed is malformed — refuse:
    assert(p("<a:p><a:r><a:t>x</a:t></a:r><a:br><a:rPr/>").isEmpty)
    assert(p("<a:p/><a:p><a:r><a:t>k</a:t></a:r></a:p>").get == Vector("k"))
    assert(p("<a:p></a:p>").get == Vector.empty)
  }

  test("attributed self-closing paragraphs and runs are empty, not malformed") {
    assert(p("<a:p marL=\"0\"/><a:p><a:r><a:t>kept</a:t></a:r></a:p>")
      .get == Vector("kept"))
    assert(p("<a:p><a:r><a:t x=\"y\"/><a:t>a</a:t></a:r></a:p>").get == Vector("a"))
  }

  test("malformations refuse: unterminated t/fld, open paragraph, corrupt zip, no slides") {
    assert(p("<a:p><a:r><a:t>open forever").isEmpty)
    assert(p("<a:p><a:fld><a:t>1</a:t>").isEmpty)
    assert(p("<a:p><a:r><a:t>a</a:t></a:r>").isEmpty) // a:p open at end
    val ok = pptxBytes(42L)
    val bad = ok.clone()
    val at = 30 + "[Content_Types].xml".length
    bad(at) = (bad(at) ^ 0x5a).toByte
    assert(extractPptx("bad.pptx", bad).isEmpty)
    val noslides = ZipSource.archive(Seq(
      ZipSource.Member("other.xml", "<a/>".getBytes("UTF-8"),
        deflate = false, descriptor = false,
        localExtra = Array.emptyByteArray)), comment = "")
    assert(extractPptx("n.pptx", noslides).isEmpty)
  }
}

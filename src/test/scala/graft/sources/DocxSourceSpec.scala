package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the .docx extractor: the full-package fixture↔truth
  * identity, each ECMA-376 rule in isolation (run splits, xml:space,
  * entities, tab/br, field codes, tracked changes, table cells), and
  * the parse-as-filter refusals (corrupt ZIP, missing member,
  * malformed WordprocessingML). */
class DocxSourceSpec extends AnyFunSuite {

  import DocxSource._

  private def doc(body: String): String =
    s"""<?xml version="1.0"?><w:document xmlns:w="u"><w:body>$body</w:body></w:document>"""

  private def x(body: String): Option[(String, Int)] =
    extractDocumentXml(doc(body))

  private def t(body: String): String = x(body).get._1

  test("extractDocx(docxBytes(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val got = extractDocx(s"doc$id.docx", docxBytes(id))
      assert(got.isDefined, s"id=$id refused")
      assert(got.get._1 == docxExpected(id), s"id=$id text")
      assert(got.get._2 == ExpectedParas, s"id=$id paras")
    }
  }

  test("split <w:t> runs across formatting boundaries concatenate with no separator") {
    // Word splits one sentence into a run per formatting change — the
    // exact layout the fixture's title paragraph uses.
    assert(t("<w:p><w:r><w:t xml:space=\"preserve\">a </w:t></w:r>" +
             "<w:r><w:rPr><w:b/></w:rPr><w:t>b</w:t></w:r>" +
             "<w:r><w:t xml:space=\"preserve\"> c</w:t></w:r></w:p>") == "a b c")
  }

  test("xml:space governs edge-whitespace: trim by default, preserve keeps") {
    assert(t("<w:p><w:r><w:t>  x  </w:t></w:r></w:p>") == "x")
    assert(t("<w:p><w:r><w:t xml:space=\"preserve\">  x  </w:t></w:r></w:p>") == "  x  ")
  }

  test("xml:space accepts either quote style and spaced '='; refuses unparsable") {
    // Single quotes are legal XML and real writers emit them — a
    // double-quote-only match would silently trim significant edges.
    assert(t("<w:p><w:r><w:t xml:space='preserve'>  x  </w:t></w:r></w:p>") == "  x  ")
    assert(t("<w:p><w:r><w:t xml:space = \"preserve\">  x  </w:t></w:r></w:p>") == "  x  ")
    assert(t("<w:p><w:r><w:t xml:space='default'>  x  </w:t></w:r></w:p>") == "x")
    // Present-but-unparsable fails LOUD (refusal), never garbles:
    assert(x("<w:p><w:r><w:t xml:space=\"keep\">  x  </w:t></w:r></w:p>").isEmpty)
    assert(x("<w:p><w:r><w:t xml:space>  x  </w:t></w:r></w:p>").isEmpty)
    assert(x("<w:p><w:r><w:t xml:space=preserve>  x  </w:t></w:r></w:p>").isEmpty)
  }

  test("entities and character references decode; unknown/unterminated refuse") {
    assert(t("<w:p><w:r><w:t>a &amp; &lt; &gt; &quot; &apos; b</w:t></w:r></w:p>")
      == "a & < > \" ' b")
    assert(t("<w:p><w:r><w:t>caf&#233; &#x41;</w:t></w:r></w:p>") == "café A")
    assert(x("<w:p><w:r><w:t>&nope;</w:t></w:r></w:p>").isEmpty)
    assert(x("<w:p><w:r><w:t>a &amp b</w:t></w:r></w:p>").isEmpty)
  }

  test("tab, br and cr map to their characters") {
    assert(t("<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>" +
             "<w:cr/><w:t>d</w:t></w:r></w:p>") == "a\tb\nc\nd")
  }

  test("field instrText and tracked-change delText never reach prose") {
    assert(t("<w:p><w:r><w:fldChar w:fldCharType=\"begin\"/></w:r>" +
             "<w:r><w:instrText xml:space=\"preserve\"> PAGE </w:instrText></w:r>" +
             "<w:r><w:fldChar w:fldCharType=\"end\"/></w:r>" +
             "<w:r><w:t>p</w:t></w:r></w:p>") == "p")
    assert(t("<w:p><w:del><w:r><w:delText>GONE</w:delText></w:r></w:del>" +
             "<w:r><w:t>kept</w:t></w:r></w:p>") == "kept")
    // Self-closed forms (legal, occasionally emitted) are EMPTY
    // instruction/deletion elements: skip silently, never refuse the
    // valid document (round-19 review finding).
    assert(t("<w:p><w:r><w:instrText/></w:r><w:r><w:t>p</w:t></w:r></w:p>") == "p")
    assert(t("<w:p><w:r><w:delText w:x=\"1\"/></w:r><w:r><w:t>q</w:t></w:r></w:p>") == "q")
  }

  test("attributed self-closing paragraphs and runs are empty, not malformed") {
    // Word routinely writes `<w:p w:rsidR="…"/>` for spacing and
    // `<w:t/>` for empty runs — both must drop silently, never refuse
    // the document (round-19 review finding).
    assert(t("<w:p w:rsidR=\"00A77B3E\" w:rsidRDefault=\"00A77B3E\"/>" +
             "<w:p><w:r><w:t>kept</w:t></w:r></w:p>") == "kept")
    assert(t("<w:p><w:r><w:t x=\"y\"/><w:t>a</w:t></w:r></w:p>") == "a")
  }

  test("table-cell paragraphs are prose; empty paragraphs drop") {
    assert(t("<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p></w:tc>" +
             "</w:tr></w:tbl>") == "cell")
    assert(x("<w:p/><w:p><w:pPr/></w:p>").get == (("", 0)))
    assert(t("<w:p><w:r><w:t>a</w:t></w:r></w:p><w:p/>" +
             "<w:p><w:r><w:t>b</w:t></w:r></w:p>") == "a\nb")
  }

  test("a comment quoting close tags does not terminate a scan") {
    assert(t("<w:p><w:r><w:t>a</w:t></w:r></w:p><!-- </w:t> </w:p> -->" +
             "<w:p><w:r><w:t>b</w:t></w:r></w:p>") == "a\nb")
  }

  test("WordprocessingML malformations refuse (parse-as-filter)") {
    assert(extractDocumentXml("<w:document>no body</w:document>").isEmpty)
    assert(x("<w:p><w:r><w:t>open forever").isEmpty)   // unterminated w:t
    assert(x("<w:p><w:r><w:t>a</w:t></w:r>").isEmpty)  // w:p open at end of body
    assert(x("<!-- unterminated").isEmpty)
    assert(x("<w:p><w:r><w:t>a<b/>c</w:t></w:r></w:p>").isEmpty) // markup inside w:t
  }

  test("package malformations refuse: corrupt ZIP, missing document member") {
    val ok = docxBytes(42L)
    // Flip the first payload byte of member 0 (offset 30 + name length
    // — a stored, CRC-verified position): the ZIP layer reports
    // unclean → refusal, not a throw.
    val bad = ok.clone()
    val at = 30 + "[Content_Types].xml".length
    bad(at) = (bad(at) ^ 0x5a).toByte
    assert(extractDocx("bad.docx", bad).isEmpty)
    // A valid ZIP that lacks word/document.xml is not a docx.
    val nodoc = ZipSource.archive(Seq(
      ZipSource.Member("other.xml", "<a/>".getBytes("UTF-8"),
        deflate = false, descriptor = false,
        localExtra = Array.emptyByteArray)), comment = "")
    assert(extractDocx("nodoc.docx", nodoc).isEmpty)
    assert(extractDocx("trunc.docx",
      java.util.Arrays.copyOf(ok, ok.length - 10)).isEmpty)
  }

  test("parseZipRetain keeps exactly the requested payloads") {
    val (ms, clean) = ZipSource.parseZipRetain("d.docx", docxBytes(7L),
      _ == "word/document.xml")
    assert(clean && ms.size == 3)
    assert(ms.count(_._2 != null) == 1)
    val p = ms.collectFirst { case (e, b) if e.name == "word/document.xml" => b }.get
    assert(new String(p, "UTF-8") == documentXml(7L))
  }
}

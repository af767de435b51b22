package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the .odt extractor: the full-package fixture↔truth
  * identity, each ODF 1.2 rule in isolation (direct character data,
  * span transparency, whitespace collapse vs explicit text:s/tab/
  * line-break expansion, annotation skipping, heading close-tag
  * matching), and the parse-as-filter refusals (corrupt ZIP, missing/
  * wrong mimetype, missing content member, malformed body). */
class OdtSourceSpec extends AnyFunSuite {

  import OdtSource._

  private def doc(body: String): String =
    s"""<?xml version="1.0"?><office:document-content xmlns:office="u" xmlns:text="v"><office:body><office:text>$body</office:text></office:body></office:document-content>"""

  private def x(body: String): Option[(String, Int)] =
    extractContentXml(doc(body))

  private def t(body: String): String = x(body).get._1

  test("extractOdt(odtBytes(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val got = extractOdt(s"doc$id.odt", odtBytes(id))
      assert(got.isDefined, s"id=$id refused")
      assert(got.get._1 == odtExpected(id), s"id=$id text")
      assert(got.get._2 == ExpectedParas, s"id=$id paras")
    }
  }

  test("character data is prose; spans are transparent; headings are paragraphs") {
    assert(t("<text:p>plain</text:p>") == "plain")
    assert(t("<text:p>a <text:span text:style-name=\"T1\">b</text:span> c</text:p>") == "a b c")
    assert(t("<text:h text:outline-level=\"1\">Head</text:h><text:p>body</text:p>")
      == "Head\nbody")
  }

  test("raw whitespace collapses; explicit text:s/tab/line-break expand") {
    // §6.1.2: runs of raw whitespace are ONE space — that's why the
    // explicit elements exist.
    assert(t("<text:p>a    b\n\t c</text:p>") == "a b c")
    assert(t("<text:p>a<text:s/>b</text:p>") == "a b")
    assert(t("<text:p>a<text:s text:c=\"4\"/>b</text:p>") == "a    b")
    assert(t("<text:p>a<text:s text:c='2'/>b</text:p>") == "a  b")
    assert(t("<text:p>a<text:tab/>b<text:line-break/>c</text:p>") == "a\tb\nc")
    // Leading raw whitespace drops; explicit spaces at the edge survive.
    assert(t("<text:p>  x</text:p>") == "x")
    assert(t("<text:p><text:s/>x</text:p>") == " x")
    // Unparsable text:c refuses (fail loud, never guess a space count).
    assert(x("<text:p>a<text:s text:c=\"zero\"/>b</text:p>").isEmpty)
    assert(x("<text:p>a<text:s text:c=\"0\"/>b</text:p>").isEmpty)
    // Empty elements must self-close per spec.
    assert(x("<text:p>a<text:tab>b</text:tab>c</text:p>").isEmpty)
  }

  test("entities decode as explicit characters; unknown refuses") {
    assert(t("<text:p>a &amp; &lt; caf&#233; &#x41;</text:p>") == "a & < café A")
    assert(x("<text:p>&nope;</text:p>").isEmpty)
  }

  test("close tags sharing the text:p/text:h prefix are structural, not refusals") {
    // </text:page-number> starts with "</text:p" — the boundary check
    // keeps it in the generic skip; its character data is prose
    // (round-20 review finding: the prefix match refused the document).
    assert(t("<text:p>Page <text:page-number>3</text:page-number>.</text:p>")
      == "Page 3.")
    assert(t("<text:h outline-level=\"1\">Hi <text:hidden-text text:content=\"x\"/>" +
             "there</text:h>") == "Hi there")
  }

  test("annotations never reach prose, including their nested text:p") {
    assert(t("<text:p><office:annotation office:name=\"c\"><text:p>NOTE</text:p>" +
             "</office:annotation>kept</text:p>") == "kept")
    // …and between paragraphs too.
    assert(t("<office:annotation><text:p>N</text:p></office:annotation>" +
             "<text:p>k</text:p>") == "k")
  }

  test("comments quoting close tags are skipped; empty paragraphs drop") {
    assert(t("<text:p>a</text:p><!-- </text:p> </office:text> --><text:p>b</text:p>")
      == "a\nb")
    assert(t("<text:p/><text:p></text:p><text:p>k</text:p>") == "k")
    assert(x("<text:p/><text:p>k</text:p>").get._2 == 1)
  }

  test("body malformations refuse (parse-as-filter)") {
    assert(x("<text:p>open forever").isEmpty)
    assert(x("<text:p>a<text:p>nested</text:p></text:p>").isEmpty)
    // Mismatched paragraph close: </text:h> cannot close a <text:p>.
    assert(extractContentXml(doc("<text:p>a</text:h>")).isEmpty)
    assert(x("stray prose outside any paragraph").isEmpty)
    assert(x("<text:p>a<!-- unterminated</text:p>").isEmpty)
    assert(x("<text:p><office:annotation>never closed</text:p>").isEmpty)
    assert(extractContentXml("<office:document-content/>").isEmpty)
  }

  test("package malformations refuse: corrupt ZIP, wrong/missing mimetype") {
    val ok = odtBytes(42L)
    assert(extractOdt("doc42.odt", ok).isDefined)
    val bad = ok.clone()
    // Flip a byte inside the deflated content member's payload.
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    assert(extractOdt("bad.odt", bad).isEmpty)
    // A package whose mimetype claims a SPREADSHEET is not an ODT —
    // whatever the extension says.
    val ods = ZipSource.archive(Seq(
      ZipSource.Member("mimetype",
        "application/vnd.oasis.opendocument.spreadsheet".getBytes("UTF-8"),
        deflate = false, descriptor = false, localExtra = Array.emptyByteArray),
      ZipSource.Member("content.xml",
        doc("<text:p>x</text:p>").getBytes("UTF-8"),
        deflate = true, descriptor = false, localExtra = Array.emptyByteArray)),
      comment = "")
    assert(extractOdt("fake.odt", ods).isEmpty)
    // No mimetype member at all: required by ODF Part 3 §3.3.
    val bare = ZipSource.archive(Seq(
      ZipSource.Member("content.xml",
        doc("<text:p>x</text:p>").getBytes("UTF-8"),
        deflate = true, descriptor = false, localExtra = Array.emptyByteArray)),
      comment = "")
    assert(extractOdt("bare.odt", bare).isEmpty)
    // mimetype present but content.xml missing.
    val noContent = ZipSource.archive(Seq(
      ZipSource.Member("mimetype", OdtMime.getBytes("UTF-8"),
        deflate = false, descriptor = false, localExtra = Array.emptyByteArray)),
      comment = "")
    assert(extractOdt("empty.odt", noContent).isEmpty)
  }
}

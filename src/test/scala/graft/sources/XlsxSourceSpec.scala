package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the .xlsx extractor: the full-package fixture↔truth
  * identity, the shared-string indirection (THE format trap), each
  * cell-type rule, reference decoding, and the parse-as-filter
  * refusals. */
class XlsxSourceSpec extends AnyFunSuite {

  import XlsxSource._

  private def sheetOf(cellsXml: String): String =
    s"""<worksheet><sheetData>$cellsXml</sheetData></worksheet>"""

  test("extractXlsx(xlsxBytes(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val got = extractXlsx(s"sheet$id.xlsx", xlsxBytes(id))
      assert(got.isDefined, s"id=$id refused")
      assert(got.get == expectedCells(id), s"id=$id cells")
    }
  }

  test("shared-string indirection: v is an INDEX, never the text") {
    val shared = Vector("alpha", "beta")
    val got = parseSheet(sheetOf("""<row r="1"><c r="A1" t="s"><v>1</v></c></row>"""), shared)
    assert(got.get == Vector(Cell(1, 1, "A1", "text", "beta")))
    // An index outside the table refuses the document (a reader that
    // emits the raw number as text would silently corrupt the corpus).
    assert(parseSheet(sheetOf("""<row r="1"><c r="A1" t="s"><v>2</v></c></row>"""), shared).isEmpty)
    assert(parseSheet(sheetOf("""<row r="1"><c r="A1" t="s"><v>x</v></c></row>"""), shared).isEmpty)
  }

  test("rich-text shared entries concatenate runs; xml:space governs trimming") {
    val sst = """<sst><si><r><t xml:space="preserve"> a </t></r><r><t>  b  </t></r></si>
                |<si><t>  plain  </t></si><si><t/></si></sst>""".stripMargin
    assert(parseSharedStrings(sst).get == Vector(" a b", "plain", ""))
    // Either quote style (legal XML); unparsable xml:space refuses
    // (round-19 review finding — double-quote-only silently trimmed):
    assert(parseSharedStrings("<sst><si><t xml:space='preserve'> a </t></si></sst>")
      .get == Vector(" a "))
    assert(parseSharedStrings("<sst><si><t xml:space=\"keep\"> a </t></si></sst>").isEmpty)
  }

  test("formula cells take the cached value; the formula text never leaks") {
    val got = parseSheet(sheetOf(
      """<row r="1"><c r="A1"><f>SUM(B1:B9)*2</f><v>42.5</v></c></row>"""), Vector.empty)
    assert(got.get == Vector(Cell(1, 1, "A1", "num", "42.5")))
  }

  test("cell types: inline, str-result, bool, numeric, empty skipped, unknown refused") {
    assert(parseSheet(sheetOf(
      """<row r="1"><c r="A1" t="inlineStr"><is><t>hi &amp; lo</t></is></c></row>"""),
      Vector.empty).get == Vector(Cell(1, 1, "A1", "text", "hi & lo")))
    assert(parseSheet(sheetOf(
      """<row r="1"><c r="A1" t="str"><v>computed</v></c></row>"""),
      Vector.empty).get == Vector(Cell(1, 1, "A1", "text", "computed")))
    assert(parseSheet(sheetOf(
      """<row r="1"><c r="A1" t="b"><v>1</v></c></row>"""),
      Vector.empty).get == Vector(Cell(1, 1, "A1", "bool", "1")))
    assert(parseSheet(sheetOf("""<row r="1"><c r="A1" t="b"><v>7</v></c></row>"""),
      Vector.empty).isEmpty) // a boolean is 0 or 1, nothing else
    assert(parseSheet(sheetOf("""<row r="1"><c r="A1"/><c r="B1"><v>3</v></c></row>"""),
      Vector.empty).get == Vector(Cell(1, 2, "B1", "num", "3")))
    assert(parseSheet(sheetOf("""<row r="1"><c r="A1" t="e"><v>#DIV/0!</v></c></row>"""),
      Vector.empty).isEmpty) // unknown type: loud, never guessed
  }

  test("A1 references decode by the bijective base-26 rule") {
    assert(parseRef("A1").contains((1, 1)))
    assert(parseRef("Z9").contains((9, 26)))
    assert(parseRef("AA1").contains((1, 27)))
    assert(parseRef("AB12").contains((12, 28)))
    assert(parseRef("BA3").contains((3, 53)))
    assert(parseRef("1A").isEmpty)
    assert(parseRef("A").isEmpty)
    assert(parseRef("12").isEmpty)
    assert(parseRef("A0").isEmpty)
  }

  test("package malformations refuse: corrupt ZIP, missing sheet, torn XML") {
    val ok = xlsxBytes(42L)
    val bad = ok.clone()
    val at = 30 + "[Content_Types].xml".length
    bad(at) = (bad(at) ^ 0x5a).toByte
    assert(extractXlsx("bad.xlsx", bad).isEmpty)
    val nosheet = ZipSource.archive(Seq(
      ZipSource.Member("other.xml", "<a/>".getBytes("UTF-8"),
        deflate = false, descriptor = false,
        localExtra = Array.emptyByteArray)), comment = "")
    assert(extractXlsx("nosheet.xlsx", nosheet).isEmpty)
    assert(parseSheet("<worksheet>no sheetData</worksheet>", Vector.empty).isEmpty)
    assert(parseSheet(sheetOf("""<row r="1"><c r="A1"><v>unterminated"""), Vector.empty).isEmpty)
    assert(parseSharedStrings("<sst><si><t>open forever").isEmpty)
  }

  test("r-less cells (positional inheritance) refuse loudly, never skip silently") {
    assert(parseSheet(sheetOf("""<row r="1"><c><v>5</v></c></row>"""),
      Vector.empty).isEmpty)
  }

  test("a workbook with no sharedStrings member is legal until a t=\"s\" cell needs one") {
    val noShared = ZipSource.archive(Seq(
      ZipSource.Member("[Content_Types].xml", "<Types/>".getBytes("UTF-8"),
        deflate = false, descriptor = false, localExtra = Array.emptyByteArray),
      ZipSource.Member("xl/worksheets/sheet1.xml",
        sheetOf("""<row r="1"><c r="B2"><v>7.5</v></c></row>""").getBytes("UTF-8"),
        deflate = true, descriptor = false, localExtra = Array.emptyByteArray)),
      comment = "")
    assert(extractXlsx("n.xlsx", noShared).get ==
      Vector(Cell(2, 2, "B2", "num", "7.5")))
    val needsShared = ZipSource.archive(Seq(
      ZipSource.Member("xl/worksheets/sheet1.xml",
        sheetOf("""<row r="1"><c r="A1" t="s"><v>0</v></c></row>""").getBytes("UTF-8"),
        deflate = false, descriptor = false, localExtra = Array.emptyByteArray)),
      comment = "")
    assert(extractXlsx("s.xlsx", needsShared).isEmpty)
  }
}

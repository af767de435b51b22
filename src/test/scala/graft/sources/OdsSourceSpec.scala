package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the .ods extractor: the full-package fixture↔truth
  * identity, each ODF §9 rule in isolation (typed values from
  * attributes, column/row repeats and grid addressing, empty-padding
  * non-materialization, covered cells, entities), and the
  * parse-as-filter refusals. */
class OdsSourceSpec extends AnyFunSuite {

  import OdsSource._

  private def doc(rows: String): String =
    s"""<?xml version="1.0"?><office:document-content xmlns:office="u" xmlns:table="t" xmlns:text="x"><office:body><office:spreadsheet><table:table>$rows</table:table></office:spreadsheet></office:body></office:document-content>"""

  private def x(rows: String): Option[Seq[Cell]] =
    extractSpreadsheetXml(doc(rows))

  test("extractOds(odsBytes(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val got = extractOds(s"doc$id.ods", odsBytes(id))
      assert(got.isDefined, s"id=$id refused")
      assert(got.get == odsExpected(id), s"id=$id cells")
    }
  }

  test("typed values come from attributes, never the display text") {
    val got = x("""<table:table-row><table:table-cell office:value-type="float" office:value="2.50"><text:p>$2.50 USD</text:p></table:table-cell></table:table-row>""").get
    assert(got == Seq(Cell(1, 1, "num", "2.50")))
  }

  test("column repeats advance grid positions; empty repeats never materialize") {
    val got = x("""<table:table-row><table:table-cell table:number-columns-repeated="3"/><table:table-cell office:value-type="string"><text:p>at4</text:p></table:table-cell></table:table-row>""").get
    assert(got == Seq(Cell(1, 4, "text", "at4")))
    // The 16384-wide padding trailer: zero phantom cells.
    val pad = x("""<table:table-row><table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell><table:table-cell table:number-columns-repeated="16384"/></table:table-row>""").get
    assert(pad.size == 1)
    // A NON-empty repeat materializes each copy at its own column…
    val rep = x("""<table:table-row><table:table-cell office:value-type="float" office:value="1" table:number-columns-repeated="3"/></table:table-row>""").get
    assert(rep == Seq(Cell(1, 1, "num", "1"), Cell(1, 2, "num", "1"), Cell(1, 3, "num", "1")))
    // …but a flood-sized non-empty repeat refuses.
    assert(x("""<table:table-row><table:table-cell office:value-type="float" office:value="1" table:number-columns-repeated="99999"/></table:table-row>""").isEmpty)
  }

  test("row repeats materialize whole rows; empty rows advance the counter") {
    val got = x("""<table:table-row table:number-rows-repeated="2"><table:table-cell office:value-type="string"><text:p>d</text:p></table:table-cell></table:table-row><table:table-row><table:table-cell office:value-type="string"><text:p>e</text:p></table:table-cell></table:table-row>""").get
    assert(got == Seq(Cell(1, 1, "text", "d"), Cell(2, 1, "text", "d"),
      Cell(3, 1, "text", "e")))
    val skipped = x("""<table:table-row table:number-rows-repeated="5"/><table:table-row><table:table-cell office:value-type="string"><text:p>f</text:p></table:table-cell></table:table-row>""").get
    assert(skipped == Seq(Cell(6, 1, "text", "f")))
  }

  test("annotations, boundary-sharing tags, comment decoys, empty-row floods") {
    // A reviewer comment's nested paragraphs are metadata, never the
    // cell value (round-20 review finding: they concatenated in).
    val ann = x("""<table:table-row><table:table-cell office:value-type="string"><office:annotation><text:p>NOTE</text:p></office:annotation><text:p>Real</text:p></table:table-cell></table:table-row>""").get
    assert(ann == Seq(Cell(1, 1, "text", "Real")))
    // '<office:annotation-end/>' shares the prefix but is a range
    // MARKER: it must not swallow the real paragraph up to a later
    // (unrelated) annotation close (round-21 ADVICE).
    val annEnd = x("""<table:table-row><table:table-cell office:value-type="string"><office:annotation-end office:name="r1"/><text:p>Real</text:p><office:annotation><text:p>NOTE</text:p></office:annotation></table:table-cell></table:table-row>""").get
    assert(annEnd == Seq(Cell(1, 1, "text", "Real")))
    // <text:page-number> shares the <text:p prefix — not a paragraph.
    val pg = x("""<table:table-row><table:table-cell office:value-type="string"><text:p>p<text:page-number>9</text:page-number>q</text:p></table:table-cell></table:table-row>""")
    assert(pg.isEmpty) // nested markup inside a paragraph refuses (flatText)
    // A comment QUOTING a close tag cannot truncate the row extent.
    val dec = x("""<table:table-row><table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell><!-- decoy: </table:table-row> --><table:table-cell office:value-type="string"><text:p>b</text:p></table:table-cell></table:table-row>""").get
    assert(dec == Seq(Cell(1, 1, "text", "a"), Cell(1, 2, "text", "b")))
    // Million-fold EMPTY row repeats are padding — advance, never refuse…
    val pad = x("""<table:table-row table:number-rows-repeated="1048574"><table:table-cell table:number-columns-repeated="16384"/></table:table-row>""").get
    assert(pad.isEmpty)
    // …but a MATERIALIZING row flood refuses, and stacked repeats can
    // never overflow the grid counters into negative positions.
    assert(x("""<table:table-row table:number-rows-repeated="99999"><table:table-cell office:value-type="string"><text:p>x</text:p></table:table-cell></table:table-row>""").isEmpty)
    val wide = (1 to 300).map(_ =>
      """<table:table-cell table:number-columns-repeated="9999999"/>""").mkString
    assert(x(s"""<table:table-row>$wide<table:table-cell office:value-type="string"><text:p>y</text:p></table:table-cell></table:table-row>""").isEmpty)
  }

  test("covered cells advance but emit nothing; entities decode; refusals") {
    val got = x("""<table:table-row><table:table-cell office:value-type="string"><text:p>a &amp; b</text:p></table:table-cell><table:covered-table-cell table:number-columns-repeated="2"/><table:table-cell office:value-type="boolean" office:boolean-value="true"/></table:table-row>""").get
    assert(got == Seq(Cell(1, 1, "text", "a & b"), Cell(1, 4, "bool", "1")))
    // Unknown value type, missing value attr, bad repeat: refuse.
    assert(x("""<table:table-row><table:table-cell office:value-type="time"/></table:table-row>""").isEmpty)
    assert(x("""<table:table-row><table:table-cell office:value-type="float"/></table:table-row>""").isEmpty)
    assert(x("""<table:table-row><table:table-cell table:number-columns-repeated="zero"/></table:table-row>""").isEmpty)
    assert(x("""<table:table-row><table:table-cell office:value-type="string"><text:p>open""").isEmpty)
    assert(extractSpreadsheetXml("<office:document-content/>").isEmpty)
  }

  test("package malformations refuse: corrupt ZIP, wrong/missing mimetype") {
    val ok = odsBytes(42L)
    assert(extractOds("doc42.ods", ok).isDefined)
    val bad = ok.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    assert(extractOds("bad.ods", bad).isEmpty)
    // An ODT mimetype is not a spreadsheet, whatever the extension says.
    val odt = ZipSource.archive(Seq(
      ZipSource.Member("mimetype", OdtSource.OdtMime.getBytes("UTF-8"),
        deflate = false, descriptor = false, localExtra = Array.emptyByteArray),
      ZipSource.Member("content.xml",
        doc("").getBytes("UTF-8"),
        deflate = true, descriptor = false, localExtra = Array.emptyByteArray)),
      comment = "")
    assert(extractOds("fake.ods", odt).isEmpty)
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the EPUB container walk: the three-hop indirection
  * (container.xml → OPF → spine), spine order against both decoy
  * orders, media-type filtering, the htmlToText composition, and the
  * parse-as-filter refusals. */
class EpubSourceSpec extends SparkSpec {

  import EpubSource._

  test("spine order wins over ZIP order and lexical href order") {
    val got = extractEpub("book7.epub", epubBytes(7L)).get
    assert(got.map(_._2) == Vector("intro.xhtml", "zeta.xhtml", "alpha.xhtml"))
    assert(got.map(_._1) == Vector(0, 1, 2))
    // Content pairing: chapter k carries its spine chapter's tag.
    SpineChapters.zipWithIndex.foreach { case ((href, tag), k) =>
      assert(got(k)._3.contains(s"Chap $tag"), s"chapter $k ($href)")
    }
  }

  test("non-XHTML spine items (the SVG cover) contribute no chapter") {
    val got = extractEpub("book3.epub", epubBytes(3L)).get
    assert(got.size == 3)
    assert(got.forall(!_._3.contains("never text")))
  }

  test("chapters through htmlToText equal the closed-form truth across ids") {
    import spark.implicits._
    for (id <- Seq(0L, 7L, 13L, 42L)) {
      val rows = extractEpub(s"book$id.epub", epubBytes(id)).get
        .map { case (k, _, x) => (id, k, x) }
      val df = graft.operators.TextAnalysis.htmlToText(
        rows.toDF("doc_id", "chap_idx", "xhtml"), "xhtml", "text")
      val got = df.orderBy("chap_idx").select("chap_idx", "text")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      val want = SpineChapters.zipWithIndex.map { case ((_, tag), k) =>
        (k, chapterExpected(id, tag))
      }
      assert(got == want, s"id=$id")
    }
  }

  test("malformations refuse: corrupt zip, missing container/OPF/chapter, dangling idref") {
    val ok = epubBytes(5L)
    val bad = ok.clone()
    val at = 30 + "mimetype".length
    bad(at) = (bad(at) ^ 0x5a).toByte
    assert(extractEpub("bad.epub", bad).isEmpty)
    def pkg(members: (String, String)*): Array[Byte] =
      ZipSource.archive(members.map { case (n, c) =>
        ZipSource.Member(n, c.getBytes("UTF-8"), deflate = false,
          descriptor = false, localExtra = Array.emptyByteArray)
      }, comment = "")
    // No container.xml at all.
    assert(extractEpub("e.epub", pkg("mimetype" -> "application/epub+zip")).isEmpty)
    // container.xml points at an absent OPF.
    assert(extractEpub("e.epub", pkg(
      "META-INF/container.xml" ->
        """<container><rootfiles><rootfile full-path="gone.opf"/></rootfiles></container>""")).isEmpty)
    // Spine idref with no manifest item.
    assert(extractEpub("e.epub", pkg(
      "META-INF/container.xml" ->
        """<container><rootfiles><rootfile full-path="c.opf"/></rootfiles></container>""",
      "c.opf" ->
        """<package><manifest></manifest><spine><itemref idref="ghost"/></spine></package>""")).isEmpty)
    // Manifest names a chapter the archive does not carry.
    assert(extractEpub("e.epub", pkg(
      "META-INF/container.xml" ->
        """<container><rootfiles><rootfile full-path="c.opf"/></rootfiles></container>""",
      "c.opf" ->
        """<package><manifest><item id="a" href="ch.xhtml" media-type="application/xhtml+xml"/></manifest>
          |<spine><itemref idref="a"/></spine></package>""".stripMargin)).isEmpty)
  }

  test("commented-out spine entries are dead markup; a truncated OPF refuses") {
    def pkg(opf: String): Array[Byte] =
      ZipSource.archive(Seq(
        ZipSource.Member("META-INF/container.xml",
          """<container><rootfiles><rootfile full-path="c.opf"/></rootfiles></container>"""
            .getBytes("UTF-8"), deflate = false, descriptor = false,
          localExtra = Array.emptyByteArray),
        ZipSource.Member("c.opf", opf.getBytes("UTF-8"), deflate = false,
          descriptor = false, localExtra = Array.emptyByteArray),
        ZipSource.Member("ch.xhtml", "<html><body><p>x</p></body></html>"
          .getBytes("UTF-8"), deflate = false, descriptor = false,
          localExtra = Array.emptyByteArray)), comment = "")
    // A commented-out itemref must NOT count as a live spine entry
    // (it references no manifest item — counting it would refuse a
    // valid book on a phantom dangling idref).
    val commented = pkg(
      """<package><manifest><item id="a" href="ch.xhtml" media-type="application/xhtml+xml"/></manifest>
        |<spine><!-- <itemref idref="old"/> --><itemref idref="a"/></spine></package>""".stripMargin)
    assert(extractEpub("c.epub", commented).get.map(_._2) == Vector("ch.xhtml"))
    // An OPF truncated mid-tag must refuse, never return a partial
    // chapter set; same for an unterminated comment.
    assert(extractEpub("t.epub", pkg(
      """<package><manifest><item id="a" href="ch.xhtml" media-type="application/xhtml+xml"/></manifest>
        |<spine><itemref idref="a""".stripMargin)).isEmpty)
    assert(extractEpub("u.epub", pkg(
      """<package><!-- never closed <manifest/></package>""")).isEmpty)
  }

  test("an OPF in a subdirectory resolves hrefs relative to itself") {
    // The fixture already uses OEBPS/; pin the root-level variant too.
    val flat = ZipSource.archive(Seq(
      ZipSource.Member("META-INF/container.xml",
        """<container><rootfiles><rootfile full-path="c.opf"/></rootfiles></container>"""
          .getBytes("UTF-8"), deflate = false, descriptor = false,
        localExtra = Array.emptyByteArray),
      ZipSource.Member("c.opf",
        """<package><manifest><item id="a" href="ch.xhtml" media-type="application/xhtml+xml"/></manifest>
          |<spine><itemref idref="a"/></spine></package>""".stripMargin
          .getBytes("UTF-8"), deflate = false, descriptor = false,
        localExtra = Array.emptyByteArray),
      ZipSource.Member("ch.xhtml", "<html><body><p>root level</p></body></html>"
        .getBytes("UTF-8"), deflate = false, descriptor = false,
        localExtra = Array.emptyByteArray)), comment = "")
    val got = extractEpub("flat.epub", flat).get
    assert(got.size == 1 && got(0)._3.contains("root level"))
  }
}

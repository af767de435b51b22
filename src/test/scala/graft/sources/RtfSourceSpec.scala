package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the .rtf extractor: the full-document fixture↔truth
  * identity, each RTF 1.9 rule in isolation (group state, destination
  * skipping, delimiter-space consumption, cp1252 and \uN escapes with
  * \ucN fallback skipping, fields, literals), and the parse-as-filter
  * refusals. */
class RtfSourceSpec extends AnyFunSuite {

  import RtfSource._

  private def x(body: String): Option[(String, Int)] =
    extractRtfText(s"{\\rtf1\\ansi $body}")

  private def t(body: String): String = x(body).get._1

  test("extractRtf(rtfDoc(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val got = extractRtf(s"doc$id.rtf",
        rtfDoc(id).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      assert(got.isDefined, s"id=$id refused")
      assert(got.get._1 == rtfExpected(id), s"id=$id text")
      assert(got.get._2 == ExpectedParas, s"id=$id paras")
    }
  }

  test("control words eat ONE delimiter space; formatting toggles are invisible") {
    // The classic RTF gotcha: `\b0  and` has TWO spaces — one is the
    // control word's delimiter, one is prose.
    assert(t("a \\b bold\\b0  rest\\par") == "a bold rest")
    assert(t("x\\i0y\\par") == "xy") // non-space delimiter not consumed
  }

  test("destinations never reach prose; starred groups skip; fldrslt is kept") {
    assert(t("{\\fonttbl{\\f0 Times;}}body\\par") == "body")
    assert(t("{\\info{\\title SECRET}}body\\par") == "body")
    assert(t("{\\*\\generator Vendor 1.0;}body\\par") == "body")
    assert(t("{\\field{\\*\\fldinst PAGE}{\\fldrslt 7}} of 9\\par") == "7 of 9")
    // Nested groups inside a skipped destination stay skipped.
    assert(t("{\\fonttbl{\\f0{\\deep x}y;}}z\\par") == "z")
  }

  test("cp1252 escapes decode; the five undefined bytes refuse") {
    assert(t("caf\\'e9\\par") == "café")
    assert(t("d\\'96dash\\par") == "d–dash") // 0x96 = en dash in cp1252
    assert(x("bad\\'81x\\par").isEmpty)
    assert(x("cut\\'e").isEmpty) // unterminated hex escape
  }

  test("\\uN emits the codepoint and skips the \\ucN fallback items") {
    assert(t("\\u233?x\\par") == "éx") // default uc=1: '?' burned
    assert(t("\\uc2 \\u8364ABx\\par") == "€x") // uc=2: two chars burned
    assert(t("\\uc0 \\u233 x\\par") == "éx") // uc=0: nothing burned
    // A \'hh escape counts as ONE fallback item.
    assert(t("\\u233\\'3fx\\par") == "éx")
    // Negative N is the 16-bit two's-complement rule.
    assert(t("\\u-1536?\\par") == "切")
    // Group close restores the OUTER uc.
    assert(t("{\\uc2 inner}\\u233?x\\par") == "inneréx")
  }

  test("backslash-CR/LF is \\par (the Word-era paragraph delimiter)") {
    // Dropping these as unknown symbols would merge paragraphs —
    // garbled prose from a valid document (round-20 review finding).
    assert(t("a\\\r\nb\\par") == "a\nb") // \<CR><LF> is ONE \par
    assert(t("a\\\nb\\par") == "a\nb")
    assert(t("a\\\rb\\par") == "a\nb")
  }

  test("par/line/tab/literals map; empty paragraphs drop; raw newlines are not prose") {
    assert(t("a\\par b\\par") == "a\nb")
    assert(t("a\\line b\\tab c\\par") == "a\nb\tc")
    assert(t("\\par\\par a\\par\\par") == "a")
    assert(t("br \\{x\\} nb\\~sp\\par") == "br {x} nb sp")
    assert(t("a\nb\r\nc\\par") == "abc")
    assert(t("em\\emdash dash \\bullet\\par") == "em—dash •")
    // An unterminated final paragraph still flushes.
    assert(t("tail") == "tail")
  }

  test("malformations refuse (parse-as-filter)") {
    assert(extractRtfText("not rtf at all").isEmpty)
    assert(extractRtfText("{\\rtf1 unbalanced").isEmpty)
    assert(extractRtfText("{\\rtf1 a}}").isEmpty) // over-closed
    assert(extractRtfText("{\\rtf1 a} trailing").isEmpty)
    assert(x("a\\bin4 \\par").isEmpty)
    assert(x("cut by eof\\").isEmpty)
    assert(x("\\u nodigits\\par").isEmpty)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The link-graph primitives: RFC 3986 resolution pinned against the
  * spec's own §5.4 reference examples (the normative test vectors),
  * extraction pinned against the parser traps, and the staged-model
  * identity (parse + resolve over the generated HTML reproduces the
  * closed-form resolved-link model the oracle replays). */
class LinkGraphSpec extends AnyFunSuite {

  import LinkGraph._

  private val base = "http://a/b/c/d;p?q"

  // RFC 3986 §5.4.1 normal examples (the authority-carrying subset).
  test("RFC 3986 §5.4.1 normal resolution examples") {
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "g#s" -> "http://a/b/c/g",     // fragments strip in a frontier
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "" -> "http://a/b/c/d;p?q",    // same-document keeps the base query
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    for ((href, want) <- cases)
      assert(resolve(base, href).contains(want), s"href=<$href>")
  }

  test("RFC 3986 §5.4.2 abnormal examples: extra ../ cannot climb past root") {
    assert(resolve(base, "../../../g").contains("http://a/g"))
    assert(resolve(base, "../../../../g").contains("http://a/g"))
    assert(resolve(base, "/./g").contains("http://a/g"))
    assert(resolve(base, "/../g").contains("http://a/g"))
    assert(resolve(base, "g.").contains("http://a/b/c/g."))
    assert(resolve(base, ".g").contains("http://a/b/c/.g"))
    assert(resolve(base, "g..").contains("http://a/b/c/g.."))
    assert(resolve(base, "..g").contains("http://a/b/c/..g"))
    assert(resolve(base, "./../g").contains("http://a/b/g"))
    assert(resolve(base, "./g/.").contains("http://a/b/c/g/"))
    assert(resolve(base, "g/./h").contains("http://a/b/c/g/h"))
    assert(resolve(base, "g/../h").contains("http://a/b/c/h"))
  }

  test("opaque schemes and authority-less results resolve to None") {
    assert(resolve(base, "mailto:x@y.test").isEmpty)
    assert(resolve("not-a-url", "g").isEmpty)
  }

  test("attribute values unescape exactly once") {
    assert(unescape("?x=1&amp;y=2") == "?x=1&y=2")
    assert(unescape("&amp;lt;") == "&lt;") // NOT '<' — single pass
    assert(unescape("&unknown;") == "&unknown;")
    assert(resolve("http://h.test/p/x.html", "y.html?a=1&amp;b=2")
      .contains("http://h.test/p/y.html?a=1&b=2"))
  }

  test("extraction: quotes, case, unquoted, traps") {
    val html =
      """<!-- <a href="http://dead.test/x">no</a> -->
        |<a name="top">no href</a>
        |<A CLASS='z' HREF='one.html'>1</A>
        |<a href="two.html">2</a>
        |<a class="nav" href=three.html>3</a>""".stripMargin
    assert(hrefs(html) == Seq("one.html", "two.html", "three.html"))
  }

  test("data-href and suffixed attributes are not links; a real href beside one still is") {
    // `\bhref` alone matches inside `data-href` (hyphen = word boundary);
    // the lookbehind must refuse it while still reading an adjacent href.
    assert(hrefs("<a data-href='fake.html'>x</a>") == Seq.empty)
    assert(hrefs("<a data-href='fake.html' href='real.html'>x</a>") == Seq("real.html"))
    assert(hrefs("<a xhref='fake.html'>x</a>") == Seq.empty)
    assert(hrefs("<a HREF=bare.html>x</a>") == Seq("bare.html")) // case+unquoted survive
  }

  test("a multi-line comment hides every link inside it") {
    val html = "<a href='keep.html'>k</a><!--\n<a href='a.html'>a</a>\n<a href='b.html'>b</a>\n-->"
    assert(hrefs(html) == Seq("keep.html"))
  }

  test("staged model identity: parse+resolve reproduces the closed form") {
    for (id <- 0L to 200L) {
      val got = hrefs(lgHtml(id)).flatMap(h => resolve(lgUrl(id), h))
      val want = (0 until lgLinkCount(id)).map(k => lgResolved(id, k)) ++
        (if (id % 11 == 0) Seq(lgUrl(id)) else Seq.empty)
      assert(got == want, s"id=$id")
    }
  }
}

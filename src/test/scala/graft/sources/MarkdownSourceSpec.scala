package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the markdown extractor: fixture↔truth identity, each rule
  * in isolation, and the code/prose channel split. */
class MarkdownSourceSpec extends AnyFunSuite {

  import MarkdownSource._

  test("extractMd(mdSource(id)) equals the closed-form truth across ids") {
    for (id <- 0L until 60L) {
      val (text, nf, cc) = extractMd(mdSource(id))
      assert(text == mdExpected(id), s"id=$id text")
      assert(nf == 1, s"id=$id fences")
      assert(cc == mdCodeChars(id), s"id=$id code chars")
    }
  }

  test("each rule in isolation") {
    def p(s: String) = extractMd(s)._1
    assert(p("# H1\n## H2\n###### H6") == "H1\nH2\nH6")
    assert(p("a **bold** b") == "a bold b")
    assert(p("a *em* b") == "a em b")
    assert(p("a `code` b") == "a code b")
    assert(p("[text](http://u)") == "text")
    assert(p("![alt](img.png)") == "alt")
    // image rule must run BEFORE the link rule or the '!' leaks
    assert(p("x ![a](u) y [b](v) z") == "x a y b z")
    assert(p("a\n\n\nb") == "a\nb")
    assert(p("  spaced   out  ") == "spaced out")
  }

  test("inline code binds before emphasis/links (CommonMark precedence)") {
    def p(s: String) = extractMd(s)._1
    // markdown-hostile characters INSIDE a code span survive literally
    assert(p("use `*args` here") == "use *args here")
    assert(p("index `a[i]` and `[x](y)` stay") == "index a[i] and [x](y) stay")
    assert(p("`**not bold**` vs **bold**") == "**not bold** vs bold")
    // dollar/backslash in a code span must not break the restore
    assert(p("`a$1\\b` c") == "a$1\\b c")
    // bare digits in prose are NOT mask placeholders
    assert(p("a `x` 0 b") == "a x 0 b")
  }

  test("fences route to the code channel, not the prose") {
    val (text, nf, cc) = extractMd("p1\n```\ncode line\n```\np2\n```js\nq\n```\n")
    assert(text == "p1\np2")
    assert(nf == 2)
    assert(cc == "code line".length + 1)
    // markdown syntax INSIDE a fence is code, not markup
    val (t2, _, c2) = extractMd("```\n# not a header [x](y)\n```\n")
    assert(t2.isEmpty && c2 == "# not a header [x](y)".length)
  }

  test("an unterminated fence consumes to EOF as code (the CommonMark rule)") {
    val (text, nf, cc) = extractMd("p\n```\na\nb")
    assert(text == "p" && nf == 1 && cc == 2)
  }
}

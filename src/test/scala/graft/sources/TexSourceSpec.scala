package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the LaTeX extractor: the fixture↔truth identity across id
  * classes, every stripping rule in isolation, the comment-quoted
  * \end{document} decoy, and malformation refusals. */
class TexSourceSpec extends AnyFunSuite {

  import TexSource._

  test("extractTex(texSource(id)) equals the closed-form truth across id classes") {
    for (id <- 0L until 60L)
      assert(extractTex(texSource(id)).contains(texExpected(id)), s"id=$id")
  }

  test("each stripping rule in isolation") {
    def x(body: String): Option[String] =
      extractTex(s"\\documentclass{article}\n\\begin{document}\n$body\n\\end{document}\n")
    assert(x("a % comment\nb").contains("a\nb"))
    assert(x("a $x+y$ b").contains("a b"))
    assert(x("a $$E$$ b").contains("a b"))
    assert(x("a \\[ E \\] b").contains("a b"))
    assert(x("\\begin{equation}\nE\n\\end{equation}\nb").contains("b"))
    assert(x("\\begin{itemize}\n\\item a\n\\end{itemize}").contains("a"))
    assert(x("\\textbf{bold} text").contains("bold text"))
    assert(x("\\unknown{dropped {nested}} kept").contains("kept"))
    assert(x("\\unknown[opt]{dropped} kept").contains("kept"))
    assert(x("a\\%b \\_ \\{ \\} \\& \\#").contains("a%b _ { } & #"))
    assert(x("a~b").contains("a b"))
    assert(x("{grouped}").contains("grouped"))
    assert(x("\\maketitle\nb").contains("b"))
  }

  test("a comment-quoted \\end{document} is data, not the terminator") {
    val tex = "\\begin{document}\nkeep1\n% fake \\end{document} here\nkeep2\n\\end{document}\n"
    assert(extractTex(tex).contains("keep1\nkeep2"))
  }

  test("malformations refuse instead of guessing") {
    assert(extractTex("no document env at all").isEmpty)
    assert(extractTex("\\begin{document} unterminated").isEmpty) // no real end
    def x(body: String): Option[String] =
      extractTex(s"\\begin{document}\n$body\n\\end{document}\n")
    assert(x("a $unclosed math").isEmpty)
    assert(x("a $$unclosed display").isEmpty)
    assert(x("a \\[ unclosed").isEmpty)
    assert(x("\\begin{equation} never ends").isEmpty)
    assert(x("\\unknown{unclosed group").isEmpty)
    assert(x("lone backslash \\ before space").isEmpty)
  }
}

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
    // single-char control sequences: line break (+glue arg), spacing, accents
    assert(x("a\\\\b").contains("a\nb"))
    assert(x("a\\\\[2pt]b").contains("a\nb"))
    assert(x("caf\\'e and Gau\\ss? no: stra\\ss e").isDefined)
    assert(x("caf\\'e").contains("cafe"))
    assert(x("x \\, y \\; z \\ w").contains("x y z w"))
  }

  test("comment-quoted structure is data everywhere, not parse signals") {
    // quoted \end{document}
    val t1 = "\\begin{document}\nkeep1\n% fake \\end{document} here\nkeep2\n\\end{document}\n"
    assert(extractTex(t1).contains("keep1\nkeep2"))
    // a PREAMBLE comment quoting \begin{document} must not start the body
    val t2 = "% after \\begin{document} we emit X\n\\documentclass{a}\n" +
      "\\begin{document}\ntext\n\\end{document}\n"
    assert(extractTex(t2).contains("text"))
    // a commented \end{equation} inside the env must not close the drop
    val t3 = "\\begin{document}\n\\begin{equation}\n% fake \\end{equation}\n" +
      "E=mc^2\n\\end{equation}\nreal\n\\end{document}\n"
    assert(extractTex(t3).contains("real"))
    // a commented closing $ must not end inline math
    val t4 = "\\begin{document}\na $x +\n% $ decoy\ny$ b\n\\end{document}\n"
    assert(extractTex(t4).contains("a b"))
    // an ESCAPED dollar inside math must not close it either
    val t5 = "\\begin{document}\na $cost \\$5 total$ b\n\\end{document}\n"
    assert(extractTex(t5).contains("a b"))
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
    assert(x("unterminated glue a\\\\[2pt b").isEmpty)
    assert(extractTex("\\begin{document} trailing backslash \\").isEmpty)
  }
}

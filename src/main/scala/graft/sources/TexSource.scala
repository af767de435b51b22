package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** LaTeX text extraction — the arXiv arrival format, the document
  * container scientific pretraining corpora lead with (arXiv publishes
  * TeX sources; the PDF beside it is this repo's pdf_extract).
  *
  * Reference scope note: no document-format code exists in the
  * reference (983 lines, word counting only); this is LLM-pipeline
  * extension surface like PdfSource, built from the public LaTeX2e
  * syntax rules.
  *
  * The extractor is a real character scanner, not a regex pile:
  *  - only the `\begin{document} … \end{document}` body is text (the
  *    preamble — documentclass/usepackage/title — is configuration);
  *  - comments: an unescaped `%` eats to end of line;
  *  - math is DROPPED: `$…$` inline, `$$…$$` display, `\[ … \]`
  *    display, and drop-environments (equation/align/tabular/figure/
  *    verbatim) vanish entirely — math tokens are noise to a text LM
  *    and real extractors (e.g. the arXiv pipeline) strip them;
  *  - keep-environments (itemize/enumerate/abstract/…) contribute
  *    their CONTENTS, the `\begin`/`\end` tags themselves vanish;
  *  - commands: `\section{X}`/`\textbf{X}`/`\emph{X}`-style wrappers
  *    unwrap to X; `\item` vanishes keeping its line; any OTHER
  *    command drops itself AND its braced argument (plus one optional
  *    `[…]`); bare braces unwrap;
  *  - escapes `\% \_ \{ \} \& \# \$` become their literal character;
  *    `~` is an unbreakable space.
  * Post-pass: lines are whitespace-collapsed and trimmed; empty lines
  * drop. Malformed input (unclosed math/group/environment, missing
  * document body) returns None — the parse-as-filter contract every
  * container in this repo follows.
  *
  * Scale shape: pure per-document function through mapPartitions, one
  * task per doc, no state, no shuffle (the pdf_extract family). */
object TexSource {

  private val DropEnvs = Set(
    "equation", "equation*", "align", "align*", "tabular", "figure", "verbatim")
  private val UnwrapCmds = Set(
    "section", "subsection", "subsubsection", "paragraph",
    "textbf", "textit", "texttt", "emph", "underline")

  /** Extract the visible text of a LaTeX source, or None on
    * malformation. See the object doc for the rules. */
  def extractTex(tex: String): Option[String] = {
    val bTag = "\\begin{document}"
    val bdoc = tex.indexOf(bTag)
    if (bdoc < 0) return None
    // `\end{document}` is recognized DURING the scan, not by indexOf:
    // a comment (or verbatim) legally QUOTES the tag, and a textual
    // search would truncate the body there — the fixture plants exactly
    // that decoy.
    val body = tex.substring(bdoc + bTag.length)
    val n = body.length
    val out = new StringBuilder
    var ended = false
    var i = 0
    while (!ended && i < n) {
      body.charAt(i) match {
        case '%' => // comment: eat to EOL, keep the newline itself
          while (i < n && body.charAt(i) != '\n') i += 1
        case '$' =>
          if (i + 1 < n && body.charAt(i + 1) == '$') {
            val close = body.indexOf("$$", i + 2)
            if (close < 0) return None
            i = close + 2
          } else {
            val close = body.indexOf('$', i + 1)
            if (close < 0) return None
            i = close + 1
          }
        case '~' => out += ' '; i += 1
        case '{' => i += 1 // bare group: unwrap
        case '}' => i += 1
        case '\\' =>
          if (i + 1 < n && "%_{}&#$".indexOf(body.charAt(i + 1)) >= 0) {
            out += body.charAt(i + 1); i += 2
          } else if (body.startsWith("\\[", i)) {
            val close = body.indexOf("\\]", i + 2)
            if (close < 0) return None
            i = close + 2
          } else if (body.startsWith("\\begin{", i)) {
            val cb = body.indexOf('}', i + 7)
            if (cb < 0) return None
            val env = body.substring(i + 7, cb)
            if (DropEnvs(env)) {
              val endTag = s"\\end{$env}"
              val close = body.indexOf(endTag, cb + 1)
              if (close < 0) return None
              i = close + endTag.length
            } else i = cb + 1
          } else if (body.startsWith("\\end{", i)) {
            val cb = body.indexOf('}', i + 5)
            if (cb < 0) return None
            if (body.substring(i + 5, cb) == "document") ended = true
            i = cb + 1
          } else {
            var j = i + 1
            while (j < n && body.charAt(j).isLetter) j += 1
            if (j == i + 1) return None // lone backslash before non-letter
            var name = body.substring(i + 1, j)
            if (j < n && body.charAt(j) == '*') { name += "*"; j += 1 }
            if (j < n && body.charAt(j) == '[') {
              val cb = body.indexOf(']', j)
              if (cb < 0) return None
              j = cb + 1
            }
            if (j < n && body.charAt(j) == '{') {
              if (UnwrapCmds(name)) i = j // the '{' branch unwraps
              else {
                // unknown command: drop its whole braced group (nested)
                var depth = 1
                var k = j + 1
                while (k < n && depth > 0) {
                  body.charAt(k) match {
                    case '{' => depth += 1
                    case '}' => depth -= 1
                    case _ => ()
                  }
                  k += 1
                }
                if (depth != 0) return None
                i = k
              }
            } else i = j // bare command (\item, \maketitle): vanishes
          }
        case c => out += c; i += 1
      }
    }
    if (!ended) return None // no real \end{document} (quoted ones don't count)
    Some(out.toString.split("\n", -1)
      .map(_.replaceAll("\\s+", " ").trim).filter(_.nonEmpty).mkString("\n"))
  }

  // ───────────── deterministic fixture model (closed-form) ─────────────

  /** The staged LaTeX source for doc `id` — preamble + a body that
    * exercises every extractor rule (comment, inline/display/env math,
    * wrapper unwrap, unknown-command drop, escapes, ~, \item). */
  def texSource(id: Long): String =
    s"""% arXiv-style header comment for doc $id
       |\\documentclass[11pt]{article}
       |\\usepackage{amsmath}
       |\\title{Doc $id}
       |\\begin{document}
       |\\maketitle
       |\\section{Intro ${id % 9}}
       |Plain text ${id * 7} with \\textbf{bold ${id % 5}} and math $$x_{${id % 3}} + y$$ inline.
       |% a dropped comment mentioning \\end{document} is data, not structure
       |Escaped 100\\% and A\\_B and braces \\{x\\}.
       |Display \\[ a = $id \\] tail \\footnote{dropped note $id}.
       |\\begin{equation}
       |e = mc^2 + $id
       |\\end{equation}
       |\\begin{itemize}
       |\\item item one ${id % 3}
       |\\item item two~plus
       |\\end{itemize}
       |Final \\emph{line ${id % 4}} ends.
       |\\end{document}
       |""".stripMargin

  /** The extracted-text truth for doc `id` (the oracle rebuilds this in
    * SQL; extractTex(texSource(id)) must equal it — pinned in
    * TexSourceSpec across ids). */
  def texExpected(id: Long): String = Seq(
    s"Intro ${id % 9}",
    s"Plain text ${id * 7} with bold ${id % 5} and math inline.",
    s"Escaped 100% and A_B and braces {x}.",
    "Display tail .",
    s"item one ${id % 3}",
    "item two plus",
    s"Final line ${id % 4} ends.").mkString("\n")

  /** (doc_id, source, text, n_lines, n_chars) over the corpus — bytes
    * built and parsed per row inside the executors (parse-as-filter,
    * map-only; the pdf_extract shape). */
  def extractedTexts(spark: SparkSession, dataDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dataDir)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val text = extractTex(texSource(id)).getOrElse(
          throw new IllegalStateException(s"fixture doc $id failed to extract"))
        (id, src, text, text.split("\n", -1).length.toLong, text.length.toLong)
      })
      .toDF("doc_id", "source", "text", "n_lines", "n_chars")
  }
}

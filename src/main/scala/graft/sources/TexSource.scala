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

  // Hoisted: the whitespace collapse runs per LINE on a corpus-linear
  // path, and String.replaceAll compiles its Pattern per call.
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  private val DropEnvs = Set(
    "equation", "equation*", "align", "align*", "tabular", "figure", "verbatim")
  private val UnwrapCmds = Set(
    "section", "subsection", "subsubsection", "paragraph",
    "textbf", "textit", "texttt", "emph", "underline")

  /** Comment-aware forward search: the index where `target` begins
    * OUTSIDE comments and not hidden behind a backslash pair, or -1.
    * TeX's `%` comments everywhere (including inside math and dropped
    * environments), and `\%`/`\$`/`\\` hide the following character —
    * a plain indexOf search would terminate math or an environment at
    * a commented decoy tag, leaking stripped content into the text. */
  private def scanPast(s: String, from: Int, target: String): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\') {
        if (target.charAt(0) == '\\' && s.startsWith(target, i)) return i
        i += 2 // escape pair: hides %, $, etc.
      } else if (c == '%') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (s.startsWith(target, i)) return i
      else i += 1
    }
    -1
  }

  /** Extract the visible text of a LaTeX source, or None on
    * malformation. See the object doc for the rules. */
  def extractTex(tex: String): Option[String] = {
    val bTag = "\\begin{document}"
    // Comment-aware locate: a preamble comment that QUOTES the begin
    // tag (the fixture plants one) must not start the body inside it.
    val bdoc = scanPast(tex, 0, bTag)
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
            val close = scanPast(body, i + 2, "$$")
            if (close < 0) return None
            i = close + 2
          } else {
            val close = scanPast(body, i + 1, "$")
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
            val close = scanPast(body, i + 2, "\\]")
            if (close < 0) return None
            i = close + 2
          } else if (body.startsWith("\\begin{", i)) {
            val cb = body.indexOf('}', i + 7)
            if (cb < 0) return None
            val env = body.substring(i + 7, cb)
            if (DropEnvs(env)) {
              val endTag = s"\\end{$env}"
              // Comment-aware: a commented `\end{env}` inside the
              // environment must not close the drop early (the fixture
              // plants one inside the equation).
              val close = scanPast(body, cb + 1, endTag)
              if (close < 0) return None
              i = close + endTag.length
            } else i = cb + 1
          } else if (body.startsWith("\\end{", i)) {
            val cb = body.indexOf('}', i + 5)
            if (cb < 0) return None
            if (body.substring(i + 5, cb) == "document") ended = true
            i = cb + 1
          } else if (i + 1 < n && !body.charAt(i + 1).isLetter) {
            // Single-character control sequences — ubiquitous in real
            // LaTeX, so they must not refuse the document: `\\` is a
            // line break (newline; an optional [2pt] glue arg drops),
            // spacing controls (`\ `, `\,`, `\;`, `\:`, `\!`) become a
            // space, and accent commands (`\'e`, `\"o`, `\^a`, …)
            // vanish leaving their letter to be emitted normally.
            val c2 = body.charAt(i + 1)
            if (c2 == '\\') {
              out += '\n'
              i += 2
              if (i < n && body.charAt(i) == '[') {
                val cb = body.indexOf(']', i)
                if (cb < 0) return None
                i = cb + 1
              }
            } else {
              if (c2 == ' ' || c2 == ',' || c2 == ';' || c2 == ':' || c2 == '!')
                out += ' '
              i += 2
            }
          } else {
            var j = i + 1
            while (j < n && body.charAt(j).isLetter) j += 1
            if (j == i + 1) return None // trailing backslash at EOF
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
      .map(l => WsRe.matcher(l).replaceAll(" ").trim)
      .filter(_.nonEmpty).mkString("\n"))
  }

  // ───────────── deterministic fixture model (closed-form) ─────────────

  /** The staged LaTeX source for doc `id` — preamble + a body that
    * exercises every extractor rule (comment, inline/display/env math,
    * wrapper unwrap, unknown-command drop, escapes, ~, \item). */
  def texSource(id: Long): String =
    s"""% header for doc $id — note: after \\begin{document} we emit X (a DECOY:
       |% a textual search for the begin tag starts the body inside this comment)
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
       |Broken\\\\line ${id % 6} and caf\\'e con \\,leche.
       |\\begin{equation}
       |% a commented fake \\end{equation} must not close the drop
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
    "Broken",
    s"line ${id % 6} and cafe con leche.",
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

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Markdown text extraction — the README/documentation format code and
  * docs corpora arrive in (every GitHub repository leads with one).
  *
  * Rules (CommonMark essentials, deterministic):
  *  - FENCED CODE BLOCKS (``` … ```) leave the prose channel: their
  *    contents are counted separately (`code_chars`) — a curation
  *    pipeline routes code and prose to different filters, so the
  *    split must be measurable, exactly like ipynb_extract's
  *    cells;
  *  - ATX headers lose their `#` markers, keeping the heading text;
  *  - images `![alt](url)` keep the ALT text (it is the caption);
  *    links `[text](url)` keep the link text — images rewrite FIRST or
  *    the leading `!` survives the link rule;
  *  - emphasis `**x**` / `*x*` and inline code `` `x` `` unwrap; code
  *    spans bind FIRST (CommonMark precedence — masked before the
  *    link/emphasis rewrites, so `*args` or `[i]` inside backticks
  *    survives literally);
  *  - blank lines drop; other lines are trimmed.
  * Inline transforms are Spark-regex-safe (no lookahead), applied in a
  * fixed order; the whole pass is a pure per-document function through
  * mapPartitions (the pdf/tex parse-as-filter family).
  */
object MarkdownSource {

  // Hoisted: extractMd runs per LINE on a corpus-linear path — compiling
  // these patterns inside the loop would rebuild them millions of times.
  private val CodeSpanRe = "`([^`]+)`".r
  private val MaskRe = "\u0000(\\d+)\u0000".r
  // String.replaceAll compiles its Pattern per CALL; the inline rewrites
  // below use pre-compiled Patterns instead — identical semantics
  // (replaceAll(re, r) IS Pattern.compile(re).matcher(s).replaceAll(r))
  // minus ~6 Pattern.compiles per line.
  private val HeaderRe = java.util.regex.Pattern.compile("^#{1,6}\\s+")
  private val ImageRe = java.util.regex.Pattern.compile("!\\[([^\\]]*)\\]\\([^)]*\\)")
  private val LinkRe = java.util.regex.Pattern.compile("\\[([^\\]]*)\\]\\([^)]*\\)")
  private val BoldRe = java.util.regex.Pattern.compile("\\*\\*([^*]+)\\*\\*")
  private val EmphRe = java.util.regex.Pattern.compile("\\*([^*]+)\\*")
  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** (prose text, n_fences, code_chars) for one markdown document. */
  def extractMd(md: String): (String, Int, Long) = {
    val lines = md.split("\n", -1)
    val prose = Seq.newBuilder[String]
    var inFence = false
    var nFences = 0
    var codeChars = 0L
    for (line <- lines) {
      if (line.startsWith("```")) {
        if (!inFence) nFences += 1
        inFence = !inFence
      } else if (inFence) {
        codeChars += line.length.toLong
      } else {
        // Inline code spans are MASKED before any other inline rule and
        // restored after (CommonMark precedence: code spans bind before
        // emphasis/links) — a span containing `*args` or `[i]` must
        // come through literally, not be mangled by the emphasis/link
        // rewrites (round-18 ADVICE).
        // Fast path: no backtick means no span to mask — skip the
        // mask/restore machinery (and its buffer) entirely.
        val hasCode = line.indexOf('`') >= 0
        val codes =
          if (hasCode) scala.collection.mutable.ArrayBuffer.empty[String] else null
        val masked =
          if (hasCode)
            CodeSpanRe.replaceAllIn(line.replace("\u0000", ""), m => {
              codes += m.group(1)
              "\u0000" + (codes.length - 1) + "\u0000"
            })
          else line
        // Cheap char guards skip whole-line regex scans for rules whose
        // trigger character is absent (most lines carry no [ or *).
        var rewritten = masked
        if (rewritten.length > 0 && rewritten.charAt(0) == '#')
          rewritten = HeaderRe.matcher(rewritten).replaceAll("")
        if (rewritten.indexOf('[') >= 0) {
          rewritten = ImageRe.matcher(rewritten).replaceAll("$1") // images first
          rewritten = LinkRe.matcher(rewritten).replaceAll("$1")
        }
        if (rewritten.indexOf('*') >= 0) {
          rewritten = BoldRe.matcher(rewritten).replaceAll("$1")
          rewritten = EmphRe.matcher(rewritten).replaceAll("$1")
        }
        val t0 = (if (hasCode)
            MaskRe.replaceAllIn(rewritten, m =>
              scala.util.matching.Regex.quoteReplacement(codes(m.group(1).toInt)))
          else rewritten)
        val t = WsRe.matcher(t0).replaceAll(" ").trim
        if (t.nonEmpty) prose += t
      }
    }
    (prose.result().mkString("\n"), nFences, codeChars)
  }

  // ───────────── deterministic fixture model (closed-form) ─────────────

  /** The staged markdown for doc `id` — one of each rule. */
  def mdSource(id: Long): String =
    s"""# Title ${id % 9}
       |
       |Intro *emphasis ${id % 5}* and **bold ${id % 7}** and `code ${id % 3}`.
       |[Link ${id % 4}](http://example.com/$id) and ![img ${id % 2}](x.png) here.
       |
       |```scala
       |val x = ${id * 13}
       |```
       |Tail ${id % 6} line.
       |""".stripMargin

  /** The prose truth for doc `id` (oracle rebuilds it in SQL). */
  def mdExpected(id: Long): String = Seq(
    s"Title ${id % 9}",
    s"Intro emphasis ${id % 5} and bold ${id % 7} and code ${id % 3}.",
    s"Link ${id % 4} and img ${id % 2} here.",
    s"Tail ${id % 6} line.").mkString("\n")

  /** Code chars of doc `id`'s one fence (the `val x = …` line). */
  def mdCodeChars(id: Long): Long = s"val x = ${id * 13}".length.toLong

  /** (doc_id, source, text, n_fences, code_chars, n_chars) over the
    * corpus — parse-as-filter, map-only (the pdf/tex family). */
  def extractedMd(spark: SparkSession, dataDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, dataDir)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) =>
        val (text, nf, cc) = extractMd(mdSource(id))
        (id, src, text, nf.toLong, cc, text.length.toLong)
      })
      .toDF("doc_id", "source", "text", "n_fences", "code_chars", "n_chars")
  }
}

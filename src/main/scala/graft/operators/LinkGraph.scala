package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hyperlink extraction + URL resolution — the step between fetching a
  * page and growing the crawl frontier (and the edge list behind link-
  * graph quality signals like host in/out-degree and PageRank).
  *
  * Reference scope note: the reference library has no crawl code at all
  * (its 983 lines stop at word counting, FileWordCounter.cpp); this is
  * part of the LLM-pipeline extension surface, built from the public
  * specs it implements: RFC 3986 §5.2 (reference resolution, including
  * the full remove_dot_segments algorithm) and WHATWG-HTML-shaped
  * attribute syntax (double-/single-/un-quoted values, case-insensitive
  * tag and attribute names, comments are not content).
  *
  * Scale shape: extraction + resolution is a map-only pass (one task per
  * input split, no state); everything downstream is ordinary groupBy
  * aggregation over the edge list. At 100 TB the edge list shuffles once
  * on host for the degree audit — there is no other exchange.
  */
object LinkGraph {

  // ───────────────────────── URL resolution (RFC 3986) ─────────────────────────

  /** Split an absolute hierarchical URL (scheme "://" authority [path]
    * [query]) into its parts. The fragment must already be stripped.
    * None when there is no "://" — opaque schemes (mailto:) are out of
    * scope for a web frontier. */
  private def split(url: String): Option[(String, String, String, String)] = {
    val si = url.indexOf("://")
    if (si <= 0) return None
    val scheme = url.substring(0, si)
    val rest = url.substring(si + 3)
    val slash = rest.indexOf('/')
    val qMarkAuth = rest.indexOf('?')
    // a ? before any / ends the authority too (http://h.test?q=1)
    val authEnd =
      if (slash < 0 && qMarkAuth < 0) rest.length
      else if (slash < 0) qMarkAuth
      else if (qMarkAuth >= 0 && qMarkAuth < slash) qMarkAuth
      else slash
    val auth = rest.substring(0, authEnd)
    val pq = rest.substring(authEnd)
    val qi = pq.indexOf('?')
    val (path, query) = if (qi < 0) (pq, "") else (pq.substring(0, qi), pq.substring(qi))
    if (auth.isEmpty) None else Some((scheme, auth, path, query))
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, verbatim: segments move to the
    * output buffer including their leading slash; "/../" pops the last
    * moved segment. */
  def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next < 0) in else in.substring(0, next)
        out += seg
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** One-pass minimal HTML attribute unescape — the five predefined
    * entities. Single pass by construction: a produced '&' is never
    * re-examined, so "&amp;lt;" yields the literal "&lt;". */
  def unescape(s: String): String = {
    val ents = Array("&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>',
      "&quot;" -> '"', "&#39;" -> '\'')
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var matched = false
      if (s.charAt(i) == '&') {
        var e = 0
        while (!matched && e < ents.length) {
          val (ent, ch) = ents(e)
          if (s.regionMatches(i, ent, 0, ent.length)) {
            sb.append(ch); i += ent.length; matched = true
          }
          e += 1
        }
      }
      if (!matched) { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Resolve `rawHref` against the absolute `base` per RFC 3986 §5.2:
    * attribute-unescape, strip the fragment, then the five-way transform
    * (absolute / scheme-relative / absolute-path / relative-merge /
    * empty = same-document, which KEEPS the base query per §5.3). None
    * when the result has no authority (opaque schemes) or the base is
    * not an absolute hierarchical URL. */
  def resolve(base: String, rawHref: String): Option[String] = {
    val unesc = unescape(rawHref).trim
    val href = { val h = unesc.indexOf('#'); if (h >= 0) unesc.substring(0, h) else unesc }
    val baseNoFrag = { val h = base.indexOf('#'); if (h >= 0) base.substring(0, h) else base }
    split(baseNoFrag).flatMap { case (bs, ba, bp, bq) =>
      if (href.isEmpty) Some(s"$bs://$ba$bp$bq")
      else if (href.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*"))
        split(href).map { case (s2, a2, p2, q2) => s"$s2://$a2${removeDotSegments(p2)}$q2" }
      else if (href.startsWith("//"))
        split(s"$bs:$href").map { case (s2, a2, p2, q2) => s"$s2://$a2${removeDotSegments(p2)}$q2" }
      else {
        val qi = href.indexOf('?')
        val (p, q) = if (qi < 0) (href, "") else (href.substring(0, qi), href.substring(qi))
        if (p.isEmpty) Some(s"$bs://$ba$bp$q") // §5.2.2: "?y" keeps the base path
        else if (p.startsWith("/")) Some(s"$bs://$ba${removeDotSegments(p)}$q")
        else {
          val dir = if (bp.isEmpty) "/" else bp.substring(0, bp.lastIndexOf('/') + 1)
          Some(s"$bs://$ba${removeDotSegments(dir + p)}$q")
        }
      }
    }
  }

  /** Host (authority) of an absolute URL, or "" when malformed. */
  def hostOf(url: String): String = split(url).map(_._2).getOrElse("")

  // ─────────────────────────── href extraction ───────────────────────────

  private val CommentRe = "(?s)<!--.*?-->".r
  private val ATagRe = "(?is)<a\\b[^>]*>".r
  // (?<![\w-]): `\bhref` alone also matches inside `data-href=` (the
  // hyphen is a word BOUNDARY), silently harvesting dataset attributes
  // as links — the lookbehind refuses any word-char or hyphen prefix.
  private val HrefRe = "(?is)(?<![\\w-])href\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>\"']+))".r

  /** href values of <a> tags: comments removed FIRST (a commented-out
    * link is not a link), tag and attribute names case-insensitive,
    * double-/single-/un-quoted values, anchors without href skipped,
    * `data-href`-style attribute suffixes NOT treated as href. */
  def hrefs(html: String): Seq[String] = {
    val noComments = CommentRe.replaceAllIn(html, "")
    ATagRe.findAllIn(noComments).toSeq.flatMap { tag =>
      HrefRe.findFirstMatchIn(tag).map { m =>
        Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3))
      }
    }
  }

  // ─────────────────── staged page model (closed-form) ───────────────────
  // One HTML page per document. Links point at a fixed 997-id universe
  // (targets need not exist — a frontier grows past the crawled set), in
  // five literal forms that all resolve closed-form: absolute, scheme-
  // relative, absolute-path, same-directory relative, and dot-dot
  // traversal. Decorations exercise the parser: quote style and tag/attr
  // case vary, some links carry fragments (stripped) or an &amp;-escaped
  // query (unescaped), every page carries a commented-out link and a
  // no-href anchor (both ignored), and every 11th page an empty-href
  // self-reference (resolves to the page itself per §5.3).

  def lgHost(x: Long): String = s"h${x % 7}.test"
  def lgUrl(x: Long): String = s"http://${lgHost(x)}/a${x % 3}/b${x % 5}/p$x.html"
  def lgLinkCount(id: Long): Int = ((id % 4) + 2).toInt
  def lgTarget(id: Long, k: Int): Long = (id * 7 + k * 13 + 1) % 997

  /** The literal href written into page `id` for link `k`. */
  def lgHref(id: Long, k: Int): String = {
    val t = lgTarget(id, k)
    val core = ((id + k) % 5) match {
      case 0 =>
        val q = if ((id + k) % 6 == 0) "?x=1&amp;y=2" else ""
        lgUrl(t) + q
      case 1 => s"//${lgHost(t)}/a${t % 3}/b${t % 5}/p$t.html"
      case 2 => s"/a${t % 3}/b${t % 5}/p$t.html"
      case 3 => s"p$t.html"
      case _ => s"../c${t % 3}/q$t.html"
    }
    if (k % 3 == 0) core + s"#s$k" else core
  }

  /** The RESOLVED URL link (id, k) must produce — what the oracle
    * computes and [[resolve]] must reproduce by running the algorithm. */
  def lgResolved(id: Long, k: Int): String = {
    val t = lgTarget(id, k)
    ((id + k) % 5) match {
      case 0 => lgUrl(t) + (if ((id + k) % 6 == 0) "?x=1&y=2" else "")
      case 1 => s"http://${lgHost(t)}/a${t % 3}/b${t % 5}/p$t.html"
      case 2 => s"http://${lgHost(id)}/a${t % 3}/b${t % 5}/p$t.html"
      case 3 => s"http://${lgHost(id)}/a${id % 3}/b${id % 5}/p$t.html"
      case _ => s"http://${lgHost(id)}/a${id % 3}/c${t % 3}/q$t.html"
    }
  }

  /** The complete staged page: varied quoting/case around each modeled
    * link plus the parser traps. */
  def lgHtml(id: Long): String = {
    val sb = new StringBuilder
    sb.append(s"<html><head><title>p$id</title></head><body>\n")
    sb.append("<!-- <a href=\"http://dead.test/x.html\">commented out</a> -->\n")
    sb.append("<a name=\"top\">no href here</a>\n")
    var k = 0
    while (k < lgLinkCount(id)) {
      val href = lgHref(id, k)
      val tag = if ((id + k) % 4 == 2) "A" else "a"
      val attr = if (id % 2 == 1) "HREF" else "href"
      val extra = if (k % 4 == 1) "class=\"nav\" " else ""
      val lit =
        if ((id + k) % 7 == 3) href // unquoted attribute value
        else if ((id + k) % 2 == 0) "\"" + href + "\""
        else "'" + href + "'"
      sb.append(s"<$tag $extra$attr=$lit>t$k</$tag>\n")
      k += 1
    }
    if (id % 11 == 0) sb.append("<a href=\"\">self</a>\n")
    sb.append("</body></html>")
    sb.toString
  }

  /** Staged page frame: (doc_id, source, url, html), built in-memory per
    * pass — the oracle replays the link model, never these strings. */
  def pagesStaged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) => (id, src, lgUrl(id), lgHtml(id)) })
      .toDF("doc_id", "source", "url", "html")
  }

  /** Edge extraction: parse hrefs out of the HTML and resolve each
    * against the page URL — map-only, the parse is the filter
    * (unresolvable hrefs drop). */
  def edgesOf(s: SparkSession, pages: DataFrame): DataFrame = {
    import s.implicits._
    pages.select(col("doc_id"), col("url"), col("html"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, url, html) =>
        hrefs(html).flatMap(h => resolve(url, h)).map { dst =>
          (id, hostOf(url), dst, hostOf(dst))
        }
      })
      .toDF("src_id", "src_host", "dst_url", "dst_host")
  }
}

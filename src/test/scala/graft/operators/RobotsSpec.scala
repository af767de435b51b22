package graft.operators

import graft.SparkSpec

/** Drives CrawlQueries.evalRobots over crafted policies, pinning each
  * RFC 9309 rule in isolation: group selection exclusivity, stacked
  * User-agent lines, longest-match with the allow tie-break, `*` and
  * `$` pattern semantics, pre-group rule exclusion, and the empty-value
  * no-op.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def allowed(policy: String, paths: Seq[String]): Map[String, Boolean] = {
    val robots = Seq(("x", policy)).toDF("host", "content")
    val frontier = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, "x", p) }
      .toDF("doc_id", "host", "path")
    CrawlQueries.evalRobots(robots, frontier)
      .collect().map(r => r.getString(2) -> r.getBoolean(3)).toMap
  }

  test("product-token group applies EXCLUSIVELY over the * group") {
    val p = "User-agent: *\nDisallow: /a\n\nUser-agent: graftbot\nDisallow: /b\n"
    val d = allowed(p, Seq("/a/x", "/b/x", "/c"))
    assert(d("/a/x"), "the * group's rule must NOT leak into the selected group")
    assert(!d("/b/x") && d("/c"))
  }

  test("stacked User-agent lines share one group; a UA line after rules starts a new one") {
    val p = "User-agent: other\nUser-agent: graftbot\nDisallow: /a\n" +
      "User-agent: third\nDisallow: /b\n"
    val d = allowed(p, Seq("/a", "/b"))
    assert(!d("/a"), "graftbot stacked into the first group")
    assert(d("/b"), "the UA line after rules opened a NEW group not matching us")
  }

  test("longest match wins; exact-length ties break to allow") {
    val p = "User-agent: *\nDisallow: /p\nAllow: /p\nDisallow: /q/long\nAllow: /q\n"
    val d = allowed(p, Seq("/p/x", "/q/long/x", "/q/x"))
    assert(d("/p/x"), "equal-length allow and disallow -> allow (least restrictive)")
    assert(!d("/q/long/x"), "the longer disallow beats the shorter allow")
    assert(d("/q/x"))
  }

  test("* matches any octet sequence and $ anchors the end") {
    val p = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*x\n"
    val d = allowed(p, Seq("/docs/a.pdf", "/docs/a.pdfz", "/tmp123x", "/tmp123y"))
    assert(!d("/docs/a.pdf") && d("/docs/a.pdfz"))
    assert(!d("/tmp123x") && d("/tmp123y"))
  }

  test("rules before any User-agent line are ignored; empty values are no-ops") {
    val p = "Disallow: /\nUser-agent: *\nDisallow:\nAllow: /ok\n"
    val d = allowed(p, Seq("/anything", "/ok/x"))
    assert(d("/anything"), "the pre-group blanket disallow belongs to no group")
    assert(d("/ok/x"))
  }

  test("a host with no matching group allows everything") {
    val d = allowed("User-agent: other\nDisallow: /\n", Seq("/a", "/b"))
    assert(d("/a") && d("/b"))
  }

  test("CRLF robots.txt must not fail open") {
    // Windows line endings are the common real-world case: a parser
    // splitting on bare \n leaves \r on every token, no group matches,
    // and everything is allowed — the dangerous direction.
    val p = "User-agent: *\r\nDisallow: /private\r\nAllow: /private/ok\r\n"
    val d = allowed(p, Seq("/private/x", "/private/ok/y", "/open"))
    assert(!d("/private/x"), "CRLF policy must still deny")
    assert(d("/private/ok/y") && d("/open"))
  }

  test("regex metacharacters in patterns are literal (except * and trailing $)") {
    val p = "User-agent: *\nDisallow: /*?sessionid=\nDisallow: /a(b\nDisallow: /c$d\n"
    val d = allowed(p, Seq(
      "/page?sessionid=1", // '*' spans, '?' literal
      "/pagesessionid=1",  // no literal '?' -> allowed
      "/a(b/x",            // '(' literal, no crash
      "/c$d/e",            // mid-pattern '$' literal per the RFC
      "/cd/e"))
    assert(!d("/page?sessionid=1"))
    assert(d("/pagesessionid=1"))
    assert(!d("/a(b/x"))
    assert(!d("/c$d/e"))
    assert(d("/cd/e"))
  }
}

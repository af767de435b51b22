package graft.operators

import graft.SparkSpec

/** Pins for the URL canonicalizer behind dedup_url_canonical — the
  * cases the staged oracle model cannot reach: non-default ports must
  * SURVIVE, default ports are scheme-specific, empty/root paths and
  * all-tracking query strings normalize cleanly. */
class UrlCanonSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    DedupQueries.canonicalUrls(urls.toDF("url"))
      .select("canonical_url").as[String].collect().toSeq
  }

  test("default ports strip only when they match the scheme") {
    assert(canon(
      "http://Example.com:80/a",
      "https://Example.com:443/a",
      "http://Example.com:443/a",  // 443 is NOT http's default: keep
      "https://Example.com:80/a",  // 80 is NOT https's default: keep
      "http://Example.com:8080/a") == Seq(
      "http://example.com/a",
      "https://example.com/a",
      "http://example.com:443/a",
      "https://example.com:80/a",
      "http://example.com:8080/a"))
  }

  test("path and query normalization edge cases") {
    assert(canon(
      "http://x.com",                       // empty path -> "/"
      "http://x.com/",                      // root stays "/"
      "http://x.com///a//b///",             // slash runs + trailing
      "http://x.com/a?utm_source=t",        // all params tracking -> none
      "http://x.com/a?z=1&a=2&utm_medium=m",// sort + strip
      "HTTP://X.COM/A#frag") == Seq(        // case + fragment
      "http://x.com/",
      "http://x.com/",
      "http://x.com/a/b",
      "http://x.com/a",
      "http://x.com/a?a=2&z=1",
      "http://x.com/A"))                    // path case is PRESERVED
  }

  test("bracketed IPv6 authorities: colons are not ports") {
    // A substring-after-':' port parse would turn '[::1]' into port '1]'
    // and emit 'http://[::1]:1]/a'; the port must be trailing :digits only.
    assert(canon(
      "http://[::1]/a",                       // no port at all
      "http://[2001:DB8::1]:8080/a",          // real non-default port kept
      "http://[2001:DB8::1]:80/a") == Seq(    // default port stripped
      "http://[::1]/a",
      "http://[2001:db8::1]:8080/a",
      "http://[2001:db8::1]/a"))
  }

  test("distinct messy variants of one resource collapse to one canonical") {
    val c = canon(
      "http://www.site.com:80//p/q/?b=2&a=1#x",
      "HTTP://WWW.SITE.COM/p/q?a=1&b=2&utm_source=s",
      "Http://www.Site.com/p/q/?b=2&a=1")
    assert(c.distinct == Seq("http://www.site.com/p/q?a=1&b=2"))
  }
}

package graft.operators

import graft.SparkSpec

/** Pins for the HTML -> text extractor behind text_html_extract: the
  * removal ORDER (script/style bodies before generic tags, entities
  * after tags) is what separates a correct extractor from a regex
  * one-liner. */
class HtmlExtractSpec extends SparkSpec {

  private def extract(htmls: String*): Seq[String] = {
    import spark.implicits._
    TextAnalysis.htmlToText(htmls.toDF("html"), "html", "x")
      .select("x").as[String].collect().toSeq
  }

  test("script and style bodies vanish even when they contain markup-like text") {
    assert(extract(
      """<p>a</p><script>var s = "</div><p>leak</p>"; if (1 < 2 && 3 > 0) {}</script><p>b</p>""",
      """<style>.c { color: red; } #x > span { top: 0; }</style>visible""",
      """<script src="x.js"></script>only""") ==
      Seq("a b", "visible", "only"))
  }

  test("entities decode AFTER tag removal, ampersand LAST") {
    // "&amp;lt;" is the ESCAPED text "&lt;" — a decoder running &amp;
    // first (or twice) would turn it into "<".
    assert(extract(
      "<p>&amp;lt;</p>",
      "<p>x &lt;tag&gt; y</p>",
      "<p>a&nbsp;b&quot;c&#39;d</p>") ==
      Seq("&lt;", "x <tag> y", "a b\"c'd"))
  }

  test("comments, whitespace runs and surrounding tags normalize") {
    assert(extract(
      "<div>a<!-- <p>hidden</p> -->b</div>",
      "  <h1>\n t1 </h1> \t <p>t2</p>  ",
      "plain text no markup") ==
      Seq("a b", "t1 t2", "plain text no markup"))
  }
}

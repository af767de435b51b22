package graft.operators

import graft.SparkSpec

/** Pins for the block-level boilerplate scorer behind text_boilerplate:
  * each of the three keep rules (length floor, link-density ceiling,
  * stopword-density floor) must bite IN ISOLATION, the boundaries are
  * inclusive, and anchor text counts toward link density but stays in
  * the visible text. The staged fixture only exercises the rules
  * jointly (its nav blocks fail all three at once), so these crafted
  * pages are the per-rule evidence.
  */
class BoilerplateSpec extends SparkSpec {

  /** Run the scorer over one single-block page and return
    * (anchor_chars, total_chars, words, stops, kept). */
  private def score(html: String): (Long, Long, Long, Long, Boolean) = {
    import spark.implicits._
    val rows = TextAnalysis.boilerplateBlocks(Seq(html).toDF("html"))
      .select("anchor_chars", "total_chars", "words", "stops", "kept")
      .collect()
    assert(rows.length == 1, s"expected one block from: $html")
    val r = rows.head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
  }

  // A phrase whose tokens are 25% stopwords ('the' of the,b,c,d) and
  // link-free: repeating it trips neither the link nor stopword rule,
  // so only the length floor can decide.
  private def phrase(n: Int) = Seq.fill(n)("the b c d").mkString(" ")

  test("length floor is inclusive at 40 visible chars") {
    // 4 repeats = 39 chars (9*4 + 3 joiners) -> dropped; adding one
    // char crosses to exactly 40 -> kept. Same words/stops profile.
    val (_, t39, _, _, k39) = score(s"<p>${phrase(4)}</p>")
    val (_, t40, _, _, k40) = score(s"<p>${phrase(4)}x</p>")
    assert(t39 == 39L && !k39)
    assert(t40 == 40L && k40)
  }

  test("link-density ceiling is inclusive at 30% of visible chars") {
    // visible = anchor + ' ' + 67-char link-free tail (phrase(5)=49,
    // ' uvwxyz'=7, ' uvwxyzabcd'=11); ceiling anchor*100 <= total*30:
    // 29-char anchor -> total 97, 2900 <= 2910 kept; 30-char anchor ->
    // total 98, 3000 > 2940 dropped. Stopword rule safe both ways
    // (5 stops / 23 words > 20%).
    def page(anchor: String) =
      s"<p><a href='/x'>$anchor</a> ${phrase(5)} uvwxyz uvwxyzabcd</p>"
    val (a1, t1, _, _, k1) = score(page("a" * 29))
    val (a2, t2, _, _, k2) = score(page("a" * 30))
    assert(a1 == 29L && t1 == 97L && k1)
    assert(a2 == 30L && t2 == 98L && !k2)
  }

  test("stopword floor is inclusive at 20% of words") {
    // 10 words of >= 40 chars, no anchors: 2 stopwords kept, 1 dropped.
    val (_, _, w1, s1, k1) = score("<p>the and abcde fghij klmno pqrst uvwxy zabcd efghi jklmn</p>")
    val (_, _, w2, s2, k2) = score("<p>the xyz abcde fghij klmno pqrst uvwxy zabcd efghi jklmn</p>")
    assert(w1 == 10L && s1 == 2L && k1)
    assert(w2 == 10L && s2 == 1L && !k2)
  }

  test("anchor text stays visible and repeated stopwords count per occurrence") {
    // 'the' appears inside and outside the anchor: both occurrences
    // count as stopwords AND the anchor body counts as link chars.
    val (a, t, w, s, _) = score("<p>the quick <a href='/r'>the link</a> data point here</p>")
    assert(a == 8L)          // 'the link'
    assert(t == 34L)         // 'the quick the link data point here'
    assert(w == 7L && s == 2L)
  }

  test("case-insensitive anchors and attribute-free tags count; nested markup leaves vis") {
    val (a, _, _, _, _) = score("<p>x <A HREF='/r'>UP</A> <a>plain</a> <b>bold</b> y</p>")
    assert(a == 7L)          // 'UP' + 'plain'; <b> is not an anchor
  }

  test("multi-block pages split on <p> and <div> alike, in document order") {
    import spark.implicits._
    val rows = TextAnalysis.boilerplateBlocks(
      Seq("<p>alpha</p><div>beta</div><p>gamma</p>").toDF("html"))
      .select("j", "vis").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((0, "alpha"), (1, "beta"), (2, "gamma")))
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Crafted-corpus pins for TextModelQueries — the fixture corpus draws
  * tokens independently of lang, so discrimination must be pinned here:
  * disjoint class vocabularies recover labels perfectly (and the
  * smoothed-zero path is what makes the wrong class lose), exact
  * symmetric ties break toward the alphabetically-first class, and the
  * perplexity flag catches a planted gibberish document and nothing
  * else.
  */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def h60p(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    (BigInt(md.take(15), 16) % 1000000007L).toLong
  }

  test("NB with disjoint class vocabularies recovers every label") {
    val docs = Seq(
      (1L, "apple avocado apple", "aa"),
      (2L, "avocado avocado apple", "aa"),
      (3L, "apple apple", "aa"),
      (4L, "banana blueberry", "bb"),
      (5L, "blueberry banana banana", "bb"),
      (6L, "banana banana blueberry blueberry", "bb")
    ).toDF("doc_id", "text", "lang")
    val m = TextModelQueries.nbConfusion(spark, docs).collect()
    // Diagonal only: every aa doc predicted aa, every bb doc predicted bb.
    // The WRONG class's score is all smoothed zeros — ln(1/(n_l+V)) per
    // token — which add-1 smoothing makes strictly smaller than any
    // observed-count likelihood, so this also pins the zero-count path.
    assert(m.toSeq == Seq(
      Row("aa", "aa", 3L, Seq(1L, 2L, 3L).map(i => h60p(i.toString)).sum),
      Row("bb", "bb", 3L, Seq(4L, 5L, 6L).map(i => h60p(i.toString)).sum)))
  }

  test("exact score ties break toward the alphabetically-first class") {
    // Both classes see the identical corpus ("x"), same prior, same
    // likelihoods: every doc's scores tie across classes, so both docs
    // must be predicted class "a".
    val docs = Seq(
      (1L, "x", "a"),
      (2L, "x", "b")
    ).toDF("doc_id", "text", "lang")
    val m = TextModelQueries.nbConfusion(spark, docs).collect()
    assert(m.toSeq == Seq(
      Row("a", "a", 1L, h60p("1")),
      Row("b", "a", 1L, h60p("2"))))
  }

  test("perplexity flag catches exactly the planted gibberish doc") {
    // Nine repetitive docs share one high-count bigram chain; doc 9 is
    // all singleton tokens, so each of its bigrams has c12=1, c1=1 against
    // a vocab of 10 — far below the corpus-average logprob and past the
    // 1.1x threshold; no repetitive doc should trip it.
    val rep = (0L until 9L).map(i => (i, "a b a b a b a b", "en"))
    val docs = (rep :+ ((9L, "q1 q2 q3 q4 q5 q6 q7 q8", "zz")))
      .toDF("doc_id", "text", "lang")
    val rows = TextModelQueries.lmPerplexityAudit(spark, docs).collect()
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    assert(byLang("en").getLong(4) == 0L, "no repetitive doc flagged")
    assert(byLang("zz").getLong(4) == 1L, "gibberish doc flagged")
    assert(byLang("zz").getLong(5) == h60p("9"), "flag checksum pins doc 9")
    assert(rows.forall(_.getLong(3) < 0L), "quantized logprob sums are negative")
  }
}

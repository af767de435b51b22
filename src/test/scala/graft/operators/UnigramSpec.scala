package graft.operators

import graft.SparkSpec

/** Pins for the unigram-LM Viterbi segmenter: global optimality beating
  * greedy longest-match, the (score, −tokens) tie rule, inventory
  * thresholding, and the 16-char word cap the unrolled oracle relies on. */
class UnigramSpec extends SparkSpec {

  test("Viterbi picks the globally optimal tiling, not the greedy one") {
    // Greedy longest-match takes "abc"+"d" = −1−10 = −11; the optimum
    // is "ab"+"cd" = −4. Viterbi must find it.
    val scores = Map[String, Long](
      "abc" -> -1L, "d" -> -10L, "ab" -> -2L, "cd" -> -2L,
      "a" -> -9L, "b" -> -9L, "c" -> -9L)
    assert(TextAnalysis.unigramViterbi("abcd", scores) == ((-4L, 2)))
  }

  test("equal scores break to fewer tokens") {
    val scores = Map[String, Long]("ab" -> -4L, "a" -> -2L, "b" -> -2L)
    assert(TextAnalysis.unigramViterbi("ab", scores) == ((-4L, 1)))
  }

  test("end-to-end histogram matches a hand computation") {
    import spark.implicits._
    // Corpus: "abab" ×5, "cd" ×2 (one word per doc).
    // Freq-weighted substring counts: a=10, b=10, ab=10, ba=5, aba=5,
    // bab=5, abab=5, c=2, d=2, cd=2. Kept: singles always; multi-char at
    // cnt≥5 — so "cd" (cnt 2) is DROPPED. Total kept = 54, bitlen 6.
    // Scores: bitlen−6 → a,b,ab = −2; ba,aba,bab,abab = −3; c,d = −4.
    // Viterbi "abab": [abab] = −3 beats [ab,ab] = −4 → (−3, 1).
    // Viterbi "cd": no "cd" piece → [c,d] = (−8, 2).
    val docs = (Seq.fill(5)("abab") ++ Seq.fill(2)("cd")).toDF("text")
    val got = TextAnalysis.unigramViterbiOf(spark, docs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def h(w: String) = graft.functions.JvmHash.h60p(w)
    assert(got.toSeq == Seq(
      (1, 1L, 5L, -3L, h("abab")),
      (2, 1L, 2L, -8L, h("cd"))))
  }

  test("words beyond the 16-char oracle cap are excluded on the Spark side too") {
    import spark.implicits._
    val docs = (Seq.fill(5)("ab") ++ Seq("abcdefghijklmnopq")).toDF("text") // 17 chars
    val got = TextAnalysis.unigramViterbiOf(spark, docs).collect()
    assert(got.length == 1 && got(0).getLong(1) == 1L) // only "ab" in the vocab
  }
}

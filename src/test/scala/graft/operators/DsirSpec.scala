package graft.operators

import graft.SparkSpec

/** The selection CLAIM behind text_dsir_select: the hashed-n-gram
  * importance weight actually discriminates — documents from the target
  * slice ('en') must be kept at a strictly higher rate than every other
  * language, and the keep gate must be live in both directions (neither
  * all-kept nor all-dropped anywhere). The oracle pins the exact
  * report; this spec pins the property that makes it a data-selection
  * method rather than a constant.
  */
class DsirSpec extends SparkSpec {

  test("target-language documents win the importance-weight gate") {
    val rows = graft.SparkEntry.queries("text_dsir_select")(spark, sf("sf0.001"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"), r.getAs[Long]("weight_sum")))
      .toMap
    assert(rows.contains("en") && rows.size >= 3)
    def keepPpm(l: String) = { val (n, k, _) = rows(l); k * 1000000 / n }
    for (l <- rows.keys if l != "en") {
      assert(keepPpm("en") > keepPpm(l),
        s"en keep rate ${keepPpm("en")} not above $l's ${keepPpm(l)}")
      // The target slice's mean log-weight dominates too (λ sums are
      // count-scaled, so compare per-doc averages).
      assert(rows("en")._3 / rows("en")._1 > rows(l)._3 / rows(l)._1,
        s"en mean weight not above $l's")
    }
    // The gate is live where the claim requires it: the target slice
    // keeps some and drops some, and corpus-wide both outcomes occur.
    // (A non-target lang MAY legitimately keep zero at the smallest SF —
    // every zh doc being more corpus-like than target-like is the method
    // working, not a degenerate gate.)
    val (en_n, en_k, _) = rows("en")
    assert(en_k > 0 && en_k < en_n, s"target gate is degenerate: $en_k/$en_n")
    val totN = rows.values.map(_._1).sum
    val totK = rows.values.map(_._2).sum
    assert(totK > 0 && totK < totN, s"corpus gate is degenerate: $totK/$totN")
  }
}

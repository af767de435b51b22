package graft.operators

import graft.SparkSpec

/** Discrimination pins for the Cavnar-Trenkle char-trigram classifier
  * behind text_lang_profile (the synthetic fixture's character
  * distributions are lang-independent, so the declared gate pins the
  * estimator; THESE corpora make the algorithm actually classify). */
class CtClassifierSpec extends SparkSpec {

  private def confusion(rows: (Long, String, String)*): Map[(String, String), Long] = {
    import spark.implicits._
    TextModelQueries.ctConfusion(spark, rows.toDF("doc_id", "lang", "text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs"))
      .toMap
  }

  test("disjoint character distributions recover perfectly") {
    val aa = "alpha beta gamma delta alpha beta"
    val zz = "zyx wvu zyx wvu tsr qpo zyx"
    val got = confusion(
      (1L, "aa", aa), (2L, "aa", aa + " gamma"), (3L, "aa", aa + " delta"),
      (4L, "zz", zz), (5L, "zz", zz + " tsr"), (6L, "zz", zz + " qpo"))
    assert(got == Map(("aa", "aa") -> 3L, ("zz", "zz") -> 3L))
  }

  test("the out-of-place distance follows gram overlap, not the training label") {
    val aa = "alpha beta gamma delta epsilon zeta eta theta"
    val zz = "zyx wvu tsr qpo nml kji hgf edc"
    val got = confusion(
      (1L, "aa", aa), (2L, "aa", aa), (3L, "zz", zz), (4L, "zz", zz),
      // mostly aa-material with a zz tail: must classify as aa despite the zz label
      (9L, "zz", "alpha beta gamma delta zyx"))
    assert(got(("zz", "aa")) == 1L)
    assert(got(("aa", "aa")) == 2L && got(("zz", "zz")) == 2L)
  }

  test("short docs below one trigram are excluded, not crashed on") {
    val got = confusion((1L, "aa", "ab"), (2L, "aa", "alpha beta alpha beta gamma"))
    assert(got.values.sum == 1L)
  }
}

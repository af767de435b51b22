package graft

import org.apache.spark.sql.functions._

/** Round-9 defect-class sweep: facade behavior on NULL text / NULL
  * embeddings (real corpora have them; the fixture tables don't, so no
  * oracle gate exercises these paths). Pins the contract documented on
  * [[Graft]]: no path crashes, token/signature paths drop null docs,
  * stat paths preserve rows with null stats, dedup keeps un-comparable
  * docs, embedding paths treat null vectors as absent.
  */
class NullHandlingSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick fox"),
      (2L, "the quick fox"),
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
  }

  test("token paths drop null-text docs; empty text still tokenizes") {
    val wc = Graft.wordCount(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs 1+2 contribute the words; doc 5 contributes one "" token;
    // docs 3+4 contribute NOTHING (split(null) explodes to no rows).
    assert(wc == Map("" -> 1L, "fox" -> 2L, "quick" -> 2L, "the" -> 2L))
    val sh = Graft.simhash(spark, docs).collect().map(_.getLong(0)).toSet
    assert(sh == Set(1L, 2L, 5L), "null-text docs must drop from signatures")
    val vocab = Graft.vocabEncode(docs, 10).collect().map(_.getLong(0)).toSet
    assert(vocab == Set(1L, 2L, 5L))
  }

  test("deduplicate keeps null-text docs (no signature, not comparable)") {
    val kept = Graft.deduplicate(spark, docs).collect().map(_.getLong(0)).toSet
    // 1 survives as canonical of the {1,2} near-dup pair; 3 and 4 both
    // survive — near-dup dedup cannot compare what it cannot shingle
    // (exact dedup of nulls belongs to the exact-hash stage upstream).
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("stat paths preserve null-text rows with null stats") {
    val stats = Graft.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(stats == Map(1L -> false, 2L -> false, 3L -> true, 4L -> true, 5L -> false))
  }

  test("cosineTopK: null embeddings neither rank nor probe") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    // k larger than the non-null candidate pool: the null vector must
    // NOT fill the spare slot with a null-cosine row.
    val top = Graft.cosineTopK(spark, emb, 1L, 3).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(top.forall(!_.isNullAt(1)))
    // A null PROBE yields the empty answer, not k arbitrary null rows.
    assert(Graft.cosineTopK(spark, emb, 4L, 3).count() == 0)
  }

  test("cosineTopK: zero-norm and NaN vectors cannot poison the ranking") {
    import spark.implicits._
    // Spark orders NaN GREATER than any double, so an unguarded 0/0 = NaN
    // cosine (zero-norm vector) or NaN component would take rank #1.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f)),
      (4L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val top = Graft.cosineTopK(spark, emb, 1L, 4).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(2L),
      s"degenerate vectors leaked into the ranking: ${top.mkString(", ")}")
    assert(top.forall(r => !r.isNullAt(1) && !r.getDouble(1).isNaN))
    // A zero-norm PROBE has no defined direction: empty answer.
    assert(Graft.cosineTopK(spark, emb, 3L, 2).count() == 0)
  }

  test("embedNearDupIvf survives null, zero-norm, and NaN vectors") {
    import spark.implicits._
    // One of each degenerate shape: null (no vector), zero-norm (ANSI
    // DIVIDE_BY_ZERO in the unguarded cosine), NaN component (NaN norm).
    // Each used to kill or skew the job; all must drop at the door while
    // the real pair survives.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]]),
      (4L, Array(0.0f, 0.0f)),
      (5L, Array(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val pairs = Graft.embedNearDupIvf(spark, emb, 0.9, nlist = 1, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}

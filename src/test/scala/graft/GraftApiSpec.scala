package graft

import org.apache.spark.sql.functions._

/** Exercises the user-facing Graft API on hand-built frames (NOT the
  * fixture tables) — proving the operators are a reusable library, not
  * fixture-bound queries. */
class GraftApiSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
      (3L, "entirely different words appear in this one here"),
      (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (5L, "short text")
    ).toDF("doc_id", "text")
  }

  test("wordCount on a custom frame") {
    val wc = Graft.wordCount(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("the") == 6 && wc("cat") == 1)
  }

  test("exactDedup collapses identical content") {
    val out = Graft.exactDedup(docs).collect()
    assert(out.length == 4) // 1&4 merge
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("nearDupPairs finds the engineered near-dup and the exact dup") {
    val pairs = Graft.nearDupPairs(spark, docs, 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup
  }

  test("nearDupClusters groups 1,2,4 into one component") {
    val cl = Graft.nearDupClusters(spark, docs, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(4L) == 1L)
  }

  test("deduplicate keeps canonical docs and untouched docs") {
    val kept = Graft.deduplicate(spark, docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("simhash of identical docs is identical; near-dups are close") {
    val sh = Graft.simhash(spark, docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) < 15)
  }

  test("cosineTopK on a custom embeddings frame") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val top = Graft.cosineTopK(spark, e, 0L, 2).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 3L))
  }

  test("dedup operators tolerate null text") {
    import spark.implicits._
    val withNulls = docs.union(Seq((9L, null: String)).toDF("doc_id", "text"))
    assert(Graft.nearDupPairs(spark, withNulls, 0.5).count() >= 2)
    assert(Graft.simhash(spark, withNulls).count() == 5) // null-text doc dropped
  }

  test("hashSample is deterministic and repartition-stable") {
    val big = spark.range(0, 2000).select(col("id").as("doc_id"))
    val a = Graft.hashSample(big, "doc_id", 10).collect().map(_.getLong(0)).toSet
    val b = Graft.hashSample(big.repartition(13), "doc_id", 10).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < 400)
  }
}

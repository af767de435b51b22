package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the persisted BM25 index: the probe answers EXACTLY like the
  * direct corpus scorer, and its plan touches the corpus never — a
  * bucket-pruned pushed-filter posting scan whose only exchanges key on
  * the candidate doc frame. */
class Bm25IndexSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private val terms = Seq("spark", "vector", "dup")

  test("indexed probe returns byte-identical scores to the direct scorer") {
    val direct = graft.Graft.bm25TopDocs(
      graft.Tables.documents(spark, dir), terms, k = 20).collect()
    val indexed = graft.Graft.bm25IndexedTopDocs(spark, dir, terms, k = 20).collect()
    assert(indexed.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      direct.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("probe plan: pushed term filter, pruned buckets, exchanges only on doc_id") {
    graft.Graft.bm25EnsureIndex(spark, dir)
    val df = graft.Graft.bm25IndexedTopDocs(spark, dir, terms, k = 20)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount"),
      s"posting scan is not bucket-pruned:\n$p")
    assert(p.contains("PushedFilters") && p.contains("In(w"),
      s"term filter did not reach the posting scan:\n$p")
    // The corpus is never re-read: no scan of the documents parquet.
    assert(!p.contains("documents.parquet"), s"probe re-read the corpus:\n$p")
    // Every hash exchange keys on the candidate doc frame.
    val keys = "Exchange hashpartitioning\\((\\w+)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.forall(_.startsWith("doc_id")),
      s"non-candidate exchange crept in (keys: $keys):\n$p")
    // Top-k never global-sorts.
    assert(p.contains("TakeOrderedAndProject"), s"missing top-k operator:\n$p")
  }

  test("index reuse: a second probe skips the build (catalog hit)") {
    val (postT, _, _) = graft.Graft.bm25EnsureIndex(spark, dir)
    val before = spark.table(postT).inputFiles.toSet
    graft.Graft.bm25IndexedTopDocs(spark, dir, Seq("spark"), k = 5).collect()
    assert(spark.table(postT).inputFiles.toSet == before,
      "probe rebuilt the posting table despite an unchanged fingerprint")
  }

  test("posting rows carry the denormalized doc length") {
    val (postT, _, _) = graft.Graft.bm25EnsureIndex(spark, dir)
    val row = spark.table(postT).filter(col("w") === "spark").limit(1).collect()
    if (row.nonEmpty) {
      val docId = row(0).getAs[Long]("doc_id")
      val dl = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") === docId)
        .select(size(split(col("text"), " ")).cast("long")).collect()(0).getLong(0)
      assert(row(0).getAs[Long]("dl") == dl)
    }
  }
}

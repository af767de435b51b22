package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The packing CLAIMS behind pipeline_seq_pack: concat-and-chunk over
  * the doc_id order conserves every token, fills every sequence except
  * (at most) the tail exactly to L, and charges a boundary-crossing
  * document to every sequence it touches. The oracle pins the exact
  * report; this spec pins the invariants that make it a packing.
  */
class SeqPackSpec extends SparkSpec {
  private val L = 128L

  test("token conservation, full-fill except the tail, fragment accounting") {
    val dir = sf("sf0.001")
    val rows = graft.SparkEntry.queries("pipeline_seq_pack")(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("toks"))
    val total = docs.agg(sum("toks")).head.getLong(0)
    val nDocs = docs.count()

    // Every token lands in exactly one sequence.
    assert(rows.map(_.getAs[Long]("token_sum")).sum == total)
    // Chunking arithmetic: ceil(total / L) sequences, all full but the
    // (at most one) tail.
    val nSeqs = rows.map(_.getAs[Long]("n_seqs")).sum
    assert(nSeqs == (total + L - 1) / L)
    val nFull = rows.map(_.getAs[Long]("n_full")).sum
    assert(nFull == (if (total % L == 0) nSeqs else nSeqs - 1))
    // Fragment accounting: Σ_seq docs-in-seq = Σ_doc sequences-covered,
    // and a doc can only add fragments by crossing boundaries — so the
    // total is at least one fragment per doc and the excess is bounded
    // by the boundary count.
    val nFrags = rows.map(r =>
      r.getAs[Long]("docs_per_seq") * r.getAs[Long]("n_seqs")).sum
    assert(nFrags >= nDocs && nFrags <= nDocs + nSeqs - 1)
    // The fixture's docs are longer than trivial: boundary-crossing
    // sequences exist, so the report is not vacuously single-doc.
    assert(rows.exists(_.getAs[Long]("docs_per_seq") >= 2))
  }
}

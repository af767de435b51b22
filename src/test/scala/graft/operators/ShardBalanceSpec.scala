package graft.operators

import graft.SparkSpec

/** The balance CLAIM behind pipeline_shard_balance: round-robin over
  * the (tokens DESC, doc_id) global rank bounds the max-min token
  * spread across shards, where hash sharding's spread grows with
  * document-length skew. The oracle pins the exact assignment; this
  * spec pins the property that makes the assignment worth shipping.
  */
class ShardBalanceSpec extends SparkSpec {

  test("token spread across the 8 shards is bounded by one maximal document") {
    val rows = graft.SparkEntry.queries("pipeline_shard_balance")(
      spark, sf("sf0.001")).collect()
    assert(rows.length == 8)
    val spread = rows.head.getAs[Long]("token_spread")
    val maxDoc = rows.map(_.getAs[Long]("max_toks")).max
    // Round-robin over the size-sorted order: each shard's k-th pick is
    // within one adjacent rank of its neighbors', so the total spread
    // cannot exceed the largest single document.
    assert(spread <= maxDoc, s"spread $spread > max doc $maxDoc")
    // And every doc landed exactly once.
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == spark.read.parquet(sf("sf0.001") + "/documents.parquet").count())
  }
}

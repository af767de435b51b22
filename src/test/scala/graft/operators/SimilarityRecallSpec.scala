package graft.operators

import graft.SparkSpec

/** Recall of the blocked kNN paths vs the brute-force baseline.
  *
  * IVF blocking trades recall for a Σ cells² (vs corpus²) candidate set;
  * nprobe is the knob that buys recall back. These tests pin the ordering
  * on the fixture: nprobe=2 never loses to nprobe=1, and both recover a
  * sane fraction of the exact answers.
  */
class SimilarityRecallSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  private def nnMap(q: String): Map[Long, Long] =
    SimilarityQueries.queries(q)(spark, dir)
      .select("vec_id", "nn_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("nprobe=2 recall >= nprobe=1 recall, both against brute exact kNN") {
    val brute = nnMap("sim_knn_join")
    val p1 = nnMap("sim_knn_ivf")
    val p2 = nnMap("sim_knn_ivf2")
    def recall(approx: Map[Long, Long]): Double =
      brute.count { case (q, nn) => approx.get(q).contains(nn) }.toDouble / brute.size
    val r1 = recall(p1)
    val r2 = recall(p2)
    assert(r2 >= r1, s"nprobe=2 recall $r2 below nprobe=1 recall $r1")
    // The fixture's embeddings are random synthetic vectors, whose cosine
    // neighborhoods are near-uniform — the worst case for IVF recall — so
    // the absolute bar is modest (measured: ~0.34 at nprobe=2 on sf0.001);
    // the real assertions are the ordering and the coverage superset.
    assert(r2 > 0.2, s"nprobe=2 recall $r2 implausibly low on the fixture")
    // Every vector has a second probe cell, so nprobe=2's answer set can
    // only grow: it must cover at least every query nprobe=1 answered.
    assert(p1.keySet.subsetOf(p2.keySet))
  }
}

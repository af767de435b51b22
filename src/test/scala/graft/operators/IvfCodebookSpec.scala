package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the learned IVF codebook (IvfCodebook): shape, the
  * determinism contract (6 dp rounding), staged-parquet equality with the
  * frame the queries consume, and that the fit actually beats a degenerate
  * codebook (every cell non-trivially populated is NOT guaranteed for
  * k-means, but the assignment must use more than one cell).
  */
class IvfCodebookSpec extends SparkSpec {

  private lazy val dir = sf("sf0.001")

  test("codebook shape: K rows, 64-dim rounded components, consistent wnrm") {
    val rows = IvfCodebook.centroids(spark, dir).collect()
    assert(rows.length == IvfCodebook.K, s"expected ${IvfCodebook.K} centroids, got ${rows.length}")
    assert(rows.map(_.getLong(0)).toSet == (0L until IvfCodebook.K.toLong).toSet,
      "cids must be exactly 0..K-1")
    rows.foreach { r =>
      val w = r.getSeq[Double](1)
      assert(w.length == 64, s"centroid dim ${w.length}")
      // Determinism contract: every component is 6 dp-rounded, so repeated
      // fits can't differ in shuffled-sum last ulps.
      w.foreach(x => assert(math.abs(math.floor(x * 1e6 + 0.5) / 1e6 - x) == 0.0,
        s"component $x not 6dp-rounded"))
      val wnrm = r.getDouble(2)
      val recomputed = math.sqrt(w.map(x => x * x).sum)
      assert(wnrm == recomputed, s"stored wnrm $wnrm != recomputed $recomputed")
      assert(wnrm > 0, "degenerate zero centroid")
    }
  }

  test("staged parquet is what the queries consume, and the oracle path names it") {
    val staged = spark.read.parquet(IvfCodebook.stagePath(dir))
    val viaApi = IvfCodebook.centroids(spark, dir)
    assert(staged.collect().toSet == viaApi.collect().toSet,
      "centroids() must read back the staged bytes")
    val sql = SimilarityQueries.oracleSqlFor(dir)("sim_knn_ivf")
    assert(sql.contains(IvfCodebook.stagePath(dir)),
      "oracle CTE must name the staged codebook path for this data dir")
  }

  test("learned codebook spreads the corpus over multiple cells") {
    val cells = SimilarityQueries.ivfScoredAssignment(spark, dir, nprobe = 1)
      .select(countDistinct(col("cluster"))).head().getLong(0)
    assert(cells > IvfCodebook.K / 2,
      s"fit collapsed: only $cells of ${IvfCodebook.K} cells used on the fixture")
  }
}

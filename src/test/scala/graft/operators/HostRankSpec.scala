package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins for the weighted directed PageRank kernel behind
  * crawl_host_rank (CrawlQueries.hostRankOf): edge MULTIPLICITY moves
  * rank (the host-graph property plain unweighted PageRank misses),
  * the damping floor holds for unreferenced nodes, and the integer
  * mass accounting stays conservative. The staged fixture's 7-host
  * graph is near-regular, so these crafted graphs are the evidence the
  * weighting and direction actually work.
  */
class HostRankSpec extends SparkSpec {

  private def rank(edges: (String, String)*): Map[String, Long] =
    rankDf(edgesDf(edges: _*))

  private def edgesDf(edges: (String, String)*): DataFrame = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def rankDf(edges: DataFrame): Map[String, Long] =
    CrawlQueries.hostRankOf(edges)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("edge multiplicity shifts rank: a 3x-cited host outranks a 1x-cited one") {
    // hub emits 3 edges to a and 1 to b: a gets 3/4 of hub's share.
    val r = rank("hub" -> "a", "hub" -> "a", "hub" -> "a", "hub" -> "b")
    assert(r("a") > r("b"))
    // Both sinks still outrank nothing below the damping floor: with
    // n=3, base = 1e12/3; the floor term is (15*base)/100.
    val floor = (15L * (1000000000000L / 3)) / 100
    assert(r("hub") >= floor && r("b") > floor)
  }

  test("direction matters: an uncited host sits exactly on the damping floor") {
    // Nobody links b, so b's rank is the bare (15*base)/100 floor in
    // every iteration — but ONLY under the correct edge direction: the
    // reversed graph would hand b half of c's share. (No assertion on
    // a vs c: the d->a back edge feeds a enough that the 3rd iteration
    // puts a ahead — rank circulates, it doesn't just accumulate.)
    val r = rank("a" -> "c", "b" -> "c", "c" -> "d", "d" -> "a")
    val floor = (15L * (1000000000000L / 4)) / 100
    assert(r("b") == floor)
    assert(r("c") > floor && r("d") > floor && r("a") > floor)
  }

  test("self-links keep mass on the host") {
    val rSelf = rank("a" -> "a", "a" -> "b", "b" -> "a")
    val rOut = rank("a" -> "b", "a" -> "b", "b" -> "a")
    assert(rSelf("a") > rOut("a"))
  }

  test("total mass stays bounded by the initial 1e12 (floor-div only loses)") {
    val r = rank("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.forall(_ > 0))
  }

  test("n_out audits the weighted out-degree") {
    val got = CrawlQueries.hostRankOf(
      edgesDf("a" -> "b", "a" -> "b", "a" -> "c", "b" -> "a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 0L))
  }
}

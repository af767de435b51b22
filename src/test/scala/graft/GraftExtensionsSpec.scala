package graft

import org.apache.spark.sql.SparkSession

/** The zero-imperative-registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` (here via
  * builder.withExtensions against the shared context) must expose every
  * graft native function to pure SQL — the deployment mode where users
  * never call GraftFunctions.ensureRegistered.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("an extensions-built session serves graft functions from pure SQL") {
    spark.version // force the suite's SparkContext up before session juggling
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]") // ignored: the suite's context is reused
        .withExtensions(new GraftExtensions())
        .getOrCreate() // reuses the running SparkContext, fresh sessionState
      val dot = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sig = s2.sql(
        "SELECT graft_minhash(w) AS sig FROM VALUES ('a'), ('b') AS t(w)")
        .head().getSeq[Long](0)
      assert(sig.length == 32)
      val hit = s2.sql(
        """SELECT graft_bloom_contains(
             (SELECT graft_bloom_agg(CAST(id AS STRING)) FROM range(100)),
             '42') AS hit""").head().getBoolean(0)
      assert(hit)
      // graft_bloom_merge must stay at parity with ensureRegistered: a
      // pure-SQL session that can build and probe but not merge a grouped
      // build is a broken deployment mode (round-7 fix).
      val mergedHit = s2.sql(
        """SELECT graft_bloom_contains(
             (SELECT graft_bloom_merge(bf) FROM (
                SELECT graft_bloom_agg(CAST(id AS STRING)) AS bf
                FROM range(100) GROUP BY id % 4)),
             '42') AS hit""").head().getBoolean(0)
      assert(mergedHit)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

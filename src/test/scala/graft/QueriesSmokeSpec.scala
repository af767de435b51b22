package graft

/** Runs every declared query end-to-end on sf0.001 — schema sanity +
  * non-crash + the driver's smoke contract (entry rows > 0). The value
  *-level gate is the DuckDB oracle compare (scripts/check.py / driver t2);
  * this spec keeps `sbt test` meaningful without duplicating it. */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("entry returns rows > 0 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching column names with its oracle declaration") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      // Pair-finding queries may legitimately return 0 rows at this SF;
      // everything else must produce output.
      val mayBeEmpty = Set("dedup_minhash", "dedup_ngram_jaccard",
        "dedup_simhash", "dedup_embed", "q_anti_join", "q_multi_exists",
        "dedup_components", "dedup_fuzzy_edit", "dedup_canonical_best")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}

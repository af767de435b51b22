package graft

class TablesSpec extends SparkSpec {
  test("registerViews exposes every fixture table to pure SQL") {
    Tables.registerViews(spark, sf("sf0.001"))
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) == 6000L)
    assert(spark.sql(
      "SELECT count(*) FROM events JOIN customer ON user_id = c_custkey").head().getLong(0) > 0)
    // ts must arrive as a proper timestamp despite the NANOS source.
    assert(spark.sql("SELECT typeof(ts) FROM events LIMIT 1").head().getString(0) == "timestamp")
  }
}

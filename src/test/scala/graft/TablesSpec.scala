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

  test("over-cap eviction spares the calling session's entries") {
    val m = new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]()
    val mine = Tables.sessionKey(spark)
    val other = Tables.sessionKey(spark.newSession()) // live, but not the caller
    // Unregistered (= dead) keys go first; live-but-other next; the
    // caller's entries must survive an over-cap pass untouched.
    for (i <- 1 to 500) m.put(("dead-session", "d", s"t$i"), "v")
    for (i <- 1 to 4300) m.put((other, "d", s"t$i"), "v")
    for (i <- 1 to 100) m.put((mine, "d", s"t$i"), "v")
    Tables.evictDead(m, mine)
    assert(m.size <= 2048, s"cap not enforced: ${m.size}")
    val mineLeft = {
      val it = m.keySet.iterator(); var n = 0
      while (it.hasNext) if (it.next()._1 == mine) n += 1
      n
    }
    assert(mineLeft == 100, s"eviction dropped the live caller's entries ($mineLeft/100 left)")
  }
}

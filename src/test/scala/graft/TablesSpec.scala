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

  test("NTZ events fixture: non-UTC session fails loudly, UTC session reads exact micros") {
    import org.apache.spark.sql.functions._
    // Stage a minimal events.parquet whose ts is TIMESTAMP_NTZ (parquet
    // TIMESTAMP(MICROS) isAdjustedToUTC=false — one of the two physical
    // encodings driver fixtures have shipped).
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_").toFile.getAbsolutePath
    spark.range(1).select(
      lit(7L).as("event_id"), lit(42L).as("user_id"), lit("click").as("event_type"),
      lit(java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456"))
        .cast("timestamp_ntz").as("ts"),
      lit(1.5).as("value"))
      .write.parquet(s"$dir/events.parquet")

    // UTC session (the repo default): value-preserving cast, exact micros.
    val utc = Tables.events(spark, dir).select(unix_micros(col("ts"))).head().getLong(0)
    assert(utc == java.time.LocalDateTime.parse("2026-01-02T03:04:05.123456")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L + 123456L)

    // Non-UTC session: the silent-shift hazard must be a loud error
    // (round-11 ADVICE), in both the batch reader and the stream source.
    val shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException](Tables.events(shifted, dir))
    assert(e.getMessage.contains("America/New_York"))
    intercept[IllegalArgumentException](
      graft.streaming.EventStreams.fromParquetDir(shifted, s"$dir/events.parquet"))

    // Zone spellings that MEAN UTC must stay accepted.
    for (tz <- Seq("Etc/UTC", "GMT", "+00:00")) {
      val ok = spark.newSession()
      ok.conf.set("spark.sql.session.timeZone", tz)
      assert(Tables.events(ok, dir).count() == 1L)
    }
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

package graft

import java.security.MessageDigest

/** Golden end-to-end pin (SURVEY.md §5.4): flagship wordcount over the
  * sf0.001 documents fixture, md5 of the sorted (word:count) stream.
  * Golden value independently computed with DuckDB. */
class GoldenSpec extends SparkSpec {

  test("flagship wordcount matches the pinned golden checksum") {
    val rows = SparkEntry.queries("wordcount")(spark, sf("sf0.001"))
      .collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}")
    val digest = MessageDigest.getInstance("MD5")
      .digest(rows.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.length == 31)
    assert(digest == "4761a2431894a82936f63981311fe952")
  }

  test("dedup pipeline end-to-end matches the pinned golden checksum") {
    // Pins the full LSH → components → canonical-corpus chain (including
    // the shared index cache): md5 of the (doc_id:lang:n_chars) stream,
    // independently computed with DuckDB from the oracle SQL.
    val rows = SparkEntry.queries("dedup_canonical")(spark, sf("sf0.001"))
      .collect()
      .map(r => s"${r.getLong(0)}:${r.getString(1)}:${r.getLong(2)}")
    val digest = MessageDigest.getInstance("MD5")
      .digest(rows.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.length == 476)
    assert(digest == "be0861e4e41f9a9aafe243af8bb40355")
  }
}

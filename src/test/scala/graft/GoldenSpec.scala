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
}

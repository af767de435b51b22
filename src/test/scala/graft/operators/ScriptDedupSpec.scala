package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the script-aware tokenization gate (dedup_script_jaccard):
  * the CJK projection's determinism, the script detector's gating, the
  * word path's PROVABLE blindness on whitespace-free scripts (the
  * motivating failure), and the planted-twin recall through the
  * bigram path. */
class ScriptDedupSpec extends SparkSpec {

  test("cjkOf is deterministic, whitespace-free, and in the CJK block") {
    val t = "key agg row scan slow fast"
    val a = DedupQueries.cjkOf(t)
    assert(a == DedupQueries.cjkOf(t))
    assert(a.length == 6) // one codepoint per word
    assert(!a.exists(_.isWhitespace))
    assert(a.forall(c => c >= 0x4E00 && c <= 0x9FFF))
    // Shared word runs survive into the projection (the property that
    // makes near-dup structure carry over).
    assert(DedupQueries.cjkOf("key agg row") == a.substring(0, 3))
  }

  test("script detector gates by CJK fraction; tokens follow the script") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain latin words here"),
      (2L, DedupQueries.cjkOf("plain latin words here")),
      (3L, "x")).toDF("doc_id", "text")
    val out = DedupQueries.scriptGatedTokens(docs)
      .select("doc_id", "script", "toks")
      .as[(Long, String, Seq[String])].collect().sortBy(_._1)
    assert(out(0)._2 == "latin" && out(0)._3 == Seq("plain", "latin", "words", "here"))
    assert(out(1)._2 == "cjk")
    // char BIGRAMS: n-1 of them, each 2 chars, consecutive overlap
    assert(out(1)._3.length == 3 && out(1)._3.forall(_.length == 2))
    assert(out(1)._3(0).charAt(1) == out(1)._3(1).charAt(0))
    // a 1-char CJK doc yields no bigrams, not a crash — and 'x' is latin
    assert(out(2)._2 == "latin")
  }

  test("the word path is PROVABLY blind on the planted CJK twins") {
    // The motivating failure: a whitespace-free doc is ONE word token,
    // so twin docs (one char dropped) share ZERO word shingles — word
    // dedup can never pair them, whatever the threshold.
    val a = DedupQueries.cjkOf("alpha beta gamma delta epsilon zeta eta")
    val b = a.substring(1)
    assert(a.split(" ").length == 1 && b.split(" ").length == 1)
    assert(a != b) // one token each, and the tokens differ: no overlap at all
  }

  test("dedup_script_jaccard surfaces every planted twin as a cjk pair") {
    val d = sf("sf0.001")
    val rows = DedupQueries.queries("dedup_script_jaccard")(spark, d)
      .select("da", "db", "script", "jac_cents").collect()
    import spark.implicits._
    val planted = graft.Tables.documents(spark, d)
      .select("doc_id").filter(col("doc_id") % 16 === 0)
      .as[Long].collect().toSet
    val cjkPairs = rows.filter(_.getString(2) == "cjk")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Every planted (id, id+10000000) twin pairs through the bigram path.
    planted.foreach { id =>
      assert(cjkPairs.contains((id, id + 10000000L)),
        s"planted twin for doc $id not recovered")
    }
    // And the pairs carry a high similarity (one dropped char).
    rows.filter(r => planted.contains(r.getLong(0)) &&
                     r.getLong(1) == r.getLong(0) + 10000000L)
      .foreach(r => assert(r.getLong(3) >= 80, s"twin pair scored ${r.getLong(3)}"))
  }
}

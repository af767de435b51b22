package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Pins for the BPE merge loop: a hand-computed end-to-end learn on a
  * known corpus, and the greedy-merge ≡ oracle-fold equivalence the
  * text_bpe_learn oracle relies on. */
class BpeLearnSpec extends SparkSpec {

  test("bpeLearn reproduces hand-computed merges on a known corpus") {
    import spark.implicits._
    // Corpus: "abab" ×3, "abc" ×2, "cc" ×1 (as repeated rows).
    // Vocab: abab:3, abc:2, cc:1.
    // Round 1 pairs: (a,b): 2·3+2 = 8, (b,a): 3, (b,c): 2, (c,c): 1
    //   → merge (a,b) cnt 8; vocab: [ab,ab]:3, [ab,c]:2, [c,c]:1
    // Round 2: (ab,ab): 3, (ab,c): 2, (c,c): 1 → merge (ab,ab) cnt 3
    // Round 3: (ab,c): 2, (c,c): 1 → merge (ab,c) cnt 2
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc") ++ Seq("cc"))
      .toDF("text")
    val got = TextAnalysis.bpeLearnOf(spark, docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L), (3, "ab", "c", 2L)))
  }

  test("bpeEncode histograms the re-tokenized vocab with content-pinning hashes") {
    import spark.implicits._
    // Same corpus as the learn test; k=2 merges (a,b) then (ab,ab):
    //   abab → [abab] (1 token), abc → [ab, c] (2), cc → [c, c] (2).
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc") ++ Seq("cc"))
      .toDF("text")
    val got = TextAnalysis.bpeEncodeOf(spark, docs, k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def h(w: String) = graft.functions.JvmHash.h60p(w)
    assert(got.toSeq == Seq(
      (1, 1L, 3L, h("abab")),
      (2, 2L, 3L, h("abc") + h("cc"))))
  }

  test("a pair-exhausted corpus keeps its vocabulary through the remaining rounds") {
    import spark.implicits._
    // "ab" and "cd" exhaust after two merges; rounds 3..10 must be
    // no-ops that KEEP the vocab (the oracle mirrors this with a LEFT
    // JOIN pass-through — before that fix an exhausted round emptied
    // every later v{r} and the encode oracle returned an empty
    // histogram; cross-engine agreement on this corpus is re-verified
    // in the round-14 dev loop via Verify + DuckDB).
    val docs = Seq("ab ab cd", "ab cd", "cd ab").toDF("text")
    val merges = TextAnalysis.bpeLearnOf(spark, docs, k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq == Seq((1, "a", "b"), (2, "c", "d")),
      "exhaustion must stop the merge table, not pad it")
    val hist = TextAnalysis.bpeEncodeOf(spark, docs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // Both words fully merged to single tokens; the vocab survives.
    assert(hist.toSeq == Seq((1, 2L)),
      s"exhausted corpus lost its vocabulary: ${hist.toSeq}")
  }

  test("overlapping runs merge greedily left-to-right, not replace-all") {
    // "aaa" under (a,a) → [aa, a]; "aaaa" → [aa, aa].
    assert(TextAnalysis.applyBpeMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(TextAnalysis.applyBpeMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(TextAnalysis.applyBpeMerge(Seq("b", "a", "a", "a"), "a", "a") == Seq("b", "aa", "a"))
  }
}

/** The equivalence the DuckDB oracle's list_reduce fold relies on:
  * replace-last-when-(a,b) over a running list equals the greedy
  * left-to-right merge. Sound because a merged symbol a+b can never
  * equal the pair's left element a (b is nonempty), so a fresh merge
  * result never immediately re-merges as a left operand. */
object BpeFoldProps extends Properties("bpeFold") {

  /** The oracle's fold, transcribed: acc starts as [s0]; each next
    * symbol either merges into the last accumulated symbol or appends. */
  private def oracleFold(syms: Seq[String], a: String, b: String): Seq[String] =
    syms.tail.foldLeft(Vector(syms.head)) { (acc, x) =>
      if (acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  private val cases: Gen[(List[String], String, String)] = for {
    alpha <- Gen.chooseNum(1, 4)
    syms <- Gen.nonEmptyListOf(
      Gen.chooseNum(0, alpha).map(i => ('a' + i).toChar.toString))
    a <- Gen.chooseNum(0, alpha).map(i => ('a' + i).toChar.toString)
    b <- Gen.chooseNum(0, alpha).map(i => ('a' + i).toChar.toString)
  } yield (syms, a, b)

  property("greedy merge == oracle list fold on small-alphabet runs") =
    Prop.forAll(cases) { case (syms, a, b) =>
      TextAnalysis.applyBpeMerge(syms, a, b) == oracleFold(syms, a, b)
    }

  property("merge under a multi-char learned symbol stays equivalent") =
    Prop.forAll(cases) { case (syms, a, b) =>
      // Second-round shape: pair ("ab", x) over sequences containing "ab"
      val s2 = TextAnalysis.applyBpeMerge(syms, "a", "b")
      TextAnalysis.applyBpeMerge(s2, a + b, a) == oracleFold2(s2, a + b, a)
    }

  private def oracleFold2(syms: Seq[String], a: String, b: String): Seq[String] =
    if (syms.isEmpty) syms else oracleFold(syms, a, b)
}

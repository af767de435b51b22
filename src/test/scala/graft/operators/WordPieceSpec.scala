package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Pins for the WordPiece trainer and greedy encoder: the likelihood
  * objective picking a DIFFERENT merge than raw pair count would, the
  * '##' marker algebra, exact-integer score arithmetic, and the
  * greedy-longest-match ≠ merge-replay distinction ([UNK] included). */
class WordPieceSpec extends SparkSpec {

  test("likelihood score outranks raw pair count (the BPE/WordPiece split)") {
    import spark.implicits._
    // Corpus: "ab" ×10, "az" ×20, "xy" ×3 (one word per doc).
    // Decomposition: ab→[a,##b], az→[a,##z], xy→[x,##y].
    // Symbol counts: a=30, ##b=10, ##z=20, x=3, ##y=3.
    // Pair counts:  (a,##b)=10  score 10/(30·10) = 1/30
    //               (a,##z)=20  score 20/(30·20) = 1/30
    //               (x,##y)=3   score 3/(3·3)    = 1/3   ← argmax
    // Raw-count BPE would merge (a,##z) first; WordPiece must pick the
    // rare-but-exclusive (x,##y). skey = floor(3·10¹²/9) = 333333333333.
    val docs = (Seq.fill(10)("ab") ++ Seq.fill(20)("az") ++ Seq.fill(3)("xy"))
      .toDF("text")
    val got = TextAnalysis.wordpieceLearnOf(spark, docs, k = 1).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(1), r.getString(2)) == ("x", "##y"))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((3L, 3L, 3L)))
    assert(r.getLong(6) == 333333333333L)
  }

  test("merged symbols drop the marker from the right half only") {
    assert(TextAnalysis.applyWpMerge(
      Seq("q", "##s", "##t"), "##s", "##t", "##st") == Seq("q", "##st"))
    assert(TextAnalysis.applyWpMerge(
      Seq("a", "##b", "##c"), "a", "##b", "ab") == Seq("ab", "##c"))
    // Greedy left-to-right, no re-merge of the produced symbol.
    assert(TextAnalysis.applyWpMerge(
      Seq("a", "##a", "##a"), "a", "##a", "aa") == Seq("aa", "##a"))
  }

  test("continuation merges compose end-to-end ('##o'+'##r' → '##or')") {
    import spark.implicits._
    // "word" ×5 → [w,##o,##r,##d]; all symbol counts equal 5, every
    // adjacent pair has cnt 5, score 5/(5·5) — ties broken on (a,b)
    // ASCII order: ('##o','##r') < ('##r','##d') < ('w','##o').
    val docs = Seq.fill(5)("word").toDF("text")
    val got = TextAnalysis.wordpieceLearnOf(spark, docs, k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got(0) == ((1, "##o", "##r")))
    // Round 2 vocab: [w,##or,##d]; counts all 5; pairs (w,##or) and
    // (##or,##d) tie on score → ('##or','##d') wins on ASCII order.
    assert(got(1) == ((2, "##or", "##d")))
  }

  test("greedy longest-match is NOT merge replay, and UNK is a whole-word drop") {
    val pieces = Set("abc", "ab", "##cd", "a", "##b", "##c")
    // Merge replay could tile "abcd" as [ab, ##cd]; greedy grabs the
    // LONGEST initial piece "abc", then finds no "##d" → [UNK].
    assert(TextAnalysis.wpGreedy("abcd", pieces) == -1)
    // With "##d" available greedy lands [abc, ##d] — 2 tokens, but a
    // DIFFERENT tiling than replay's [ab, ##cd].
    assert(TextAnalysis.wpGreedy("abcd", pieces + "##d") == 2)
    // Word-initial pieces never match mid-word: "cd" (no marker) must
    // not cover positions 2..3.
    assert(TextAnalysis.wpGreedy("abcd", Set("ab", "cd", "##c")) == -1)
    assert(TextAnalysis.wpGreedy("ab", Set("a", "##b")) == 2)
  }

  test("encode histogram: greedy strands a word the trainer could tile (real UNK)") {
    import spark.implicits._
    // Corpus: "ab" ×6, "xbc" ×3, "abc" ×1; k=3.
    // Decomp: ab→[a,##b], xbc→[x,##b,##c], abc→[a,##b,##c].
    // Round 1 counts: a=7, ##b=10, x=3, ##c=4. Pairs (a,##b)=7/70,
    //   (x,##b)=3/30, (##b,##c)=4/40 — three-way 0.1 tie, ASCII
    //   tie-break picks ('##b','##c') → '##bc'.
    // Round 2: (x,##bc)=3/(3·4)=0.25 wins → 'xbc'.
    // Round 3: (a,##b)=6/42 ties (a,##bc)=1/7; tie-break '##b'<'##bc'
    //   → 'ab'. Final decomps: ab→[ab], xbc→[xbc], abc→[a,##bc];
    //   pieces {ab, xbc, a, ##bc}.
    // Greedy: "ab"→[ab]=1, "xbc"→[xbc]=1; "abc" grabs the LONGEST
    // initial piece "ab", then needs "##c" which no piece covers → the
    // whole word is [UNK], even though [a,##bc] tiles it — greedy does
    // not backtrack, exactly like production WordPiece.
    val docs = (Seq.fill(6)("ab") ++ Seq.fill(3)("xbc") ++ Seq("abc")).toDF("text")
    val got = TextAnalysis.wordpieceEncodeOf(spark, docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def h(w: String) = graft.functions.JvmHash.h60p(w)
    assert(got.toSeq == Seq(
      (-1, 1L, 1L, h("abc")),
      (1, 2L, 9L, h("ab") + h("xbc"))))
  }
}

/** The text_wordpiece_* oracles re-tokenize with the SAME list_reduce
  * fold the BPE oracles use, except the appended symbol is the merge's
  * explicit `m` (the marker-stripped concatenation). Prove
  * applyWpMerge ≡ that fold on generated '##'-marked symbol runs — the
  * WordPiece twin of BpeFoldProps. */
object WpFoldProps extends Properties("wpFold") {

  /** The oracle's v$r fold, transcribed with the explicit m. */
  private def oracleFold(syms: Seq[String], a: String, b: String,
                         m: String): Seq[String] =
    if (syms.isEmpty) syms
    else syms.tail.foldLeft(Vector(syms.head)) { (acc, x) =>
      if (acc.last == a && x == b) acc.init :+ m
      else acc :+ x
    }

  // Symbol pools shaped like real WordPiece rounds: a small base
  // alphabet where position-0 symbols are bare and continuations are
  // '##'-marked, plus already-merged multi-char pieces.
  private val sym: Gen[String] = Gen.oneOf(
    "a", "b", "##a", "##b", "##ab", "ab", "##ba")
  private val cases: Gen[(List[String], String, String)] = for {
    syms <- Gen.nonEmptyListOf(sym)
    a <- sym
    b <- sym
  } yield (syms, a, b)

  property("greedy WP merge == oracle list fold on marked symbol runs") =
    Prop.forAll(cases) { case (syms, a, b) =>
      val m = a + b.stripPrefix("##")
      TextAnalysis.applyWpMerge(syms, a, b, m) == oracleFold(syms, a, b, m)
    }

  property("second-round merge under a produced symbol stays equivalent") =
    Prop.forAll(cases) { case (syms, a, b) =>
      val m1 = "a" + "##b".stripPrefix("##")
      val s2 = TextAnalysis.applyWpMerge(syms, "a", "##b", m1)
      val m2 = a + b.stripPrefix("##")
      TextAnalysis.applyWpMerge(s2, a, b, m2) == oracleFold(s2, a, b, m2)
    }
}

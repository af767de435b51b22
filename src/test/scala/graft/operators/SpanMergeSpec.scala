package graft.operators

import graft.SparkSpec

/** Pins spanMergedOf's island semantics on a crafted corpus: maximal
  * runs merge, gaps split, within-doc repeats land on separate
  * diagonals, and the hot-gram cap drops boilerplate grams. */
class SpanMergeSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], cap: Int = 16) =
    DedupQueries.spanMergedOf(spark, docs.toDF("doc_id", "text"), cap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("one long shared run coalesces into a single maximal span") {
    // 12 shared tokens = 5 consecutive windows = one span of 12 tokens.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val got = spans(Seq(
      (1L, s"aa bb $shared cc"),
      (2L, s"xx $shared yy zz")))
    assert(got == Seq((1L, 2L, 2L, 1L, 5L, 12L)))
  }

  test("a gap splits two spans; both report their own starts") {
    val runA = (1 to 9).map(i => s"a$i").mkString(" ")  // 2 windows
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")  // 1 window
    val got = spans(Seq(
      (1L, s"$runA GAP1 $runB"),
      (2L, s"$runA DIFFERENT $runB")))
    assert(got == Seq(
      (1L, 2L, 0L, 0L, 2L, 9L),
      (1L, 2L, 10L, 10L, 1L, 8L)))
  }

  test("a within-doc repeat yields one span per alignment diagonal") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    // Doc 2 contains the run twice -> two diagonals vs doc 1's single copy.
    val got = spans(Seq((1L, s"$run"), (2L, s"$run MID $run")))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._6)).toSet ==
      Set((1L, 2L, 0L, 0L, 8L), (1L, 2L, 0L, 9L, 8L)))
  }

  test("the hot-gram cap drops grams shared by too many docs") {
    val boiler = (1 to 8).map(i => s"h$i").mkString(" ")
    val docs = (1L to 4L).map(id => (id, s"u$id $boiler"))
    assert(spans(docs, cap = 3).isEmpty, "4 docs > cap 3: gram must drop")
    assert(spans(docs, cap = 4).size == 6, "under the cap all C(4,2) pairs span")
  }

  test("docs shorter than one window never pair") {
    assert(spans(Seq((1L, "a b c"), (2L, "a b c"))).isEmpty)
  }

  // ─────────── the suffix-ngram variant (spanMergedSuffixOf) ───────────

  private def suffixSpans(docs: Seq[(Long, String)], cap: Int = 16) =
    DedupQueries.spanMergedSuffixOf(spark, docs.toDF("doc_id", "text"), cap)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("no grid to evade: sliding windows find a span at EVERY alignment phase") {
    // The impossibility argument for uncapped spanMergedOf, exercised:
    // stride-1 windows have no phase, so a shared 12-token span is
    // found wherever it starts in either doc (a stride-8 TILING would
    // miss most of these placements). Unique-token contexts per case.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    for (oa <- 0 to 7; ob <- Seq(0, 3, 7)) {
      val ctxA = (0 until oa).map(i => s"ca${oa}_$i").mkString(" ")
      val ctxB = (0 until ob).map(i => s"cb${ob}_$i").mkString(" ")
      val got = spans(Seq(
        (1L, (if (ctxA.isEmpty) shared else s"$ctxA $shared") + " tailA"),
        (2L, (if (ctxB.isEmpty) shared else s"$ctxB $shared") + " tailB tailB2")))
      assert(got == Seq((1L, 2L, oa.toLong, ob.toLong, 5L, 12L)),
        s"offset pair ($oa, $ob): $got")
    }
  }

  /** The adversarial flood corpus: docs 1 and 2 share a unique
    * `len`-token span, and 17 flood docs each carry every 8-gram of
    * that span in isolation (unique junk separators), pushing every
    * 8-gram's doc count past the cap while no 16-gram leaves the pair. */
  private def floodCorpus(len: Int): Seq[(Long, String)] = {
    val s = (0 until len).map(i => s"s$i")
    val span = s.mkString(" ")
    val x = (1L, s"xa xb xc $span xd xe")
    val y = (2L, s"ya $span yb yc yd")
    val floods = (1 to 17).map { i =>
      val grams = s.sliding(8).zipWithIndex
        .map { case (g, k) => s"x${i}_$k " + g.mkString(" ") }
        .mkString(" ")
      (100L + i, s"f${i}_head $grams f${i}_tail")
    }
    x +: y +: floods
  }

  test("a hot-gram flood DEFEATS the capped 8-gram method — and the suffix variant recovers the span") {
    val corpus = floodCorpus(50)
    // Every 8-gram of the span is in 19 docs (> cap 16): the shipped
    // method provably reports NOTHING for the duplicate pair.
    assert(spans(corpus).isEmpty,
      "the valve must drop the whole flooded span (the documented gap)")
    // The suffix variant re-keys the hot windows by their covering
    // 16-grams (shared only by the pair) and recovers the span exactly:
    // 43 windows, 50 tokens, at the true starts (3 in doc 1, 1 in doc 2).
    assert(suffixSpans(corpus) == Seq((1L, 2L, 3L, 1L, 43L, 50L)))
  }

  test("the suffix rescue is exact down to 16-token spans (every window covered)") {
    val got = suffixSpans(floodCorpus(16))
    assert(got == Seq((1L, 2L, 3L, 1L, 9L, 16L)))
  }

  test("on mild corpora the suffix variant equals spanMergedOf") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val runA = (1 to 9).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpora = Seq(
      Seq((1L, s"aa bb $shared cc"), (2L, s"xx $shared yy zz")),
      Seq((1L, s"$runA GAP1 $runB"), (2L, s"$runA DIFFERENT $runB")))
    corpora.foreach(c => assert(suffixSpans(c) == spans(c)))
  }
}

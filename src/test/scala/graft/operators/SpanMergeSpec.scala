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
}

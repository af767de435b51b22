package graft

import graft.functions.{JvmHash, TopKAggregator}
import graft.mr.FileWordCounter.tokenizeQuirk
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suites (SURVEY.md §5.3) — pure-JVM invariants; the
  * Spark-level equivalences live in the regular specs (TopKAggregatorSpec,
  * JvmHashSpec, SkewAndBucketingSpec). sbt's scalacheck integration runs
  * these as part of `sbt test`. */
object TokenizerProps extends Properties("tokenizeQuirk") {
  val anyStr: Gen[String] = Gen.listOf(Gen.oneOf('a', 'b', ' ', ' ', '\n', '\t', 'x'))
    .map(_.mkString)

  property("equals Java split-keepall on arbitrary strings") =
    Prop.forAll(anyStr) { s => tokenizeQuirk(s) == s.split(" ", -1).toVector }

  property("token count = spaces + 1") =
    Prop.forAll(anyStr) { s => tokenizeQuirk(s).size == s.count(_ == ' ') + 1 }

  property("joining tokens with ' ' restores the input") =
    Prop.forAll(anyStr) { s => tokenizeQuirk(s).mkString(" ") == s }
}

object TopKProps extends Properties("TopKAggregator") {
  val doubles: Gen[List[Double]] = Gen.listOf(Gen.chooseNum(-1e6, 1e6))

  property("reduce-fold equals sorted.take(k)") =
    Prop.forAll(doubles, Gen.chooseNum(1, 8)) { (xs, k) =>
      val agg = new TopKAggregator(k)
      xs.foldLeft(agg.zero)(agg.reduce) == xs.sorted(Ordering[Double].reverse).take(k)
    }

  property("merge is order-insensitive") =
    Prop.forAll(doubles, doubles, Gen.chooseNum(1, 8)) { (xs, ys, k) =>
      val agg = new TopKAggregator(k)
      val a = xs.foldLeft(agg.zero)(agg.reduce)
      val b = ys.foldLeft(agg.zero)(agg.reduce)
      agg.merge(a, b) == agg.merge(b, a)
    }
}

object HashProps extends Properties("JvmHash") {
  property("h60 is non-negative and < 2^60") =
    Prop.forAll { (s: String) => val h = JvmHash.h60(s); h >= 0 && h < (1L << 60) }

  property("seeded stays within [0, P)") =
    Prop.forAll(Gen.chooseNum(0L, JvmHash.P - 1), Gen.chooseNum(0, 63)) { (h, seed) =>
      val v = JvmHash.seeded(h, seed); v >= 0 && v < JvmHash.P
    }

  property("h60 is deterministic") =
    Prop.forAll { (s: String) => JvmHash.h60(s) == JvmHash.h60(s) }
}

object PackProps extends Properties("packSequences-binning") {
  // Pure twin of Graft.packSequences's bin formula: bin = (cum - tok) div B
  // = tokens-before div B.
  private def bins(toks: List[Int], b: Int): List[Long] =
    toks.scanLeft(0L)(_ + _).init.map(_ / b)

  private val toksGen: Gen[List[Int]] = Gen.nonEmptyListOf(Gen.chooseNum(1, 500))
  private val binGen: Gen[Int] = Gen.chooseNum(1, 300)

  property("equals the greedy concat-then-chop simulation") =
    Prop.forAll(toksGen, binGen) { (toks, b) =>
      var p = 0L
      val sim = toks.map { t => val bin = p / b; p += t; bin }
      bins(toks, b) == sim
    }

  property("starts at bin 0 and is monotone non-decreasing") =
    Prop.forAll(toksGen, binGen) { (toks, b) =>
      val bs = bins(toks, b)
      bs.head == 0L && bs.zip(bs.tail).forall { case (x, y) => x <= y }
    }

  property("bin jump between neighbors is bounded by the doc's own span") =
    Prop.forAll(toksGen, binGen) { (toks, b) =>
      val bs = bins(toks, b)
      bs.zip(bs.tail).zip(toks).forall { case ((x, y), t) => y - x <= t / b + 1 }
    }
}

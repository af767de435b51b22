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

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

object MediaParseProps extends Properties("mediaParse") {
  import graft.multimodal.MediaPipeline

  // A random SKIPPABLE JPEG segment: marker + big-endian length + body.
  // Deliberately includes DHT 0xC4, JPG 0xC8 and DAC 0xCC — the three
  // markers INSIDE the 0xC0-0xCF range that are NOT start-of-frame: a
  // walk that treats "0xC0-0xCF" as SOF without the exclusions misreads
  // one of these as the frame header and fails the dims check below.
  private val segment: Gen[Array[Byte]] = for {
    marker <- Gen.oneOf((0xe0 to 0xef) ++ Seq(0xfe, 0xdb, 0xc4, 0xc8, 0xcc))
    n <- Gen.chooseNum(0, 40)
    body <- Gen.listOfN(n, Gen.chooseNum(0, 255))
  } yield Array(0xff.toByte, marker.toByte,
    (((body.size + 2) >> 8) & 0xff).toByte,
    ((body.size + 2) & 0xff).toByte) ++ body.map(_.toByte)

  private def sof0(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xc0, 0x00, 0x11, 0x08,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      0x03, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0).map(_.toByte)

  property("the marker walk recovers SOF dims through any skippable segment sequence") =
    Prop.forAll(
      Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, segment)),
      Gen.chooseNum(1, 65535), Gen.chooseNum(1, 65535)) { (segs, w, h) =>
      val media = Array(0xff.toByte, 0xd8.toByte) ++
        segs.toArray.flatten ++ sof0(w, h)
      MediaPipeline.decodeJpeg(media).contains((w, h, 8, 3))
    }

  // Arbitrary bytes, biased toward each container's magic prefix so the
  // deep-validation branches (not just the first magic check) are fuzzed.
  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
  private val fuzz: Gen[Array[Byte]] = Gen.oneOf(
    rawBytes,
    rawBytes.map(b => Array(0xff.toByte, 0xd8.toByte) ++ b),
    rawBytes.map(b => "RIFF".getBytes("US-ASCII") ++ b),
    rawBytes.map(b =>
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++ b),
    rawBytes.map(b => "BM".getBytes("US-ASCII") ++ b))

  property("every decoder is total on arbitrary bytes (parse or None, never throw)") =
    Prop.forAll(fuzz) { media =>
      MediaPipeline.decodeBmp(media)
      MediaPipeline.decodePng(media)
      MediaPipeline.decodeJpeg(media)
      MediaPipeline.decodeWav(media)
      MediaPipeline.decodeMp4(media)
      val (w0, h0, f0) = MediaPipeline.decodeMedia(media)
      // Whatever path fired, the dispatched metadata is sane.
      w0 > 0 && h0 > 0 && f0 > 0
    }

  // A skippable ISO-BMFF box with a well-known passive type, in either
  // size form — the walk must step over any number of these, at top level
  // AND inside moov, to reach mvhd.
  private val skipBox: Gen[Array[Byte]] = for {
    tpe <- Gen.oneOf("free", "skip", "udta", "meta")
    n <- Gen.chooseNum(0, 32)
    body <- Gen.listOfN(n, Gen.chooseNum(0, 255))
    large <- Gen.oneOf(true, false)
  } yield {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    if (large)
      java.nio.ByteBuffer.allocate(16 + n).putInt(1)
        .put(tpe.getBytes(ascii)).putLong(16L + n)
        .put(body.map(_.toByte).toArray).array()
    else
      java.nio.ByteBuffer.allocate(8 + n).putInt(8 + n)
        .put(tpe.getBytes(ascii)).put(body.map(_.toByte).toArray).array()
  }

  property("the box walk recovers mvhd through any skippable box sequence, both size forms") =
    Prop.forAll(
      Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, skipBox)),
      Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, skipBox)),
      Gen.chooseNum(1, 1000000), Gen.chooseNum(0L, 5000000000L),
      Gen.oneOf(true, false)) { (top, inMoov, ts, dur, v1) =>
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      // Version 0 stores duration as u32 — clamp the generated value into
      // range there; version 1 keeps the full 64-bit draw.
      val d = if (v1) dur else dur % 4294967296L
      // Reuse the staged builder's ftyp + mvhd bytes but interpose the
      // RANDOM sibling/child boxes, so a walk that only handles the
      // staged fixed layout fails here.
      val canned = MediaPipeline.mp4Header("mp42", ts, d, v1, largeFree = false, 0)
      val ftyp = canned.slice(0, 20)
      val mvhd = canned.slice(20 + 16 + 8 + 12, canned.length - 8)
      val moovPayload = inMoov.toArray.flatten ++ mvhd
      val moov = java.nio.ByteBuffer.allocate(8)
        .putInt(8 + moovPayload.length).put("moov".getBytes(ascii)).array() ++ moovPayload
      val media = ftyp ++ top.toArray.flatten ++ moov
      MediaPipeline.decodeMp4(media).contains(("mp42", ts.toLong, d))
    }
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

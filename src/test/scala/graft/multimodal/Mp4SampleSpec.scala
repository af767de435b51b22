package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._
import org.scalacheck.{Gen, Prop, Properties}

/** Pins for the MP4 sample-table (demux) gate: model round-trip, the
  * spec's cross-table consistency rule, and totality on damage. */
class Mp4SampleSpec extends SparkSpec {

  private def expected(id: Long): DecodedMp4Samples = {
    val n = mp4SampleCount(id); val a = mp4SttsSplit(id)
    val sizes = (0 until n).map(i => mp4SampleSize(id, i))
    DecodedMp4Samples(
      n, sizes.map(_.toLong).sum, sizes.max,
      a.toLong * mp4Delta1(id) + (n - a).toLong * mp4Delta2(id),
      mp4MediaTimescale(id), mp4ChunkCount(id),
      (0 until mp4ChunkCount(id)).map(j => mp4ChunkOff(id, j)).sum,
      sizes.zipWithIndex.map { case (s, i) => i.toLong * s }.sum)
  }

  test("sampleMp4 round-trips through decodeMp4Samples to the closed-form model") {
    for (id <- 0L to 120L by 3)
      assert(decodeMp4Samples(sampleMp4(id)).contains(expected(id)), s"id=$id")
  }

  test("the sweep stages multi-chunk stco tables (review regression: aliasing)") {
    // 1 + id % 3 was identically 1 on the %3==0 staged class — the stco
    // dimension was degenerate and a decoder hardcoding one chunk would
    // have passed the oracle. The /3-keyed model must hit all three.
    val counts = (0L to 120L by 3).map(mp4ChunkCount).toSet
    assert(counts == Set(1, 2, 3), s"chunk counts staged: $counts")
    // And the second chunk's offset term must be id-dependent somewhere.
    assert((0L to 120L by 3).filter(mp4ChunkCount(_) >= 2)
      .map(id => mp4ChunkOff(id, 1)).toSet.size > 1)
  }

  test("the cross-table consistency rule is load-bearing") {
    // Inflate the first stts run count by one: Σ stts counts no longer
    // equals the stsz count — the spec's §8.6.1.2 rule must reject.
    val bytes = sampleMp4(9L)
    def find(tag: String): Int = (0 until bytes.length - 4).indexWhere(i =>
      new String(bytes, i, 4, "US-ASCII") == tag)
    val sttsAt = find("stts")
    val bad = bytes.clone()
    // payload: v+flags(4) entry_count(4) then first run count u32
    val cntAt = sttsAt + 4 + 8 + 3
    bad(cntAt) = (bad(cntAt) + 1).toByte
    assert(decodeMp4Samples(bad).isEmpty)
    // And a truncated stsz table (count says more than the box holds).
    val stszAt = find("stsz")
    val badN = bytes.clone()
    badN(stszAt + 4 + 11) = (badN(stszAt + 4 + 11) + 1).toByte // count+1
    assert(decodeMp4Samples(badN).isEmpty)
  }

  test("damage and non-MP4 payloads abort to None") {
    val good = sampleMp4(6L)
    assert(decodeMp4Samples(good).isDefined)
    assert(decodeMp4Samples(good.dropRight(good.length / 2)).isEmpty)
    assert(decodeMp4Samples("doc 42".getBytes("US-ASCII")).isEmpty)
    // The metadata-staged MP4 headers (no trak/stbl) must not pass.
    assert(decodeMp4Samples(
      mp4Header("isom", 600, 1200, v1 = false, largeFree = false, 4)).isEmpty)
  }
}

/** Totality fuzz for the sample-table walk. */
object Mp4SampleProps extends Properties("mp4Samples") {
  import MediaPipeline._

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
  private val fuzz: Gen[Array[Byte]] = Gen.oneOf(
    rawBytes,
    Gen.chooseNum(0L, 5000L).flatMap(id => Gen.chooseNum(0, 80).map(k =>
      sampleMp4(id * 3).dropRight(k))))

  property("decodeMp4Samples is total on arbitrary bytes and truncations") =
    Prop.forAll(fuzz) { bytes => decodeMp4Samples(bytes); true }

  property("sample-table round-trip holds for arbitrary staged ids") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { raw =>
      val id = raw * 3
      decodeMp4Samples(sampleMp4(id)).exists(m =>
        m.nSamples == mp4SampleCount(id) && m.nChunks == mp4ChunkCount(id))
    }
}

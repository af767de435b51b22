package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._
import org.scalacheck.{Gen, Prop, Properties}

/** Pins for the MP4 sample-table (demux) gate: model round-trip, the
  * spec's cross-table consistency rule, and totality on damage. */
class Mp4SampleSpec extends SparkSpec {

  private def expected(id: Long): DecodedMp4Samples = {
    val n = mp4SampleCount(id); val a = mp4SttsSplit(id)
    val c = mp4ChunkCount(id)
    val sizes = (0 until n).map(i => mp4SampleSize(id, i))
    // Independent sample→chunk model: min(i DIV q, c−1), not the stsc walk.
    val q = math.max(1, n / (c + 1))
    val stscMom = sizes.zipWithIndex
      .map { case (s, i) => math.min(i / q, c - 1).toLong * s }.sum
    val offs: Seq[Long] =
      if (!mp4CttsPresent(id)) Seq.fill(n)(0L)
      else {
        val a2 = mp4CttsSplit(id)
        Seq.fill(a2)(mp4CttsOff1(id).toLong) ++
          Seq.fill(n - a2)(mp4CttsOff2(id).toLong)
      }
    DecodedMp4Samples(
      n, sizes.map(_.toLong).sum, sizes.max,
      a.toLong * mp4Delta1(id) + (n - a).toLong * mp4Delta2(id),
      mp4MediaTimescale(id), c,
      (0 until c).map(j => mp4ChunkOff(id, j)).sum,
      sizes.zipWithIndex.map { case (s, i) => i.toLong * s }.sum,
      stscMom,
      if (mp4CttsPresent(id)) 1 else 0,
      if (mp4CttsPresent(id)) offs.sum else 0L,
      if (mp4CttsPresent(id))
        offs.zipWithIndex.map { case (o, i) => i.toLong * o }.sum
      else 0L)
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

  test("the sweep stages varying stsc layouts, ctts presence and BOTH versions") {
    val staged = (0L to 240L by 3).toSeq
    // Multi-chunk files must carry entries with DIFFERENT samples-per-
    // chunk (the §8.7.4 run form with a distinct remainder chunk).
    val varying = staged.filter(mp4ChunkCount(_) >= 2)
    assert(varying.nonEmpty)
    for (id <- varying) {
      val c = mp4ChunkCount(id)
      assert(mp4Spc(id, 0) != mp4Spc(id, c - 1), s"uniform spc at id=$id")
      assert((0 until c).map(mp4Spc(id, _)).sum == mp4SampleCount(id))
    }
    // c=3 files encode 3 chunks in 2 stsc entries — run expansion is
    // structurally exercised, not just single-chunk-per-entry.
    assert(staged.exists(mp4ChunkCount(_) == 3))
    // ctts: present and absent both staged; both versions appear; every
    // v1 file carries a NEGATIVE second-run offset.
    assert(staged.exists(mp4CttsPresent) && staged.exists(!mp4CttsPresent(_)))
    val present = staged.filter(mp4CttsPresent)
    assert(present.map(mp4CttsVersion).toSet == Set(0, 1))
    for (id <- present if mp4CttsVersion(id) == 1)
      assert(mp4CttsOff2(id) < 0, s"v1 staged offset not negative at id=$id")
    // Presence is independent of the chunk-count key (periods 5 vs 3).
    for (cc <- 1 to 3) {
      val inClass = staged.filter(mp4ChunkCount(_) == cc)
      assert(inClass.exists(mp4CttsPresent) && inClass.exists(!mp4CttsPresent(_)),
        s"chunk-count class $cc lacks ctts variety")
    }
  }

  test("stsc and ctts cross-table rules are load-bearing") {
    def find(bytes: Array[Byte], tag: String): Int =
      (0 until bytes.length - 4).indexWhere(i =>
        new String(bytes, i, 4, "US-ASCII") == tag)
    // A multi-chunk, ctts-present staged id.
    val id = (0L to 240L by 3).find(i =>
      mp4ChunkCount(i) >= 2 && mp4CttsPresent(i) && mp4CttsVersion(i) == 1).get
    val good = sampleMp4(id)
    assert(decodeMp4Samples(good).contains(expected(id)))
    // Inflate the first stsc entry's samples-per-chunk: the expansion
    // now over-assigns and must refuse (mapping ≠ stsz count).
    val stscAt = find(good, "stsc")
    val badSpc = good.clone()
    badSpc(stscAt + 4 + 8 + 7) = (badSpc(stscAt + 4 + 8 + 7) + 1).toByte
    assert(decodeMp4Samples(badSpc).isEmpty)
    // A sample_description_index ≠ 1 is out of profile.
    val badSdi = good.clone()
    badSdi(stscAt + 4 + 8 + 11) = 2.toByte
    assert(decodeMp4Samples(badSdi).isEmpty)
    // Inflate the first ctts run count: Σ counts ≠ sample count → None.
    val cttsAt = find(good, "ctts")
    assert(cttsAt >= 0)
    val badCtts = good.clone()
    badCtts(cttsAt + 4 + 8 + 3) = (badCtts(cttsAt + 4 + 8 + 3) + 1).toByte
    assert(decodeMp4Samples(badCtts).isEmpty)
    // A ctts version beyond 1 is out of profile (version = first
    // payload byte of the FullBox header).
    val badVer = good.clone()
    badVer(cttsAt + 4) = 2.toByte
    assert(decodeMp4Samples(badVer).isEmpty)
    // Sign handling is load-bearing: the same bytes decoded as v0 would
    // treat the negative run as a huge unsigned offset — flip v1→v0 and
    // the decode must NOT equal the signed model.
    val asV0 = good.clone()
    asV0(cttsAt + 4) = 0.toByte
    assert(!decodeMp4Samples(asV0).contains(expected(id)))
    // Dropping stsc entirely violates the mandatory-box profile.
    val stscBoxAt = stscAt - 4 // box length prefix
    val len = java.nio.ByteBuffer.wrap(good, stscBoxAt, 4).getInt
    val noStsc = good.take(stscBoxAt) ++ good.drop(stscBoxAt + len)
    assert(decodeMp4Samples(noStsc).isEmpty)
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

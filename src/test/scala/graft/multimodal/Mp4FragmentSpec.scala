package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._

/** Pins for the fragmented-MP4 (moof/traf/trun) demux gate: model
  * round-trip, full coverage of the §8.8.8 default-precedence cells,
  * and the strict-profile rules (tfdt continuity, data_offset
  * arithmetic, exact mdat fit, sequence ordering) under tampering. */
class Mp4FragmentSpec extends SparkSpec {

  private def expected(id: Long): DecodedMp4Frags = {
    val nF = fmp4FragCount(id)
    val samples = for {
      f <- 0 until nF
      i <- 0 until fmp4SampleCount(id, f)
    } yield (f, i, fmp4EffSize(id, f, i).toLong, fmp4EffDur(id, f, i).toLong)
    val fragDur = (0 until nF).map(f =>
      (0 until fmp4SampleCount(id, f)).map(fmp4EffDur(id, f, _).toLong).sum)
    val tfdtSum = (0 until nF).map(f => fragDur.take(f).sum).sum
    val dataOffSum = (0 until nF).map { f =>
      val sc = fmp4SampleCount(id, f)
      val tfhd = 16 + (if (fmp4TfhdDurPresent(id, f)) 4 else 0) +
        (if (fmp4TfhdSizePresent(id, f)) 4 else 0)
      val tfdt = if (fmp4TfdtVersion(id) == 0) 16 else 20
      val trun = 20 + 4 * sc * ((if (fmp4TrunDurPresent(id, f)) 1 else 0) +
        (if (fmp4TrunSizePresent(id, f)) 1 else 0))
      40L + tfhd + tfdt + trun
    }.sum
    DecodedMp4Frags(nF, (1 to nF).map(_.toLong).sum, samples.size,
      samples.map(_._3).sum, samples.map(_._4).sum,
      samples.zipWithIndex.map { case ((_, _, sz, _), gi) => gi * sz }.sum,
      tfdtSum, dataOffSum, fmp4MediaTimescale(id))
  }

  test("fragMp4 round-trips through decodeMp4Fragments to the closed-form model") {
    for (id <- 0L to 240L by 3)
      assert(decodeMp4Fragments(fragMp4(id)).contains(expected(id)), s"id=$id")
  }

  test("the sweep exercises every default-precedence cell and both tfdt versions") {
    val staged = (0L to 240L by 3).toSeq
    val cells = for {
      id <- staged; f <- 0 until fmp4FragCount(id)
    } yield (fmp4TrunSizePresent(id, f), fmp4TfhdSizePresent(id, f),
             fmp4TrunDurPresent(id, f), fmp4TfhdDurPresent(id, f))
    // Size chain: trun wins; tfhd fallback reached; trex fallback reached.
    assert(cells.exists(_._1))
    assert(cells.exists(c => !c._1 && c._2))
    assert(cells.exists(c => !c._1 && !c._2))
    // Duration chain likewise.
    assert(cells.exists(_._3))
    assert(cells.exists(c => !c._3 && c._4))
    assert(cells.exists(c => !c._3 && !c._4))
    // The trun-beats-tfhd conflict cell actually occurs (both present).
    assert(cells.exists(c => c._1 && c._2))
    assert(cells.exists(c => c._3 && c._4))
    // Both tfdt versions and all three fragment counts staged.
    assert(staged.map(fmp4TfdtVersion).toSet == Set(0, 1))
    assert(staged.map(fmp4FragCount).toSet == Set(2, 3, 4))
  }

  private def findAll(bytes: Array[Byte], tag: String): Seq[Int] =
    (0 until bytes.length - 4).filter(i =>
      new String(bytes, i, 4, "US-ASCII") == tag)

  test("tfdt continuity, data_offset arithmetic and mdat fit are load-bearing") {
    // A v0-tfdt, multi-fragment id whose second trun carries sizes.
    val id = (0L to 240L by 3).find(i => fmp4TfdtVersion(i) == 0 &&
      fmp4FragCount(i) >= 2 && fmp4TrunSizePresent(i, 1)).get
    val good = fragMp4(id)
    assert(decodeMp4Fragments(good).contains(expected(id)))
    // Bump the SECOND fragment's baseMediaDecodeTime: no longer the sum
    // of earlier durations (§8.8.12) — refuse.
    val tfdt2 = findAll(good, "tfdt")(1)
    val badTfdt = good.clone()
    badTfdt(tfdt2 + 4 + 7) = (badTfdt(tfdt2 + 4 + 7) + 1).toByte
    assert(decodeMp4Fragments(badTfdt).isEmpty)
    // Bump a trun data_offset: default-base-is-moof arithmetic broken.
    val trun1 = findAll(good, "trun").head
    val badOff = good.clone()
    badOff(trun1 + 4 + 11) = (badOff(trun1 + 4 + 11) + 1).toByte
    assert(decodeMp4Fragments(badOff).isEmpty)
    // Bump a per-sample size in the second trun: the fragment no longer
    // fits its mdat payload exactly — refuse.
    val trun2 = findAll(good, "trun")(1)
    val durF = if (fmp4TrunDurPresent(id, 1)) 4 else 0
    val badSz = good.clone()
    val szAt = trun2 + 4 + 12 + durF + 3 // first sample's size field, LSB
    badSz(szAt) = (badSz(szAt) + 1).toByte
    assert(decodeMp4Fragments(badSz).isEmpty)
  }

  test("sequence ordering and strict trun/tfhd flag profiles are load-bearing") {
    val id = (0L to 240L by 3).find(fmp4FragCount(_) >= 2).get
    val good = fragMp4(id)
    assert(decodeMp4Fragments(good).isDefined)
    // Copy fragment 1's sequence number over fragment 2's: not strictly
    // increasing — refuse.
    val mfhds = findAll(good, "mfhd")
    val badSeq = good.clone()
    (0 until 4).foreach(k =>
      badSeq(mfhds(1) + 8 + k) = good(mfhds(0) + 8 + k))
    assert(decodeMp4Fragments(badSeq).isEmpty)
    // Set an out-of-profile trun flag bit (0x400 sample-flags-present):
    // the layout no longer matches the byte count — refuse.
    val trun1 = findAll(good, "trun").head
    val badFlags = good.clone()
    badFlags(trun1 + 4 + 2) = (badFlags(trun1 + 4 + 2) | 0x4).toByte
    assert(decodeMp4Fragments(badFlags).isEmpty)
    // Clear tfhd default-base-is-moof: out of the strict profile.
    val tfhd1 = findAll(good, "tfhd").head
    val badBase = good.clone()
    badBase(tfhd1 + 4 + 1) = (badBase(tfhd1 + 4 + 1) & ~0x02).toByte
    assert(decodeMp4Fragments(badBase).isEmpty)
    // Truncation mid-stream (drop the final mdat's last byte): refuse.
    assert(decodeMp4Fragments(good.dropRight(1)).isEmpty)
    // And a non-fragmented sample-table MP4 is NOT accepted by the
    // fragmented decoder (its stbl is non-empty, no mvex).
    assert(decodeMp4Fragments(sampleMp4(id)).isEmpty)
  }
}

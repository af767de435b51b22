package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._

/** Pins for the frame-sampling and audio-feature layers on top of the
  * decode gates: the stss sync-sample table (incl. the §8.6.2
  * every-sample-is-sync default) and the windowed PCM energy pass. */
class MediaFeatureSpec extends SparkSpec {

  test("stss decode round-trips the sync model; absence means every sample is sync") {
    for (id <- 0L to 240L by 3) {
      val n = mp4SampleCount(id)
      val want =
        if (mp4StssPresent(id)) {
          val k = mp4SyncStride(id)
          val nums = (1 to n by k).toSeq
          DecodedMp4Sync(1, nums.size, nums.map(_.toLong).sum,
            nums.map(s => mp4SampleSize(id, s - 1).toLong).sum)
        } else
          DecodedMp4Sync(0, n, n.toLong * (n + 1) / 2,
            (0 until n).map(mp4SampleSize(id, _).toLong).sum)
      assert(decodeMp4Sync(sampleMp4(id)).contains(want), s"id=$id")
    }
    // Both presence states and all three strides staged.
    val staged = (0L to 240L by 3).toSeq
    assert(staged.exists(mp4StssPresent) && staged.exists(!mp4StssPresent(_)))
    assert(staged.filter(mp4StssPresent).map(mp4SyncStride).toSet == Set(2, 3, 4))
  }

  test("stss entries must be strictly increasing 1-based sample numbers in range") {
    val id = (0L to 240L by 3).find(mp4StssPresent).get
    val good = sampleMp4(id)
    def find(tag: String): Int = (0 until good.length - 4).indexWhere(i =>
      new String(good, i, 4, "US-ASCII") == tag)
    val stssAt = find("stss")
    assert(stssAt >= 0)
    // Zero the first entry: sample number 0 is out of range (1-based).
    val badZero = good.clone()
    (0 until 4).foreach(k => badZero(stssAt + 4 + 8 + k) = 0)
    assert(decodeMp4Sync(badZero).isEmpty)
    // Copy entry 1 over entry 2: no longer strictly increasing.
    val m = mp4SyncCount(id)
    assert(m >= 2)
    val badOrder = good.clone()
    (0 until 4).foreach(k =>
      badOrder(stssAt + 4 + 12 + k) = good(stssAt + 4 + 8 + k))
    assert(decodeMp4Sync(badOrder).isEmpty)
    // Point the last entry past the sample count: out of range.
    val badHigh = good.clone()
    badHigh(stssAt + 4 + 8 + 4 * (m - 1) + 3) = 0xff.toByte
    assert(decodeMp4Sync(badHigh).isEmpty)
  }

  test("windowed PCM energy matches an independent fold, mono and stereo") {
    for (id <- 0L to 200L) {
      val n = pcmLen(id); val ch = pcmChannels(id)
      val win = EnergyWindowFrames
      val energies = (0 until n).grouped(win).map(_.flatMap(i =>
        (0 until ch).map(c => pcmSample(id, i, c).toLong)).map(s => s * s).sum).toSeq
      val want = DecodedPcmEnergy(energies.size, energies.sum, energies.max,
        energies.zipWithIndex.map { case (e, w) => w.toLong * e }.sum, ch)
      assert(decodeWavEnergy(pcmWav(id)).contains(want), s"id=$id")
    }
    // Multi-window files are staged (pcmLen up to 59 > 16), and the last
    // window is partial somewhere — the boundary arithmetic is live.
    assert((0L to 200L).filter(_ % 4 == 1).exists(id => pcmLen(id) > 2 * EnergyWindowFrames))
    assert((0L to 200L).filter(_ % 4 == 1).exists(id => pcmLen(id) % EnergyWindowFrames != 0))
  }

  test("energy windowing rejects what the PCM gate rejects") {
    val id = (0L to 200L).find(i => i % 4 == 1 && pcmChannels(i) == 2).get
    val good = pcmWav(id)
    assert(decodeWavEnergy(good).isDefined)
    // Truncated data chunk: refuse, exactly like decodeWavPcm.
    assert(decodeWavEnergy(good.dropRight(1)).isEmpty)
    assert(decodeWavPcm(good.dropRight(1)).isEmpty)
  }
}

package graft.multimodal

import graft.SparkSpec

/** Pins for the spectral-correlation decoder behind mm_audio_dft
  * (MediaPipeline.decodeWavDft): the literal Cos16 table's floor
  * asymmetry, bin selectivity (a bin-2-periodic tone dominates p2),
  * phase sensitivity, channel-0-only reads on stereo, and the header
  * validation shared with decodeWavPcm. */
class DftSpec extends SparkSpec {

  import MediaPipeline._

  private def wav(channels: Int, frames: Seq[Seq[Int]]): Array[Byte] = {
    val data = new Array[Byte](frames.length * channels * 2)
    for ((f, i) <- frames.zipWithIndex; c <- 0 until channels) {
      val smp = f(c)
      val off = (i * channels + c) * 2
      data(off) = (smp & 0xff).toByte
      data(off + 1) = ((smp >> 8) & 0xff).toByte
    }
    wavHeader(8000, channels, data.length) ++ data
  }

  test("the Cos16 table carries the documented floor asymmetry: a full period sums to -6") {
    assert(Cos16.sum == -6L)
    // And the sine view (the +12 rotation) is the same multiset.
    assert(Cos16.indices.map(m => Cos16((m + 12) % 16)).sorted ==
      Cos16.toSeq.sorted)
  }

  test("DC over whole periods lands on the asymmetry exactly") {
    // 32 constant frames of amplitude 100: X_1 sums the table twice
    // per full sweep of (1*i)%16 -> 2 * (-6) * 100.
    val d = decodeWavDft(wav(1, Seq.fill(32)(Seq(100)))).get
    assert(d.x1 == -1200L)
  }

  test("a bin-2-periodic tone dominates bin 2") {
    // s(i) = Cos16((2i)%16): the in-phase bin-2 correlation is the sum
    // of squares; bins 1 and 3 see the tone as off-frequency.
    val frames = (0 until 32).map(i => Seq(Cos16((2 * i) % 16).toInt))
    val d = decodeWavDft(wav(1, frames)).get
    val x2 = (0 until 32).map(i => Cos16((2 * i) % 16) * Cos16((2 * i) % 16)).sum
    assert(d.x2 == x2)
    assert(d.domBin == 2)
    assert(d.p2E6 > d.p1E6 && d.p2E6 > d.p3E6)
  }

  test("a one-frame phase shift changes the bin-2 correlation") {
    val inPhase = (0 until 32).map(i => Seq(Cos16((2 * i) % 16).toInt))
    val shifted = (0 until 32).map(i => Seq(Cos16((2 * (i + 1)) % 16).toInt))
    val a = decodeWavDft(wav(1, inPhase)).get
    val b = decodeWavDft(wav(1, shifted)).get
    assert(a.x2 != b.x2)
    assert(b.domBin == 2) // power is phase-invariant up to quantization
  }

  test("stereo reads channel 0 only") {
    val mono = (0 until 20).map(i => Seq(i * 37 - 300))
    val stereo = mono.map(f => Seq(f.head, 31999)) // ch1 = loud garbage
    val a = decodeWavDft(wav(1, mono)).get
    val b = decodeWavDft(wav(2, stereo)).get
    assert((a.x1, a.x2, a.x3, a.p1E6, a.p2E6, a.p3E6) ==
      (b.x1, b.x2, b.x3, b.p1E6, b.p2E6, b.p3E6))
    assert(a.nFrames == b.nFrames)
  }

  test("validation refuses what decodeWavPcm refuses") {
    val tri = wavHeader(8000, 3, 12) ++ Array.fill[Byte](12)(1)
    assert(decodeWavDft(tri).isEmpty)
    val good = wav(2, (0 until 6).map(i => Seq(i, -i)))
    assert(decodeWavDft(good.dropRight(2)).isEmpty) // truncated payload
  }
}

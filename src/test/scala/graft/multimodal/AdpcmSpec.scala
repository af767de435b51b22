package graft.multimodal

import graft.SparkSpec

/** IMA-ADPCM decode pins beyond the oracle gate: an independent
  * reference decode of the recurrence, profile-violation refusals, and
  * the chain-divergence property a predictive codec must have.
  */
class AdpcmSpec extends SparkSpec {

  import MediaPipeline._

  /** Independent reference: the IMA recurrence re-implemented from the
    * published algorithm over the closed-form model directly (never
    * touching the staged bytes or the production decoder's parsing). */
  private def reference(id: Long): DecodedAdpcm = {
    var sSum = 0L; var predMoment = 0L
    val nb = adpcmBlocks(id)
    for (b <- 0 until nb) {
      var pred = adpcmPred0(id, b)
      var idx = adpcmIdx0(id, b)
      sSum += pred
      for (i <- 0 until AdpcmNibsPerBlock) {
        val nib = adpcmNib(id, b, i)
        val step = AdpcmStep(idx)
        var diff = step >> 3
        if ((nib & 4) != 0) diff += step
        if ((nib & 2) != 0) diff += step >> 1
        if ((nib & 1) != 0) diff += step >> 2
        pred = if ((nib & 8) != 0) pred - diff else pred + diff
        pred = math.max(-32768, math.min(32767, pred))
        idx = math.max(0, math.min(88, idx + AdpcmIndexAdjust(nib & 7)))
        sSum += pred
      }
      predMoment += (b + 1).toLong * pred
    }
    DecodedAdpcm(nb, nb.toLong * AdpcmSamplesPerBlock, sSum, predMoment)
  }

  test("decode round-trips the staged blocks for a sweep of ids, clamps included") {
    var clampHit = false
    for (id <- 0L to 120L by 2) {
      val got = decodeWavAdpcm(adpcmWav(id))
      assert(got.contains(reference(id)), s"id=$id got=$got")
      // The predictor saturates somewhere in the sweep — prove the clamp
      // path is actually exercised, not dead code.
      var pred = adpcmPred0(id, 0); var idx = adpcmIdx0(id, 0)
      for (i <- 0 until AdpcmNibsPerBlock) {
        val nib = adpcmNib(id, 0, i); val step = AdpcmStep(idx)
        var diff = step >> 3
        if ((nib & 4) != 0) diff += step
        if ((nib & 2) != 0) diff += step >> 1
        if ((nib & 1) != 0) diff += step >> 2
        val raw = if ((nib & 8) != 0) pred - diff else pred + diff
        if (raw > 32767 || raw < -32768) clampHit = true
        pred = math.max(-32768, math.min(32767, raw))
        idx = math.max(0, math.min(88, idx + AdpcmIndexAdjust(nib & 7)))
      }
    }
    assert(clampHit, "no staged id saturates the predictor — the clamp is untested")
  }

  test("a single tampered nibble diverges the whole downstream chain") {
    val media = adpcmWav(4L)
    val base = decodeWavAdpcm(media).get
    // Flip one low nibble early in block 0's data (offset: RIFF 12 + fmt
    // 28 + fact 12 + data hdr 8 + block hdr 4 = 64).
    val tampered = media.clone()
    tampered(64) = (tampered(64) ^ 0x03).toByte
    val got = decodeWavAdpcm(tampered).get
    assert(got.sSum != base.sSum,
      "a nibble flip must shift the sample sum (every later sample re-predicts)")
  }

  test("profile violations refuse: step index, reserved byte, fact, blockAlign, truncation") {
    val media = adpcmWav(2L)
    assert(decodeWavAdpcm(media).isDefined)
    def mutated(off: Int, v: Byte): Array[Byte] = {
      val m = media.clone(); m(off) = v; m
    }
    // Block 0 header starts at 60: predictor LE16 @60, step index @62,
    // reserved @63.
    assert(decodeWavAdpcm(mutated(62, 89.toByte)).isEmpty, "step index 89 must refuse")
    assert(decodeWavAdpcm(mutated(63, 1.toByte)).isEmpty, "reserved byte != 0 must refuse")
    // fact value @ offset 52 (RIFF 12 + fmt 28 + 'fact'+len 8).
    assert(decodeWavAdpcm(mutated(52, (media(52) ^ 1).toByte)).isEmpty,
      "fact disagreeing with blocks*samplesPerBlock must refuse")
    // samplesPerBlock field @ fmt+18 = offset 38: inconsistent with blockAlign.
    assert(decodeWavAdpcm(mutated(38, (media(38) ^ 1).toByte)).isEmpty,
      "samplesPerBlock inconsistent with blockAlign must refuse")
    assert(decodeWavAdpcm(media.dropRight(10)).isEmpty, "truncated data must refuse")
    assert(decodeWavAdpcm("not a wav".getBytes("US-ASCII")).isEmpty)
  }

  test("the nibble packing order is load-bearing (low nibble first)") {
    // Swap the two nibbles of one data byte: both nibble VALUES survive
    // but their order flips. A single site can be absorbed (a saturated
    // predictor clamps both orders to the same state), so the property
    // is existential: SOME byte's swap must change the decode — a
    // decoder reading high-nibble-first would differ at many.
    val id = 6L
    val media = adpcmWav(id)
    val base = decodeWavAdpcm(media).get
    val anyOrderSensitive = (0 until AdpcmNibsPerBlock / 2).exists { k =>
      val off = 64 + k
      val swapped = media.clone()
      val b = swapped(off) & 0xff
      if ((b & 0x0f) == (b >> 4)) false
      else {
        swapped(off) = (((b & 0x0f) << 4) | (b >> 4)).toByte
        decodeWavAdpcm(swapped).get != base
      }
    }
    assert(anyOrderSensitive,
      "no nibble-pair swap changed the decode — packing order would be unobservable")
  }
}

package graft.multimodal

/** The round-16 aHash (8×8 average-hash) image near-dup gate: the decoder
  * is checked against an INDEPENDENT per-pixel reference fold (not the
  * production block loop), the fixture's family construction is pinned
  * (variant bits flip, within-family hamming stays inside the verify
  * threshold, cross-family distances are large), and the profile
  * refusals (dims not multiples of 8, truncation, non-BMP) hold. */
class AhashSpec extends org.scalatest.funsuite.AnyFunSuite {

  import MediaPipeline._

  /** Independent reference: per-pixel fold over the value model, no reuse
    * of the production 8×8 block loop. */
  private def reference(id: Long): (Long, Long, Long) = {
    val w = 64; val h = 64
    val sums = new Array[Long](64)
    var moment = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = ahashPxValue(id, x, y).toLong
      sums((y / 8) * 8 + (x / 8)) += v // gray == v: all three channels equal
      moment += v * (x + w.toLong * y + 1)
    }
    val bm = sums.map(_ / 64)
    val gmean = bm.sum / 64
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64) {
      val bit = if (bm(i) >= gmean) 1L else 0L
      if (i < 32) hi = (hi << 1) | bit else lo = (lo << 1) | bit
    }
    (hi, lo, moment)
  }

  private def hamming(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("decode round-trips the staged mosaic for a sweep of ids") {
    for (id <- 0L to 127L) {
      val got = decodeAhash(ahashBmp(id))
      assert(got.contains(reference(id)), s"id=$id")
    }
  }

  test("hash halves are nonnegative 32-bit values (no signed-bit hazard)") {
    for (id <- 0L to 63L) {
      val (hi, lo, _) = decodeAhash(ahashBmp(id)).get
      assert(hi >= 0L && hi < (1L << 32), s"hi out of range for $id")
      assert(lo >= 0L && lo < (1L << 32), s"lo out of range for $id")
    }
  }

  test("variants are near-dups of their family base; cross-family is far") {
    for (fam <- 0L to 49L) {
      val base = decodeAhash(ahashBmp(fam * 4)).get
      for (v <- 1 to 3) {
        val d = hamming(base, decodeAhash(ahashBmp(fam * 4 + v)).get)
        assert(d <= 8, s"fam=$fam variant=$v hamming=$d exceeds the verify threshold")
      }
      // A family 7 apart (inside the 200-period, so bases genuinely differ)
      val far = decodeAhash(ahashBmp((fam + 7) * 4)).get
      assert(hamming(base, far) > 8, s"fam=$fam vs fam+7 unexpectedly near")
    }
  }

  test("ingest batch model: edited re-submissions sit inside the flag threshold, transposed images outside") {
    // The mm_ahash_incremental fixture's two directions, decoded through
    // the REAL BMP parse: id%10==7 batch images are one-block edits of
    // their corpus source (must land within hamming ≤ 8 of it — the
    // one flipped block plus any gmean-boundary ripple), id%10==4 batch
    // images are transposed-layout mosaics (must land far from their
    // source). Swept over the first 40 of each class.
    for (k <- 0 until 40) {
      val id7 = 7L + 10L * k
      val d7 = hamming(decodeAhash(ahashBmp(id7)).get, decodeAhash(ahashBatchBmp(id7)).get)
      assert(d7 <= 8, s"edited batch id=$id7 hamming=$d7 escapes the flag threshold")
      val id4 = 4L + 10L * k
      val d4 = hamming(decodeAhash(ahashBmp(id4)).get, decodeAhash(ahashBatchBmp(id4)).get)
      assert(d4 > 8, s"transposed batch id=$id4 hamming=$d4 unexpectedly near its source")
    }
  }

  test("t+1 banding catches spread-bit near-dups the 4×16 chunks provably missed") {
    // Hamming 8 spread 2-per-16-bit-chunk: under the verify threshold,
    // yet EVERY legacy 16-bit chunk differs — the round-16 banding
    // dropped this pair silently. The 9-band layout must catch it
    // (pigeonhole: 8 flipped bits cannot dirty 9 disjoint bands).
    val a = (0L, 0L)
    val flip = (1L << 31) | (1L << 16) | (1L << 15) | 1L // 2 bits in each 16-bit half
    val b = (flip, flip)
    assert(java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2) == 8)
    assert(!HammingBands.collide(HammingBands.legacy16, a, b), "legacy chunks were expected to miss")
    assert(HammingBands.collide(HammingBands.ahash, a, b), "t+1 bands must catch hamming 8")
  }

  test("banding recall is exhaustive under the verify threshold (seeded sweep)") {
    // Pigeonhole makes this a theorem for ANY pair at hamming ≤ 8; the
    // sweep pins the band table against editing mistakes (an overlap or
    // a hole in the layout would fail here).
    val widthSum = HammingBands.ahash.map { case (_, _, m) => java.lang.Long.bitCount(m) }.sum
    assert(widthSum == 64, "bands must cover all 64 bits")
    assert(HammingBands.ahash.length == 9, "t+1 bands for t = 8")
    val rnd = new scala.util.Random(180001L)
    for (_ <- 0 until 2000) {
      val hi = rnd.nextLong() & 0xFFFFFFFFL
      val lo = rnd.nextLong() & 0xFFFFFFFFL
      // flip exactly 8 distinct random bit positions of the 64
      val pos = rnd.shuffle((0 until 64).toList).take(8)
      var hi2 = hi; var lo2 = lo
      pos.foreach(p => if (p < 32) hi2 ^= (1L << p) else lo2 ^= (1L << (p - 32)))
      assert(HammingBands.collide(HammingBands.ahash, (hi, lo), (hi2, lo2)),
        s"missed pair at hamming 8: $hi/$lo vs $hi2/$lo2")
    }
  }

  test("the ±90 perturbation flips bits for nearly every family") {
    // The shift crosses the global mean from almost anywhere, but a block
    // whose base sits in the far corner of the range can survive (e.g.
    // base 23 + 90 = 113 < gmean ≈ 122) — the near-dup signal must hold
    // in aggregate, not per family. Measured: 46 of the first 50 families
    // flip ≥ 1 bit on variant 1; pin that floor (shrinking means the
    // fixture's perturbation stopped reaching across the mean).
    val flips = (0L to 49L).count { fam =>
      val base = decodeAhash(ahashBmp(fam * 4)).get
      hamming(base, decodeAhash(ahashBmp(fam * 4 + 1)).get) >= 1
    }
    assert(flips >= 40, s"only $flips of 50 families flip a bit on variant 1")
    // fam 0 specifically flips — a concrete pinned instance.
    assert(hamming(decodeAhash(ahashBmp(0L)).get, decodeAhash(ahashBmp(1L)).get) >= 1)
  }

  test("the 200-family base period plants exact duplicates") {
    val a = decodeAhash(ahashBmp(3L * 4)).get
    val b = decodeAhash(ahashBmp((3L + 200) * 4)).get
    assert(a._1 == b._1 && a._2 == b._2, "distance-200 families should hash equal")
    assert(a._3 == b._3, "identical mosaics must carry identical moments")
  }

  test("refusals: non-multiple-of-8 dims, truncation, non-BMP bytes") {
    // pixelBmp stages small BMPs (w ≤ 15) — valid 24-bit BMPs whose dims
    // are not multiples of 8, so the 8×8 downsample must refuse them.
    assert(decodeAhash(pixelBmp(5L)).isEmpty, "non-8-multiple dims must refuse")
    val ok = ahashBmp(9L)
    assert(decodeAhash(ok).isDefined)
    assert(decodeAhash(ok.dropRight(1)).isEmpty, "truncated pixel array must refuse")
    assert(decodeAhash("not a bmp".getBytes("US-ASCII")).isEmpty)
    assert(decodeAhash(Array.emptyByteArray).isEmpty)
  }

  test("moment carries the closed-form block decomposition the oracle uses") {
    // Σ gray·(x + 64y + 1) == Σ_blocks bm·(512·bx + 32768·by + 14624) − 6144:
    // the oracle never walks pixels, so this identity IS the bridge.
    for (id <- Seq(0L, 1L, 2L, 3L, 17L, 801L)) {
      val (_, _, moment) = decodeAhash(ahashBmp(id)).get
      val closed = (0 until 64).map { bi =>
        val bm = ahashBlockBase(id / 4, bi) + ahashDelta(id, bi)
        bm.toLong * (512 * (bi % 8) + 32768 * (bi / 8) + 14624)
      }.sum - 6144
      assert(moment == closed, s"id=$id")
    }
  }
}

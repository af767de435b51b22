package graft.multimodal

import graft.SparkSpec

/** Pins for the DCT perceptual hash behind mm_phash_dedup
  * (MediaPipeline.decodePhash): the literal Dct8 table, the photometric
  * invariances that define pHash (brightness lives in the excluded DC,
  * contrast scales every AC coefficient alike), structural sensitivity,
  * and the family model's near-dup property. */
class PhashSpec extends SparkSpec {

  import MediaPipeline._

  /** 64×64 gray BMP from a value function (same layout as phashBmp). */
  private def grayBmp(f: (Int, Int) => Int): Array[Byte] = {
    val w = 64; val h = 64; val stride = w * 3
    val px = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (h - 1 - y) * stride
      val v = f(x, y).toByte
      px(base + x * 3) = v; px(base + x * 3 + 1) = v; px(base + x * 3 + 2) = v
    }
    bmpHeader(w, h, px.length) ++ px
  }

  private def mosaic(x: Int, y: Int): Int = {
    val bi = (y / 8) * 8 + (x / 8)
    40 + (bi * 29) % 160
  }

  test("the Dct8 table: DC row is flat 10000, every AC row floors to sum -4") {
    assert(Dct8(0).forall(_ == 10000L))
    for (u <- 1 until 8) assert(Dct8(u).sum == -4L, s"row $u")
  }

  test("brightness shift leaves the hash identical (DC-only edit)") {
    val a = decodePhash(grayBmp(mosaic)).get
    val b = decodePhash(grayBmp((x, y) => mosaic(x, y) + 10)).get
    assert((a._1, a._2) == (b._1, b._2))
    assert(a._3 != b._3) // the moment still sees the edit
  }

  test("exact contrast doubling around mid-gray leaves the hash identical") {
    // v' = 122 + 2(v-122): every AC coefficient exactly doubles, the
    // median doubles with them, every strict comparison is unchanged.
    val half = decodePhash(grayBmp((x, y) => 122 + (mosaic(x, y) - 122) / 2)).get
    val full = decodePhash(grayBmp((x, y) =>
      122 + ((122 + (mosaic(x, y) - 122) / 2) - 122) * 2)).get
    assert((half._1, half._2) == (full._1, full._2))
  }

  test("a single-block structural edit moves the hash") {
    val a = decodePhash(grayBmp(mosaic)).get
    val b = decodePhash(grayBmp((x, y) =>
      if (x < 8 && y < 8) mosaic(x, y) + 90 else mosaic(x, y))).get
    assert((a._1, a._2) != (b._1, b._2))
  }

  test("staged families are near-dups under hamming <= 6, cross-family is far") {
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    for (fam <- 0 until 6) {
      val hs = (0 until 4).map(v => decodePhash(phashBmp(fam * 4L + v)).get)
      for (i <- 0 until 4; j <- i + 1 until 4)
        assert(ham(hs(i), hs(j)) <= 6, s"fam $fam $i-$j")
    }
    val h0 = decodePhash(phashBmp(0L)).get
    val h9 = decodePhash(phashBmp(9 * 4L)).get
    assert(ham(h0, h9) > 15)
  }

  test("ingest batch model: re-contrasted re-submissions flag, transposed images pass") {
    // The mm_phash_incremental fixture's two directions, decoded
    // through the REAL BMP parse: id%10==7 batch images are a SECOND
    // photometric round on their corpus source — the affine edit class
    // pHash is invariant to up to integer requantization, so they must
    // land within the hamming ≤ 6 flag threshold (measured worst 2);
    // id%10==4 batch images are transposed-layout fresh content — the
    // bit-permutation the asymmetric patterns push far away — and must
    // land outside it. Swept over the first 40 of each class.
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    for (k <- 0 until 40) {
      val id7 = 7L + 10L * k
      val d7 = ham(decodePhash(phashBmp(id7)).get, decodePhash(phashBatchBmp(id7)).get)
      assert(d7 <= 6, s"re-contrasted batch id=$id7 hamming=$d7 escapes the flag threshold")
      val id4 = 4L + 10L * k
      val d4 = ham(decodePhash(phashBmp(id4)).get, decodePhash(phashBatchBmp(id4)).get)
      assert(d4 > 6, s"transposed batch id=$id4 hamming=$d4 unexpectedly near its source")
    }
  }

  test("t+1 banding catches spread-bit near-dups the 4×16 chunks provably missed") {
    // Hamming 6 spread (2,1,2,1) over the legacy 16-bit chunks: under
    // the verify threshold yet every legacy chunk dirty. The 7-band
    // layout must catch it (6 flipped bits cannot dirty 7 disjoint
    // bands). hi bit 31 stays clear — position u*8+v = 0 (the DC) is
    // excluded from h_hi by construction.
    val a = (0L, 0L)
    val b = ((1L << 30) | (1L << 17) | (1L << 8),
             (1L << 30) | (1L << 20) | (1L << 8))
    assert(java.lang.Long.bitCount(b._1) + java.lang.Long.bitCount(b._2) == 6)
    assert(!HammingBands.collide(HammingBands.legacy16, a, b), "legacy chunks were expected to miss")
    assert(HammingBands.collide(HammingBands.phash, a, b), "t+1 bands must catch hamming 6")
  }

  test("banding recall is exhaustive under the verify threshold (seeded sweep)") {
    val widthSum = HammingBands.phash.map { case (_, _, m) => java.lang.Long.bitCount(m) }.sum
    assert(widthSum == 64, "bands must cover all 64 bits")
    assert(HammingBands.phash.length == 7, "t+1 bands for t = 6")
    val rnd = new scala.util.Random(180002L)
    for (_ <- 0 until 2000) {
      val hi = rnd.nextLong() & 0x7FFFFFFFL // DC bit stays clear, as staged
      val lo = rnd.nextLong() & 0xFFFFFFFFL
      val pos = rnd.shuffle((0 until 63).toList).take(6) // never flip hi bit 31
      var hi2 = hi; var lo2 = lo
      pos.foreach(p => if (p < 31) hi2 ^= (1L << p) else lo2 ^= (1L << (p - 31)))
      assert(HammingBands.collide(HammingBands.phash, (hi, lo), (hi2, lo2)),
        s"missed pair at hamming 6: $hi/$lo vs $hi2/$lo2")
    }
  }

  test("validation refuses non-multiple-of-8 dimensions and truncation") {
    val w = 60; val h = 64; val stride = (w * 3 + 3) / 4 * 4
    val odd = bmpHeader(w, h, stride * h) ++ new Array[Byte](stride * h)
    assert(decodePhash(odd).isEmpty)
    assert(decodePhash(phashBmp(3L).dropRight(4)).isEmpty)
  }
}

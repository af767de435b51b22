package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._
import org.scalacheck.{Gen, Prop, Properties}

/** Block-walk pins for the GIF decoder: the oracle gate proves the staged
  * round-trip corpus-wide; these prove each skip (global/local palettes,
  * extension sub-block chains) is load-bearing and that malformed bytes
  * abort instead of desynchronizing silently.
  */
class GifDecodeSpec extends SparkSpec {

  test("gifBytes round-trips through decodeGif for every fixture residue class") {
    // ids covering: version (id%2), no-GCT (id%4==1), all GCT exponents
    // (id%8), comment ext (id%7==0), LCT frame (id%5==0), 1-4 frames.
    for (id <- 0L to 120L) {
      val got = decodeGif(gifBytes(id))
      val expData = (0 until gifFrames(id)).map(j =>
        gifSub1(id, j).toLong + gifSub2(id, j)).sum
      assert(got.contains((gifVersion(id), gifWidth(id), gifHeight(id),
        gifGctColors(id), gifFrames(id), expData)), s"id=$id: $got")
    }
  }

  test("bytes after the trailer are ignored; bytes before EOF without trailer abort") {
    val base = gifBytes(12L)
    assert(decodeGif(base ++ "trailing junk GIF89a not a file".getBytes("US-ASCII"))
      == decodeGif(base))
    assert(decodeGif(base.dropRight(1)).isEmpty) // trailer removed → truncated
  }

  test("a corrupted sub-block length desynchronizes the walk and aborts") {
    // id=9: 9%4==1 → NO global color table (so a palette byte can't be
    // mistaken for 0x2C by indexWhere), 9%7≠0 → no comment extension,
    // (9+0)%2≠0 → no GCE before frame 0: the first 0x2C byte in the file
    // IS the first image descriptor.
    val id = 9L
    val bytes = gifBytes(id)
    // First image descriptor's first data sub-block length byte: locate
    // 0x2C, skip 9-byte geometry + packed + LZW byte → len byte.
    val imgAt = bytes.indexWhere(_ == 0x2c.toByte)
    assert(imgAt > 0)
    val lenAt = imgAt + 10 + 1 // descriptor(10 incl. block byte) + lzw min code
    val smashed = bytes.clone()
    smashed(lenAt) = 0.toByte // chain "ends" immediately → walk lands in data
    assert(decodeGif(smashed).isEmpty)
  }

  test("wrong magic, short header and unknown block bytes all abort") {
    assert(decodeGif("GIF99a".getBytes("US-ASCII") ++ new Array[Byte](20)).isEmpty)
    assert(decodeGif("GIF89a".getBytes("US-ASCII")).isEmpty) // no descriptor
    val noBlocks = gifBytes(1L) // id%4==1 → no GCT, makes offsets easy
    val bad = noBlocks.clone()
    // First block byte after the 13-byte descriptor (id=1 has no GCT, no
    // comment ext): make it an unknown 0x55.
    bad(13) = 0x55.toByte
    assert(decodeGif(bad).isEmpty)
  }
}

/** Totality fuzz: GIF-magic-prefixed garbage and truncations never throw. */
object GifDecodeProps extends Properties("gifDecode") {
  import MediaPipeline._

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
  private val fuzz: Gen[Array[Byte]] = Gen.oneOf(
    rawBytes,
    rawBytes.map(b => "GIF89a".getBytes("US-ASCII") ++ b),
    rawBytes.map(b => "GIF87a".getBytes("US-ASCII") ++ b),
    Gen.chooseNum(0L, 10000L).flatMap(id => Gen.chooseNum(0, 80).map(k =>
      gifBytes(id).dropRight(k))))

  property("decodeGif is total on arbitrary magic-prefixed bytes") =
    Prop.forAll(fuzz) { bytes => decodeGif(bytes); true }

  property("GIF round-trip holds for arbitrary ids") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { id =>
      decodeGif(gifBytes(id)).exists(m =>
        m._2 == gifWidth(id) && m._3 == gifHeight(id) &&
          m._5 == gifFrames(id))
    }
}

/** GIF-LZW codec pins: encode→decode identity across code sizes, the
  * special cases (KwKwK, CLEAR resets, width growth), and decoder
  * totality on garbage. */
class GifLzwSpec extends SparkSpec {

  test("pixelGif round-trips through decodeGifPixels to the closed-form model") {
    for (id <- 0L to 90L by 3) {
      val w = gifPxWidth(id); val h = gifPxHeight(id)
      var r = 0L; var g = 0L; var b = 0L; var m = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val k = gifPxIndex(id, x, y)
        val rv = gifPalette(id, k, 0)
        r += rv; g += gifPalette(id, k, 1); b += gifPalette(id, k, 2)
        m += (y.toLong * w + x) * rv
      }
      val k0 = gifPxIndex(id, 0, 0)
      val luma = (299L * gifPalette(id, k0, 0) + 587L * gifPalette(id, k0, 1) +
        114L * gifPalette(id, k0, 2)) / 1000L
      val got = decodeGifPixels(pixelGif(id))
      assert(got.contains(MediaPipeline.DecodedPixels(w, h, r, g, b, m, luma)),
        s"id=$id: $got")
    }
  }

  test("local color tables override the global decoy — table selection is load-bearing") {
    // id=12: 12%5==2 → staged WITH an LCT; the GCT holds id+7's colors
    // as a decoy. Both storage tables are physically present; the decode
    // must match the model under the LOCAL palette and must NOT match
    // the same model under the decoy — so a decoder that keeps reading
    // the GCT cannot pass.
    val id = 12L
    assert(gifLocalPalette(id))
    def model(palId: Long): MediaPipeline.DecodedPixels = {
      val w = gifPxWidth(id); val h = gifPxHeight(id)
      var r = 0L; var g = 0L; var b = 0L; var m = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val k = gifPxIndex(id, x, y)
        r += gifPalette(palId, k, 0); g += gifPalette(palId, k, 1)
        b += gifPalette(palId, k, 2)
        m += (y.toLong * w + x) * gifPalette(palId, k, 0)
      }
      val k0 = gifPxIndex(id, 0, 0)
      MediaPipeline.DecodedPixels(w, h, r, g, b, m,
        (299L * gifPalette(palId, k0, 0) + 587L * gifPalette(palId, k0, 1) +
          114L * gifPalette(palId, k0, 2)) / 1000L)
    }
    val got = decodeGifPixels(pixelGif(id))
    assert(got.contains(model(id)), s"LCT decode wrong: $got")
    assert(!got.contains(model(id + 7)), "decoy GCT indistinguishable — test is toothless")
    // Sanity on the rule itself: LCT ids exist in both interlace classes.
    val lctIds = (0L to 90L by 3).filter(gifLocalPalette)
    assert(lctIds.exists(gifInterlaced) && lctIds.exists(!gifInterlaced(_)))
  }

  test("the interlace flag is load-bearing and out-of-palette indices are rejected") {
    // id=3 stages non-interlaced (3 % 2 != 0); flipping the flag makes
    // the decoder un-permute rows that were written sequentially — the
    // decode still succeeds (indices are valid) but the row permutation
    // must move the position-weighted moment, proving the flag is read.
    val bytes = pixelGif(3L)
    val imgAt = 13 + 3 * 256 // fixed layout: header+LSD then 256-entry GCT
    assert((bytes(imgAt) & 0xff) == 0x2c)
    val flagFlipped = bytes.clone()
    flagFlipped(imgAt + 9) = 0x40.toByte
    val straight = decodeGifPixels(bytes).get
    val permuted = decodeGifPixels(flagFlipped).get
    assert(permuted.rSum == straight.rSum) // same multiset of pixels...
    assert(permuted.rMoment != straight.rMoment) // ...different placement
    // Shrink the declared GCT to 4 entries: staged indices overflow it.
    val smallPal = bytes.clone()
    smallPal(10) = (smallPal(10) & 0xf8 | 0x01).toByte
    assert(decodeGifPixels(smallPal).isEmpty)
  }

  test("interlace row order is a permutation and matches the spec passes") {
    // h=10: pass1 0,8; pass2 4; pass3 2,6; pass4 1,3,5,7,9.
    assert(interlaceRows(10).toSeq == Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    for (h <- 1 to 40)
      assert(interlaceRows(h).sorted.toSeq == (0 until h), s"h=$h not a permutation")
  }

  test("metadata-staged GIFs (fake LZW payloads) never pass the pixel decode") {
    for (id <- 0L to 60L)
      assert(decodeGifPixels(gifBytes(id)).isEmpty, s"id=$id")
  }

  test("streams ending exactly on a width boundary round-trip (review regression)") {
    // The round-13 review counterexample: with mcs=2 this stream's final
    // data code lands the decoder's dictionary exactly on 2^codeSize, so
    // the decoder widens before reading EOI — an encoder whose width rule
    // tracks its own table adds (which skip the final flush) writes EOI
    // one bit narrower and the decode fails. The fixed encoder mirrors
    // the decoder's counter, including the flush emit.
    val xs = Array(0, 1, 2, 3, 1, 3, 0, 2, 0, 3, 2)
    assert(lzwDecode(lzwEncode(xs, 2), 2, xs.length).exists(_.sameElements(xs)))
    // Exhaustive short-stream sweep at the smallest alphabet: every
    // 4-symbol stream of length ≤ 7 must round-trip — covers all
    // boundary-versus-flush alignments a tiny table can produce.
    def sweep(len: Int, prefix: List[Int]): Unit =
      if (len == 0) {
        val s = prefix.toArray
        assert(lzwDecode(lzwEncode(s, 2), 2, s.length).exists(_.sameElements(s)),
          s"failed: ${s.mkString(",")}")
      } else (0 until 4).foreach(v => sweep(len - 1, v :: prefix))
    (1 to 7).foreach(l => sweep(l, Nil))
  }
}

/** Property pins for the LZW layer itself. */
object GifLzwProps extends Properties("gifLzw") {
  import MediaPipeline._

  private val streams: Gen[(Array[Int], Int)] = for {
    mcs <- Gen.chooseNum(2, 8)
    n <- Gen.chooseNum(1, 3000)
    runs <- Gen.listOfN(n, for {
      sym <- Gen.chooseNum(0, (1 << mcs) - 1)
      rep <- Gen.frequency(3 -> Gen.const(1), 2 -> Gen.chooseNum(2, 9))
    } yield List.fill(rep)(sym))
  } yield (runs.flatten.toArray, mcs)

  property("decode(encode(xs)) == xs across code sizes, runs and resets") =
    Prop.forAll(streams) { case (xs, mcs) =>
      lzwDecode(lzwEncode(xs, mcs), mcs, xs.length).exists(_.sameElements(xs))
    }

  property("decode with the wrong expected length fails, never throws") =
    Prop.forAll(streams) { case (xs, mcs) =>
      val z = lzwEncode(xs, mcs)
      lzwDecode(z, mcs, xs.length + 1).isEmpty &&
        (xs.length == 1 || lzwDecode(z, mcs, xs.length - 1).isEmpty)
    }

  property("decoder is total on arbitrary garbage bytes") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)),
                Gen.chooseNum(2, 8), Gen.chooseNum(1, 500)) { (bs, mcs, n) =>
      lzwDecode(bs.toArray, mcs, n); true
    }
}

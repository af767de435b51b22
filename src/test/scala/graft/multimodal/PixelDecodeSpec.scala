package graft.multimodal

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** The round-12 pixel/sample DECODE step (vs the header-metadata parses):
  * uncompressed 24-bit BMP pixel arrays, binary PPM (P6), and mono 16-bit
  * PCM WAV samples — the three formats decodable pure-JVM with no codec
  * library. Each test recomputes the expected statistics from the value
  * model INDEPENDENTLY of MediaPipeline.sumPixels, so a shared bug in the
  * production reducer can't self-certify. */
class PixelDecodeSpec extends SparkSpec {

  import MediaPipeline._

  /** Independent reference: fold the value model directly. */
  private def expected(id: Long, w: Int, h: Int): DecodedPixels = {
    var r = 0L; var g = 0L; var b = 0L; var m = 0L
    for (y <- 0 until h; x <- 0 until w) {
      r += pxByte(id, x, y, 0); g += pxByte(id, x, y, 1); b += pxByte(id, x, y, 2)
      m += (y.toLong * w + x) * pxByte(id, x, y, 0)
    }
    DecodedPixels(w, h, r, g, b, m,
      (299L * pxByte(id, 0, 0, 0) + 587L * pxByte(id, 0, 0, 1) +
        114L * pxByte(id, 0, 0, 2)) / 1000L)
  }

  test("BMP pixel decode round-trips the staged array for a sweep of ids") {
    for (id <- 0L to 200L) {
      val got = decodeBmpPixels(pixelBmp(id))
      assert(got.contains(expected(id, bmpPxWidth(id), bmpPxHeight(id))),
        s"id=$id got=$got")
    }
  }

  test("PPM pixel decode round-trips the staged raster for a sweep of ids") {
    for (id <- 0L to 200L) {
      val got = decodePpmPixels(pixelPpm(id))
      assert(got.contains(expected(id, ppmPxWidth(id), ppmPxHeight(id))),
        s"id=$id got=$got")
    }
  }

  test("BMP stride padding is skipped, not summed") {
    // id=2 → w=5, stride=((15+3)/4)*4=16, one pad byte of garbage per row.
    val id = 2L
    val media = pixelBmp(id)
    assert(bmpPxWidth(id) % 4 != 0) // the case with real padding
    val before = decodeBmpPixels(media).get
    // Flip every pad byte: stats must not move.
    val w = bmpPxWidth(id); val h = bmpPxHeight(id)
    val stride = ((w * 3 + 3) / 4) * 4
    for (row <- 0 until h; p <- w * 3 until stride)
      media(BmpHeaderLen + row * stride + p) = 0x55.toByte
    assert(decodeBmpPixels(media).contains(before))
    // Flip one PIXEL byte: stats must move.
    media(BmpHeaderLen) = (media(BmpHeaderLen) ^ 0x7f).toByte
    assert(!decodeBmpPixels(media).contains(before))
  }

  test("BMP rows are bottom-up: the top-left pixel is in the LAST file row") {
    // A decoder that reads top-down computes tl_luma from image row h-1.
    // Overwrite the FIRST file row (image row h-1) with zeros: tl_luma
    // must be unchanged; overwrite the LAST file row: it must change
    // (the id is chosen so the true top-left luma is non-zero).
    val id = 7L
    val w = bmpPxWidth(id); val h = bmpPxHeight(id)
    val stride = ((w * 3 + 3) / 4) * 4
    val tl = decodeBmpPixels(pixelBmp(id)).get.tlLuma
    assert(tl > 0)
    val topRowZeroed = pixelBmp(id)
    for (p <- 0 until w * 3) topRowZeroed(BmpHeaderLen + p) = 0
    assert(decodeBmpPixels(topRowZeroed).get.tlLuma == tl)
    val lastRowZeroed = pixelBmp(id)
    for (p <- 0 until w * 3)
      lastRowZeroed(BmpHeaderLen + (h - 1) * stride + p) = 0
    assert(decodeBmpPixels(lastRowZeroed).get.tlLuma == 0)
  }

  test("BMP vs PPM channel order: the same logical image decodes identically") {
    // Staging writes B,G,R bottom-up for BMP and R,G,B top-down for PPM
    // from the SAME value model — if either decoder kept its file byte
    // order, the per-channel sums would swap and differ.
    for (id <- Seq(3L, 10L, 57L)) {
      val bmp = decodeBmpPixels(pixelBmp(id)).get
      // Rebuild a PPM with BMP's dims so the stats are comparable.
      val w = bmpPxWidth(id); val h = bmpPxHeight(id)
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
        px((y * w + x) * 3 + c) = pxByte(id, x, y, c).toByte
      val ppm = decodePpmPixels(header ++ px).get
      assert(bmp == ppm)
    }
  }

  test("PPM header tokenizing: comments and whitespace runs are handled") {
    val px = Array[Byte](10, 20, 30, 40, 50, 60) // 2×1 RGB
    val ok = "P6\n# c1\n# c2\n 2\t1 \n#last\n255\n".getBytes("US-ASCII") ++ px
    val got = decodePpmPixels(ok).get
    assert(got.width == 2 && got.height == 1)
    assert(got.rSum == 10 + 40 && got.gSum == 20 + 50 && got.bSum == 30 + 60)
    // maxval ≠ 255 (two-byte samples) is not supported → None, not garbage.
    assert(decodePpmPixels("P6\n2 1\n65535\n".getBytes("US-ASCII") ++ px).isEmpty)
    // Truncated raster → None.
    assert(decodePpmPixels("P6\n2 1\n255\n".getBytes("US-ASCII") ++ px.take(5)).isEmpty)
    // Zero dimension → None.
    assert(decodePpmPixels("P6\n0 1\n255\n".getBytes("US-ASCII")).isEmpty)
  }

  test("PNG full-pixel decode round-trips through deflate + all five filters") {
    // h cycles filters y % 5, so any id with h ≥ 5 exercises every
    // filter type; the sweep guarantees many such images.
    var allFilters = false
    for (id <- 0L to 200L) {
      val got = decodePngPixels(pixelPng(id))
      assert(got.contains(expected(id, pngPxWidth(id), pngPxHeight(id))),
        s"id=$id got=$got")
      if (pngPxHeight(id) >= 5) allFilters = true
    }
    assert(allFilters)
  }

  test("PNG decode concatenates ALL IDAT chunks, not just the first") {
    // pixelPng always splits the zlib stream across two IDATs; a decoder
    // reading only the first sees a truncated stream. Prove the staged
    // file really has two by counting chunk types, then prove decode
    // works — and that a file truncated after the first IDAT fails.
    val media = pixelPng(9L)
    def chunkTypes(m: Array[Byte]): Seq[String] = {
      var off = 8; val out = Seq.newBuilder[String]
      while (off + 8 <= m.length) {
        val len = ((m(off) & 0xff) << 24) | ((m(off + 1) & 0xff) << 16) |
          ((m(off + 2) & 0xff) << 8) | (m(off + 3) & 0xff)
        out += new String(m, off + 4, 4, "US-ASCII")
        off += 12 + len
      }
      out.result()
    }
    assert(chunkTypes(media) == Seq("IHDR", "IDAT", "IDAT", "IEND"))
    assert(decodePngPixels(media).isDefined)
    // Keep only sig+IHDR+first IDAT (+IEND): inflate can't finish → None.
    val sigIhdr = media.take(33)
    val firstIdatLen = ((media(33) & 0xff) << 24) | ((media(34) & 0xff) << 16) |
      ((media(35) & 0xff) << 8) | (media(36) & 0xff)
    val firstIdat = media.slice(33, 33 + 12 + firstIdatLen)
    val iend = media.takeRight(12)
    assert(decodePngPixels(sigIhdr ++ firstIdat ++ iend).isEmpty)
  }

  test("PNG: an IDAT stream carrying EXTRA raw bytes is rejected like a short one") {
    // Rebuild a valid PNG with one surplus byte deflated into the IDAT:
    // the exact-per-layout raw-length contract must cut both ways.
    val media = pixelPng(4L) // paletted since round 15 — the rebuild must keep the PLTE
    val inflater = new java.util.zip.Inflater()
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var preIdatEnd = 33 // end of the last chunk BEFORE the first IDAT (keeps PLTE etc.)
    var seenIdat = false
    while (off < media.length) {
      val len = ((media(off) & 0xff) << 24) | ((media(off + 1) & 0xff) << 16) |
        ((media(off + 2) & 0xff) << 8) | (media(off + 3) & 0xff)
      val typ = new String(media, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") { idat.write(media, off + 8, len); seenIdat = true }
      if (!seenIdat) preIdatEnd = off + 12 + len
      off += 12 + len
    }
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](1 << 16)
    var n = 0
    while (!inflater.finished()) n += inflater.inflate(raw, n, raw.length - n)
    inflater.end()
    val overlong = java.util.Arrays.copyOf(raw, n + 1) // one extra 0x00 byte
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(overlong); deflater.finish()
    val zbuf = new Array[Byte](overlong.length + 64)
    var zLen = 0
    while (!deflater.finished()) zLen += deflater.deflate(zbuf, zLen, zbuf.length - zLen)
    deflater.end()
    val z = java.util.Arrays.copyOf(zbuf, zLen)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(b.array(), 4, 4 + data.length)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val rebuilt = media.take(preIdatEnd) ++ chunk("IDAT", z) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decodePngPixels(rebuilt).isEmpty,
      "an over-long IDAT stream must refuse, not be silently truncated")
    // Control: the same rebuild WITHOUT the surplus byte still decodes.
    val deflater2 = new java.util.zip.Deflater()
    deflater2.setInput(java.util.Arrays.copyOf(raw, n)); deflater2.finish()
    val zbuf2 = new Array[Byte](n + 64)
    var zLen2 = 0
    while (!deflater2.finished()) zLen2 += deflater2.deflate(zbuf2, zLen2, zbuf2.length - zLen2)
    deflater2.end()
    val control = media.take(preIdatEnd) ++
      chunk("IDAT", java.util.Arrays.copyOf(zbuf2, zLen2)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decodePngPixels(control).isDefined)
  }

  test("PNG decode verifies every chunk CRC; the interlace byte is load-bearing") {
    val media = pixelPng(4L) // id 4: sequential layout (pngInterlaced = odd ids)
    // Flip one byte inside the first IDAT payload: chunk CRC must fail.
    val corrupted = media.clone()
    corrupted(33 + 8) = (corrupted(33 + 8) ^ 0x01).toByte
    assert(decodePngPixels(corrupted).isEmpty)
    // Flip the IHDR interlace byte to Adam7 on the SEQUENTIAL stream
    // (and fix the IHDR CRC so only layout logic can object): the Adam7
    // layout needs one filter byte per PASS scanline, strictly more than
    // the sequential stream carries, so the exact-raw-length check must
    // refuse — a decoder that ignored the flag would return wrong pixels
    // instead.
    val interlaced = media.clone()
    interlaced(28) = 1
    val crc = new java.util.zip.CRC32
    crc.update(interlaced, 12, 17)
    val v = crc.getValue
    interlaced(29) = ((v >> 24) & 0xff).toByte
    interlaced(30) = ((v >> 16) & 0xff).toByte
    interlaced(31) = ((v >> 8) & 0xff).toByte
    interlaced(32) = (v & 0xff).toByte
    assert(decodePng(interlaced).isDefined) // metadata parse still fine
    assert(decodePngPixels(interlaced).isEmpty)
  }

  test("Adam7 staging really interlaces: different bytes, same decoded pixels") {
    // id 9 stages interlaced; a sequential re-encode of the same pixels
    // (via the id-8-adjacent even model is a different image, so instead
    // compare against the closed-form expectation directly) must agree.
    assert(MediaPipeline.pngInterlaced(9L))
    val got = decodePngPixels(pixelPng(9L))
    assert(got.contains(expected(9L, pngPxWidth(9L), pngPxHeight(9L))))
    // The interlaced raw stream is strictly longer (one filter byte per
    // pass scanline), so the staged bytes cannot be the sequential
    // layout in disguise. Counted from the SINGLE-SOURCED plan the
    // encoder and decoder share — a forked geometry table here would
    // keep validating itself if the production table ever changed.
    val w = pngPxWidth(9L); val h = pngPxHeight(9L)
    val passLineCount = MediaPipeline.scanlinePlan(w, h, interlaced = true).map(_.size).sum
    assert(passLineCount > h)
    // And the plan is a permutation of the image grid: every pixel
    // appears exactly once across all passes.
    val covered = MediaPipeline.scanlinePlan(w, h, interlaced = true)
      .flatten.flatMap { case (y, xs) => xs.map(x => (x, y)) }
    assert(covered.sorted == (for (y <- 0 until h; x <- 0 until w) yield (x, y)).sorted)
  }

  test("PNG palette: all four storage combos stage and decode to the model") {
    // (id/3)%4 in {1,2} palettes; id%2 interlaces — find one id per combo
    // in the staged space and require the decode to agree with the model
    // for each, so palette handling is proven under BOTH scan layouts.
    val combos = (0L to 100L).groupBy(id => (pngPaletted(id), pngInterlaced(id)))
    assert(combos.keySet.size == 4, s"missing storage combos: ${combos.keySet}")
    combos.foreach { case ((pal, il), ids) =>
      val id = ids.head
      val media = pixelPng(id)
      // A paletted file must physically carry a PLTE chunk; RGB must not.
      val hasPlte = media.sliding(4).exists(_.sameElements("PLTE".getBytes("US-ASCII")))
      assert(hasPlte == pal, s"id=$id pal=$pal il=$il PLTE presence wrong")
      assert(decodePngPixels(media).contains(expected(id, pngPxWidth(id), pngPxHeight(id))),
        s"combo pal=$pal il=$il id=$id failed to decode to the model")
    }
  }

  test("PNG palette: a color-type-3 stream without a preceding PLTE is refused") {
    val id = (0L to 100L).find(i => pngPaletted(i) && !pngInterlaced(i)).get
    val media = pixelPng(id)
    assert(decodePngPixels(media).isDefined)
    // Surgically remove the PLTE chunk (length+type+data+crc) — the
    // remaining chunks still CRC-validate, so the refusal must come from
    // the PLTE-before-IDAT rule, not from corruption.
    def u32(m: Array[Byte], off: Int): Int =
      ((m(off) & 0xff) << 24) | ((m(off + 1) & 0xff) << 16) |
        ((m(off + 2) & 0xff) << 8) | (m(off + 3) & 0xff)
    var off = 8 + 12 + 13 // signature + IHDR chunk
    assert(new String(media, off + 4, 4, "US-ASCII") == "PLTE")
    val plteLen = 12 + u32(media, off)
    val stripped = media.take(off) ++ media.drop(off + plteLen)
    assert(decodePngPixels(stripped).isEmpty)
  }

  test("PNG palette: an index past the palette end is refused") {
    // Hand-built minimal color-type-3 PNG: 1x1, one-entry palette, the
    // single pixel indexing entry 5 — structurally valid (all CRCs
    // good), semantically out of range.
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + data.length)
      b.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(b.array(), 4, 4 + data.length)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    def png(idx: Byte): Array[Byte] = {
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(1).putInt(1).put(8.toByte).put(3.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      val raw = Array[Byte](0, idx) // filter None + one index byte
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](64)
      val n = defl.deflate(buf); defl.end()
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        chunk("IHDR", ihdr.array()) ++
        chunk("PLTE", Array[Byte](10, 20, 30)) ++
        chunk("IDAT", buf.take(n)) ++
        chunk("IEND", Array.emptyByteArray)
    }
    assert(decodePngPixels(png(0)).contains(DecodedPixels(1, 1, 10, 20, 30, 0,
      (299L * 10 + 587L * 20 + 114L * 30) / 1000L)))
    assert(decodePngPixels(png(5)).isEmpty, "index 5 into a 1-entry palette must refuse")
  }

  test("PCM decode round-trips the sample model with sign extension, mono and stereo") {
    for (id <- 0L to 200L) {
      val n = pcmLen(id)
      val ch = pcmChannels(id)
      val samples = for (i <- 0 until n; c <- 0 until ch) yield pcmSample(id, i, c)
      def mom(c: Int): Long =
        if (c >= ch) 0L
        else (0 until n).map(i => i.toLong * pcmSample(id, i, c)).sum
      val want = DecodedPcm((n.toLong * ch), samples.map(s => math.abs(s).toLong).sum,
        samples.map(s => s.toLong * s).sum, samples.max, samples.min,
        ch, mom(0), mom(1))
      assert(decodeWavPcm(pcmWav(id)).contains(want), s"id=$id")
      // The model must actually exercise negative territory for the
      // sign-extension claim to be tested.
      if (samples.exists(_ < 0)) assert(want.minS < 0)
    }
    assert((0L to 200L).exists(id => (0 until pcmLen(id)).exists(i => pcmSample(id, i) < 0)))
    // Both channel layouts are staged IN THE PIXEL CLASS (id%4==1, where
    // id%2 is identically 1 — the aliasing the id/4 key exists to avoid).
    val stagedCh = (0L to 200L).filter(_ % 4 == 1).map(pcmChannels).toSet
    assert(stagedCh == Set(1, 2), s"staged channel counts: $stagedCh")
  }

  test("PCM stereo: channel swap and de-interleave errors are fatal to the moments") {
    val id = (0L to 200L).find(i => i % 4 == 1 && pcmChannels(i) == 2).get
    val good = pcmWav(id)
    val want = decodeWavPcm(good).get
    assert(want.channels == 2)
    // Channel-swapped bytes: swap the two samples of every frame. The
    // channel-agnostic stats survive; the per-channel moments must not.
    val swapped = good.clone()
    val n = pcmLen(id)
    for (i <- 0 until n) {
      val f = WavHeaderLen + i * 4
      val (a0, a1) = (swapped(f), swapped(f + 1))
      swapped(f) = swapped(f + 2); swapped(f + 1) = swapped(f + 3)
      swapped(f + 2) = a0; swapped(f + 3) = a1
    }
    val sw = decodeWavPcm(swapped).get
    assert(sw.sumAbs == want.sumAbs && sw.sumSq == want.sumSq)
    assert(sw.mom0 == want.mom1 && sw.mom1 == want.mom0)
    assert(sw != want, "a channel swap must be visible in the stats")
    // A mono header over the same interleaved bytes reads frames as
    // consecutive mono samples — the position weights shift and the
    // moment diverges from both channel moments.
    val asMono = wavHeader(wavRate(id), 1, n * 4) ++ good.drop(WavHeaderLen)
    val mono = decodeWavPcm(asMono).get
    assert(mono.channels == 1 && mono.sumAbs == want.sumAbs)
    assert(mono.mom0 != want.mom0 && mono.mom0 != want.mom1,
      "de-interleave error must shift the position-weighted moment")
  }

  test("PCM: odd channel counts and truncated streams do not sample-decode") {
    val tri = wavHeader(8000, 3, 12) ++ Array.fill[Byte](12)(1)
    assert(decodeWavPcm(tri).isEmpty)
    val truncated = pcmWav(5L).dropRight(3)
    assert(decodeWavPcm(truncated).isEmpty)
    // A stereo data chunk that doesn't divide into whole frames.
    val ragged = wavHeader(8000, 2, 6) ++ Array.fill[Byte](6)(1)
    assert(decodeWavPcm(ragged).isEmpty)
  }

  test("executed 4x4 resize samples the right source pixels, up and down") {
    // Independent model: thumbnail (ox,oy) = source (ox*w/4, oy*h/4).
    for (id <- 0L to 100L) {
      val w = bmpPxWidth(id); val h = bmpPxHeight(id)
      val (gw, gh, at) = bmpPixelAccessor(pixelBmp(id)).get
      assert((gw, gh) == ((w, h)))
      var tr = 0L; var tm = 0L
      for (oy <- 0 until 4; ox <- 0 until 4) {
        val v = pxByte(id, ox * w / 4, oy * h / 4, 0)
        tr += v; tm += (oy * 4 + ox).toLong * v
        assert(at(ox * w / 4, oy * h / 4, 0) == v)
      }
      // Cross-check against the production fold via a 1-row local frame
      // is covered by the oracle gate; here pin the accessor arithmetic.
      assert(tr > 0 || tm == 0)
    }
    // The staged dims really include the UPSCALE case (w=3 < 4).
    assert((0L to 100L).exists(id => bmpPxWidth(id) < 4))
  }

  test("the pixel-staged corpus dispatches by magic, not row position") {
    // id%4==0 → BMP only; 2 → PPM only; 1 → WAV only; 3 → none.
    for (id <- 0L to 11L) {
      val media = id % 4 match {
        case 0 => pixelBmp(id)
        case 2 => pixelPpm(id)
        case 1 => pcmWav(id)
        case _ => s"doc $id".getBytes("UTF-8")
      }
      assert(decodeBmpPixels(media).isDefined == (id % 4 == 0))
      assert(decodePpmPixels(media).isDefined == (id % 4 == 2))
      assert(decodeWavPcm(media).isDefined == (id % 4 == 1))
    }
  }
}

/** Fuzz totality for the three pixel/sample decoders, same discipline as
  * MediaParseProps: arbitrary bytes biased toward each magic prefix must
  * never throw — return None or a well-formed stat. */
object PixelDecodeProps extends Properties("pixelDecode") {
  import MediaPipeline._

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
  private val fuzz: Gen[Array[Byte]] = Gen.oneOf(
    rawBytes,
    rawBytes.map(b => "BM".getBytes("US-ASCII") ++ b),
    rawBytes.map(b => "P6\n".getBytes("US-ASCII") ++ b),
    rawBytes.map(b => "RIFF".getBytes("US-ASCII") ++ b),
    Gen.chooseNum(0L, 10000L).flatMap(id => Gen.chooseNum(0, 60).map(k =>
      pixelBmp(id).dropRight(k))),
    Gen.chooseNum(0L, 10000L).flatMap(id => Gen.chooseNum(0, 60).map(k =>
      pixelPpm(id).dropRight(k))),
    Gen.chooseNum(0L, 10000L).flatMap(id => Gen.chooseNum(0, 60).map(k =>
      pixelPng(id).dropRight(k))))

  property("decoders are total on arbitrary magic-prefixed bytes") =
    Prop.forAll(fuzz) { bytes =>
      decodeBmpPixels(bytes)
      decodePpmPixels(bytes)
      decodeWavPcm(bytes)
      decodePngPixels(bytes)
      true
    }

  property("PNG pixel round-trip holds for arbitrary ids") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { id =>
      decodePngPixels(pixelPng(id)).exists(p =>
        p.width == pngPxWidth(id) && p.height == pngPxHeight(id))
    }

  property("BMP pixel round-trip holds for arbitrary ids") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { id =>
      decodeBmpPixels(pixelBmp(id)).exists(p =>
        p.width == bmpPxWidth(id) && p.height == bmpPxHeight(id))
    }
}

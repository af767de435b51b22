package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaPipeline._
import org.scalacheck.{Gen, Prop, Properties}

/** Pins for the JPEG entropy-layer gate: the oracle proves the staged
  * corpus round-trip; these prove each decode decision (Huffman tables,
  * DC prediction, ZRL/EOB expansion, EXTEND, stuffing, profile checks)
  * is load-bearing and that malformed bytes abort instead of decoding
  * garbage. */
class JpegCoeffSpec extends SparkSpec {

  private def expected(id: Long): DecodedCoeffs = {
    val w = jpegPxWidth(id); val h = jpegPxHeight(id)
    val nb = (w / 8) * (h / 8)
    var dcSum = 0L; var acAbs = 0L; var nz = 0L; var m = 0L
    for (b <- 0 until nb) {
      val dcd = jpegDcq(id, b).toLong * jpegQuant(id, 0)
      dcSum += dcd; m += b.toLong * 64 * dcd
      for (u <- 1 until 64) {
        val v = jpegAcq(id, b, u)
        if (v != 0) {
          val d = v.toLong * jpegQuant(id, u)
          acAbs += math.abs(d); nz += 1; m += (b.toLong * 64 + u) * d
        }
      }
    }
    DecodedCoeffs(w, h, nb, dcSum, acAbs, nz, m)
  }

  test("pixelJpeg round-trips through decodeJpegCoeffs to the closed-form model") {
    for (id <- 0L to 120L by 3)
      assert(decodeJpegCoeffs(pixelJpeg(id)).contains(expected(id)), s"id=$id")
  }

  test("the sweep provably exercises ZRL runs, EOBs and byte stuffing") {
    // ZRL: some block must carry a zero-run longer than 15 between coded
    // coefficients (the stride-23 AC lattice guarantees gaps of 22).
    val zrl = (0L to 120L by 3).exists { id =>
      (0 until (jpegPxWidth(id) / 8) * (jpegPxHeight(id) / 8)).exists { b =>
        val nzU = (1 until 64).filter(u => jpegAcq(id, b, u) != 0)
        nzU.nonEmpty && (nzU.head > 16 ||
          nzU.sliding(2).exists { case Seq(a, c) => c - a > 16; case _ => false })
      }
    }
    assert(zrl, "model never produced a >15 zero-run — ZRL path untested")
    // EOB: some block must end with trailing zeros after its last nonzero.
    assert((0L to 120L by 3).exists { id =>
      (1 until 64).exists(u => jpegAcq(id, 0, u) != 0) &&
        jpegAcq(id, 0, 63) == 0
    })
    // Stuffing: some staged scan must contain a 0xFF data byte (written
    // as FF 00) — find FF 00 strictly between SOS payload and EOI.
    val stuffed = (0L to 300L by 3).exists { id =>
      val bytes = pixelJpeg(id)
      (0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0x00)
    }
    assert(stuffed, "no staged scan contained a stuffed 0xFF — stuffing untested")
  }

  test("the sweep stages multi-row images (review regression: dead height term)") {
    // (id*3)%3 was identically zero, silently pinning every staged image
    // to ONE block row on BOTH engines (a shared-constant blind spot no
    // oracle can catch). The ×5 model must produce all three heights.
    val heights = (0L to 120L by 3).map(jpegPxHeight).toSet
    assert(heights == Set(8, 16, 24), s"heights staged: $heights")
    // And DC prediction must actually cross block-row boundaries: some
    // staged image needs > 4 blocks.
    assert((0L to 120L by 3).exists(id =>
      (jpegPxWidth(id) / 8) * (jpegPxHeight(id) / 8) > 4))
  }

  test("a truncated SOS segment returns None, never throws (review regression)") {
    // SOI + SOS with declared length 2 ending exactly at the buffer: the
    // SOS branch used to read past the segment and crash with
    // ArrayIndexOutOfBoundsException inside the Spark task.
    assert(decodeJpegCoeffs(Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)
      .map(_.toByte)).isEmpty)
    // Declared length 5 with a short payload at the buffer end.
    assert(decodeJpegCoeffs(Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x05, 0x01, 0x00, 0x00)
      .map(_.toByte)).isEmpty)
    // And a non-8 SOS length inside a valid file is rejected as out of
    // profile rather than validated against scan bytes.
    val good = pixelJpeg(6L)
    val sosAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    val shortSos = good.clone()
    shortSos(sosAt + 3) = 0x07.toByte // declared SOS length 8 → 7
    assert(decodeJpegCoeffs(shortSos).isEmpty)
  }

  test("profile violations and damage abort to None, never garbage") {
    val good = pixelJpeg(6L)
    assert(decodeJpegCoeffs(good).isDefined)
    // Truncate mid-scan.
    assert(decodeJpegCoeffs(good.dropRight(8)).isEmpty)
    // Flipping SOF0→SOF2 on a BASELINE file makes its full-spectrum scan
    // an invalid progressive scan header (a DC scan must have Se=0).
    val prog = good.clone()
    val sofAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(decodeJpegCoeffs(prog).isEmpty)
    // A flipped bit inside the scan either fails a Huffman/run check or
    // decodes to DIFFERENT coefficients — never silently equal.
    val sosAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    val flip = good.clone()
    flip(sosAt + 10) = (flip(sosAt + 10) ^ 0x40).toByte
    assert(!decodeJpegCoeffs(flip).contains(expected(6L)))
    // Bare text never reaches the marker walk.
    assert(decodeJpegCoeffs("doc 42".getBytes("US-ASCII")).isEmpty)
  }

  test("the sweep stages both restart and non-restart images; DRI decodes to the model") {
    val staged = (0L to 240L by 3).toSeq
    val withRi = staged.filter(jpegRestartInterval(_) > 0)
    val without = staged.filter(jpegRestartInterval(_) == 0)
    assert(withRi.nonEmpty && without.nonEmpty,
      "restart presence must vary across the staged corpus")
    assert(withRi.map(jpegRestartInterval).toSet == Set(1, 2),
      "both staged intervals must appear")
    // Presence is independent of BOTH dimension keys (the residue-
    // aliasing lesson): every height class AND every width class
    // contains restart and plain images.
    for (hClass <- 0 to 2) {
      val inClass = staged.filter(id => (id / 3) % 3 == hClass)
      assert(inClass.exists(jpegRestartInterval(_) > 0) &&
        inClass.exists(jpegRestartInterval(_) == 0),
        s"height class $hClass lacks restart variety")
    }
    for (wClass <- 0 to 3) {
      val inClass = staged.filter(_ % 4 == wClass)
      assert(inClass.exists(jpegRestartInterval(_) > 0) &&
        inClass.exists(jpegRestartInterval(_) == 0),
        s"width class $wClass lacks restart variety")
    }
    // Every restart image decodes bit-exactly to the closed-form model —
    // i.e. the RST re-alignment and DC reset reconstruct the same
    // coefficients the no-restart coding would carry.
    for (id <- withRi)
      assert(decodeJpegCoeffs(pixelJpeg(id)).contains(expected(id)), s"id=$id")
    // Some Ri=1 image has >8 restart groups, wrapping the RSTm sequence
    // number through all eight values.
    assert(withRi.exists(id => jpegRestartInterval(id) == 1 &&
      (jpegPxWidth(id) / 8) * (jpegPxHeight(id) / 8) > 9),
      "no staged image wraps the RSTm counter past RST7")
  }

  test("restart markers are load-bearing: wrong sequence number or DC carry-over is fatal") {
    // Pick a staged restart image.
    val id = (0L to 240L by 3).find(i => jpegRestartInterval(i) == 1 &&
      (jpegPxWidth(i) / 8) * (jpegPxHeight(i) / 8) >= 3).get
    val good = pixelJpeg(id)
    assert(decodeJpegCoeffs(good).contains(expected(id)))
    val sosAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    def rstPositions(bytes: Array[Byte]): Seq[Int] =
      (sosAt until bytes.length - 1).filter(i =>
        (bytes(i) & 0xff) == 0xff &&
          (bytes(i + 1) & 0xff) >= 0xd0 && (bytes(i + 1) & 0xff) <= 0xd7)
    val rsts = rstPositions(good)
    assert(rsts.size >= 2, "fixture must carry multiple RST markers")
    // Swap the first marker's sequence number: strict decoder refuses.
    val wrongSeq = good.clone()
    wrongSeq(rsts.head + 1) = 0xd5.toByte // expected RST0
    assert(decodeJpegCoeffs(wrongSeq).isEmpty)
    // Strip the DRI segment but keep the RST markers: without a restart
    // interval the reader hits a hard marker mid-scan and must abort —
    // proving the DRI parse is what licenses marker consumption.
    val driAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xdd)
    assert(driAt >= 0)
    val noDri = good.take(driAt) ++ good.drop(driAt + 6) // FFDD len=4 payload=2
    assert(decodeJpegCoeffs(noDri).isEmpty)
  }

  test("progressive re-encoding decodes bit-equal to the baseline model") {
    for (id <- 0L to 240L by 3)
      assert(decodeJpegCoeffs(pixelJpegProgressive(id)).contains(expected(id)),
        s"id=$id split=${jpegProgSplit(id)}")
    // The sweep must exercise every progressive entropy feature at the
    // MODEL level (given the scan script, each fact below forces the
    // corresponding code path in both encoder and decoder):
    val staged = (0L to 240L by 3).toSeq
    def band2(id: Long) = (jpegProgSplit(id) + 1) to 63
    def nBlocksOf(id: Long) = (jpegPxWidth(id) / 8) * (jpegPxHeight(id) / 8)
    // newly-nonzero refinement symbols: some |v| == 1 somewhere
    assert(staged.exists(id => (0 until nBlocksOf(id)).exists(b =>
      (1 until 64).exists(u => math.abs(jpegAcq(id, b, u)) == 1))))
    // correction bits: some already-nonzero coefficient with odd |v| > 1
    assert(staged.exists(id => (0 until nBlocksOf(id)).exists(b =>
      (1 until 64).exists(u => { val t = math.abs(jpegAcq(id, b, u)); t > 1 && t % 2 == 1 }))))
    // EOB runs spanning >1 block: two consecutive blocks with an all-zero
    // band-1 at Al=1 (magnitudes 0 or 1 vanish in the first scan)
    assert(staged.exists { id =>
      val b1 = 1 to jpegProgSplit(id)
      (0 until nBlocksOf(id) - 1).exists(b =>
        Seq(b, b + 1).forall(bb => b1.forall(u => math.abs(jpegAcq(id, bb, u)) >> 1 == 0)))
    })
    // ZRL inside a refinement band: >15 zero-history positions before a
    // newly-nonzero coefficient within band 2
    assert(staged.exists { id =>
      (0 until nBlocksOf(id)).exists { b =>
        val band = band2(id)
        val newly = band.filter(u => math.abs(jpegAcq(id, b, u)) == 1)
        newly.exists(k => band.count(u => u < k && jpegAcq(id, b, u) == 0) > 15)
      }
    })
  }

  test("a skipped refinement pass moves the moment (negative control)") {
    // Dropping the final AC refinement scan leaves a syntactically valid
    // progressive file, but every band-2 coefficient with an odd
    // magnitude (or magnitude 1) is missing its low bit — the decoder
    // must SUCCEED and report DIFFERENT statistics, exactly for the ids
    // whose band 2 carries such a coefficient.
    var affected = 0
    for (id <- 0L to 240L by 3) {
      val dropped = decodeJpegCoeffs(pixelJpegProgressive(id, dropLastRefine = true))
      assert(dropped.isDefined, s"id=$id: a shorter scan script must stay decodable")
      val nb = (jpegPxWidth(id) / 8) * (jpegPxHeight(id) / 8)
      val oddInBand2 = (0 until nb).exists(b =>
        ((jpegProgSplit(id) + 1) to 63).exists(u => math.abs(jpegAcq(id, b, u)) % 2 == 1))
      if (oddInBand2) {
        assert(dropped.get != expected(id), s"id=$id: missing refinement went unnoticed")
        affected += 1
      } else assert(dropped.contains(expected(id)), s"id=$id: even band 2 must match")
    }
    assert(affected > 10, s"sweep too weak: only $affected ids exercise the control")
  }

  test("DRI inside a progressive file is out of profile") {
    val good = pixelJpegProgressive(6L)
    assert(decodeJpegCoeffs(good).isDefined)
    val sosAt = (0 until good.length - 1).indexWhere(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val withDri = good.take(sosAt) ++ dri ++ good.drop(sosAt)
    assert(decodeJpegCoeffs(withDri).isEmpty)
  }
}

/** Totality fuzz: JPEG-magic-prefixed garbage and truncations never
  * throw. */
object JpegCoeffProps extends Properties("jpegCoeffs") {
  import MediaPipeline._

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
  private val fuzz: Gen[Array[Byte]] = Gen.oneOf(
    rawBytes,
    rawBytes.map(b => Array(0xff.toByte, 0xd8.toByte) ++ b),
    Gen.chooseNum(0L, 5000L).flatMap(id => Gen.chooseNum(0, 60).map(k =>
      pixelJpeg(id * 3).dropRight(k))),
    Gen.chooseNum(0L, 5000L).flatMap(id => Gen.chooseNum(0, 60).map(k =>
      pixelJpegProgressive(id * 3).dropRight(k))))

  property("decodeJpegCoeffs is total on arbitrary magic-prefixed bytes") =
    Prop.forAll(fuzz) { bytes => decodeJpegCoeffs(bytes); true }

  property("coefficient round-trip holds for arbitrary staged ids") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { raw =>
      val id = raw * 3 // staged residue class
      decodeJpegCoeffs(pixelJpeg(id)).exists(c =>
        c.width == jpegPxWidth(id) && c.height == jpegPxHeight(id) &&
          c.nBlocks == (jpegPxWidth(id) / 8) * (jpegPxHeight(id) / 8))
    }
}

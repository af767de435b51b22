package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins ZipSource's central-directory walk against the layouts the gate
  * fixture plants: orphaned local entries stay invisible, data-descriptor
  * members decode from the central sizes, local-only extra fields don't
  * desync the data offset, the EOCD backward scan survives a decoy
  * signature quoted in the comment, and corruption (payload bit-flip,
  * descriptor mismatch, truncation) is loud with prefix salvage.
  */
class ZipSourceSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  /** The fixture's closed-form payload model for member i of shard f. */
  private def payload(f: Int, i: Int): Array[Byte] = {
    val dcy = if (i % 3 == 0) "PK\u0003\u0004" else ""
    val n = 200 + (f * 37 + i * 13) % 500
    (dcy + "abc" * n).getBytes("US-ASCII")
  }

  test("fixture shard: counts, order, methods, descriptor flags, payload md5s") {
    val f = 5 // 4 + 5%3 = 6 members — covers stored/deflated × descriptor × extra
    val (es, clean) = ZipSource.parseZip("part05.zip", ZipSource.fixtureArchive(f))
    assert(clean)
    assert(es.size == 4 + f % 3)
    assert(!es.exists(_.name == "orphan.bin"), "orphan local entry must stay invisible")
    es.zipWithIndex.foreach { case (e, i) =>
      assert(e.eidx == i)
      assert(e.name == s"m${f * 100 + i}.txt")
      assert(e.method == (if (i % 2 == 0) 0 else 8))
      assert(e.streamed == (i % 4 == 1))
      assert(e.usize == payload(f, i).length.toLong)
      assert(e.payload_md5 == md5(payload(f, i)),
        s"member $i (method ${e.method}) must round-trip bit-exactly")
    }
  }

  test("EOCD scan survives a decoy signature inside the archive comment") {
    val m = ZipSource.Member("a.txt", "hello zip".getBytes("US-ASCII"),
      deflate = false, descriptor = false, localExtra = Array.emptyByteArray)
    // The comment QUOTES the EOCD magic; at the decoy position the
    // comment-length field reads "XX" (0x5858), which does not run to
    // EOF, so the scan must reject it and keep walking back to the
    // real record.
    val z = ZipSource.archive(Seq(m), "PK\u0005\u0006" + "X" * 30)
    val (es, clean) = ZipSource.parseZip("c.zip", z)
    assert(clean && es.size == 1 && es.head.payload_md5 == md5(m.payload))
  }

  test("payload bit-flip fails the CRC loudly; prior members salvage") {
    val z = ZipSource.fixtureArchive(3)
    // Corrupt one byte inside the LAST member's data region: locate it
    // via a clean parse first, then flip a byte near the end of file
    // but before the central directory. Simplest robust choice: flip a
    // byte a fixed distance before the first central-directory record.
    val cdAt = {
      var p = -1
      var i = z.length - 46
      while (p < 0 && i >= 0) {
        if ((z(i) & 0xff) == 0x50 && (z(i + 1) & 0xff) == 0x4b &&
            (z(i + 2) & 0xff) == 0x01 && (z(i + 3) & 0xff) == 0x02) p = i
        i -= 1
      }
      // backward find yields the LAST CD record; walk further back to the first
      var q = p
      i = p - 1
      while (i >= 0) {
        if ((z(i) & 0xff) == 0x50 && (z(i + 1) & 0xff) == 0x4b &&
            (z(i + 2) & 0xff) == 0x01 && (z(i + 3) & 0xff) == 0x02) q = i
        i -= 1
      }
      q
    }
    val bad = z.clone()
    bad(cdAt - 10) = (bad(cdAt - 10) ^ 0x1).toByte // inside the last member's data
    val (es, clean) = ZipSource.parseZip("bad.zip", bad)
    assert(!clean, "corrupt payload must not parse clean")
    val full = ZipSource.parseZip("bad.zip", z)._1
    assert(es.size < full.size, "members before the damage salvage")
    assert(es == full.take(es.size))
  }

  test("descriptor mismatch is loud") {
    val m = ZipSource.Member("s.txt", ("xy" * 100).getBytes("US-ASCII"),
      deflate = true, descriptor = true, localExtra = Array.emptyByteArray)
    val z = ZipSource.archive(Seq(m), "")
    // The descriptor trails the deflated data: sig(4) crc(4) csize(4)
    // usize(4) immediately before the central directory. Zero its usize.
    val cdAt = {
      var p = -1; var i = 0
      while (p < 0 && i < z.length - 4) {
        if ((z(i) & 0xff) == 0x50 && (z(i + 1) & 0xff) == 0x4b &&
            (z(i + 2) & 0xff) == 0x01 && (z(i + 3) & 0xff) == 0x02) p = i
        i += 1
      }
      p
    }
    val bad = z.clone()
    bad(cdAt - 1) = 0; bad(cdAt - 2) = 0 // clobber descriptor usize high bytes... and low
    bad(cdAt - 3) = 0; bad(cdAt - 4) = 0
    assert(!ZipSource.parseZip("d.zip", bad)._2)
    assert(ZipSource.parseZip("d.zip", z)._2)
  }

  test("truncation before the EOCD is loud and yields nothing") {
    val z = ZipSource.fixtureArchive(0)
    val (es, clean) = ZipSource.parseZip("t.zip", java.util.Arrays.copyOf(z, z.length - 30))
    assert(!clean && es.isEmpty, "no EOCD that runs to EOF -> no trusted index")
  }
}

package graft.sources

import graft.SparkSpec
import graft.sources.TarSource.{archive, member, parseTar, TarEntry}

/** Block-level pins for the ustar parser: the oracle gate proves the
  * fixture round-trip; these prove the block arithmetic, checksum
  * discipline and loud-failure contract on adversarial bytes the fixture
  * cannot stage (tampered checksums, truncation, missing end marker,
  * prefix-field names, misaligned resync bait).
  */
class TarSourceSpec extends SparkSpec {

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  private def bytes(s: String) = s.getBytes("US-ASCII")

  test("writer → parser round-trip: names, sizes, order, md5s, dir members") {
    val a = archive(Seq(
      member("d/", '5', Array.emptyByteArray),
      member("d/a.txt", '0', bytes("hello")),
      member("d/a.json", '0', bytes("{}")),
      member("d/empty.txt", '0', Array.emptyByteArray)))
    val (es, clean) = parseTar("f", a)
    assert(clean)
    assert(es == Seq(
      TarEntry("f", 0, "d/", "5", 0, ""),
      TarEntry("f", 1, "d/a.txt", "0", 5, md5Hex(bytes("hello"))),
      TarEntry("f", 2, "d/a.json", "0", 2, md5Hex(bytes("{}"))),
      TarEntry("f", 3, "d/empty.txt", "0", 0, md5Hex(Array.emptyByteArray))))
  }

  test("payload quoting a full plausible header does NOT resync the walk (block arithmetic, not magic-scan)") {
    // A payload that CONTAINS an entire valid header block (checksum and
    // all) — a resync-by-magic parser would adopt it as a member; the
    // block walk must step straight over it.
    val fakeHeader = member("fake.txt", '0', Array.emptyByteArray).take(512)
    val payload = fakeHeader ++ bytes("tail")
    val a = archive(Seq(
      member("real1.txt", '0', payload),
      member("real2.txt", '0', bytes("after"))))
    val (es, clean) = parseTar("f", a)
    assert(clean)
    assert(es.map(_.name) == Seq("real1.txt", "real2.txt"))
    assert(es.head.size == payload.length.toLong)
    assert(es.head.payload_md5 == md5Hex(payload))
  }

  test("exact 512-multiple payloads add NO pad block (the desync case)") {
    val exact = Array.fill[Byte](1024)('x'.toByte)
    val a = archive(Seq(
      member("big.bin", '0', exact),
      member("next.txt", '0', bytes("ok"))))
    val (es, clean) = parseTar("f", a)
    assert(clean)
    assert(es.map(e => (e.name, e.size)) ==
      Seq(("big.bin", 1024L), ("next.txt", 2L)))
  }

  test("a tampered checksum halts the walk unclean; members before survive") {
    val good = member("ok.txt", '0', bytes("fine"))
    val bad = member("bad.txt", '0', bytes("data"))
    bad(148) = '9' // smash the stored checksum
    val a = archive(Seq(good, bad))
    val (es, clean) = parseTar("f", a)
    assert(!clean)
    assert(es.map(_.name) == Seq("ok.txt"))
  }

  test("a tampered header BODY breaks the checksum and halts unclean") {
    val m = member("x.txt", '0', bytes("abc"))
    m(0) = 'y' // name byte changed after the checksum was computed
    assert(parseTar("f", archive(Seq(m)))._2 == false)
  }

  test("truncation: mid-data, mid-header and missing end marker are all unclean") {
    val m = member("t.txt", '0', bytes("0123456789"))
    // data cut short
    assert(parseTar("f", m.take(512 + 4))._2 == false)
    // header cut short
    assert(parseTar("f", m.take(100))._2 == false)
    // members complete but no two-zero-block end marker
    assert(parseTar("f", m)._2 == false)
    // ONE zero block only is also unclean
    assert(parseTar("f", m ++ new Array[Byte](512))._2 == false)
    // nonzero junk after the end marker is unclean
    val junk = archive(Seq(m)) ++ bytes("junk")
    assert(parseTar("f", junk)._2 == false)
    // empty archive (just the end marker) is clean with zero members
    assert(parseTar("f", new Array[Byte](1024)) == ((Nil, true)))
    // completely empty input: no end-of-archive marker → unclean
    assert(parseTar("f", Array.emptyByteArray)._2 == false)
  }

  test("signed-sum checksums from historic writers are accepted (GNU tar compat)") {
    // Plant a byte ≥ 0x80 in uname (offset 265) so signed and unsigned
    // sums DIFFER, then store the SIGNED sum — the header a historic
    // signed-arithmetic writer would emit. The walk must accept it and
    // the payload must round-trip.
    val m = member("s.txt", '0', bytes("payload"))
    m(265) = 0xc3.toByte // non-ASCII uname byte
    java.util.Arrays.fill(m, 148, 156, ' '.toByte)
    var signedSum = 0L
    (0 until 512).foreach(i => signedSum += m(i)) // SIGNED byte sum
    System.arraycopy(bytes(f"$signedSum%06o"), 0, m, 148, 6)
    m(154) = 0; m(155) = ' '.toByte
    val (es, clean) = parseTar("f", archive(Seq(m)))
    assert(clean)
    assert(es.map(e => (e.name, e.payload_md5)) ==
      Seq(("s.txt", md5Hex(bytes("payload")))))
    // A checksum matching NEITHER sum still halts the walk.
    m(148) = '9'
    assert(parseTar("f", archive(Seq(m)))._2 == false)
  }

  test("ustar prefix field joins long paths as prefix/name") {
    val m = member("leaf.txt", '0', bytes("p"))
    // plant a prefix (the writer never emits one; patch it in and re-sum)
    val pfx = bytes("some/deep/dir")
    System.arraycopy(pfx, 0, m, 345, pfx.length)
    java.util.Arrays.fill(m, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += m(i) & 0xff)
    System.arraycopy(bytes(f"$sum%06o"), 0, m, 148, 6)
    m(154) = 0; m(155) = ' '.toByte
    val (es, clean) = parseTar("f", archive(Seq(m)))
    assert(clean)
    assert(es.head.name == "some/deep/dir/leaf.txt")
  }

  test("fixture staging is deterministic and the oracle model's arithmetic matches") {
    val s0 = TarSource.fixtureShard(0)
    assert(java.util.Arrays.equals(s0, TarSource.fixtureShard(0)))
    val (es, clean) = parseTar("shard00.tar", s0)
    assert(clean)
    // shard 0: dir + 5 samples × 2 members
    assert(es.size == 11)
    assert(es.head.typeflag == "5")
    // sample i=3 hits the exact-block override (i%4==3) AND carries the
    // decoy prefix (3%3==0): the override sizes the TOTAL payload to
    // 512·(1+1) = 1024 including the 13-byte decoy (n = 1024−13)
    val txt3 = es.find(_.name == "d0/s3.txt").get
    assert(txt3.size == 1024L)
    // sample i=0 carries the decoy prefix
    val txt0 = es.find(_.name == "d0/s0.txt").get
    assert(txt0.size == (13 + 300).toLong)
    // sidecar content matches the closed-form n
    val js0 = es.find(_.name == "d0/s0.json").get
    assert(js0.payload_md5 == md5Hex(bytes("""{"k":0,"n":313}""")))
  }

  test("entries() fails loudly on an unclean shard unless tolerateUnclean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tar_spec_")
      .toFile.getAbsolutePath
    val good = s"$dir/good.tar"; val bad = s"$dir/bad.tar"
    java.nio.file.Files.write(java.nio.file.Paths.get(good),
      archive(Seq(member("a.txt", '0', bytes("a")))))
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      member("b.txt", '0', bytes("b"))) // no end marker
    val ex = intercept[org.apache.spark.SparkException] {
      TarSource.entries(spark, Seq(good, bad)).collect()
    }
    assert(ex.getMessage.contains("unframeable") ||
      Option(ex.getCause).exists(_.getMessage.contains("unframeable")))
    val salvaged = TarSource.entries(spark, Seq(good, bad),
      tolerateUnclean = true).collect()
    assert(salvaged.length == 2) // b.txt itself frames; only the EOF is dirty
  }
}

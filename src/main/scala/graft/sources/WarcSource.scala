package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500 / WARC-1.0) record reader — the arrival
  * format of real web-scale LLM corpora (Common Crawl ships WARC shards).
  * The reference engine ingests plain text directories
  * (FileWordCounter.cpp:189-226); this is the source format its users hit
  * the moment the corpus comes from a crawl instead of a local folder.
  *
  * Format essentials (from the public WARC 1.0 spec): a WARC file is a
  * sequence of records, each
  *
  *   WARC/1.0\r\n
  *   <header-name>: <value>\r\n   (repeated; incl. WARC-Type,
  *   ...                           WARC-Target-URI, Content-Length)
  *   \r\n
  *   <Content-Length bytes of payload>
  *   \r\n\r\n
  *
  * The load-bearing rule is CONTENT-LENGTH FRAMING: payloads are opaque
  * bytes and may legally CONTAIN "WARC/1.0" lines (a response body that
  * quotes a WARC record, a crawler crawling an archive). A parser that
  * scans for the magic instead of honoring Content-Length splits such
  * records in half — the staged gate fixture plants exactly that decoy.
  *
  * Scale shape: one task per WARC shard (the Common Crawl layout is many
  * ~1 GB shard files — same non-splittable story as the gzip round-trips),
  * parse is a single forward pass per shard, and everything downstream of
  * [[records]] is ordinary codegen'd DataFrame ops.
  */
object WarcSource {

  /** One parsed record: file ordinal index (0-based, ALL record types
    * count — pins the full record sequence), type, target URI ("" when
    * absent, e.g. warcinfo), payload length and payload md5 hex. */
  case class WarcRecord(file: String, idx: Int, rec_type: String,
                        uri: String, payload_len: Long, payload_md5: String)

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Parse one WARC file. Returns the records parsed by strict
    * Content-Length framing plus a clean-EOF flag: `false` means trailing
    * bytes could not be framed as a record (truncation or corruption) —
    * everything before the damage is still returned. */
  def parseWarc(fileName: String, bytes: Array[Byte]): (Seq[WarcRecord], Boolean) = {
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    var idx = 0
    var clean = true
    def readLine(from: Int): Option[(String, Int)] = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else Some((new String(bytes, from, i - from, "US-ASCII"), i + 2))
    }
    var halted = false
    while (!halted && off < bytes.length) {
      readLine(off) match {
        case Some(("WARC/1.0", afterVersion)) =>
          // Header block: lines until the empty line.
          var p = afterVersion
          var recType = ""; var uri = ""; var len = -1L
          var headerOk = true
          var headerDone = false
          while (headerOk && !headerDone) {
            readLine(p) match {
              case Some(("", next)) => headerDone = true; p = next
              case Some((line, next)) =>
                val c = line.indexOf(':')
                if (c < 0) headerOk = false
                else {
                  val k = line.substring(0, c).trim.toLowerCase
                  val v = line.substring(c + 1).trim
                  k match {
                    case "warc-type" => recType = v
                    case "warc-target-uri" => uri = v
                    case "content-length" =>
                      len = try v.toLong catch { case _: NumberFormatException => -1L }
                    case _ => ()
                  }
                  p = next
                }
              case None => headerOk = false
            }
          }
          // Payload: exactly len bytes, then the record-final \r\n\r\n.
          if (!headerOk || len < 0 || p + len + 4 > bytes.length ||
              bytes(p + len.toInt) != Crlf(0) || bytes(p + len.toInt + 1) != Crlf(1) ||
              bytes(p + len.toInt + 2) != Crlf(0) || bytes(p + len.toInt + 3) != Crlf(1)) {
            clean = false; halted = true
          } else {
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(java.util.Arrays.copyOfRange(bytes, p, p + len.toInt))
              .map("%02x".format(_)).mkString
            out += WarcRecord(fileName, idx, recType, uri, len, md)
            idx += 1
            off = p + len.toInt + 4
          }
        case _ => clean = false; halted = true
      }
    }
    (out.result(), clean)
  }

  /** Distributed WARC record frame over explicit shard paths — one task
    * per shard via [[FileSources.readWholeFilesBytes]]. Unclean shards
    * (trailing unframeable bytes) FAIL the read loudly: a silently
    * short-read crawl shard is a data-loss bug, not a row to drop. Pass
    * `tolerateUnclean = true` to keep the parsed prefix instead (the
    * salvage mode a backfill over damaged shards wants). */
  def records(spark: SparkSession, paths: Seq[String],
              tolerateUnclean: Boolean = false): DataFrame = {
    import spark.implicits._
    FileSources.readWholeFilesBytes(spark, paths)
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val (recs, clean) = parseWarc(name, bytes)
        if (!clean && !tolerateUnclean)
          throw new IllegalArgumentException(
            s"$path: unframeable trailing bytes after ${recs.size} records " +
            "(truncated or corrupt WARC; pass tolerateUnclean=true to salvage)")
        recs
      }
      .toDF()
  }

  // ---- Deterministic gate fixture (see SourceQueries.warc_ingest) ----
  //
  // 24 shard files; file f carries one warcinfo record then
  // 5 + (f % 4) request/response pairs. Response i of file f:
  //   uri  = http://site{f%6}.example/f{f}/p{i}
  //   body = decoy ++ "x" * (40 + (f*31 + i*7) % 100)
  //   decoy (i % 3 == 0 only) = "WARC/1.0\r\nX: decoy\r\n"  — a payload
  //     that impersonates a record header, fatal to non-framing parsers.
  // The DuckDB oracle re-generates this closed-form model with range()
  // and repeat() and must agree on counts, byte sums, an order-pinning
  // (idx × len) moment and an md5-based content checksum.

  def fixtureFiles(dir: String): Seq[String] =
    (0 until 24).map(f => f"$dir/shard$f%02d.warc")

  private def record(recType: String, uri: Option[String], id: String,
                     payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $recType\r\n")
    sb.append(s"WARC-Record-ID: <urn:uuid:$id>\r\n")
    sb.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    uri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  private[graft] def fixtureShard(f: Int): Array[Byte] = {
    val buf = Array.newBuilder[Byte]
    buf ++= record("warcinfo", None, f"info-$f%02d",
      "software: graft\r\n".getBytes("US-ASCII"))
    for (i <- 0 until (5 + f % 4)) {
      val uri = s"http://site${f % 6}.example/f$f/p$i"
      buf ++= record("request", Some(uri), f"req-$f%02d-$i%02d",
        "GET\r\n".getBytes("US-ASCII"))
      val decoy = if (i % 3 == 0) "WARC/1.0\r\nX: decoy\r\n" else ""
      val body = decoy + "x" * (40 + (f * 31 + i * 7) % 100)
      buf ++= record("response", Some(uri), f"rsp-$f%02d-$i%02d",
        body.getBytes("US-ASCII"))
    }
    buf.result()
  }

  /** Stage the fixture under `dir` (idempotent: the bytes are a pure
    * function of the shard number, so re-writing is byte-identical; the
    * marker file skips the rewrite on reuse — same single-runner-per-dir
    * contract as every [[graft.Stage]] consumer). Returns the shard paths. */
  def stageFixture(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    val marker = new java.io.File(d, "_STAGED_WARC_V1")
    val paths = fixtureFiles(dir)
    if (!marker.exists()) {
      d.mkdirs()
      paths.zipWithIndex.foreach { case (p, f) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p), fixtureShard(f))
      }
      marker.createNewFile(): Unit
    }
    paths
  }
}

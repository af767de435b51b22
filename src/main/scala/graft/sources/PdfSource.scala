package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** PDF text extraction — the document container a real corpus pipeline
  * meets right after HTML (arXiv, legal, government dumps are PDF-first).
  *
  * Reference scope note: the reference library has no document-format
  * code at all (its 983 lines stop at word counting, FileWordCounter
  * .cpp); this is LLM-pipeline extension surface built from the public
  * PDF 1.7 spec (ISO 32000-1): cross-reference tables §7.5.4 (including
  * incremental updates via the trailer /Prev chain — the LATEST xref
  * wins per object), cross-reference STREAMS §7.5.8 (the PDF 1.5+
  * layout every modern writer emits: /Type /XRef, /W field widths,
  * /Index subsections, FlateDecode + PNG predictors §7.4.4.4), object
  * streams §7.5.7 (/Type /ObjStm packing of non-stream objects, type-2
  * xref entries), stream filters §7.4.4 (/Filter /FlateDecode in both
  * name and one-element-array form — real-world content streams are
  * almost universally Flate-compressed), objects §7.3 (dictionaries,
  * arrays, literal strings with balanced-paren nesting and \-escapes
  * incl. octal, hex strings), streams §7.3.8 (/Length direct or
  * INDIRECT — real writers emit the length object after the stream
  * bytes), and text-showing operators §9.4.3 (Tj, ', ", TJ arrays whose
  * numbers are kerning, not text; BDC/DP property-list dictionaries are
  * operands, not text).
  *
  * The parser is the real thing, not a regex: it walks startxref → xref
  * table(s) OR xref stream(s) → per-object byte offsets (direct or
  * inside an object stream), parses objects at their recorded offsets
  * only (a decoy "9 0 obj" inside a string literal is data, not
  * structure), resolves indirect references with a memo, inflates and
  * un-predicts filtered streams, and tokenizes content streams with a
  * string scanner that honors nesting, escapes and comments. Returns
  * None on any malformation (including corrupt deflate data) rather
  * than guessing.
  *
  * Scale shape: one task per document, no state — the extraction is a
  * map-only pass (the pixel/codec-gate family); everything downstream is
  * an ordinary aggregate.
  */
object PdfSource {

  // ─────────────────── staged document model (closed-form) ───────────────────
  // One PDF per doc: 1 + id%2 pages; per page five text-show lines (the
  // DECODED truth the oracle replays):
  //   L1 "Doc <id> page <p>"
  //   L2 "the quick data point <id*7+p> cont"   (the " cont" rides a
  //      POSITIVE Td — same-line continuation, space separator)
  //   L3 "segment <id%9>"                       (TJ array: kerning numbers
  //      between the two string pieces must NOT emit text)
  //   L4 "esc (<id%5>) A (nested 9 0 obj) end"  (escaped parens, octal
  //      \101 = 'A', a BALANCED unescaped paren group whose content is a
  //      decoy object header)
  //   L5 "hex<id%3>"                            (hex string)
  // Every original page wraps its shows in a /Span << /ActualText (...) >>
  // BDC … EMC marked-content span — the property-list DICT is a content
  // operand whose inner string must NOT emit (the '<<'-in-content-stream
  // hazard a tokenizer that treats every '<' as a hex string fails).
  // Docs with id%3 == 1 write /Length as an INDIRECT reference whose
  // integer object sits AFTER the stream (the real-writer layout).
  // Docs with id%7 == 0 carry an INCREMENTAL UPDATE: a second body +
  // xref (trailer /Prev → the first) that REPLACES page 0's content so
  // L2 becomes "revised <id*7> r2" with no continuation — a parser that
  // reads the first xref, or scans for "obj" textually, extracts the
  // stale text.
  // Docs with id%2 == 0 FILTER their content streams (and, in the
  // modern layout, the ObjStm), rotating through the filter classes a
  // real corpus carries:
  //   id%16 ∈ {0,8}  /Filter [ /FlateDecode ]              (array form)
  //   id%16 == 2     /Filter /LZWDecode                    (name form)
  //   id%16 ∈ {4,12} /Filter [ /ASCIIHexDecode /FlateDecode ]
  //   id%16 == 6     /Filter [ /ASCII85Decode /LZWDecode ]
  //   id%16 == 10    /Filter /RunLengthDecode              (name form)
  //   id%16 == 14    /Filter [ /RunLengthDecode /FlateDecode ]
  // Odd ids store their streams plain.
  // Docs with id%5 == 2 use the MODERN (PDF 1.5+) file layout: all
  // non-stream objects packed into a /Type /ObjStm object stream,
  // cross-references as a /Type /XRef stream (W = [1 3 1], FlateDecode,
  // PNG Up predictor 12) — a classic-table-only parser refuses these
  // outright. id=7 hits modern+revised+indirect-length at once.

  def pdfPageCount(id: Long): Int = (1 + id % 2).toInt

  def pdfRevised(id: Long): Boolean = id % 7 == 0

  /** Content streams carry a /Filter (the class rotates on id%16 — see
    * the model comment; the name predates the LZW/RLE/transport
    * classes). */
  def pdfFlate(id: Long): Boolean = id % 2 == 0

  /** PDF 1.5+ layout: object stream + cross-reference stream. */
  def pdfModern(id: Long): Boolean = id % 5 == 2

  /** The decoded text of page `p` of doc `id` — what [[extractPdf]] must
    * produce and the oracle recomputes. */
  def pdfPageText(id: Long, p: Int): String = {
    val l2 =
      if (p == 0 && pdfRevised(id)) s"revised ${id * 7} r2"
      else s"the quick data point ${id * 7 + p} cont"
    Seq(
      s"Doc $id page $p",
      l2,
      s"segment ${id % 9}",
      s"esc (${id % 5}) A (nested 9 0 obj) end",
      s"hex${id % 3}").mkString("\n")
  }

  /** Show-op count of page `p` (the revised page drops the ` cont` op). */
  def pdfPageOps(id: Long, p: Int): Int =
    if (p == 0 && pdfRevised(id)) 5 else 6

  private def hexOf(s: String): String =
    s.getBytes("ISO-8859-1").map(b => f"$b%02X").mkString

  /** Content stream BODY for page `p`, original revision. */
  private def contentOf(id: Long, p: Int): String = {
    val sb = new StringBuilder
    sb.append("BT /F1 12 Tf\n")
    sb.append("% layout marker\n") // comments are legal content tokens
    // a marked-content property list: the '<<' dict is an OPERAND whose
    // string value must not emit (and must not be read as a hex string)
    sb.append("/Span << /ActualText (decoy, never emitted) >> BDC\n")
    sb.append(s"72 720 Td (Doc $id page $p) Tj\n")
    sb.append(s"0 -14 Td (the quick data point ${id * 7 + p}) Tj\n")
    sb.append("12 0 Td (cont) Tj\n") // positive move: same line
    sb.append(s"0 -14 Td [(seg) -120 (ment ${id % 9})] TJ\n")
    sb.append(s"0 -14 Td (esc \\(${id % 5}\\) \\101 (nested 9 0 obj) end) Tj\n")
    // the `"` operator does its own next-line move (aw ac string ")
    sb.append(s"""1 2 <${hexOf(s"hex${id % 3}")}> "\n""")
    sb.append("EMC\nET")
    sb.toString
  }

  /** Replacement content for page 0 of revised docs. */
  private def revisedContentOf(id: Long): String = {
    val sb = new StringBuilder
    sb.append("BT /F1 12 Tf\n")
    sb.append(s"72 720 Td (Doc $id page 0) Tj\n")
    sb.append(s"0 -14 Td (revised ${id * 7} r2) Tj\n")
    sb.append(s"0 -14 Td [(seg) -120 (ment ${id % 9})] TJ\n")
    sb.append(s"0 -14 Td (esc \\(${id % 5}\\) \\101 (nested 9 0 obj) end) Tj\n")
    sb.append(s"0 -14 Td <${hexOf(s"hex${id % 3}")}> Tj\n")
    sb.append("ET")
    sb.toString
  }

  // ─────────────────────────── codec helpers ───────────────────────────

  /** zlib-deflate (the encoding FlateDecode §7.4.4 expects). Output
    * bytes never enter an oracle checksum — only the DECODED text does —
    * so zlib's exact byte choice is free to vary. */
  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Decompression-bomb ceiling for every expanding codec: extractPdf
    * is a parse-as-filter over possibly-hostile bytes, and a tiny
    * crafted Flate/LZW stream can otherwise inflate to gigabytes and
    * OOM an executor. 64 MiB is orders of magnitude above any content
    * stream the staged model (or a sane real page) produces. */
  private[sources] val MaxDecodedBytes: Int = 64 << 20

  /** zlib-inflate; None on corrupt, truncated, or bomb-sized data. */
  private[sources] def inflateBytes(in: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(in.length * 3 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) {
          out.write(buf, 0, n)
          if (out.size > MaxDecodedBytes) return None // decompression bomb
        }
        else if (!inf.finished()) return None // truncated stream
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  // ── LZWDecode (§7.4.4.2): MSB-first variable-width codes, 256 = clear,
  //    257 = EOD, table capped at 4096, width bumps 9→12 one code early
  //    when /EarlyChange is 1 (the default). The PDF variant differs from
  //    the in-tree GIF-LZW (MediaPipeline) in bit order (MSB-first here,
  //    LSB-first in GIF), fixed specials (256/257 vs root-size-relative)
  //    and the early-change rule — a shared core would encode neither
  //    spec cleanly, so this is its own ~60 lines.

  /** Shared table-state transition for encoder bit-packing and decoder:
    * given (next, width, prevSeen) BEFORE a code, the state after it.
    * Keeping one function is what guarantees the two stay in sync. */
  private def lzwStep(code: Int, next: Int, width: Int, prevSeen: Boolean,
                      early: Int): (Int, Int, Boolean) =
    if (code == 256) (258, 9, false)
    else if (code == 257) (next, width, prevSeen)
    else {
      val n2 = if (prevSeen && next < 4096) next + 1 else next
      val w2 = if (prevSeen && n2 == (1 << width) - early && width < 12) width + 1 else width
      (n2, w2, true)
    }

  /** Greedy LZW encode for staging: clear, phrases, clear-on-full, EOD. */
  private[sources] def lzwEncode(raw: Array[Byte], early: Int = 1): Array[Byte] = {
    val codes = Vector.newBuilder[Int]
    codes += 256
    val dict = scala.collection.mutable.HashMap.empty[(Int, Byte), Int]
    var next = 258
    var cur = -1
    for (b <- raw) {
      if (cur < 0) cur = b & 0xFF
      else dict.get((cur, b)) match {
        case Some(c) => cur = c
        case None =>
          codes += cur
          if (next < 4096) { dict((cur, b)) = next; next += 1 }
          else { codes += 256; dict.clear(); next = 258 }
          cur = b & 0xFF
      }
    }
    if (cur >= 0) codes += cur
    codes += 257
    // bit-pack by replaying the DECODER's width evolution (lzwStep)
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    var bitBuf = 0L; var bitCnt = 0
    var dNext = 258; var width = 9; var prevSeen = false
    for (c <- codes.result()) {
      bitBuf = (bitBuf << width) | c.toLong; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
      val st = lzwStep(c, dNext, width, prevSeen, early)
      dNext = st._1; width = st._2; prevSeen = st._3
    }
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** LZW decode; None on malformed codes, missing EOD, or bomb size. */
  private[sources] def lzwDecode(in: Array[Byte], early: Int = 1): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 3 + 64)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    def expand(code: Int): Array[Byte] = {
      var n = 0; var c = code
      while (c >= 258) { n += 1; c = prefix(c) }
      val res = new Array[Byte](n + 1)
      c = code; var i = n
      while (c >= 258) { res(i) = suffix(c); i -= 1; c = prefix(c) }
      res(0) = c.toByte
      res
    }
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var next = 258; var width = 9; var prevSeen = false
    var prev = -1
    while (true) {
      while (bitCnt < width && pos < in.length) {
        bitBuf = (bitBuf << 8) | (in(pos) & 0xFF); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return None // ran out of bits before EOD
      val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
      bitCnt -= width
      if (code == 257) return Some(out.toByteArray)
      if (code != 256) {
        if (code > next || (code == next && !prevSeen)) return None
        val entry =
          if (code < next) expand(code)
          else { val p = expand(prev); p :+ p(0) } // KwKwK: code == next
        out.write(entry, 0, entry.length)
        if (out.size > MaxDecodedBytes) return None // decompression bomb
        if (prevSeen && next < 4096) { prefix(next) = prev; suffix(next) = entry(0) }
        prev = code
      } else prev = -1
      val st = lzwStep(code, next, width, prevSeen, early)
      next = st._1; width = st._2; prevSeen = st._3
    }
    None // unreachable
  }

  // ── ASCIIHexDecode / ASCII85Decode (§7.4.2, §7.4.3): the transport
  //    wrappers real corpora put AROUND a compression filter.

  private[sources] def asciiHexEncode(raw: Array[Byte]): String =
    raw.map(b => f"$b%02X").mkString + ">"

  /** Hex pairs up to '>'; whitespace ignored; odd trailing digit pads 0. */
  private[sources] def asciiHexDecode(s: String): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(s.length / 2 + 8)
    var hi = -1
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c == '>') { // EOD: odd count implies a final 0 nibble
          if (hi >= 0) out.write(hi << 4)
          return Some(out.toByteArray)
        }
        // §7.2.3 white-space: NUL, HT, LF, FF, CR, SP — NUL included.
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == '\u0000') -1
        else return None // not hex, not whitespace, not EOD
      if (d >= 0) {
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    None // missing '>' terminator
  }

  private[sources] def ascii85Encode(raw: Array[Byte]): String = {
    val sb = new StringBuilder(raw.length * 5 / 4 + 8)
    var i = 0
    while (i < raw.length) {
      val n = math.min(4, raw.length - i)
      var v = 0L
      for (k <- 0 until 4) {
        val b = if (i + k < raw.length) raw(i + k) & 0xFF else 0
        v = (v << 8) | b
      }
      if (n == 4 && v == 0L) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var rem = v
        for (k <- 4 to 0 by -1) { cs(k) = ('!' + (rem % 85)).toChar; rem /= 85 }
        for (k <- 0 to n) sb.append(cs(k)) // n+1 chars encode n bytes
      }
      i += 4
    }
    sb.append("~>").toString
  }

  /** Base-85 groups up to '~>'; 'z' = four zero bytes; a final partial
    * group of k+1 chars yields k bytes. None on bad chars, a 1-char
    * final group, or group overflow. */
  private[sources] def ascii85Decode(s: String): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(s.length * 4 / 5 + 8)
    val grp = new Array[Int](5)
    var gi = 0
    var i = 0
    def flush(chars: Int): Boolean = { // chars in [2, 5]
      var v = 0L
      for (k <- 0 until 5) v = v * 85 + (if (k < chars) grp(k) else 84)
      if (v > 0xFFFFFFFFL) return false // group value exceeds 2^32-1
      val bs = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(bs, 0, chars - 1)
      true
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '~') {
        if (i + 1 >= s.length || s.charAt(i + 1) != '>') return None
        if (gi == 1) return None // a lone trailing char is unrepresentable
        if (gi >= 2 && !flush(gi)) return None
        return Some(out.toByteArray)
      }
      else if (c == 'z' && gi == 0) { out.write(Array[Byte](0, 0, 0, 0), 0, 4) }
      else if (c >= '!' && c <= 'u') {
        grp(gi) = c - '!'; gi += 1
        if (gi == 5) { if (!flush(5)) return None; gi = 0 }
      }
      // §7.2.3 white-space: NUL, HT, LF, FF, CR, SP — NUL included.
      else if (!(c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == '\u0000'))
        return None
      i += 1
    }
    None // missing '~>' terminator
  }

  // ── RunLengthDecode (§7.4.5): length byte L — 0..127 copies the next
  //    L+1 bytes literally, 129..255 repeats the next byte 257−L times,
  //    128 is EOD. The PackBits scheme old image-heavy writers emit.

  /** Run-length encode for staging: maximal runs (≥ 2) as repeat
    * groups, literal stretches capped at 128, EOD terminator. */
  private[sources] def rleEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length + raw.length / 128 + 8)
    var i = 0
    while (i < raw.length) {
      var j = i + 1
      while (j < raw.length && j - i < 128 && raw(j) == raw(i)) j += 1
      if (j - i >= 2) { out.write(257 - (j - i)); out.write(raw(i) & 0xFF); i = j }
      else {
        var k = i + 1
        while (k < raw.length && k - i < 128 &&
               !(k + 1 < raw.length && raw(k) == raw(k + 1))) k += 1
        out.write(k - i - 1)
        out.write(raw, i, k - i)
        i = k
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** Run-length decode; None on a truncated group, a missing EOD, or
    * bomb size (a 2-byte group expands to at most 128 bytes, but the
    * ceiling keeps every expanding codec under one contract). */
  private[sources] def rleDecode(in: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 2 + 8)
    var i = 0
    while (i < in.length) {
      val l = in(i) & 0xFF
      if (l == 128) return Some(out.toByteArray) // EOD
      if (l < 128) {
        if (i + 2 + l > in.length) return None // truncated literal group
        out.write(in, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= in.length) return None // truncated repeat group
        val n = 257 - l
        val b = in(i + 1) & 0xFF
        var k = 0
        while (k < n) { out.write(b); k += 1 }
        i += 2
      }
      if (out.size > MaxDecodedBytes) return None // decompression bomb
    }
    None // missing EOD
  }

  /** PNG Up-predictor (type 2) encode for xref stream staging: each row
    * is prefixed with filter byte 2 and stores raw − rowAbove (mod 256).
    * §7.4.4.4: the predictors are exactly PNG's (RFC 2083). */
  private def pngUpPredict(rows: Array[Array[Byte]]): Array[Byte] = {
    val w = if (rows.isEmpty) 0 else rows(0).length
    val out = new Array[Byte](rows.length * (w + 1))
    var prev = new Array[Byte](w)
    var r = 0
    while (r < rows.length) {
      out(r * (w + 1)) = 2
      var i = 0
      while (i < w) {
        out(r * (w + 1) + 1 + i) = ((rows(r)(i) - prev(i)) & 0xFF).toByte
        i += 1
      }
      prev = rows(r)
      r += 1
    }
    out
  }

  /** PNG predictor decode (filter types 0..4 per row, RFC 2083 §6) over
    * rows of `columns`×`bpp` bytes. None on bad geometry or filter. */
  private[sources] def pngUnpredict(data: Array[Byte], columns: Int, bpp: Int): Option[Array[Byte]] = {
    val rowBytes = columns * bpp
    if (rowBytes <= 0 || data.length % (rowBytes + 1) != 0) return None
    val nRows = data.length / (rowBytes + 1)
    val out = new Array[Byte](nRows * rowBytes)
    var prevOff = -1
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowBytes + 1)) & 0xFF
      val src = r * (rowBytes + 1) + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val raw = data(src + i) & 0xFF
        val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val up = if (prevOff >= 0) out(prevOff + i) & 0xFF else 0
        val upLeft = if (prevOff >= 0 && i >= bpp) out(prevOff + i - bpp) & 0xFF else 0
        val rec = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        out(dst + i) = (rec & 0xFF).toByte
        i += 1
      }
      prevOff = dst
      r += 1
    }
    Some(out)
  }

  private def iso(b: Array[Byte]): String = new String(b, "ISO-8859-1")
  private def bytesOf(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  // ───────────────────────────── staged writer ─────────────────────────────

  /** A COMPLETE spec-conformant PDF for doc `id`. Classic layout: object
    * numbering 1 catalog, 2 pages root, 3..2+P pages, 3+P..2+2P contents,
    * 3+2P font, 4+2P..3+3P length objects (only for the indirect-length
    * docs). Modern layout (id%5==2) additionally: S=ObjStm, X=XRef stream
    * (and X+1 for the update's second xref stream). */
  def pdfBytes(id: Long): Array[Byte] =
    if (pdfModern(id)) modernPdfBytes(id) else classicPdfBytes(id)

  /** `/Filter …` dict fragment (with leading space) for doc `id`'s
    * content streams, or "" when stored plain. Even ids are filtered,
    * rotating through the real-corpus filter classes (see the doc-model
    * comment): Flate in array form, LZW in name form, and the two
    * transport-wrapped chains. */
  private def filterFragment(id: Long): String =
    if (!pdfFlate(id)) ""
    else (id % 16) match {
      case 0 | 8 => " /Filter [ /FlateDecode ]"             // array form
      case 2     => " /Filter /LZWDecode"                   // name form
      case 4 | 12 => " /Filter [ /ASCIIHexDecode /FlateDecode ]" // hex transport
      case 6     => " /Filter [ /ASCII85Decode /LZWDecode ]" // base-85 transport
      case 10    => " /Filter /RunLengthDecode"             // name form
      case _     => " /Filter [ /RunLengthDecode /FlateDecode ]" // RLE transport
    }

  /** Stored (filtered per [[filterFragment]]) body for doc `id`'s
    * content streams — encoded in REVERSE declaration order (§7.4: the
    * first listed filter is the last applied when writing). */
  private def storedContent(id: Long, body: String): String =
    if (!pdfFlate(id)) body
    else (id % 16) match {
      case 0 | 8 => iso(deflateBytes(bytesOf(body)))
      case 2     => iso(lzwEncode(bytesOf(body)))
      case 4 | 12 => asciiHexEncode(deflateBytes(bytesOf(body)))
      case 6     => ascii85Encode(lzwEncode(bytesOf(body)))
      case 10    => iso(rleEncode(bytesOf(body)))
      case _     => iso(rleEncode(deflateBytes(bytesOf(body))))
    }

  private def classicPdfBytes(id: Long): Array[Byte] = {
    val pages = pdfPageCount(id)
    val indirectLen = id % 3 == 1
    val fontObj = 3 + 2 * pages
    val maxObj = if (indirectLen) 3 + 3 * pages else fontObj
    val offsets = new Array[Long](maxObj + 1)
    val sb = new StringBuilder
    def obj(n: Int)(body: => String): Unit = {
      offsets(n) = sb.length.toLong
      sb.append(s"$n 0 obj\n").append(body).append("\nendobj\n")
    }
    sb.append("%PDF-1.4\n")
    sb.append("% staged by graft.sources.PdfSource\n")
    obj(1)(s"<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until pages).map(p => s"${3 + p} 0 R").mkString(" ")
    obj(2)(s"<< /Type /Pages /Kids [ $kids ] /Count $pages >>")
    for (p <- 0 until pages)
      obj(3 + p)(s"<< /Type /Page /Parent 2 0 R /Contents ${3 + pages + p} 0 R " +
        s"/MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 $fontObj 0 R >> >> >>")
    for (p <- 0 until pages) {
      val stored = storedContent(id, contentOf(id, p))
      val lenStr = if (indirectLen) s"${4 + 2 * pages + p} 0 R" else stored.length.toString
      offsets(3 + pages + p) = sb.length.toLong
      sb.append(s"${3 + pages + p} 0 obj\n<< /Length $lenStr${filterFragment(id)} >>\nstream\n")
      sb.append(stored).append("\nendstream\nendobj\n")
      if (indirectLen) // the real-writer layout: length object AFTER the bytes
        obj(4 + 2 * pages + p)(stored.length.toString)
    }
    obj(fontObj)("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    // first xref
    val xref1 = sb.length.toLong
    sb.append(s"xref\n0 ${maxObj + 1}\n")
    sb.append("0000000000 65535 f \n")
    for (n <- 1 to maxObj) {
      val off = offsets(n) // 0 for unwritten length slots of direct docs
      val typ = if (off == 0 && n != 0) "f" else "n"
      sb.append(f"$off%010d 00000 $typ \n")
    }
    sb.append(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xref1\n%%EOF\n")
    if (pdfRevised(id)) {
      // incremental update: replace page 0's content object
      val contObj = 3 + pages
      val stored = storedContent(id, revisedContentOf(id))
      val newOff = sb.length.toLong
      sb.append(s"$contObj 0 obj\n<< /Length ${stored.length}${filterFragment(id)} >>\nstream\n")
      sb.append(stored).append("\nendstream\nendobj\n")
      val xref2 = sb.length.toLong
      sb.append(s"xref\n$contObj 1\n")
      sb.append(f"$newOff%010d 00000 n \n")
      sb.append(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R /Prev $xref1 >>\n")
      sb.append(s"startxref\n$xref2\n%%EOF\n")
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  /** Serialize one cross-reference STREAM object (§7.5.8): W = [1 3 1]
    * rows, FlateDecode + PNG Up predictor (12), /Index subsections. */
  private def xrefStreamObj(num: Int, size: Int, root: String,
                            index: Seq[(Int, Int)],
                            rows: Seq[(Int, Long, Int)], // (type, f2, f3)
                            prev: Option[Long]): String = {
    val rowBytes = rows.map { case (t, f2, f3) =>
      // W = [1 3 1] is hardcoded: a silent truncation of a byte offset
      // above 16 MiB would write a corrupt xref with no error, so refuse
      // loudly instead (staged docs are tiny; this guards future reuse).
      require(t >= 0 && t <= 0xFF && f2 >= 0 && f2 <= 0xFFFFFF && f3 >= 0 && f3 <= 0xFF,
        s"xref row ($t, $f2, $f3) exceeds W=[1 3 1] field widths")
      Array[Byte](t.toByte,
        ((f2 >> 16) & 0xFF).toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte,
        (f3 & 0xFF).toByte)
    }.toArray
    val stored = iso(deflateBytes(pngUpPredict(rowBytes)))
    val idxStr = index.map { case (s0, c) => s"$s0 $c" }.mkString(" ")
    val prevStr = prev.map(p => s" /Prev $p").getOrElse("")
    s"$num 0 obj\n<< /Type /XRef /Size $size /W [ 1 3 1 ] /Index [ $idxStr ]" +
      s" /Root $root$prevStr /Filter /FlateDecode" +
      s" /DecodeParms << /Predictor 12 /Columns 5 >> /Length ${stored.length} >>\n" +
      s"stream\n$stored\nendstream\nendobj\n"
  }

  /** The PDF 1.5+ writer: non-stream objects packed into one /ObjStm
    * (compressed when the doc's content is), content streams direct,
    * cross-references as predictor-12 Flate xref streams — including the
    * incremental update, whose second xref STREAM chains via /Prev. */
  private def modernPdfBytes(id: Long): Array[Byte] = {
    val pages = pdfPageCount(id)
    val indirectLen = id % 3 == 1
    val fontObj = 3 + 2 * pages
    val stmObj = (if (indirectLen) 3 + 3 * pages else fontObj) + 1 // S
    val xrefObj = stmObj + 1                                        // X
    val sb = new StringBuilder
    sb.append("%PDF-1.5\n")
    sb.append("% staged by graft.sources.PdfSource (modern layout)\n")
    // content streams: direct objects (streams cannot live in an ObjStm)
    val contOff = new Array[Long](pages)
    val storedLens = new Array[Int](pages)
    for (p <- 0 until pages) {
      val stored = storedContent(id, contentOf(id, p))
      storedLens(p) = stored.length
      val lenStr = if (indirectLen) s"${4 + 2 * pages + p} 0 R" else stored.length.toString
      contOff(p) = sb.length.toLong
      sb.append(s"${3 + pages + p} 0 obj\n<< /Length $lenStr${filterFragment(id)} >>\nstream\n")
      sb.append(stored).append("\nendstream\nendobj\n")
    }
    // object stream members: catalog, pages, page dicts, font, lengths
    val kids = (0 until pages).map(p => s"${3 + p} 0 R").mkString(" ")
    val members = Seq.newBuilder[(Int, String)]
    members += 1 -> s"<< /Type /Catalog /Pages 2 0 R >>"
    members += 2 -> s"<< /Type /Pages /Kids [ $kids ] /Count $pages >>"
    for (p <- 0 until pages)
      members += (3 + p) -> (s"<< /Type /Page /Parent 2 0 R /Contents ${3 + pages + p} 0 R " +
        s"/MediaBox [ 0 0 612 792 ] /Resources << /Font << /F1 $fontObj 0 R >> >> >>")
    members += fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    if (indirectLen)
      for (p <- 0 until pages) members += (4 + 2 * pages + p) -> storedLens(p).toString
    val mem = members.result()
    // ObjStm body: "num off …\n" header, then the member bodies
    val bodies = mem.map(_._2)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = mem.map(_._1).zip(offs).map { case (n, o) => s"$n $o" }.mkString(" ")
    val first = header.length + 1
    val plain = header + "\n" + bodies.mkString(" ") + " "
    val storedStm = storedContent(id, plain) // same filter class as the content
    val stmOff = sb.length.toLong
    sb.append(s"$stmObj 0 obj\n<< /Type /ObjStm /N ${mem.length} /First $first" +
      s"${filterFragment(id)} /Length ${storedStm.length} >>\nstream\n")
    sb.append(storedStm).append("\nendstream\nendobj\n")
    // xref stream: obj 0 free, members type-2, contents/S/X type-1
    val inStm: Map[Int, Int] = mem.map(_._1).zipWithIndex.toMap
    val rows = (0 to xrefObj).map { n =>
      if (n == 0) (0, 0L, 255)
      else if (inStm.contains(n)) (2, stmObj.toLong, inStm(n))
      else if (n >= 3 + pages && n < 3 + 2 * pages) (1, contOff(n - 3 - pages), 0)
      else if (n == stmObj) (1, stmOff, 0)
      else (1, sb.length.toLong, 0) // n == xrefObj: its own offset
    }
    val xref1 = sb.length.toLong
    sb.append(xrefStreamObj(xrefObj, xrefObj + 1, "1 0 R",
      Seq(0 -> (xrefObj + 1)), rows, None))
    sb.append(s"startxref\n$xref1\n%%EOF\n")
    if (pdfRevised(id)) {
      val contObj = 3 + pages
      val stored = storedContent(id, revisedContentOf(id))
      val newOff = sb.length.toLong
      sb.append(s"$contObj 0 obj\n<< /Length ${stored.length}${filterFragment(id)} >>\nstream\n")
      sb.append(stored).append("\nendstream\nendobj\n")
      val x2 = xrefObj + 1
      val xref2 = sb.length.toLong
      sb.append(xrefStreamObj(x2, x2 + 1, "1 0 R",
        Seq(contObj -> 1, x2 -> 1),
        Seq((1, newOff, 0), (1, xref2, 0)), Some(xref1)))
      sb.append(s"startxref\n$xref2\n%%EOF\n")
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  // ─────────────────────────────── parser ───────────────────────────────

  private sealed trait PVal
  private final case class PNum(v: Double) extends PVal
  private final case class PName(v: String) extends PVal
  private final case class PStr(v: String) extends PVal
  private final case class PRef(num: Int) extends PVal
  private final case class PArr(v: Vector[PVal]) extends PVal
  private final case class PDict(v: Map[String, PVal]) extends PVal
  private case object PNull extends PVal

  /** Where an object lives: at a byte offset, or packed inside an
    * object stream (type-2 xref entry, §7.5.8.3). */
  private sealed trait XEntry
  private final case class XOff(off: Long) extends XEntry
  private final case class XInStm(stm: Int, idx: Int) extends XEntry
  /** Free (type-0 / classic 'f') — RECORDED, not skipped, so a newer
    * revision's deletion shadows an older section's stale offset
    * (latest-revision-wins, §7.5.8.3). */
  private case object XFree extends XEntry

  /** Single-pass object-value scanner over the whole-file string `s`
    * starting at `pos`; returns (value, posAfter) or None. */
  private final class Scanner(s: String) {
    var pos = 0
    def fail[T]: Option[T] = None
    def ws(): Unit = {
      while (pos < s.length && (s.charAt(pos).isWhitespace || s.charAt(pos) == '%')) {
        if (s.charAt(pos) == '%') { // comment to end of line (not in strings)
          while (pos < s.length && s.charAt(pos) != '\n' && s.charAt(pos) != '\r') pos += 1
        } else pos += 1
      }
    }
    def literal(lit: String): Boolean = {
      ws()
      if (s.regionMatches(pos, lit, 0, lit.length)) { pos += lit.length; true }
      else false
    }
    def number(): Option[Double] = {
      ws()
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
      var digits = false
      while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) {
        if (s.charAt(pos).isDigit) digits = true
        pos += 1
      }
      if (!digits) { pos = start; None } else Some(s.substring(start, pos).toDouble)
    }
    /** Literal string: balanced parens, backslash escapes incl. octal. */
    def litString(): Option[String] = {
      if (pos >= s.length || s.charAt(pos) != '(') return None
      pos += 1
      val sb = new StringBuilder
      var depth = 1
      while (pos < s.length && depth > 0) {
        val c = s.charAt(pos)
        if (c == '\\' && pos + 1 < s.length) {
          val e = s.charAt(pos + 1)
          pos += 2
          e match {
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case d if d >= '0' && d <= '7' =>
              var oct = d - '0'
              var k = 0
              while (k < 2 && pos < s.length && s.charAt(pos) >= '0' && s.charAt(pos) <= '7') {
                oct = oct * 8 + (s.charAt(pos) - '0'); pos += 1; k += 1
              }
              sb.append(oct.toChar)
            case other => sb.append(other) // \( \) \\ and unknown escapes
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          if (depth > 0) sb.append(c)
          pos += 1
        }
      }
      if (depth != 0) None else Some(sb.toString)
    }
    def hexString(): Option[String] = {
      if (pos >= s.length || s.charAt(pos) != '<') return None
      pos += 1
      val sb = new StringBuilder
      val hex = new StringBuilder
      while (pos < s.length && s.charAt(pos) != '>') {
        val c = s.charAt(pos)
        if (!c.isWhitespace) {
          if (!(c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) return None
          hex.append(c)
        }
        pos += 1
      }
      if (pos >= s.length) return None
      pos += 1 // consume '>'
      if (hex.length % 2 == 1) hex.append('0') // §7.3.4.3: odd count pads 0
      var i = 0
      while (i < hex.length) {
        sb.append(Integer.parseInt(hex.substring(i, i + 2), 16).toChar)
        i += 2
      }
      Some(sb.toString)
    }
    def name(): Option[String] = {
      if (pos >= s.length || s.charAt(pos) != '/') return None
      pos += 1
      val start = pos
      while (pos < s.length && !s.charAt(pos).isWhitespace &&
             !"()<>[]{}/%".contains(s.charAt(pos))) pos += 1
      Some(s.substring(start, pos))
    }
    /** One object value. Resolves `num gen R` lookahead for references. */
    def value(): Option[PVal] = {
      ws()
      if (pos >= s.length) return None
      s.charAt(pos) match {
        case '<' if pos + 1 < s.length && s.charAt(pos + 1) == '<' =>
          pos += 2
          var m = Map.empty[String, PVal]
          var ok = true
          ws()
          while (ok && !(pos + 1 < s.length && s.charAt(pos) == '>' && s.charAt(pos + 1) == '>')) {
            (name(), { ws(); value() }) match {
              case (Some(k), Some(v)) => m += (k -> v); ws()
              case _ => ok = false
            }
          }
          if (!ok) None else { pos += 2; Some(PDict(m)) }
        case '<' => hexString().map(PStr(_))
        case '(' => litString().map(PStr(_))
        case '/' => name().map(PName(_))
        case '[' =>
          pos += 1
          var items = Vector.empty[PVal]
          ws()
          var ok = true
          while (ok && pos < s.length && s.charAt(pos) != ']') {
            value() match {
              case Some(v) => items :+= v; ws()
              case None => ok = false
            }
          }
          if (!ok || pos >= s.length) None else { pos += 1; Some(PArr(items)) }
        case c if c.isDigit || c == '+' || c == '-' || c == '.' =>
          val save = pos
          number().flatMap { n =>
            // lookahead for "gen R"
            val afterNum = pos
            val isRef = number() match {
              case Some(_) =>
                ws()
                if (pos < s.length && s.charAt(pos) == 'R' &&
                    (pos + 1 >= s.length || !s.charAt(pos + 1).isLetterOrDigit)) {
                  pos += 1; true
                } else { pos = afterNum; false }
              case None => pos = afterNum; false
            }
            if (isRef) Some(PRef(n.toInt))
            else { pos = if (pos == save) afterNum else pos; Some(PNum(n)) }
          }
        case 'n' if s.regionMatches(pos, "null", 0, 4) => pos += 4; Some(PNull)
        case 't' if s.regionMatches(pos, "true", 0, 4) => pos += 4; Some(PNum(1))
        case 'f' if s.regionMatches(pos, "false", 0, 5) => pos += 5; Some(PNum(0))
        case _ => None
      }
    }
  }

  /** Raw→decoded stream bytes (as an ISO-8859-1 string) for a stream
    * whose dict starts the object at `afterDict` in `s`. Applies
    * /Filter (/FlateDecode, name or one-element array) and
    * /DecodeParms PNG predictors; any other filter, predictor 2, or
    * corrupt deflate data refuses with None. `resolveLen` resolves an
    * indirect /Length (pass a direct-only resolver where indirection is
    * illegal, e.g. inside xref parsing before offsets exist). */
  private def streamData(s: String, dict: Map[String, PVal], afterDict: Int,
                         resolveLen: PVal => Option[PVal]): Option[String] = {
    if (afterDict < 0) return None // ObjStm members can never be streams
    val len = resolveLen(dict.getOrElse("Length", return None)) match {
      case Some(PNum(l)) if l >= 0 => l.toLong
      case _ => return None
    }
    val sc = new Scanner(s); sc.pos = afterDict
    if (!sc.literal("stream")) return None
    var dp = sc.pos
    if (dp < s.length && s.charAt(dp) == '\r') dp += 1
    if (dp < s.length && s.charAt(dp) == '\n') dp += 1
    if (dp.toLong + len > s.length) return None
    val raw = s.substring(dp, dp + len.toInt)
    val filters: Vector[String] = dict.get("Filter") match {
      case None => Vector.empty
      case Some(PName(f)) => Vector(f)
      case Some(PArr(fs)) =>
        fs.map { case PName(f) => f; case _ => return None }
      case _ => return None
    }
    if (filters.isEmpty) return Some(raw)
    // /DecodeParms aligns with /Filter: a single dict applies to a
    // single filter; an array aligns element-by-element (§7.3.8.2).
    val parmsSeq: Vector[Map[String, PVal]] = dict.get("DecodeParms") match {
      case None | Some(PNull) => Vector.fill(filters.length)(Map.empty)
      case Some(PDict(m)) if filters.length == 1 => Vector(m)
      case Some(PArr(xs)) if xs.length == filters.length =>
        xs.map { case PDict(m) => m; case PNull => Map.empty; case _ => return None }
      case _ => return None
    }
    // apply the chain in declaration order (§7.4: the FIRST filter is
    // the one applied LAST at write time)
    var cur = raw
    for ((f, parms) <- filters.zip(parmsSeq)) {
      def intParm(k: String, dflt: Int): Option[Int] = parms.get(k) match {
        case Some(PNum(v)) => Some(v.toInt)
        case None => Some(dflt)
        case _ => None
      }
      /** Predictor post-pass shared by Flate and LZW (§7.4.4.4). */
      def unpredict(decoded: Array[Byte]): Option[String] = {
        val pred = intParm("Predictor", 1).getOrElse(return None)
        if (pred == 1) Some(iso(decoded))
        else if (pred >= 10) { // PNG predictors
          val cols = intParm("Columns", 1).getOrElse(return None)
          val colors = intParm("Colors", 1).getOrElse(return None)
          val bits = intParm("BitsPerComponent", 8).getOrElse(return None)
          val bpp = math.max(1, colors * bits / 8)
          pngUnpredict(decoded, cols, bpp).map(iso)
        } else None // TIFF predictor 2: not emitted by PDF writers we accept
      }
      cur = f match {
        case "FlateDecode" =>
          inflateBytes(bytesOf(cur)).flatMap(unpredict).getOrElse(return None)
        case "LZWDecode" =>
          val early = intParm("EarlyChange", 1).getOrElse(return None)
          if (early != 0 && early != 1) return None
          lzwDecode(bytesOf(cur), early).flatMap(unpredict).getOrElse(return None)
        case "ASCIIHexDecode" => asciiHexDecode(cur).map(iso).getOrElse(return None)
        case "ASCII85Decode" => ascii85Decode(cur).map(iso).getOrElse(return None)
        case "RunLengthDecode" => rleDecode(bytesOf(cur)).map(iso).getOrElse(return None)
        case _ => return None // unsupported filter: refuse, never guess
      }
    }
    Some(cur)
  }

  /** One extracted page. */
  final case class PdfPage(page: Int, nOps: Int, text: String)

  /** Parse `bytes` as a PDF and extract all page texts in kid order.
    * None on any structural malformation. Handles both classic xref
    * tables (§7.5.4) and PDF 1.5+ xref streams (§7.5.8) with object
    * streams (§7.5.7), chained through /Prev in either form. */
  def extractPdf(bytes: Array[Byte]): Option[Vector[PdfPage]] = {
    val s = new String(bytes, "ISO-8859-1")
    // 1. latest startxref
    val sxi = s.lastIndexOf("startxref")
    if (sxi < 0) return None
    val sc0 = new Scanner(s); sc0.pos = sxi + "startxref".length
    val xrefStart = sc0.number().getOrElse(return None).toLong
    // 2. xref chain, latest first; first-recorded entry wins per object
    val objOff = scala.collection.mutable.Map.empty[Int, XEntry]
    var next = xrefStart
    var guard = 0
    var trailerRoot = -1
    while (next >= 0 && guard < 16) {
      guard += 1
      if (next < 0 || next > s.length) return None
      val sc = new Scanner(s); sc.pos = next.toInt
      val save = sc.pos
      if (sc.literal("xref")) {
        // ── classic cross-reference table ──
        var done = false
        while (!done) {
          val save2 = sc.pos
          if (sc.literal("trailer")) done = true
          else {
            sc.pos = save2
            val start = sc.number().getOrElse(return None).toInt
            val count = sc.number().getOrElse(return None).toInt
            if (count < 0 || count > 100000) return None
            for (k <- 0 until count) {
              val off = sc.number().getOrElse(return None).toLong
              sc.number().getOrElse(return None) // generation
              sc.ws()
              if (sc.pos >= s.length) return None
              val typ = s.charAt(sc.pos); sc.pos += 1
              if (typ != 'n' && typ != 'f') return None
              val objNum = start + k
              if (!objOff.contains(objNum))
                objOff(objNum) = if (typ == 'n') XOff(off) else XFree
            }
          }
        }
        sc.value() match {
          case Some(PDict(t)) =>
            if (trailerRoot < 0) t.get("Root") match {
              case Some(PRef(r)) => trailerRoot = r
              case _ => return None
            }
            next = t.get("Prev") match {
              case Some(PNum(p)) => p.toLong
              case _ => -1L
            }
          case _ => return None
        }
      } else {
        // ── PDF 1.5+ cross-reference STREAM: "N 0 obj << /Type /XRef … >>" ──
        sc.pos = save
        sc.number().getOrElse(return None) // object number
        sc.number().getOrElse(return None) // generation
        if (!sc.literal("obj")) return None
        val dict = sc.value() match {
          case Some(PDict(m)) if m.get("Type").contains(PName("XRef")) => m
          case _ => return None
        }
        // xref stream dict entries must be direct (§7.5.8.2) — resolve
        // nothing: offsets are not known yet at this point of the walk.
        val data = streamData(s, dict, sc.pos,
          { case n @ PNum(_) => Some(n); case _ => None }).getOrElse(return None)
        val w = dict.get("W") match {
          case Some(PArr(ws)) if ws.length == 3 =>
            ws.map { case PNum(x) if x >= 0 && x <= 7 => x.toInt; case _ => return None }
          case _ => return None
        }
        val size = dict.get("Size") match {
          case Some(PNum(n)) if n > 0 => n.toInt
          case _ => return None
        }
        val index: Vector[(Int, Int)] = dict.get("Index") match {
          case None => Vector((0, size))
          case Some(PArr(xs)) if xs.length % 2 == 0 =>
            xs.grouped(2).map {
              case Vector(PNum(a), PNum(b)) => (a.toInt, b.toInt)
              case _ => return None
            }.toVector
          case _ => return None
        }
        val rowLen = w.sum
        if (rowLen <= 0) return None
        val total = index.map(_._2.toLong).sum
        if (total * rowLen > data.length) return None
        var p = 0
        def field(width: Int): Long = {
          var v = 0L; var i = 0
          while (i < width) { v = (v << 8) | (data.charAt(p) & 0xFF); p += 1; i += 1 }
          v
        }
        for ((start, count) <- index; k <- 0 until count) {
          val typ = if (w(0) == 0) 1L else field(w(0)) // §7.5.8.3: default type 1
          val f2 = field(w(1))
          val f3 = field(w(2))
          val objNum = start + k
          if (!objOff.contains(objNum)) typ match {
            case 1L => objOff(objNum) = XOff(f2)
            case 2L => objOff(objNum) = XInStm(f2.toInt, f3.toInt)
            // type 0 (free) RECORDS so a newer deletion shadows an older
            // /Prev section's offset; unknown types read as the null
            // object (§7.5.8.3) — same refusal on use.
            case _ => objOff(objNum) = XFree
          }
        }
        if (trailerRoot < 0) dict.get("Root") match {
          case Some(PRef(r)) => trailerRoot = r
          case _ => return None
        }
        next = dict.get("Prev") match {
          case Some(PNum(pv)) => pv.toLong
          case _ => -1L
        }
      }
    }
    if (trailerRoot < 0) return None
    // 3. object resolution at recorded offsets only
    val memo = scala.collection.mutable.Map.empty[Int, (PVal, Int)]
    // decoded object streams: stm → (member (num, off) pairs, /First, data)
    val stmMemo = scala.collection.mutable.Map.empty[Int, Option[(Vector[(Int, Int)], Int, String)]]
    def parseAt(off: Long, expectNum: Int): Option[(PVal, Int)] = {
      if (off < 0 || off >= s.length) return None
      val sc = new Scanner(s); sc.pos = off.toInt
      val n = sc.number().getOrElse(return None).toInt
      if (n != expectNum) return None // xref offset must land on the object it names
      sc.number().getOrElse(return None) // generation
      if (!sc.literal("obj")) return None
      val v = sc.value().getOrElse(return None)
      Some((v, sc.pos))
    }
    // A nested def (not an inline thunk) so the `return None`s below
    // exit THIS function — the failure value then reaches the memo and a
    // malformed ObjStm is not re-parsed per member lookup.
    def computeObjStm(stm: Int): Option[(Vector[(Int, Int)], Int, String)] =
      objOff.get(stm) match {
        case Some(XOff(off)) => // an ObjStm can never itself be packed
          parseAt(off, stm).flatMap { case (v, after) =>
            v match {
              case PDict(d) if d.get("Type").contains(PName("ObjStm")) =>
                val n = d.get("N") match {
                  case Some(PNum(x)) if x >= 0 => x.toInt
                  case _ => return None
                }
                val first = d.get("First") match {
                  case Some(PNum(x)) if x >= 0 => x.toInt
                  case _ => return None
                }
                // /Length of an ObjStm: direct only (indirection could
                // recurse into this very stream)
                val data = streamData(s, d, after,
                  { case pn @ PNum(_) => Some(pn); case _ => None })
                  .getOrElse(return None)
                val hs = new Scanner(data)
                val pairs = Vector.newBuilder[(Int, Int)]
                for (_ <- 0 until n) {
                  val num = hs.number().getOrElse(return None).toInt
                  val o = hs.number().getOrElse(return None).toInt
                  pairs += ((num, o))
                }
                Some((pairs.result(), first, data))
              case _ => None
            }
          }
        case _ => None
      }
    def objStmOf(stm: Int): Option[(Vector[(Int, Int)], Int, String)] =
      stmMemo.getOrElseUpdate(stm, computeObjStm(stm))
    def parseObj(num: Int): Option[(PVal, Int)] = memo.get(num) match {
      case Some(v) => Some(v)
      case None =>
        val r: Option[(PVal, Int)] = objOff.getOrElse(num, return None) match {
          case XFree => None // freed (or unknown-type) entry: null object
          case XOff(off) => parseAt(off, num)
          case XInStm(stm, idx) =>
            val (pairs, first, data) = objStmOf(stm).getOrElse(return None)
            if (idx < 0 || idx >= pairs.length) return None
            val (onum, ooff) = pairs(idx)
            if (onum != num) return None // header pair must name this object
            val sc = new Scanner(data)
            sc.pos = first + ooff
            if (sc.pos > data.length) return None
            // -1: packed objects are never streams (§7.5.7 forbids it)
            sc.value().map(v => (v, -1))
        }
        r.foreach(memo(num) = _)
        r
    }
    def resolve(v: PVal): Option[PVal] = v match {
      case PRef(n) => parseObj(n).map(_._1)
      case other => Some(other)
    }
    def dictOf(v: PVal): Option[Map[String, PVal]] =
      resolve(v).collect { case PDict(m) => m }
    // 4. catalog -> pages -> kids
    val catalog = dictOf(PRef(trailerRoot)).getOrElse(return None)
    val pagesDict = dictOf(catalog.getOrElse("Pages", return None)).getOrElse(return None)
    val kids = resolve(pagesDict.getOrElse("Kids", return None)) match {
      case Some(PArr(k)) => k
      case _ => return None
    }
    val out = Vector.newBuilder[PdfPage]
    for ((kid, p) <- kids.zipWithIndex) {
      val page = dictOf(kid).getOrElse(return None)
      val contRef = page.getOrElse("Contents", return None) match {
        case PRef(n) => n
        case _ => return None
      }
      val (contVal, afterDict) = parseObj(contRef).getOrElse(return None)
      val contDict = contVal match {
        case PDict(m) => m
        case _ => return None
      }
      val content = streamData(s, contDict, afterDict, resolve).getOrElse(return None)
      out += extractText(p, content).getOrElse(return None)
    }
    Some(out.result())
  }

  /** Content-stream text assembly: Tj / ' / " / TJ emit; a Td/TD whose
    * ty argument is negative starts a new line, a non-negative move
    * continues the line with a space. A '<<' token is a DICTIONARY
    * operand (BDC/DP property lists, §14.6) — parsed and discarded, its
    * inner strings never emit. */
  private def extractText(pageIdx: Int, content: String): Option[PdfPage] = {
    val sc = new Scanner(content)
    val text = new StringBuilder
    var nOps = 0
    var pendingNewline = false
    var started = false
    // operand stack of the current instruction
    var operands = Vector.empty[PVal]
    def emit(str: String): Unit = {
      if (started) text.append(if (pendingNewline) "\n" else " ")
      text.append(str)
      started = true
      pendingNewline = false
      nOps += 1
    }
    while ({ sc.ws(); sc.pos < content.length }) {
      val c = content.charAt(sc.pos)
      if (c == '<' && sc.pos + 1 < content.length && content.charAt(sc.pos + 1) == '<') {
        // dict operand (property list); value() consumes the balanced <<…>>
        operands :+= sc.value().getOrElse(return None)
      } else if (c == '(' ) {
        operands :+= PStr(sc.litString().getOrElse(return None))
      } else if (c == '<') {
        operands :+= PStr(sc.hexString().getOrElse(return None))
      } else if (c == '[') {
        sc.pos += 1
        var items = Vector.empty[PVal]
        sc.ws()
        while (sc.pos < content.length && content.charAt(sc.pos) != ']') {
          val ic = content.charAt(sc.pos)
          if (ic == '(') items :+= PStr(sc.litString().getOrElse(return None))
          else if (ic == '<') items :+= PStr(sc.hexString().getOrElse(return None))
          else items :+= PNum(sc.number().getOrElse(return None))
          sc.ws()
        }
        if (sc.pos >= content.length) return None
        sc.pos += 1
        operands :+= PArr(items)
      } else if (c == '/') {
        operands :+= PName(sc.name().getOrElse(return None))
      } else if (c.isDigit || c == '+' || c == '-' || c == '.') {
        operands :+= PNum(sc.number().getOrElse(return None))
      } else {
        // operator token
        val start = sc.pos
        while (sc.pos < content.length && !content.charAt(sc.pos).isWhitespace &&
               !"()<>[]{}/%".contains(content.charAt(sc.pos))) sc.pos += 1
        if (sc.pos == start) return None
        val op = content.substring(start, sc.pos)
        op match {
          case "Tj" => operands.lastOption match {
            case Some(PStr(v)) => emit(v)
            case _ => return None
          }
          case "'" => operands.lastOption match {
            case Some(PStr(v)) => pendingNewline = true; emit(v)
            case _ => return None
          }
          // `"` = set word/char spacing AND move-to-next-line-show
          // (§9.4.3, Table 107): aw ac (string) " — the string is the
          // LAST operand, the two numbers are spacing (no text effect).
          case "\"" => operands.lastOption match {
            case Some(PStr(v)) => pendingNewline = true; emit(v)
            case _ => return None
          }
          case "TJ" => operands.lastOption match {
            case Some(PArr(items)) =>
              emit(items.collect { case PStr(v) => v }.mkString)
            case _ => return None
          }
          case "Td" | "TD" =>
            if (operands.length < 2) return None
            operands(operands.length - 1) match {
              case PNum(ty) => if (ty < 0) pendingNewline = true
              case _ => return None
            }
          case _ => () // Tf, BT, ET, BDC, EMC, cm, ... — no text effect
        }
        operands = Vector.empty
      }
    }
    Some(PdfPage(pageIdx, nOps, text.toString))
  }

  // ─────────────────────────── staged table + pass ───────────────────────────

  final case class PdfRow(doc_id: Long, source: String, pdf: Array[Byte])
  final case class PdfPageRow(doc_id: Long, source: String, page: Int,
                              n_ops: Int, n_chars: Long, text_md5: String)

  /** Staged PDF table: one document per corpus row, built in-memory per
    * pass — the oracle replays the text model, never these bytes. */
  def pdfTableStaged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, src) => PdfRow(id, src, pdfBytes(id)) })
      .toDF()
  }

  /** Extraction pass: parse-as-filter, one row per page. */
  def extractedPages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pdfTableStaged(s, dir).as[PdfRow]
      .mapPartitions(_.flatMap { r =>
        extractPdf(r.pdf).toSeq.flatten.map { pg =>
          PdfPageRow(r.doc_id, r.source, pg.page, pg.nOps, pg.text.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(pg.text.getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString)
        }
      })
      .toDF()
  }
}

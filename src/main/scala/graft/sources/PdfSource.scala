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
  * wins per object), objects §7.3 (dictionaries, arrays, literal strings
  * with balanced-paren nesting and \-escapes incl. octal, hex strings),
  * streams §7.3.8 (/Length direct or INDIRECT — real writers emit the
  * length object after the stream bytes), and text-showing operators
  * §9.4.3 (Tj, ', TJ arrays whose numbers are kerning, not text).
  *
  * The parser is the real thing, not a regex: it walks startxref → xref
  * section(s) → per-object byte offsets, parses objects at their
  * recorded offsets only (a decoy "9 0 obj" inside a string literal is
  * data, not structure), resolves indirect references with a memo, and
  * tokenizes content streams with a string scanner that honors nesting,
  * escapes and comments. Returns None on any malformation rather than
  * guessing.
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
  // Docs with id%3 == 1 write /Length as an INDIRECT reference whose
  // integer object sits AFTER the stream (the real-writer layout).
  // Docs with id%7 == 0 carry an INCREMENTAL UPDATE: a second body +
  // xref (trailer /Prev → the first) that REPLACES page 0's content so
  // L2 becomes "revised <id*7> r2" with no continuation — a parser that
  // reads the first xref, or scans for "obj" textually, extracts the
  // stale text.

  def pdfPageCount(id: Long): Int = (1 + id % 2).toInt

  def pdfRevised(id: Long): Boolean = id % 7 == 0

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
    sb.append(s"72 720 Td (Doc $id page $p) Tj\n")
    sb.append(s"0 -14 Td (the quick data point ${id * 7 + p}) Tj\n")
    sb.append("12 0 Td (cont) Tj\n") // positive move: same line
    sb.append(s"0 -14 Td [(seg) -120 (ment ${id % 9})] TJ\n")
    sb.append(s"0 -14 Td (esc \\(${id % 5}\\) \\101 (nested 9 0 obj) end) Tj\n")
    // the `"` operator does its own next-line move (aw ac string ")
    sb.append(s"""1 2 <${hexOf(s"hex${id % 3}")}> "\n""")
    sb.append("ET")
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

  /** A COMPLETE spec-conformant PDF for doc `id` (ASCII throughout).
    * Object numbering: 1 catalog, 2 pages root, 3..2+P pages,
    * 3+P..2+2P contents, 3+2P font, 4+2P..3+3P length objects (only
    * written for the indirect-length docs). */
  def pdfBytes(id: Long): Array[Byte] = {
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
      val body = contentOf(id, p)
      val lenStr = if (indirectLen) s"${4 + 2 * pages + p} 0 R" else body.length.toString
      offsets(3 + pages + p) = sb.length.toLong
      sb.append(s"${3 + pages + p} 0 obj\n<< /Length $lenStr >>\nstream\n")
      sb.append(body).append("\nendstream\nendobj\n")
      if (indirectLen) // the real-writer layout: length object AFTER the bytes
        obj(4 + 2 * pages + p)(body.length.toString)
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
      val body = revisedContentOf(id)
      val newOff = sb.length.toLong
      sb.append(s"$contObj 0 obj\n<< /Length ${body.length} >>\nstream\n")
      sb.append(body).append("\nendstream\nendobj\n")
      val xref2 = sb.length.toLong
      sb.append(s"xref\n$contObj 1\n")
      sb.append(f"$newOff%010d 00000 n \n")
      sb.append(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R /Prev $xref1 >>\n")
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

  /** One extracted page. */
  final case class PdfPage(page: Int, nOps: Int, text: String)

  /** Parse `bytes` as a PDF and extract all page texts in kid order.
    * None on any structural malformation. */
  def extractPdf(bytes: Array[Byte]): Option[Vector[PdfPage]] = {
    val s = new String(bytes, "ISO-8859-1")
    // 1. latest startxref
    val sxi = s.lastIndexOf("startxref")
    if (sxi < 0) return None
    val sc0 = new Scanner(s); sc0.pos = sxi + "startxref".length
    val xrefStart = sc0.number().getOrElse(return None).toLong
    // 2. xref chain, latest first; first-recorded offset wins per object
    val objOff = scala.collection.mutable.Map.empty[Int, Long]
    var next = xrefStart
    var guard = 0
    var trailerRoot = -1
    while (next >= 0 && guard < 16) {
      guard += 1
      if (next > s.length) return None
      val sc = new Scanner(s); sc.pos = next.toInt
      if (!sc.literal("xref")) return None
      // subsections until "trailer"
      var done = false
      while (!done) {
        val save = sc.pos
        if (sc.literal("trailer")) done = true
        else {
          sc.pos = save
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
            if (typ == 'n' && !objOff.contains(objNum)) objOff(objNum) = off
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
    }
    if (trailerRoot < 0) return None
    // 3. object resolution at recorded offsets only
    val memo = scala.collection.mutable.Map.empty[Int, (PVal, Int)]
    def parseObj(num: Int): Option[(PVal, Int)] = memo.get(num) match {
      case Some(v) => Some(v)
      case None =>
        val off = objOff.getOrElse(num, return None)
        if (off < 0 || off >= s.length) return None
        val sc = new Scanner(s); sc.pos = off.toInt
        val n = sc.number().getOrElse(return None).toInt
        if (n != num) return None // xref offset must land on the object it names
        sc.number().getOrElse(return None) // generation
        if (!sc.literal("obj")) return None
        val v = sc.value().getOrElse(return None)
        val r = (v, sc.pos)
        memo(num) = r
        Some(r)
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
      val len = resolve(contDict.getOrElse("Length", return None)) match {
        case Some(PNum(l)) if l >= 0 => l.toLong
        case _ => return None
      }
      // stream keyword follows the dict; data starts after its EOL
      val sc = new Scanner(s); sc.pos = afterDict
      if (!sc.literal("stream")) return None
      var dp = sc.pos
      if (dp < s.length && s.charAt(dp) == '\r') dp += 1
      if (dp < s.length && s.charAt(dp) == '\n') dp += 1
      if (dp.toLong + len > s.length) return None
      val content = s.substring(dp, dp + len.toInt)
      out += extractText(p, content).getOrElse(return None)
    }
    Some(out.result())
  }

  /** Content-stream text assembly: Tj / ' / TJ emit; a Td/TD whose ty
    * argument is negative starts a new line, a non-negative move
    * continues the line with a space. */
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
      if (c == '(' ) {
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
          case _ => () // Tf, BT, ET, cm, ... — no text effect
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

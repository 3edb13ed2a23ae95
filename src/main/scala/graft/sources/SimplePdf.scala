package graft.sources

import java.util.zip.Inflater
import scala.collection.mutable

/** A real (if minimal) PDF text extractor on nothing but the JDK —
  * upgrading S1/S2 from the form-feed stand-in to actual PDF parsing
  * (`extract_text_from_pdf`, `scripts/prepare_data.py:31-42` does this
  * via PyPDF2; no PDF jar ships in this build, and `java.util.zip.
  * Inflater` covers FlateDecode, the filter ~all text PDFs use).
  *
  * Supported: classic cross-reference layout (objects scanned directly,
  * so a corrupt/absent xref table is fine), uncompressed and FlateDecode
  * content streams, the page tree (/Root → /Pages → /Kids, nested), and
  * the text-showing operators Tj / ' / " / TJ (with large negative
  * kerning rendered as a space, like pdftotext) plus Td/TD/T* line
  * breaks. Literal strings handle nesting + all escapes; hex strings
  * decode as Latin-1.
  *
  * Also supported: PDF 1.5 object streams (/Type /ObjStm) — the
  * compressed container most modern writers pack page/catalog dicts
  * into. The stream inflates to `N` (objnum, offset) header pairs
  * followed by the serialized objects; each is spliced into the object
  * map (a directly-scanned `N 0 obj` wins on collision, matching the
  * spec's rule that an ObjStm entry is only live when the xref points
  * at it). Streams cannot nest inside an ObjStm, so spliced objects
  * are dict-only.
  *
  * Also supported: /ToUnicode CMaps — each page's /Resources /Font
  * objects are resolved, their ToUnicode streams parsed (bfchar,
  * bfrange with increment and array forms, 1- and 2-byte codespaces,
  * UTF-16BE destinations incl. surrogate pairs), and `Tf` switches the
  * active map so shown strings decode to real Unicode. Fonts without a
  * CMap keep the PDFDocEncoding≈Latin-1 reading (right for the ASCII
  * diary corpus), and unmapped codes fall through as raw chars.
  *
  * Out of scope (documented, falls back gracefully): non-Flate filters
  * (their streams extract empty). When no page tree resolves, every
  * stream containing a BT text block becomes a page in document order,
  * so partially-supported files degrade to "all text, approximate
  * pagination" instead of nothing.
  */
object SimplePdfExtractor extends PdfExtractor {

  private final case class Obj(num: Int, dict: String, stream: Option[Array[Byte]])

  override def extractPages(bytes: Array[Byte]): Seq[String] = try {
    if (bytes == null || bytes.isEmpty) return Nil
    val raw = new String(bytes, "ISO-8859-1")
    val objs = parseObjects(raw, bytes)
    val pages = pageDicts(objs)
    if (pages.nonEmpty)
      pages.map { pd =>
        val fonts = fontCMaps(pd, objs)
        contentRefs(pd).flatMap(objs.get).flatMap(o => decodedStream(o))
          .map(textOfContent(_, fonts)).mkString("\n")
      }
    else // no resolvable page tree: every BT-bearing stream is a "page"
      objs.values.toSeq.sortBy(_.num)
        .flatMap(o => decodedStream(o))
        .filter(_.contains("BT"))
        .map(textOfContent(_))
  } catch { case scala.util.control.NonFatal(_) =>
    // graceful-degradation contract: ONE corrupt/fuzzed crawl file must
    // degrade to no-text, never abort the ingest job (a crafted
    // "99999999999 0 obj" used to escape as NumberFormatException
    // straight out of the UDF; r11 review)
    Nil
  }

  // ── object layer ──

  private val ObjStart = """(?s)(\d{1,9})\s+\d{1,9}\s+obj\b""".r

  private def parseObjects(raw: String, bytes: Array[Byte]): Map[Int, Obj] = {
    val out = mutable.Map[Int, Obj]()
    // manual scan cursor, NOT findAllMatchIn over the whole file: the
    // cursor jumps past each stream's computed extent, so a phantom
    // "N 0 obj" byte pattern INSIDE compressed stream data can neither
    // mint a garbage object nor overwrite a real one (r11 review).
    // Later legitimate re-definitions (incremental updates) still win —
    // they sit outside any stream extent.
    val matcher = ObjStart.pattern.matcher(raw)
    var scanFrom = 0
    while (matcher.find(scanFrom)) {
      val m = matcher
      val num = m.group(1).toInt
      val end = raw.indexOf("endobj", m.end)
      val bodyEnd = if (end < 0) raw.length else end
      val body = raw.substring(m.end, bodyEnd)
      val streamAt = body.indexOf("stream")
      var consumedTo = if (end < 0) raw.length else end + "endobj".length
      if (streamAt < 0) out(num) = Obj(num, body, None)
      else {
        val dict = body.substring(0, streamAt)
        // stream data starts after "stream" + EOL (CRLF or LF)
        var s = m.end + streamAt + "stream".length
        if (s < bytes.length && bytes(s) == '\r') s += 1
        if (s < bytes.length && bytes(s) == '\n') s += 1
        // Extent comes from the dict's /Length when it checks out (ADVICE
        // r3: compressed bytes can legitimately contain the ASCII text
        // "endstream", and scanning for it truncated such streams); the
        // literal scan is only the fallback for a missing or inconsistent
        // /Length. Consistent = "endstream" follows the claimed extent
        // after at most EOL/space padding.
        val byLen = streamLength(dict, raw).map(s + _).filter { e2 =>
          e2 >= s && e2 <= bytes.length && {
            var k = e2
            while (k < raw.length &&
              (raw(k) == '\r' || raw(k) == '\n' || raw(k) == ' ')) k += 1
            raw.startsWith("endstream", k)
          }
        }
        val data = byLen match {
          case Some(e2) =>
            consumedTo = math.max(consumedTo, e2)
            java.util.Arrays.copyOfRange(bytes, s, e2)
          case None =>
            val e = raw.indexOf("endstream", s)
            if (e < 0) Array.empty[Byte]
            else {
              consumedTo = math.max(consumedTo, e)
              java.util.Arrays.copyOfRange(bytes, s, trimEol(bytes, s, e))
            }
        }
        out(num) = Obj(num, dict, Some(data))
      }
      scanFrom = math.max(consumedTo, m.end)
    }
    spliceObjectStreams(out)
    out.toMap
  }

  /** PDF 1.5 /ObjStm: inflate, read the `/N` header pairs
    * (objnum, offset-from-/First), splice each packed object into the
    * map. Direct `N 0 obj` definitions win on collision. */
  private def spliceObjectStreams(out: mutable.Map[Int, Obj]): Unit = {
    val IntPair = """(\d{1,9})\s+(\d{1,9})""".r
    for (o <- out.values.toSeq if o.dict.contains("/ObjStm") && o.stream.isDefined) {
      val content = decodedStream(o).getOrElse("")
      val nOpt = """/N\s+(\d{1,9})""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
      val firstOpt = """/First\s+(\d{1,9})""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)
      for (n <- nOpt; first <- firstOpt if first <= content.length) {
        val pairs = IntPair.findAllMatchIn(content.substring(0, first))
          .map(m => (m.group(1).toInt, m.group(2).toInt)).take(n).toVector
        for (((num, off), idx) <- pairs.zipWithIndex if !out.contains(num)) {
          val start = first + off
          val end =
            if (idx + 1 < pairs.length) math.min(first + pairs(idx + 1)._2, content.length)
            else content.length
          if (start >= 0 && start <= end)
            out(num) = Obj(num, content.substring(start, end), None)
        }
      }
    }
  }

  /** The stream dict's /Length — direct (`/Length 44`) or resolved through
    * a one-hop indirect ref (`/Length 12 0 R` → the plain-integer body of
    * object 12). None when absent or unresolvable. */
  private def streamLength(dict: String, raw: String): Option[Int] = {
    """/Length\s+(\d{1,9})(?:\s+(\d{1,9})\s+R)?""".r.findFirstMatchIn(dict).flatMap { m =>
      if (m.group(2) == null) Some(m.group(1).toInt)
      else ("""(?s)(?<!\d)""" + m.group(1) + """\s+""" + m.group(2) +
        """\s+obj\s*(\d{1,9})""").r.findFirstMatchIn(raw).map(_.group(1).toInt)
    }.filter(_ >= 0)
  }

  /** endstream is preceded by an EOL that is not stream data. */
  private def trimEol(bytes: Array[Byte], start: Int, end: Int): Int = {
    var e = end
    if (e > start && bytes(e - 1) == '\n') e -= 1
    if (e > start && bytes(e - 1) == '\r') e -= 1
    e
  }

  private def decodedStream(o: Obj): Option[String] = o.stream.map { data =>
    if (o.dict.contains("/FlateDecode")) inflate(data) else new String(data, "ISO-8859-1")
  }

  /** Decoded-stream budget: 2^26 B = 64 MB per content stream. Real page
    * streams are kilobytes; a deflate bomb expanding past this would OOM
    * the task (an Error the catch below never sees — r12 fuzz finding),
    * so inflation stops at the cap and the prefix is what gets parsed. */
  private val MaxStreamBytes = 1 << 26

  private def inflate(data: Array[Byte]): String = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(1 << 16) // grow-as-decoded
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput() && out.size < MaxStreamBytes) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return new String(out.toByteArray, "ISO-8859-1")
      }
      new String(out.toByteArray, "ISO-8859-1")
    } catch { case _: Exception => "" }
    finally inf.end()
  }

  // ── page tree ──

  private val RefPat = """(\d{1,9})\s+\d{1,9}\s+R""".r

  private def refsIn(dict: String, key: String): Seq[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) return Nil
    val after = dict.substring(at + key.length)
    // either a single "N 0 R" or an array "[N 0 R M 0 R ...]"
    val trimmed = after.dropWhile(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
    if (trimmed.startsWith("[")) {
      val close = trimmed.indexOf(']')
      RefPat.findAllMatchIn(trimmed.substring(0, math.max(close, 0))).map(_.group(1).toInt).toSeq
    } else RefPat.findFirstMatchIn(trimmed.take(32)).map(_.group(1).toInt).toSeq
  }

  private def pageDicts(objs: Map[Int, Obj]): Seq[String] = {
    def walk(num: Int, depth: Int): Seq[String] =
      if (depth > 64) Nil // cycle guard
      else objs.get(num).toSeq.flatMap { o =>
        if (o.dict.contains("/Type") && o.dict.contains("/Pages"))
          refsIn(o.dict, "/Kids").flatMap(walk(_, depth + 1))
        else if (o.dict.contains("/Page")) Seq(o.dict)
        else Nil
      }
    val fromCatalog = for {
      cat <- objs.values.find(o => o.dict.contains("/Catalog"))
      pagesRef <- refsIn(cat.dict, "/Pages").headOption
    } yield walk(pagesRef, 0)
    fromCatalog.getOrElse(Nil) match {
      case Nil => // no catalog (or unresolvable): appearance order of /Type /Page
        objs.values.toSeq.sortBy(_.num).map(_.dict)
          .filter(d => d.contains("/Page") && !d.contains("/Pages"))
      case found => found
    }
  }

  private def contentRefs(pageDict: String): Seq[Int] = refsIn(pageDict, "/Contents")

  // ── /ToUnicode CMaps ──

  /** A font's code→text map: `codeBytes` (1 or 2) comes from the
    * codespacerange / source-code width, `map` from bfchar + bfrange. */
  private[sources] final case class CMap(codeBytes: Int, map: Map[Int, String])

  private val HexTok = """<([0-9A-Fa-f]+)>""".r

  /** bfchar pairs, bfrange increments and arrays, codespacerange width.
    * Destination hex is UTF-16BE code units (2-hex single-byte forms some
    * writers emit are accepted too). */
  private[sources] def parseCMap(text: String): CMap = {
    val map = mutable.Map[Int, String]()
    var codeBytes = 1
    def dstString(hex: String): String =
      if (hex.length % 4 == 0)
        hex.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString
      else if (hex.length <= 4) Integer.parseInt(hex, 16).toChar.toString
      else "" // over-wide odd-length dst: drop rather than overflow parseInt
    def hexCode(hex: String): Option[Int] = // src codes are <= 2 bytes
      if (hex.nonEmpty && hex.length <= 8) Some(Integer.parseInt(hex.takeRight(4), 16))
      else None
    for (m <- """(?s)begincodespacerange(.*?)endcodespacerange""".r.findAllMatchIn(text);
         h <- HexTok.findFirstMatchIn(m.group(1)))
      codeBytes = math.max(codeBytes, h.group(1).length / 2)
    for (m <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text))
      HexTok.findAllMatchIn(m.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) =>
          codeBytes = math.max(codeBytes, src.length / 2)
          hexCode(src).foreach(c => map(c) = dstString(dst))
        case _ => ()
      }
    val RangeEntry =
      """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)""".r
    for (m <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text);
         e <- RangeEntry.findAllMatchIn(m.group(1))) {
      val lo = hexCode(e.group(1)).getOrElse(0)
      val hi = hexCode(e.group(2)).getOrElse(-1) // invalid range: empty loop
      codeBytes = math.max(codeBytes, e.group(1).length / 2)
      if (e.group(3).startsWith("[")) // explicit per-code destinations
        HexTok.findAllMatchIn(e.group(3)).map(_.group(1)).zipWithIndex.foreach {
          case (d, i) => if (lo + i <= hi) map(lo + i) = dstString(d)
        }
      else { // incrementing range: the destination's last code unit steps
        val units = dstString(e.group(3).drop(1).dropRight(1)).toCharArray
        for (c <- lo to math.min(hi, lo + 0xFFFF)) {
          val u = units.clone()
          if (u.nonEmpty) u(u.length - 1) = (u(u.length - 1) + (c - lo)).toChar
          map(c) = new String(u)
        }
      }
    }
    CMap(math.min(codeBytes, 2), map.toMap)
  }

  /** Per-page font name → ToUnicode CMap: /Resources (inline or ref) →
    * /Font (inline or ref) → each font object's /ToUnicode stream.
    * Fonts without one simply don't appear (bytes then read as Latin-1,
    * the pre-CMap behavior). */
  private def fontCMaps(pageDict: String, objs: Map[Int, Obj]): Map[String, CMap] = {
    def sub(dict: String, key: String): String = {
      val at = dict.indexOf(key)
      if (at < 0) return ""
      val after = dict.substring(at + key.length)
      val trimmed = after.dropWhile(_.isWhitespace)
      // an INLINE dict must be recognized before the ref fallback: refsIn
      // would otherwise match the first "N 0 R" nested inside it (e.g.
      // /Resources << /Font << /F1 5 0 R >> >> "resolving" to the font)
      if (trimmed.startsWith("<<")) trimmed
      else refsIn(dict, key).headOption.flatMap(objs.get).map(_.dict).getOrElse("")
    }
    val fontDict = sub(sub(pageDict, "/Resources"), "/Font")
    """/(\w+)\s+(\d{1,9})\s+\d{1,9}\s+R""".r.findAllMatchIn(fontDict).flatMap { fm =>
      for {
        fobj <- objs.get(fm.group(2).toInt)
        if fobj.dict.contains("/Font") || fobj.dict.contains("/Type0") ||
          fobj.dict.contains("/ToUnicode")
        tuRef <- refsIn(fobj.dict, "/ToUnicode").headOption
        tuObj <- objs.get(tuRef)
        text <- decodedStream(tuObj)
      } yield fm.group(1) -> parseCMap(text)
    }.toMap
  }

  /** Map a raw (Latin-1-decoded) string's bytes through the current
    * font's CMap; unmapped codes fall through as their raw chars
    * (graceful-degradation contract). */
  private def applyCMap(raw: String, cm: CMap): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      if (cm.codeBytes == 2 && i + 1 < raw.length) {
        val code = ((raw(i) & 0xFF) << 8) | (raw(i + 1) & 0xFF)
        cm.map.get(code) match {
          case Some(s) => sb ++= s
          case None => sb += raw(i) += raw(i + 1)
        }
        i += 2
      } else {
        sb ++= cm.map.getOrElse(raw(i) & 0xFF, raw(i).toString)
        i += 1
      }
    }
    sb.toString
  }

  // ── content-stream text operators ──

  /** Text shown by Tj / ' / " / TJ, with Td, TD, T-star and ET as line
    * breaks and TJ kerning ≤ -180 (thousandths of an em) rendered as a
    * space. `fonts` carries the page's ToUnicode CMaps; `Tf` switches the
    * active one and strings map through it (absent a CMap, bytes read as
    * Latin-1 — the ASCII-diary-correct default).
    */
  private[sources] def textOfContent(content: String,
                                     fonts: Map[String, CMap] = Map.empty): String = {
    val out = new StringBuilder
    val pending = new StringBuilder // strings since the last operator
    var i = 0
    val n = content.length
    var lastName = "" // most recent /Name token (the Tf operand)
    var curFont: Option[CMap] = None
    def mapped(s: String): String = curFont match {
      case Some(cm) => applyCMap(s, cm)
      case None => s
    }
    def flushLine(): Unit =
      if (out.nonEmpty && !out.endsWith("\n")) out += '\n'
    while (i < n) {
      content(i) match {
        case '(' =>
          val (s, next) = literalString(content, i)
          pending ++= mapped(s); i = next
        case '<' if i + 1 < n && content(i + 1) == '<' =>
          i += 2 // inline dictionary open (<< /MCID 0 >> etc.) — not a string
        case '<' =>
          val close = content.indexOf('>', i)
          if (close < 0) i = n
          else {
            // keep only hex digits: corrupt bytes degrade to partial text
            // instead of throwing out of the extractor (graceful-degradation
            // contract)
            val hex = content.substring(i + 1, close)
              .filter(c => Character.digit(c, 16) >= 0)
            val even = if (hex.length % 2 == 0) hex else hex + "0"
            pending ++= mapped(even.grouped(2)
              .map(h => Integer.parseInt(h, 16).toChar).mkString)
            i = close + 1
          }
        case '>' => i += 1 // dictionary close (>>) — consumed char by char
        case '[' | ']' => i += 1 // TJ array brackets: strings+numbers flow through
        case c if c.isWhitespace => i += 1
        case '%' => i = { val e = content.indexOf('\n', i); if (e < 0) n else e + 1 }
        case _ =>
          val start = i
          while (i < n && !content(i).isWhitespace &&
            content(i) != '(' && content(i) != '[' && content(i) != ']' &&
            content(i) != '<' && content(i) != '%') i += 1
          if (i == start) i += 1 // never stall: unknown stop char advances
          content.substring(start, i) match {
            case "Tj" | "TJ" => out ++= pending; pending.clear()
            case "'" => flushLine(); out ++= pending; pending.clear()
            case "\"" => flushLine(); out ++= pending; pending.clear()
            case "Td" | "TD" | "T*" | "ET" => flushLine(); pending.clear()
            case "Tf" => curFont = fonts.get(lastName)
            case t if t.startsWith("/") => lastName = t.substring(1)
            case t =>
              // inside a TJ array, kerning ≤ -180/1000 em reads as a space
              if (pending.nonEmpty &&
                t.matches("-?\\d+(\\.\\d+)?") && t.toDouble <= -180.0)
                pending += ' '
          }
      }
    }
    out ++= pending
    out.toString.trim
  }

  /** PDF literal string: balanced parens, backslash escapes, octal. */
  private def literalString(s: String, open: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'n' => out += '\n'; i += 2
            case 'r' => out += '\r'; i += 2
            case 't' => out += '\t'; i += 2
            case 'b' => out += '\b'; i += 2
            case 'f' => out += '\f'; i += 2
            case '(' => out += '('; i += 2
            case ')' => out += ')'; i += 2
            case '\\' => out += '\\'; i += 2
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < s.length && j < i + 4 && s(j) >= '0' && s(j) <= '7') {
                v = v * 8 + (s(j) - '0'); j += 1
              }
              out += v.toChar; i = j
            case other => out += other; i += 2
          }
        case '(' => depth += 1; out += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out += ')'
          i += 1
        case c => out += c; i += 1
      }
    }
    (out.toString, i)
  }
}

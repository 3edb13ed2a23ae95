package graft.sources

import graft.SparkSpec
import java.util.zip.Deflater

/** Exercises SimplePdfExtractor against a REAL PDF built byte-by-byte in
  * the test (catalog → page tree → FlateDecode + plain content streams),
  * so the parser is verified on the actual format, not a fixture of
  * itself.
  */
class SimplePdfSpec extends SparkSpec {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](8192)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOfRange(buf, 0, n)
  }

  /** Two-page PDF: page 1 Flate-compressed (Tj + escapes + TJ kerning),
    * page 2 uncompressed (hex string + ' line op). */
  private def samplePdf: Array[Byte] = {
    val c1 = deflate(
      "BT /F1 12 Tf (Dr. Voss diary \\(day one\\)) Tj T* " +
        "[(Second) -250 (line) 5 (s)] TJ ET")
    val c2 = "BT (Back) Tj T* <42617365> Tj (continued) ' ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
    out.write(c1); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${c2.length} >> stream\n")
    out.write(c2); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("extracts both pages in page-tree order with escapes, kerning, hex strings") {
    val pages = SimplePdfExtractor.extractPages(samplePdf)
    assert(pages.length === 2)
    // \( \) unescaped; T* breaks the line; -250 kerning → space, 5 → none
    assert(pages(0) === "Dr. Voss diary (day one)\nSecond lines")
    // hex <42617365> = "Base"; ' shows text on a new line
    assert(pages(1) === "Back\nBase\ncontinued")
  }

  test("/Length governs stream extent: literal 'endstream' inside data does not truncate") {
    // the content stream's BYTES contain the ASCII text "endstream" — the
    // old literal scan cut the stream there and lost the tail
    val c = "BT (before endstream after) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c.length} >> stream\n")
    out.write(c); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    assert(SimplePdfExtractor.extractPages(out.toByteArray)
      === Seq("before endstream after"))
  }

  test("/Length as a one-hop indirect ref resolves; a lying /Length falls back to the scan") {
    val c = "BT (indirect length) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w("4 0 obj << /Length 7 0 R >> stream\n")
    out.write(c); w("\nendstream endobj\n")
    w(s"7 0 obj ${c.length} endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    assert(SimplePdfExtractor.extractPages(out.toByteArray) === Seq("indirect length"))

    // /Length pointing past the real endstream is inconsistent → the scan
    // fallback still extracts the page
    val bad = new String(out.toByteArray, "ISO-8859-1")
      .replace("7 0 obj " + c.length, "7 0 obj 9999")
    assert(SimplePdfExtractor.extractPages(bad.getBytes("ISO-8859-1"))
      === Seq("indirect length"))
  }

  test("degrades to BT-stream fallback when the page tree is absent") {
    val body = "1 0 obj << /Length 20 >> stream\nBT (orphan text) Tj ET\nendstream endobj\n"
    val pages = SimplePdfExtractor.extractPages(("%PDF-1.4\n" + body).getBytes("ISO-8859-1"))
    assert(pages === Seq("orphan text"))
  }

  test("marked-content dictionaries and corrupt hex degrade, never hang or throw") {
    // Word/Chrome-style tagged PDFs put << /MCID 0 >> BDC sequences inside
    // content streams — must be skipped, not spin the tokenizer forever
    val tagged = "1 0 obj << /Length 60 >> stream\n" +
      "/P <</MCID 0>> BDC BT (tagged text) Tj ET EMC\nendstream endobj\n"
    assert(SimplePdfExtractor.extractPages(("%PDF-1.7\n" + tagged).getBytes("ISO-8859-1"))
      === Seq("tagged text"))
    // non-hex bytes inside a hex string are dropped, not thrown on
    val badHex = "1 0 obj << /Length 30 >> stream\nBT <4G2617ZZ3.65> Tj ET\nendstream endobj\n"
    assert(SimplePdfExtractor.extractPages(("%PDF-1.7\n" + badHex).getBytes("ISO-8859-1"))
      === Seq("Base")) // G/Z/. dropped -> hex pairs 42 61 73 65
  }

  test("null/empty/garbage input extracts nothing, never throws") {
    assert(SimplePdfExtractor.extractPages(null) === Nil)
    assert(SimplePdfExtractor.extractPages(Array.emptyByteArray) === Nil)
    assert(SimplePdfExtractor.extractPages("not a pdf at all".getBytes) === Nil)
  }

  test("fuzzed/corrupt PDFs degrade to Nil, never throw out of the extractor (r11)") {
    // oversized object numbers used to escape as NumberFormatException
    val overflowObj = ("%PDF-1.4\n99999999999 0 obj\n<< /Length 99999999999 >>\n" +
      "stream\nxx\nendstream\nendobj").getBytes("ISO-8859-1")
    assert(SimplePdfExtractor.extractPages(overflowObj) === Nil ||
      SimplePdfExtractor.extractPages(overflowObj) != null) // must not throw
    // arbitrary binary after the magic must never throw either
    val rnd = new scala.util.Random(20260814)
    (1 to 20).foreach { _ =>
      val junk = "%PDF-".getBytes ++ Array.fill(512)(rnd.nextInt(256).toByte)
      SimplePdfExtractor.extractPages(junk) // any result, no exception
    }
  }

  test("a phantom 'N 0 obj' byte pattern inside stream data cannot overwrite a real object (r11)") {
    // object 1 is a REAL text-bearing content stream; object 2's stream
    // DATA contains the ASCII bytes "1 0 obj ... endobj" (possible in any
    // compressed payload at crawl scale). The scanner must skip object
    // 2's /Length-delimited extent — before the fix the phantom minted a
    // garbage object 1 over the real one and its text vanished.
    val content = "BT (RealText) Tj ET"
    val phantom = "1 0 obj << /NoStreamHere true >> endobj"
    val pdf = ("%PDF-1.4\n" +
      s"1 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      s"2 0 obj\n<< /Length ${phantom.length} >>\nstream\n$phantom\nendstream\nendobj\n")
      .getBytes("ISO-8859-1")
    val pages = SimplePdfExtractor.extractPages(pdf)
    assert(pages.exists(_.contains("RealText")),
      s"object 1's real content must survive the phantom header: $pages")
  }

  test("AutoExtractor routes by magic: real PDFs parse, plain text splits on form-feed") {
    assert(AutoExtractor.extractPages(samplePdf).head.startsWith("Dr. Voss diary"))
    assert(AutoExtractor.extractPages("page one\fpage two".getBytes("UTF-8")) ===
      Seq("page one", "page two"))
    assert(AutoExtractor.extractPages(null) === Nil)
  }

  test("a mixed directory extracts PDF and text files correctly side by side") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pdfmixed")
    java.nio.file.Files.write(dir.resolve("a.pdf"), samplePdf)
    java.nio.file.Files.write(dir.resolve("b.txt"), "plain one\fplain two".getBytes("UTF-8"))
    val got = PdfSource.pages(spark, dir.toString)
      .select(col("doc_id"), col("page"), col("page_text")).collect()
      .map(r => (r.getString(0).split('/').last, r.getInt(1), r.getString(2))).toSet
    assert(got.exists { case (f, p, t) => f == "a.pdf" && p == 0 && t.startsWith("Dr. Voss") })
    assert(got.contains(("b.txt", 0, "plain one")))
    assert(got.contains(("b.txt", 1, "plain two")))
  }

  test("ObjStm-packed page tree resolves: modern-writer layout extracts in tree order") {
    // catalog + pages node + both page dicts live inside one FlateDecode
    // /Type /ObjStm (the PDF 1.5 layout every modern writer emits);
    // only the content streams are regular top-level objects
    val packed = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      5 -> "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>")
    val offsets = packed.map(_._2.length + 1).scanLeft(0)(_ + _)
    val header = packed.zip(offsets).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + " "
    val body = packed.map(_._2).mkString("\n") + "\n"
    val objStm = deflate(header + body)
    val c1 = "BT (packed page one) Tj ET".getBytes("ISO-8859-1")
    val c2 = "BT (packed page two) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"7 0 obj << /Type /ObjStm /N ${packed.length} /First ${header.length} " +
      s"/Length ${objStm.length} /Filter /FlateDecode >> stream\n")
    out.write(objStm); w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n")
    out.write(c1); w("\nendstream endobj\n")
    w(s"6 0 obj << /Length ${c2.length} >> stream\n")
    out.write(c2); w("\nendstream endobj\n")
    w("%%EOF\n")
    assert(SimplePdfExtractor.extractPages(out.toByteArray)
      === Seq("packed page one", "packed page two"))
  }

  test("a direct object definition wins over an ObjStm entry with the same number") {
    // same layout, but object 3 ALSO exists top-level pointing at different
    // content — the direct definition must shadow the packed one
    val packed = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>")
    val offsets = packed.map(_._2.length + 1).scanLeft(0)(_ + _)
    val header = packed.zip(offsets).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + " "
    val objStm = deflate(header + packed.map(_._2).mkString("\n") + "\n")
    val c = "BT (direct wins) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"7 0 obj << /Type /ObjStm /N ${packed.length} /First ${header.length} " +
      s"/Length ${objStm.length} /Filter /FlateDecode >> stream\n")
    out.write(objStm); w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${c.length} >> stream\n")
    out.write(c); w("\nendstream endobj\n")
    w("%%EOF\n")
    assert(SimplePdfExtractor.extractPages(out.toByteArray) === Seq("direct wins"))
  }

  test("/ToUnicode CMap decodes a 2-byte Type0 font to real Unicode; fonts without one stay Latin-1") {
    // page 1 shows CID codes through a Type0 font whose ToUnicode CMap
    // carries bfchar (incl. a surrogate-pair destination), an
    // incrementing bfrange, and a 2-byte codespace; page 2 has no CMap
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0041> <0416>
        |<0042> <D83DDE00>
        |endbfchar
        |1 beginbfrange
        |<0050> <0052> <0414>
        |endbfrange
        |endcmap
        |end""".stripMargin
    // codes: 0041(Ж via bfchar) 0050 0051 0052 (ДЕЖ via bfrange) 0042 (emoji)
    val c1 = "BT /F1 12 Tf <00410050005100520042> Tj ET".getBytes("ISO-8859-1")
    val c2 = "BT (plain latin) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 8 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} >> stream\n")
    out.write(c1); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H " +
      "/ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${cmap.length} >> stream\n")
    w(cmap); w("\nendstream endobj\n")
    w("8 0 obj << /Type /Page /Parent 2 0 R /Contents 9 0 R >> endobj\n")
    w(s"9 0 obj << /Length ${c2.length} >> stream\n")
    out.write(c2); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    val pages = SimplePdfExtractor.extractPages(out.toByteArray)
    assert(pages.length === 2)
    assert(pages(0) === "ЖДЕЖ😀") // ЖДЕЖ😀
    assert(pages(1) === "plain latin") // no CMap → Latin-1 reading intact
  }

  test("parseCMap: 1-byte codespace, bfrange array destinations, unmapped fallthrough") {
    val cm = SimplePdfExtractor.parseCMap(
      """begincodespacerange <00> <FF> endcodespacerange
        |2 beginbfchar <41> <00C4> <42> <00D6> endbfchar
        |1 beginbfrange <50> <51> [<0391> <0392>] endbfrange""".stripMargin)
    assert(cm.codeBytes === 1)
    assert(cm.map(0x41) === "Ä" && cm.map(0x42) === "Ö")
    assert(cm.map(0x50) === "Α" && cm.map(0x51) === "Β")
    // unmapped code falls through as its raw char in textOfContent
    val shown = SimplePdfExtractor.textOfContent(
      "BT /F1 9 Tf (AZB) Tj ET", Map("F1" -> cm))
    assert(shown === "ÄZÖ")
  }

  test("PdfSource.pages drives the real extractor through the binaryFile scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pdfsrc")
    java.nio.file.Files.write(dir.resolve("diary.pdf"), samplePdf)
    val got = PdfSource.pages(spark, dir.toString, SimplePdfExtractor)
      .orderBy(col("page"))
      .select(col("page"), col("page_text"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got.map(_._1) === Seq(0, 1))
    assert(got(0)._2.startsWith("Dr. Voss diary"))
    // S1 whole-document shape: pages joined with \n (prepare_data.py:37-40)
    val text = PdfSource.text(spark, dir.toString, SimplePdfExtractor)
      .select("text").head().getString(0)
    assert(text === "Dr. Voss diary (day one)\nSecond lines\nBack\nBase\ncontinued")
  }
}

package graft.operators

import graft.sources.SimplePdfExtractor
import org.scalatest.funsuite.AnyFunSuite

/** Seeded structure-aware fuzz over every binary parser in the engine
  * (PNG, JPEG, GIF, WAV, MP4, WebM, PDF). The contract under test is the
  * hostile-input boundary the decode UDFs rely on at corpus scale: a
  * malformed payload must come back as None/empty — never a thrown
  * Throwable (an escaping OutOfMemoryError or StackOverflowError kills
  * the EXECUTOR, not the row), and never a hang. Four mutation families:
  *
  *   1. truncation — every parser sees a sweep of prefixes of a valid
  *      fixture (the commonest real corruption: cut-off downloads);
  *   2. bit flips — random single-bit damage to a valid fixture;
  *   3. header byte substitution — each of the first 64 structural bytes
  *      forced to 0x00/0x7F/0x80/0xFF (length fields, tags, markers);
  *   4. random garbage — arbitrary bytes with and without a valid magic.
  *
  * Plus the allocation-bomb pins for the r12 findings: tiny files whose
  * headers CLAIM multi-GB dimensions must refuse before allocating
  * (SimplePng.MaxRawBytes / SimpleJpeg.MaxPixels / SimpleGif.MaxPixels),
  * and a deflate bomb behind small claimed PNG dims must stop inflating
  * at the dimensioned size instead of materializing the bomb.
  *
  * Every failure message carries (format, family, seed, index) so a hit
  * replays deterministically.
  */
class ParserFuzzSpec extends AnyFunSuite {

  // ── valid fixtures, one per format ──

  private def pngFix: Array[Byte] = {
    val px = Array.tabulate(5 * 6 * 3)(i => ((i * 37 + 11) % 256).toByte)
    SimplePng.encode(SimplePng.Image(5, 6, 3, px))
  }

  private def jpegFix: Array[Byte] = {
    val px = Array.tabulate(16 * 16 * 3)(i => ((i * 29 + 5) % 256).toByte)
    SimpleJpeg.encode(SimpleJpeg.Image(16, 16, 3, px))
  }

  private def gifFix: Array[Byte] = {
    val pal = Array(0x000000, 0x7F7F7F, 0xFFFFFF, 0xFF0000)
    val f = Array.tabulate[Byte](8 * 8)(i => (i % 4).toByte)
    SimpleGif.encode(8, 8, pal, Seq(f, f.reverse))
  }

  private def wavFix: Array[Byte] = {
    val samples = Array.tabulate(64)(i => (i * 131) % 32768 - 16384)
    SimpleWav.encode(SimpleWav.Audio(8000, 2, 16, samples))
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def mbox(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
  private def vf0: Array[Byte] = Array[Byte](0, 0, 0, 0)

  private def mp4Fix: Array[Byte] = {
    val ftyp = mbox("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    val mvhd = mbox("mvhd", vf0 ++ be32(0) ++ be32(0) ++ be32(600) ++
      be32(1200) ++ new Array[Byte](80))
    val tkhd = mbox("tkhd", vf0 ++ new Array[Byte](72) ++
      be32(320L << 16) ++ be32(240L << 16))
    val mdhd = mbox("mdhd", vf0 ++ new Array[Byte](20))
    val hdlr = mbox("hdlr", vf0 ++ be32(0) ++ "vide".getBytes ++ new Array[Byte](13))
    val stsd = mbox("stsd", vf0 ++ be32(1) ++
      (be32(16) ++ "avc1".getBytes ++ new Array[Byte](8)))
    val stsz = mbox("stsz", vf0 ++ be32(0) ++ be32(48))
    val stbl = mbox("stbl", stsd ++ stsz)
    val trak = mbox("trak", tkhd ++ mbox("mdia", mdhd ++ hdlr ++ mbox("minf", stbl)))
    ftyp ++ mbox("moov", mvhd ++ trak) ++ mbox("mdat", Array.tabulate[Byte](64)(_.toByte))
  }

  private def ebml(id: Long, payload: Array[Byte]): Array[Byte] = {
    val n = if (id <= 0xFF) 1 else if (id <= 0xFFFF) 2 else if (id <= 0xFFFFFF) 3 else 4
    val idBytes = (0 until n).reverse.map(i => ((id >> (8 * i)) & 0xFF).toByte).toArray
    val size = Array(0x01.toByte) ++
      (0 until 7).reverse.map(i => ((payload.length.toLong >> (8 * i)) & 0xFF).toByte)
    idBytes ++ size ++ payload
  }
  private def eUint(id: Long, v: Long, width: Int): Array[Byte] =
    ebml(id, (0 until width).reverse.map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray)

  private def webmFix: Array[Byte] = {
    val header = ebml(0x1A45DFA3L, ebml(0x4282L, "webm".getBytes))
    val info = ebml(0x1549A966L, eUint(0x2AD7B1L, 1000000L, 4) ++
      ebml(0x4489L, {
        val bits = java.lang.Double.doubleToLongBits(1500.0)
        (0 until 8).reverse.map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray
      }))
    val video = ebml(0xE0L, eUint(0xB0L, 640, 2) ++ eUint(0xBAL, 480, 2))
    val tracks = ebml(0x1654AE6BL, ebml(0xAEL,
      eUint(0x83L, 1L, 1) ++ ebml(0x86L, "V_VP9".getBytes) ++ video))
    val cluster = ebml(0x1F43B675L,
      (1 to 3).map(_ => ebml(0xA3L, Array[Byte](0x81.toByte, 0, 0, 0))).reduce(_ ++ _))
    header ++ ebml(0x18538067L, info ++ tracks ++ cluster)
  }

  private def deflate(s: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def pdfFix: Array[Byte] = {
    val c1 = deflate("BT (Dr. Voss diary) Tj T* (second line) Tj ET".getBytes("ISO-8859-1"))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
    out.write(c1); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  /** (name, fixture, total decode function). Each parser must TERMINATE
    * and not throw; the return value is free to be None/empty. */
  private lazy val parsers: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
    ("png", pngFix, b => SimplePng.decode(b)),
    ("jpeg", jpegFix, b => SimpleJpeg.decode(b)),
    ("gif", gifFix, b => SimpleGif.decode(b)),
    ("wav", wavFix, b => SimpleWav.decode(b)),
    ("mp4", mp4Fix, b => SimpleMp4.parse(b)),
    ("mjpeg-mp4", SimpleMp4.muxMjpeg(16, 8, Seq.tabulate(3) { f =>
      SimpleJpeg.encode(SimpleJpeg.Image(16, 8, 1,
        Array.tabulate(128)(i => ((29 + f * 11 + ((i / 16 / 8) * 2 + (i % 16 / 8)) * 17) % 256).toByte)))
    }), b => SimpleMp4.mjpegFrames(b)),
    // the multi-chunk layout walks DIFFERENT decode paths (stsc
    // run-advance, per-chunk stco/co64 offsets, inter-chunk gaps) — fuzz
    // it as its own target (r15 verdict #2)
    ("mjpeg-mp4-multichunk", SimpleMp4.muxMjpeg(16, 8, Seq.tabulate(5) { f =>
      SimpleJpeg.encode(SimpleJpeg.Image(16, 8, 1,
        Array.tabulate(128)(i => ((29 + f * 11 + ((i / 16 / 8) * 2 + (i % 16 / 8)) * 17) % 256).toByte)))
    }, chunkSizes = Seq(1, 2, 2), co64 = true, chunkGap = 7),
      b => SimpleMp4.mjpegFrames(b)),
    ("webm", webmFix, b => SimpleWebm.parse(b)),
    ("pdf", pdfFix, b => SimplePdfExtractor.extractPages(b))
  )

  private def mustNotThrow(name: String, family: String, idx: Int)(b: => Any): Unit =
    try { b; () } catch {
      case t: Throwable =>
        fail(s"$name/$family #$idx: parser threw ${t.getClass.getName}: ${t.getMessage}")
    }

  test("truncation sweep: every prefix of a valid fixture parses without throwing") {
    for ((name, fix, dec) <- parsers) {
      // every length 0..64, then a stride through the body, then the tail
      val lens = (0 to math.min(64, fix.length)) ++
        (65 until fix.length by math.max(1, fix.length / 97)) ++
        (math.max(0, fix.length - 8) until fix.length)
      for (k <- lens.distinct)
        mustNotThrow(name, "truncate", k)(dec(java.util.Arrays.copyOf(fix, k)))
    }
  }

  test("bit flips: 400 seeded single/double-bit mutations per format never throw") {
    val seed = 0xC0FFEE
    for ((name, fix, dec) <- parsers) {
      val rnd = new scala.util.Random(seed ^ name.hashCode)
      for (i <- 0 until 400) {
        val m = fix.clone()
        val flips = 1 + rnd.nextInt(2)
        for (_ <- 0 until flips) {
          val p = rnd.nextInt(m.length)
          m(p) = (m(p) ^ (1 << rnd.nextInt(8))).toByte
        }
        mustNotThrow(name, s"bitflip(seed=$seed)", i)(dec(m))
      }
    }
  }

  test("header substitution: structural bytes forced to boundary values never throw") {
    for ((name, fix, dec) <- parsers;
         p <- 0 until math.min(64, fix.length);
         v <- Seq(0x00, 0x7F, 0x80, 0xFF)) {
      val m = fix.clone(); m(p) = v.toByte
      mustNotThrow(name, s"hdrsub(v=$v)", p)(dec(m))
    }
  }

  test("random garbage, with and without a valid magic, never throws") {
    val rnd = new scala.util.Random(0xBADF00D)
    for ((name, fix, dec) <- parsers; i <- 0 until 150) {
      val len = rnd.nextInt(512)
      val g = new Array[Byte](len); rnd.nextBytes(g)
      mustNotThrow(name, "garbage", i)(dec(g))
      // same garbage behind the format's real magic prefix, so the parser
      // commits past its signature check before hitting the noise
      val magicLen = math.min(12, fix.length)
      val withMagic = java.util.Arrays.copyOf(fix, magicLen + len)
      System.arraycopy(g, 0, withMagic, magicLen, len)
      mustNotThrow(name, "magic+garbage", i)(dec(withMagic))
    }
  }

  // ── allocation-bomb pins for the r12 findings ──

  private def crc32(b: Array[Byte]): Array[Byte] = {
    val c = new java.util.zip.CRC32(); c.update(b); be32(c.getValue)
  }
  private def pngChunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val body = typ.getBytes("US-ASCII") ++ payload
    be32(payload.length.toLong) ++ body ++ crc32(body)
  }
  private def pngClaiming(w: Int, h: Int, ctype: Int, idat: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, ctype.toByte, 0, 0, 0)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", idat) ++
      pngChunk("IEND", Array.empty)
  }

  test("PNG claiming 46000x46000 from a 100-byte file refuses fast, no allocation") {
    val bomb = pngClaiming(46000, 46000, 0, deflate(new Array[Byte](64)))
    val t0 = System.nanoTime()
    assert(SimplePng.decode(bomb).isEmpty)
    assert((System.nanoTime() - t0) < 2e9, "refusal must not scan/allocate the claim")
  }

  test("PNG deflate bomb behind small claimed dims stops inflating at the dimensioned size") {
    // 32 MB of zeros deflates to ~32 KB; the claimed 4x4 gray image needs
    // only 20 raw bytes — decode must stop there, not materialize 32 MB
    val bombIdat = deflate(new Array[Byte](32 * 1024 * 1024))
    assert(bombIdat.length < 64 * 1024)
    val t0 = System.nanoTime()
    SimplePng.decode(pngClaiming(4, 4, 0, bombIdat)) // value free; must terminate fast
    assert((System.nanoTime() - t0) < 2e9, "inflate must be capped at the claimed size")
  }

  test("JPEG claiming 65535x65535 refuses before allocating coefficient planes") {
    // minimal marker chain: SOI, DQT(id 0), SOF0 claiming huge dims, DHT, SOS
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xFF); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xFF)
      out.write(payload)
    }
    out.write(0xFF); out.write(0xD8)
    m(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(1))
    m(0xC0, Array[Byte](8) ++
      Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++ // h=65535 w=65535
      Array[Byte](1, 1, 0x11, 0))
    val bits = new Array[Byte](16); bits(0) = 1
    m(0xC4, Array[Byte](0) ++ bits ++ Array[Byte](0))
    m(0xC4, Array[Byte](0x10) ++ bits ++ Array[Byte](0))
    m(0xDA, Array[Byte](1, 1, 0, 0, 63, 0))
    assert(SimpleJpeg.decode(out.toByteArray).isEmpty)
  }

  test("PDF deflate bomb in a content stream stops at the decoded-stream budget") {
    // 96 MB of zeros deflates to ~100 KB; extraction must stop at the
    // 64 MB stream cap instead of materializing the bomb (or OOMing)
    val bomb = deflate(new Array[Byte](96 * 1024 * 1024))
    assert(bomb.length < 1024 * 1024)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${bomb.length} /Filter /FlateDecode >> stream\n")
    out.write(bomb); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    val t0 = System.nanoTime()
    SimplePdfExtractor.extractPages(out.toByteArray) // value free; must terminate
    assert((System.nanoTime() - t0) < 30e9, "stream inflation must be capped")
  }

  test("GIF claiming a 65535x32767 frame refuses before the 2.1 GB LZW allocation") {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](8, 0, 8, 0)) // screen 8x8
    out.write(0x80); out.write(0); out.write(0) // global palette, 2 entries
    out.write(Array[Byte](1, 2, 3, 4, 5, 6)) // the palette
    out.write(0x2C) // image descriptor
    out.write(Array[Byte](0, 0, 0, 0)) // left, top
    out.write(Array[Byte](0xFF.toByte, 0xFF.toByte)) // w = 65535
    out.write(Array[Byte](0xFF.toByte, 0x7F.toByte)) // h = 32767
    out.write(0) // no local palette
    out.write(2) // LZW min code
    out.write(1); out.write(0x44); out.write(0) // one tiny sub-block, terminator
    out.write(0x3B)
    assert(SimpleGif.decode(out.toByteArray).isEmpty)
  }

  // ── r12-advice: the per-frame cap alone is not enough — LZW expands up
  // to ~2700x, so a small blob can carry MANY frames each under the
  // per-frame cap and accumulate GBs in the frames Vector. Build a real
  // LZW bomb (KwKwK dictionary growth, then the longest code repeated):
  // each 4096x4096 frame decodes from ~9 KB of data. ──

  /** LZW data decoding to >= nPixels, mirroring SimpleGif.lzwDecode's
    * dictionary-growth and code-width timing exactly. */
  private def lzwBombFrame(minCode: Int, nPixels: Long): Array[Byte] = {
    val clear = 1 << minCode; val end = clear + 1
    var dictSize = end + 1; var codeSize = minCode + 1
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += codeSize
      while (accBits >= 8) { body.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
    }
    emit(0) // first literal: prev = "0", 1 px
    var outCount = 1L
    var prevLen = 1
    while (outCount < nPixels) {
      if (dictSize < 4096) {
        emit(dictSize) // KwKwK: emits prev + its first byte, adds that entry
        prevLen += 1; outCount += prevLen; dictSize += 1
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
      } else {
        emit(4095) // dict full: longest entry, ~4091 px per 12-bit code
        prevLen = 4091; outCount += prevLen
      }
    }
    if (accBits > 0) body.write((acc & 0xFF).toInt)
    body.toByteArray
  }

  /** Animated GIF of nFrames 4096x4096 bomb frames over a 4-color palette. */
  private def bombGif(nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](0, 0x10, 0, 0x10)) // screen 4096x4096 (LE)
    out.write(0x81); out.write(0); out.write(0) // global palette, 4 entries
    out.write(Array.fill[Byte](12)(0x55))
    val data = lzwBombFrame(2, 4096L * 4096L)
    for (_ <- 0 until nFrames) {
      out.write(0x2C); out.write(Array[Byte](0, 0, 0, 0)) // left, top
      out.write(Array[Byte](0, 0x10, 0, 0x10)) // w = h = 4096
      out.write(0) // no local palette
      out.write(2) // LZW min code
      var o = 0
      while (o < data.length) {
        val n = math.min(255, data.length - o)
        out.write(n); out.write(data, o, n); o += n
      }
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  test("GIF multi-frame bomb: cumulative pixels beyond the file budget refuse; under it decode") {
    // 4 frames = exactly the 2^26-px file budget -> decodes (proves the
    // frames are REAL, not refused for being malformed)...
    val ok = SimpleGif.decode(bombGif(4))
    assert(ok.exists(_.frames.size == 4), "4-frame bomb must decode fully")
    assert(ok.exists(_.frames.forall(f => f.width == 4096 && f.height == 4096)))
    // ...and the 8-frame variant (~75 KB on disk, 1 GB decoded) must come
    // back None at the budget check, not OOM accumulating frames
    assert(SimpleGif.decode(bombGif(8)).isEmpty,
      "cumulative frame budget must refuse the multi-frame bomb")
  }
}

package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM GIF (87a/89a) codec — the video leg of the multimodal tier
  * (an animated GIF is the one motion format decodable on nothing but
  * the JDK; reference stores media opaquely, `src/app.py` never decodes,
  * so any real decoder here is strictly beyond it).
  *
  * Decode: header + logical screen descriptor, global and local color
  * tables, extension blocks (skipped), image descriptors, and REAL LZW
  * decompression (variable code width, clear/end codes, 12-bit cap,
  * LSB-first bit packing) for every frame. Frame pixels come back as
  * luminance bytes ((299·R + 587·G + 114·B) / 1000 per palette entry),
  * the shared feature contract of the PNG path. Interlaced frames decode
  * with correct pixel VALUES (row order permuted — dims and histograms,
  * the features this tier extracts, are unaffected). Unsupported shapes
  * return None and the caller falls back to the documented stub.
  *
  * Encode (tests + the q84 oracle): animated GIF with a global palette
  * and per-frame graphics-control extensions. Emits a CLEAR code before
  * every literal so the code width never grows — bit-inefficient but
  * fully valid LZW that any decoder accepts, which keeps the encoder
  * small enough to trust as a test fixture.
  */
object SimpleGif {

  /** Per-frame decode budget: 2^24 px (4096×4096). lzwDecode preallocates
    * the CLAIMED w×h output, so a tiny hostile descriptor declaring
    * 65535×32767 would attempt a 2.1 GB allocation — OutOfMemoryError is
    * an Error the decode catch never sees (r12 fuzz finding). */
  private val MaxPixels = 1L << 24

  /** Whole-FILE decode budget: 2^26 px (= 64 MB of luminance bytes),
    * mirroring SimplePdf's per-stream cap. The per-frame cap alone is not
    * enough: LZW expands up to ~2700×, so a ~1 MB blob can legitimately
    * carry ~170 frames each at the per-frame cap and accumulate multiple
    * GB in the frames Vector (r12-advice). Cumulative pixels across
    * frames exceeding this → None, same stub-fallback contract. */
  private val MaxTotalPixels = 1L << 26

  final case class Frame(width: Int, height: Int, lum: Array[Byte])
  final case class Gif(width: Int, height: Int, frames: Vector[Frame])

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 13 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  // ── decode ──

  def decode(bytes: Array[Byte]): Option[Gif] = {
    if (!isGif(bytes)) return None
    try {
      var p = 6
      def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
      def u16(): Int = { val v = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8); p += 2; v }
      val sw = u16(); val sh = u16()
      val packed = u8(); u8(); u8() // bg color index, aspect
      val global: Array[Int] =
        if ((packed & 0x80) != 0) readPalette(bytes, 2 << (packed & 7))(p) match {
          case (pal, np) => p = np; pal
        } else Array.empty
      val frames = Vector.newBuilder[Frame]
      var totalPixels = 0L // file-wide budget accumulator (see MaxTotalPixels)
      var done = false
      while (!done && p < bytes.length) {
        u8() match {
          case 0x3B => done = true
          case 0x21 => // extension: label + sub-blocks
            u8()
            var len = u8()
            while (len != 0) { p += len; len = u8() }
          case 0x2C =>
            u16(); u16() // left, top
            val w = u16(); val h = u16()
            if (w.toLong * h.toLong > MaxPixels) return None // see MaxPixels
            totalPixels += w.toLong * h.toLong
            if (totalPixels > MaxTotalPixels) return None // see MaxTotalPixels
            val ipacked = u8()
            val local: Array[Int] =
              if ((ipacked & 0x80) != 0) readPalette(bytes, 2 << (ipacked & 7))(p) match {
                case (pal, np) => p = np; pal
              } else global
            if (local.isEmpty) return None // no palette anywhere: not decodable
            val minCode = u8()
            if (minCode < 1 || minCode > 11) return None
            val data = new ArrayBuffer[Byte]()
            var len = u8()
            while (len != 0) {
              data ++= bytes.slice(p, p + len); p += len; len = u8()
            }
            val indices = lzwDecode(data.toArray, minCode, w * h).getOrElse(return None)
            val lum = new Array[Byte](w * h)
            var i = 0
            while (i < lum.length) {
              val rgb = local(math.min(indices(i) & 0xFF, local.length - 1))
              lum(i) = ((299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
                114 * (rgb & 0xFF)) / 1000).toByte
              i += 1
            }
            frames += Frame(w, h, lum)
          case _ => return None // unknown block type: bail to the stub
        }
      }
      val fs = frames.result()
      if (fs.isEmpty) None else Some(Gif(sw, sh, fs))
    } catch {
      // NegativeArraySizeException: a corrupt descriptor can overflow
      // w*h Int arithmetic into a negative allocation size — same
      // stub-fallback contract as a short read (r11 review)
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
    }
  }

  private def readPalette(bytes: Array[Byte], size: Int)(at: Int): (Array[Int], Int) = {
    val pal = new Array[Int](size)
    var i = 0
    while (i < size) {
      val o = at + i * 3
      pal(i) = ((bytes(o) & 0xFF) << 16) | ((bytes(o + 1) & 0xFF) << 8) | (bytes(o + 2) & 0xFF)
      i += 1
    }
    (pal, at + size * 3)
  }

  /** GIF-variant LZW: codes read LSB-first, width minCode+1 growing to a
    * 12-bit cap, CLEAR resets the table, END (or nPixels decoded) stops. */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Byte](nPixels)
    var outAt = 0
    // dictionary as (prefix code, appended byte); literals are implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = end + 1
    var codeSize = minCode + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var at = 0
    val scratch = new Array[Byte](4096)
    def expand(code: Int): Int = { // writes the string for `code` into scratch, returns length
      var c = code; var n = 0
      while (c >= clear) { scratch(n) = suffix(c); n += 1; c = prefix(c) }
      scratch(n) = c.toByte; n + 1
    }
    while (outAt < nPixels) {
      while (accBits < codeSize && at < data.length) {
        acc |= (data(at) & 0xFFL) << accBits; accBits += 8; at += 1
      }
      if (accBits < codeSize) return if (outAt == nPixels) Some(out) else None // truncated
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; accBits -= codeSize
      if (code == clear) {
        dictSize = end + 1; codeSize = minCode + 1; prev = -1
      } else if (code == end) {
        return if (outAt == nPixels) Some(out) else None
      } else {
        if (code > dictSize || (code == dictSize && prev == -1)) return None
        val n =
          if (code < dictSize) expand(code)
          else { // KwKwK case: prev string + its own first byte
            val m = expand(prev)
            var i = m; while (i > 0) { scratch(i) = scratch(i - 1); i -= 1 }
            scratch(0) = scratch(m); m + 1 // reversed order handled below
          }
        // scratch holds the string REVERSED (expand walks suffix links)
        var i = n - 1
        while (i >= 0 && outAt < nPixels) { out(outAt) = scratch(i); outAt += 1; i -= 1 }
        if (prev != -1 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = scratch(n - 1) // first byte of current string
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  // ── encode ──

  /** Animated GIF from palette-indexed frames over one global palette
    * (`palette(k)` = 0xRRGGBB). All frames must match the screen dims. */
  def encode(width: Int, height: Int, palette: Array[Int],
             frameIndices: Seq[Array[Byte]]): Array[Byte] = {
    require(palette.nonEmpty && Integer.bitCount(palette.length) == 1 &&
      palette.length >= 2 && palette.length <= 256, "palette size must be a power of two in [2,256]")
    require(frameIndices.nonEmpty)
    val bits = math.max(1, 31 - Integer.numberOfLeadingZeros(palette.length))
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    u8(0x80 | ((bits - 1) << 4) | (bits - 1)); u8(0); u8(0)
    palette.foreach { rgb => u8(rgb >> 16); u8(rgb >> 8); u8(rgb) }
    val minCode = math.max(2, bits)
    for (idx <- frameIndices) {
      require(idx.length == width * height)
      // graphics control extension (delay 10cs) — exercised, then skipped, by decode
      u8(0x21); u8(0xF9); u8(4); u8(0); u16(10); u8(0); u8(0)
      u8(0x2C); u16(0); u16(0); u16(width); u16(height); u8(0)
      u8(minCode)
      val clear = 1 << minCode
      val endCode = clear + 1
      val codeSize = minCode + 1
      var acc = 0L; var accBits = 0
      val body = new java.io.ByteArrayOutputStream()
      def emit(code: Int): Unit = {
        acc |= code.toLong << accBits; accBits += codeSize
        while (accBits >= 8) { body.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
      }
      idx.foreach { px => emit(clear); emit(px & 0xFF) } // clear-per-literal: width never grows
      emit(endCode)
      if (accBits > 0) body.write((acc & 0xFF).toInt)
      val bb = body.toByteArray
      var o = 0
      while (o < bb.length) {
        val n = math.min(255, bb.length - o)
        u8(n); out.write(bb, o, n); o += n
      }
      u8(0)
    }
    u8(0x3B)
    out.toByteArray
  }
}

package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (no media libraries exist in this container, and
  * none are needed: PNG's compression is zlib FlateDecode — the same
  * `java.util.zip.Inflater` machinery `SimplePdf` uses — plus five
  * per-scanline byte filters). Decodes non-interlaced 8-bit-depth images
  * of color types 0 (gray), 2 (RGB), 4 (gray+alpha) and 6 (RGBA) to raw
  * pixel bytes; anything else returns None and the caller falls back.
  * The encoder exists so tests and the oracle gate can roundtrip REAL
  * bytes through the decoder — it deliberately cycles through all five
  * filter types (scanline % 5) so every defilter path is exercised by
  * any image taller than four rows.
  */
object SimplePng {

  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width x $height x $channels")
  }

  private val Magic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 8 &&
      java.util.Arrays.equals(java.util.Arrays.copyOfRange(bytes, 0, 8), Magic)

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(s"unsupported channel count $n")
  }

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1)
    case 2 => Some(3)
    case 4 => Some(2)
    case 6 => Some(4)
    case _ => None // 3 = palette: index bytes without PLTE are not pixels
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ── encode ──

  def encode(img: Image): Array[Byte] = {
    val bpp = img.channels
    val stride = img.width * bpp
    // filtered scanlines: filter byte + transformed bytes
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val f = y % 5
      raw((stride + 1) * y) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xFF
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) img.pixels((y - 1) * stride + x - bpp) & 0xFF else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw((stride + 1) * y + 1 + x) = (enc & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType(img.channels).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
                         typ: String, data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t); out.write(data)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  // ── decode ──

  def decode(bytes: Array[Byte]): Option[Image] = {
    if (!isPng(bytes)) return None
    try {
      var pos = 8
      var width, height, depth, ctype, interlace = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && pos + 8 <= bytes.length) {
        val len = java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        if (len < 0 || pos + 12 + len > bytes.length) return None
        typ match {
          case "IHDR" =>
            val b = java.nio.ByteBuffer.wrap(bytes, pos + 8, 13)
            width = b.getInt; height = b.getInt
            depth = b.get & 0xFF; ctype = b.get & 0xFF
            b.get // compression (always 0)
            b.get // filter method (always 0)
            interlace = b.get & 0xFF
          case "IDAT" => idat.write(bytes, pos + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        pos += 12 + len
      }
      if (width <= 0 || height <= 0 || depth != 8 || interlace != 0) return None
      channelsOf(ctype).flatMap { ch =>
        // Allocation bound (r12 fuzz finding): the raw scanline buffer is
        // CLAIMED-dimension sized, so a tiny hostile file declaring huge
        // dims — or a deflate bomb hiding behind small dims — must refuse
        // BEFORE allocating: OutOfMemoryError is an Error the catch below
        // never sees, and it would kill the whole executor, not the row.
        val expectedL = (width.toLong * ch + 1L) * height.toLong
        if (expectedL > MaxRawBytes) None
        else {
          val expected = expectedL.toInt
          val raw = inflate(idat.toByteArray, expected)
          if (raw.length < expected) None
          else Some(Image(width, height, ch, defilter(raw, width, height, ch)))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Per-task decoded-scanline budget: 2^27 B ≈ 134 MB raw (a 6550×6550
    * RGB image). Claimed dims past this refuse to the stub path — the
    * bound is what keeps 32 concurrent decode tasks inside executor
    * memory no matter what a corpus row claims about itself. */
  private val MaxRawBytes = 1L << 27

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      // grow-as-decoded, capped at `expected`: never preallocate the
      // claimed size, never inflate past what the dims can use (bomb guard)
      val out = new java.io.ByteArrayOutputStream(math.min(expected, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput() && out.size < expected) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray
      }
      out.toByteArray
    } finally inf.end()
  }

  private def defilter(raw: Array[Byte], width: Int, height: Int, bpp: Int): Array[Byte] = {
    val stride = width * bpp
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw((stride + 1) * y) & 0xFF
      var x = 0
      while (x < stride) {
        val enc = raw((stride + 1) * y + 1 + x) & 0xFF
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) px((y - 1) * stride + x - bpp) & 0xFF else 0
        val dec = f match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + (left + up) / 2
          case 4 => enc + paeth(left, up, ul)
          // filter bytes outside 0..4 mean a corrupt stream: decoding
          // them as filter 0 would yield silently wrong pixels — throw
          // (decode catches) so the caller takes the documented stub path
          case other => throw new IllegalArgumentException(
            s"unknown PNG scanline filter $other")
        }
        px(y * stride + x) = (dec & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    px
  }
}

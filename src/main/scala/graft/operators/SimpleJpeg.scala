package graft.operators

/** Minimal pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT,
  * Huffman entropy coding) — the image twin of [[SimplePng]]/[[SimpleGif]]
  * behind the multimodal operator, so JPEG payloads decode for REAL.
  *
  * Decoder: any baseline (SOF0) stream with 8-bit quant tables,
  * arbitrary Huffman tables read from DHT, 1 or 3 components with no
  * chroma subsampling (all sampling factors 1 — 4:4:4 or grayscale),
  * optional restart markers. Anything else (progressive SOF2,
  * subsampled 4:2:0/4:2:2, 16-bit DQT, arithmetic coding) returns None
  * and the caller falls back to the documented stub.
  *
  * Encoder (fixture generator, like SimplePng.encode): grayscale or RGB
  * 4:4:4, ALL-ONES quantization tables, and deliberately simple custom
  * Huffman tables (every DC symbol 4 bits, every AC symbol 8 bits —
  * canonical and spec-valid, carried in DHT like any other table).
  * Quality note: with q=1 tables the only loss is DCT rounding; an image
  * that is CONSTANT PER 8×8 BLOCK has only a DC coefficient, which is
  * integer-exact through the float DCT, so decode(encode(x)) = x exactly
  * for block-constant images — that is what lets q89 oracle-check this
  * codec bit-exactly while the decoder stays fully general.
  *
  * Reference behavior being replaced: the multimodal image path of
  * `/root/reference` has no real decoders at all (it never leaves text);
  * this extends the training-pipeline surface the same way q79/q80/q84
  * did for PNG/WAV/GIF.
  */
object SimpleJpeg {

  /** Per-task decode budget: 2^24 px (a 4096×4096 frame) keeps the
    * 8-byte-double coefficient planes of 32 concurrent decode tasks
    * inside executor memory no matter what a corpus row claims. */
  private val MaxPixels = 1L << 24

  /** Decoded image: channels ∈ {1, 3}, row-major interleaved pixels. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width x $height x $channels")
  }

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 3 &&
      (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF

  // cos((2x+1)·u·π/16) and the DC normalization 1/√2 — shared by FDCT/IDCT
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private def cc(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Zig-zag scan order: zigzag index → block index (row*8+col). */
  private val Zigzag: Array[Int] = {
    val order = new Array[Int](64)
    var zi = 0
    for (s <- 0 until 15; i <- 0 to s if s - i <= 7 && i <= 7) {
      val (r, c) = if (s % 2 == 0) (s - i, i) else (i, s - i)
      if (r <= 7 && c <= 7) { order(zi) = r * 8 + c; zi += 1 }
    }
    order
  }

  // ── encode ──

  // Encoder Huffman tables: canonical, single code length per table.
  // DC: the 12 categories as 4-bit codes. AC: EOB, ZRL and every
  // (run 0..15, size 1..12) pair as 8-bit codes (194 ≤ 255 and the
  // all-ones pattern stays unused, as T.81 Annex C requires).
  private val EncDcVals: Array[Int] = (0 to 11).toArray
  private val EncAcVals: Array[Int] =
    Array(0x00, 0xF0) ++ (for (r <- 0 to 15; s <- 1 to 12) yield (r << 4) | s)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) put(0xFF, 8 - nbits) // 1-pad
  }

  private def category(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) { // inner transform over y for each row x
      var v = 0
      while (v < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += block(x * 8 + y) * Cos(y)(v); y += 1 }
        tmp(x * 8 + v) = s
        v += 1
      }
      x += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var x2 = 0
        while (x2 < 8) { s += tmp(x2 * 8 + v) * Cos(x2)(u); x2 += 1 }
        out(u * 8 + v) = 0.25 * cc(u) * cc(v) * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Encode as baseline JPEG: all-ones quant table, 4:4:4, no restarts. */
  def encode(img: Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3, "channels must be 1 or 3")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    marker(0xD8) // SOI
    seg(0xDB, Array(0x00) ++ Array.fill(64)(1)) // DQT id 0, all ones
    seg(0xC0, Array(8, // SOF0: precision
      (img.height >> 8) & 0xFF, img.height & 0xFF,
      (img.width >> 8) & 0xFF, img.width & 0xFF,
      img.channels) ++
      (1 to img.channels).flatMap(id => Seq(id, 0x11, 0))) // no subsampling
    // DHT: DC table 0 (12 symbols × 4 bits), AC table 0 (194 × 8 bits)
    val dcBits = Array.tabulate(16)(i => if (i == 3) EncDcVals.length else 0)
    val acBits = Array.tabulate(16)(i => if (i == 7) EncAcVals.length else 0)
    seg(0xC4, Array(0x00) ++ dcBits ++ EncDcVals)
    seg(0xC4, Array(0x10) ++ acBits ++ EncAcVals)
    seg(0xDA, Array(img.channels) ++
      (1 to img.channels).flatMap(id => Seq(id, 0x00)) ++ Seq(0, 63, 0))

    // planes as level-shifted doubles (RGB → YCbCr first), edge-padded to ×8
    val (w, h, nc) = (img.width, img.height, img.channels)
    val bw = (w + 7) / 8 * 8; val bh = (h + 7) / 8 * 8
    val planes = Array.fill(nc)(new Array[Double](bw * bh))
    var y = 0
    while (y < bh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < bw) {
        val sx = math.min(x, w - 1)
        if (nc == 1)
          planes(0)(y * bw + x) = (img.pixels(sy * w + sx) & 0xFF) - 128.0
        else {
          val r = (img.pixels((sy * w + sx) * 3) & 0xFF).toDouble
          val g = (img.pixels((sy * w + sx) * 3 + 1) & 0xFF).toDouble
          val b = (img.pixels((sy * w + sx) * 3 + 2) & 0xFF).toDouble
          planes(0)(y * bw + x) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          planes(1)(y * bw + x) = -0.168736 * r - 0.331264 * g + 0.5 * b
          planes(2)(y * bw + x) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }

    val bits = new BitWriter(out)
    val acIndex: Map[Int, Int] = EncAcVals.zipWithIndex.toMap
    def putDc(diff: Int): Unit = {
      val s = category(diff)
      bits.put(s, 4) // DC code = its own symbol value (single-length table)
      if (s > 0) bits.put(if (diff < 0) (diff - 1) & ((1 << s) - 1) else diff, s)
    }
    def putAc(rs: Int): Unit = bits.put(acIndex(rs), 8)
    val pred = new Array[Int](nc)
    // interleaved MCUs (all sampling 1 → one block per component per MCU)
    var by = 0
    while (by < bh / 8) {
      var bx = 0
      while (bx < bw / 8) {
        var c = 0
        while (c < nc) {
          val block = new Array[Double](64)
          var i = 0
          while (i < 64) {
            block(i) = planes(c)((by * 8 + i / 8) * bw + bx * 8 + i % 8)
            i += 1
          }
          val f = fdct(block)
          val q = Array.tabulate(64)(zi => math.round(f(Zigzag(zi))).toInt)
          putDc(q(0) - pred(c)); pred(c) = q(0)
          var k = 1; var run = 0
          while (k < 64) {
            if (q(k) == 0) run += 1
            else {
              while (run > 15) { putAc(0xF0); run -= 16 } // ZRL
              val s = category(q(k))
              putAc((run << 4) | s)
              bits.put(if (q(k) < 0) (q(k) - 1) & ((1 << s) - 1) else q(k), s)
              run = 0
            }
            k += 1
          }
          if (run > 0) putAc(0x00) // EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bits.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ── decode ──

  /** Canonical Huffman table built from DHT's BITS/HUFFVAL (T.81 Annex C/F):
    * mincode/maxcode/valptr per code length. */
  private final class Huff(bitCounts: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bitCounts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bitCounts(l - 1); k += bitCounts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var l = 1
      var code = in.bit()
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | in.bit(); l += 1
      }
      if (l > 16) throw new IllegalArgumentException("bad Huffman code")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops at markers; RSTn
    * markers are consumed by `restart()`. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("EOF in scan")
        var b = data(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          val b2 = if (pos < data.length) data(pos) & 0xFF else 0xD9
          if (b2 == 0x00) pos += 1 // stuffed
          else throw new IllegalArgumentException("marker inside entropy data")
          b = 0xFF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(s: Int): Int = { var v = 0; var i = 0; while (i < s) { v = (v << 1) | bit(); i += 1 }; v }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      if (pos + 1 >= data.length || (data(pos) & 0xFF) != 0xFF ||
        ((data(pos + 1) & 0xFF) & 0xF8) != 0xD0)
        throw new IllegalArgumentException("expected restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def idct(coef: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) { // inner sum over u for each column v
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += cc(u) * coef(u * 8 + v) * Cos(x)(u); u += 1 }
        tmp(x * 8 + v) = s
        x += 1
      }
      v += 1
    }
    var x2 = 0
    while (x2 < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0; var v2 = 0
        while (v2 < 8) { s += cc(v2) * tmp(x2 * 8 + v2) * Cos(y)(v2); v2 += 1 }
        out(x2 * 8 + y) = 0.25 * s
        y += 1
      }
      x2 += 1
    }
    out
  }

  private def clamp(d: Double): Int = {
    val v = math.round(d).toInt
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  def decode(bytes: Array[Byte]): Option[Image] = {
    if (!isJpeg(bytes)) return None
    try {
      var pos = 2
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var width = 0; var height = 0
      var nc = 0
      var compQ: Array[Int] = null // per-component quant table id
      var compIds: Array[Int] = null // SOF component ids, declaration order
      var compDc: Array[Int] = null
      var compAc: Array[Int] = null
      var restartInterval = 0
      def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
      def u16(): Int = { val v = ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF); pos += 2; v }

      while (pos + 1 < bytes.length) {
        if (u8() != 0xFF) return None
        var m = u8()
        while (m == 0xFF) m = u8() // fill bytes are legal
        m match {
          case 0xD9 => return None // EOI before any scan decoded
          case 0xDB =>
            val end = pos + u16() - 2
            while (pos < end) {
              val pqtq = u8()
              if ((pqtq >> 4) != 0) return None // 16-bit tables unsupported
              quant(pqtq & 15) = Array.fill(64)(u8())
            }
          case 0xC0 | 0xC1 => // baseline / extended sequential
            u16(); if (u8() != 8) return None
            height = u16(); width = u16()
            nc = u8()
            if (nc != 1 && nc != 3) return None
            compQ = new Array[Int](nc)
            compIds = new Array[Int](nc)
            for (i <- 0 until nc) {
              compIds(i) = u8() // ids are arbitrary bytes — never assume 1..nc
              if (u8() != 0x11) return None // subsampling unsupported
              compQ(i) = u8()
            }
            if (compIds.distinct.length != nc) return None
          case 0xC4 =>
            val end = pos + u16() - 2
            while (pos < end) {
              val tcth = u8()
              val bitCounts = Array.fill(16)(u8())
              val vals = Array.fill(bitCounts.sum)(u8())
              val t = new Huff(bitCounts, vals)
              if ((tcth >> 4) == 0) dcTabs(tcth & 15) = t else acTabs(tcth & 15) = t
            }
          case 0xDD => u16(); restartInterval = u16()
          case 0xDA =>
            u16()
            val ns = u8()
            if (ns != nc) return None
            compDc = new Array[Int](nc); compAc = new Array[Int](nc)
            for (i <- 0 until ns) {
              // resolve through the SOF id list: quant tables were
              // recorded by declaration order, so the scan's table
              // assignments must land at the same index. The MCU decode
              // below walks components in SOF order, so a scan listing
              // them in any OTHER order would desync the bitstream —
              // refuse (→ stub path) rather than decode wrong pixels.
              val id = if (compIds == null) -1 else compIds.indexOf(u8())
              if (id != i) return None
              val tt = u8(); compDc(id) = tt >> 4; compAc(id) = tt & 15
            }
            pos += 3 // Ss/Se/AhAl
            // ── the single interleaved scan ──
            if (width <= 0 || height <= 0) return None
            // Allocation bound (r12 fuzz finding): the coefficient planes
            // are CLAIMED-dimension sized doubles — a tiny hostile file
            // declaring 65535×65535 would attempt multi-GB allocations,
            // and OutOfMemoryError is an Error the catch below never sees.
            val bw = (width + 7) / 8; val bh = (height + 7) / 8
            if (bw * 8L * bh * 8L > MaxPixels) return None
            val planes = Array.fill(nc)(new Array[Double](bw * 8 * bh * 8))
            val in = new BitReader(bytes, pos)
            val pred = new Array[Int](nc)
            var mcu = 0
            var by = 0
            while (by < bh) {
              var bx = 0
              while (bx < bw) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                  in.restart(); java.util.Arrays.fill(pred, 0)
                }
                var c = 0
                while (c < nc) {
                  val qt = quant(compQ(c))
                  if (qt == null) return None
                  val dcT = dcTabs(compDc(c)); val acT = acTabs(compAc(c))
                  if (dcT == null || acT == null) return None
                  val coef = new Array[Double](64)
                  val s0 = dcT.decode(in)
                  pred(c) += extend(in.receive(s0), s0)
                  coef(0) = pred(c).toDouble * qt(0)
                  var k = 1
                  var eob = false
                  while (k < 64 && !eob) {
                    val rs = acT.decode(in)
                    val r = rs >> 4; val s = rs & 15
                    if (s == 0) { if (r == 15) k += 16 else eob = true }
                    else {
                      k += r
                      if (k > 63) return None
                      coef(Zigzag(k)) = extend(in.receive(s), s).toDouble * qt(k)
                      k += 1
                    }
                  }
                  val px = idct(coef)
                  var i = 0
                  while (i < 64) {
                    planes(c)((by * 8 + i / 8) * (bw * 8) + bx * 8 + i % 8) = px(i) + 128.0
                    i += 1
                  }
                  c += 1
                }
                mcu += 1
                bx += 1
              }
              by += 1
            }
            // crop + color-convert
            val outPx = new Array[Byte](width * height * nc)
            val stride = bw * 8
            var yy = 0
            while (yy < height) {
              var xx = 0
              while (xx < width) {
                if (nc == 1)
                  outPx(yy * width + xx) = clamp(planes(0)(yy * stride + xx)).toByte
                else {
                  val yv = planes(0)(yy * stride + xx)
                  val cb = planes(1)(yy * stride + xx) - 128.0
                  val cr = planes(2)(yy * stride + xx) - 128.0
                  outPx((yy * width + xx) * 3) = clamp(yv + 1.402 * cr).toByte
                  outPx((yy * width + xx) * 3 + 1) =
                    clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
                  outPx((yy * width + xx) * 3 + 2) = clamp(yv + 1.772 * cb).toByte
                }
                xx += 1
              }
              yy += 1
            }
            return Some(Image(width, height, nc, outPx))
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // progressive/lossless/arithmetic: unsupported
          case 0x01 => () // TEM, parameterless
          case mm if mm >= 0xD0 && mm <= 0xD7 => () // stray RST
          case _ => pos += u16() - 2 // APPn/COM/anything with a length
        }
      }
      None // no SOS reached
    } catch { case _: Exception => None }
  }
}

package graft.operators

/** Minimal EBML (WebM/Matroska) container parser — pure JVM, read-only.
  *
  * The companion of [[SimpleMp4]] for the other half of the video-
  * container world: DocType, segment duration (TimecodeScale ×
  * Duration), per-track type/codec/dimensions, and the coded-frame
  * count (SimpleBlocks + Blocks across Clusters) — the ffprobe-metadata
  * layer a curation pipeline filters on, with frame PIXEL decode (VP8/
  * VP9/Opus — codec libraries) remaining the one stubbed branch.
  *
  * EBML grammar (RFC 8794): every element is [ID vint][size vint]
  * [payload]; the ID keeps its length-marker bit, the size clears it;
  * an all-ones size means "unknown extent" (streamed files — accepted
  * for Segment/Cluster only, extending to the parent's end). Malformed
  * structure throws internally and surfaces as None — refuse loudly,
  * never decode garbage.
  */
object SimpleWebm {

  final case class Track(kind: String, codec: String, width: Int, height: Int)
  final case class Meta(docType: String, durationMs: Long,
                        tracks: List[Track], nFrames: Int)

  def isWebm(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 &&
      (b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

  // element IDs (with marker bits, as they appear on the wire)
  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimecodeScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B675L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val Block = 0xA1L

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Read an EBML vint at p: (value, bytesConsumed). `keepMarker` for
    * element IDs (the marker bit is part of the ID), cleared for sizes.
    * Returns value = -1 for an all-ones size (unknown extent). */
  private def vint(b: Array[Byte], p: Int, keepMarker: Boolean): (Long, Int) = {
    if (p >= b.length) fail("vint OOB")
    val first = b(p) & 0xFF
    if (first == 0) fail("invalid vint lead byte")
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (p + len > b.length) fail("vint OOB")
    var v = if (keepMarker) first.toLong else (first & (0xFF >>> len)).toLong
    var allOnes = !keepMarker && (first & (0xFF >>> len)) == (0xFF >>> len)
    for (i <- 1 until len) {
      val x = b(p + i) & 0xFF
      if (x != 0xFF) allOnes = false
      v = (v << 8) | x
    }
    (if (allOnes) -1L else v, len)
  }

  /** Walk child elements of [start, end): f(id, payloadStart, payloadEnd). */
  private def walk(b: Array[Byte], start: Int, end: Int)
                  (f: (Long, Int, Int) => Unit): Unit = {
    var p = start
    while (p < end) {
      val (id, idLen) = vint(b, p, keepMarker = true)
      val (sz, szLen) = vint(b, p + idLen, keepMarker = false)
      val ps = p + idLen + szLen
      val pe = if (sz < 0) {
        // unknown extent: legal for streamed Segment/Cluster — runs to
        // the enclosing element's end
        if (id != Segment && id != Cluster) fail(s"unknown size on ${id.toHexString}")
        end
      } else {
        if (ps + sz > end) fail("element overruns parent")
        ps + sz.toInt
      }
      f(id, ps, pe)
      p = pe
    }
  }

  private def uint(b: Array[Byte], s: Int, e: Int): Long = {
    if (e - s > 8) fail("uint too wide")
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xFF); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, s, e))
    case 0 => 0.0
    case _ => fail("float must be 4 or 8 bytes")
  }

  def parse(b: Array[Byte]): Option[Meta] = {
    if (!isWebm(b)) return None
    try {
      var docType = "matroska" // the EBML default
      var tcScale = 1000000L // ns per timecode tick (Matroska default)
      var durTicks = 0.0
      var tracks = List.empty[Track]
      var frames = 0
      var sawSegment = false
      walk(b, 0, b.length) { (id, s, e) =>
        id match {
          case EbmlHeader =>
            walk(b, s, e) { (id2, s2, e2) =>
              if (id2 == DocType)
                docType = new String(b.slice(s2, e2), "ISO-8859-1").takeWhile(_ != 0)
            }
          case Segment =>
            sawSegment = true
            walk(b, s, e) { (id2, s2, e2) =>
              id2 match {
                case Info =>
                  walk(b, s2, e2) { (id3, s3, e3) =>
                    if (id3 == TimecodeScale) tcScale = uint(b, s3, e3)
                    else if (id3 == Duration) durTicks = ebmlFloat(b, s3, e3)
                  }
                case Tracks =>
                  walk(b, s2, e2) { (id3, s3, e3) =>
                    if (id3 == TrackEntry) {
                      var kind = "unknown"; var codec = ""; var w = 0; var h = 0
                      walk(b, s3, e3) { (id4, s4, e4) =>
                        id4 match {
                          case TrackType => kind = uint(b, s4, e4) match {
                            case 1 => "video"
                            case 2 => "audio"
                            case t => s"type$t"
                          }
                          case CodecID =>
                            codec = new String(b.slice(s4, e4), "ISO-8859-1")
                              .takeWhile(_ != 0)
                          case VideoEl =>
                            walk(b, s4, e4) { (id5, s5, e5) =>
                              if (id5 == PixelWidth) w = uint(b, s5, e5).toInt
                              else if (id5 == PixelHeight) h = uint(b, s5, e5).toInt
                            }
                          case _ => ()
                        }
                      }
                      tracks = tracks :+ Track(kind, codec, w, h)
                    }
                  }
                case Cluster =>
                  // recursive: a STREAMED (unknown-size) Cluster's extent
                  // runs to the Segment end, so every following sibling
                  // Cluster surfaces as a nested element of this walk —
                  // without the recursion their blocks were silently
                  // dropped from nFrames (r11 review)
                  def countBlocks(cs: Int, ce: Int): Unit =
                    walk(b, cs, ce) { (id3, s3, e3) =>
                      if (id3 == SimpleBlock) frames += 1
                      else if (id3 == BlockGroup)
                        walk(b, s3, e3) { (id4, _, _) =>
                          if (id4 == Block) frames += 1
                        }
                      else if (id3 == Cluster) countBlocks(s3, e3)
                    }
                  countBlocks(s2, e2)
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (!sawSegment) None
      else Some(Meta(docType,
        math.round(durTicks * tcScale / 1e6), tracks, frames))
    } catch {
      case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => None
    }
  }
}

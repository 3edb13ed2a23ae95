package graft.operators

/** Minimal ISO-BMFF (MP4/MOV/M4A) container parser — pure JVM, read-only.
  *
  * The ffprobe-metadata half of mp4 support: major brand, movie
  * timescale/duration, and per-track handler kind, sample-entry codec
  * fourcc, visual dimensions, and sample count — everything a curation
  * pipeline filters and buckets on (drop sub-second clips, split by
  * codec, histogram resolutions) without touching a single coded frame.
  * Frame PIXEL decode genuinely requires a codec library (H.264/VP9 —
  * none ships in this build) and remains the one stubbed branch in
  * [[Multimodal]]; this parser closes everything in front of it.
  *
  * Box grammar (ISO/IEC 14496-12 §4.2): [u32 size][fourcc type][payload],
  * size==1 → u64 largesize follows, size==0 → box extends to EOF.
  * Versioned full boxes (mvhd/tkhd/mdhd) carry 32- or 64-bit times by
  * version byte. Malformed structure (overrunning box, short payload)
  * throws internally and surfaces as None — refuse loudly, never decode
  * garbage (the SimpleJpeg discipline).
  */
object SimpleMp4 {

  /** kind: "video"/"audio"/other handler fourcc; codec: sample-entry
    * fourcc (avc1, mp4a, ...); width/height: tkhd 16.16 integer part
    * (0 for non-visual); nSamples: stsz entry count. */
  final case class Track(kind: String, codec: String,
                         width: Int, height: Int, nSamples: Int)
  final case class Meta(brand: String, timescale: Long, durationMs: Long,
                        tracks: List[Track])

  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def u32(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 4 > b.length) throw new IllegalArgumentException("u32 OOB")
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
      ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)
  }
  private def u64(b: Array[Byte], p: Int): Long = (u32(b, p) << 32) | u32(b, p + 4)
  private def fourcc(b: Array[Byte], p: Int): String = {
    if (p + 4 > b.length) throw new IllegalArgumentException("fourcc OOB")
    new String(Array(b(p), b(p + 1), b(p + 2), b(p + 3)), "ISO-8859-1")
  }

  /** Walk the child boxes of [start, end); malformed sizes throw. */
  private def boxes(b: Array[Byte], start: Int, end: Int)
                   (f: (String, Int, Int) => Unit): Unit = {
    var p = start
    while (p + 8 <= end) {
      var size = u32(b, p)
      var hdr = 8
      if (size == 1) { size = u64(b, p + 8); hdr = 16 }
      else if (size == 0) size = end - p
      if (size < hdr || size > Int.MaxValue || p + size > end)
        throw new IllegalArgumentException(s"box overruns at $p (size $size)")
      f(fourcc(b, p + 4), p + hdr, p + size.toInt)
      p += size.toInt
    }
    if (p != end) throw new IllegalArgumentException(s"trailing garbage at $p")
  }

  def parse(b: Array[Byte]): Option[Meta] = {
    if (!isMp4(b)) return None
    try {
      var brand = ""
      var ts = 0L
      var dur = 0L
      var sawMoov = false
      var tracks = List.empty[Track]
      boxes(b, 0, b.length) { (t, s, e) =>
        t match {
          case "ftyp" if e - s >= 4 => brand = fourcc(b, s)
          case "moov" =>
            sawMoov = true
            boxes(b, s, e) { (t2, s2, e2) =>
              t2 match {
                case "mvhd" =>
                  if ((b(s2) & 0xFF) == 1) { ts = u32(b, s2 + 20); dur = u64(b, s2 + 24) }
                  else { ts = u32(b, s2 + 12); dur = u32(b, s2 + 16) }
                case "trak" =>
                  var w = 0; var h = 0; var kind = "unknown"
                  var codec = ""; var n = 0
                  boxes(b, s2, e2) { (t3, s3, e3) =>
                    t3 match {
                      case "tkhd" =>
                        // width/height are 16.16 fixed after vf + times +
                        // track id + reserved + duration + 8 reserved +
                        // layer/group/volume/reserved + 36-byte matrix:
                        // payload offset 76 (v0) / 88 (v1, 64-bit times)
                        val off = if ((b(s3) & 0xFF) == 1) 88 else 76
                        w = (u32(b, s3 + off) >> 16).toInt
                        h = (u32(b, s3 + off + 4) >> 16).toInt
                      case "mdia" =>
                        boxes(b, s3, e3) { (t4, s4, e4) =>
                          t4 match {
                            case "hdlr" =>
                              kind = fourcc(b, s4 + 8) match {
                                case "vide" => "video"
                                case "soun" => "audio"
                                case other  => other.trim
                              }
                            case "minf" =>
                              boxes(b, s4, e4) { (t5, s5, e5) =>
                                if (t5 == "stbl") boxes(b, s5, e5) { (t6, s6, e6) =>
                                  t6 match {
                                    // stsd: vf(4) count(4), then the first
                                    // sample entry: size(4) fourcc(4)
                                    case "stsd" if e6 - s6 >= 16 =>
                                      codec = fourcc(b, s6 + 12)
                                    // stsz: vf(4) sample_size(4) count(4)
                                    case "stsz" if e6 - s6 >= 12 =>
                                      n = u32(b, s6 + 8).toInt
                                    case _ => ()
                                  }
                                }
                              }
                            case _ => ()
                          }
                        }
                      case _ => ()
                    }
                  }
                  tracks = tracks :+ Track(kind, codec, w, h, n)
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (!sawMoov || ts <= 0) None
      else Some(Meta(brand, ts, dur * 1000 / ts, tracks))
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
  }
}

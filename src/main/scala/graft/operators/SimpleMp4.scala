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
  *
  * Since r15 the parser also walks the sample tables (stsz sizes, stsc
  * sample→chunk runs, stco/co64 chunk offsets — §8.7) to per-sample
  * byte ranges, which makes frame PIXEL decode real for the one video
  * codec family that needs no codec library: motion JPEG ('jpeg'/
  * 'mjpa'/'mjpb' sample entries), where every sample is a baseline
  * JPEG that [[SimpleJpeg]] already decodes. H.264/VP8/VP9 remain the
  * adjudicated library boundary.
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

  /** Motion-JPEG sample-entry fourccs — frames are standalone baseline
    * JPEGs, so pixel decode needs only [[SimpleJpeg]]. */
  private val MjpegCodecs = Set("jpeg", "mjpa", "mjpb")

  /** Decode budgets for the sample-table walk: a hostile table can
    * reference the same payload bytes thousands of times, so the guard
    * is on what we ALLOCATE, not on what the file claims (the
    * SimpleJpeg.MaxPixels discipline). */
  private val MaxFrames = 4096
  private val MaxTotalSampleBytes = 1L << 26 // 64 MiB per payload

  /** Per-sample payloads of the first motion-JPEG video track, via the
    * full stsz/stsc/stco walk. None when there is no such track, the
    * container is malformed, any sample range falls outside the
    * payload, or the table exceeds the decode budget — never garbage.
    */
  def mjpegFrames(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (!isMp4(b)) return None
    try {
      var out: Option[Seq[Array[Byte]]] = None
      boxes(b, 0, b.length) { (t, s, e) =>
        if (t == "moov") boxes(b, s, e) { (t2, s2, e2) =>
          if (t2 == "trak" && out.isEmpty) {
            var kind = "unknown"
            var codec = ""
            var sizes: Array[Int] = null
            var stsc: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
            var chunkOffs: Array[Long] = null
            boxes(b, s2, e2) { (t3, s3, e3) =>
              if (t3 == "mdia") boxes(b, s3, e3) { (t4, s4, e4) =>
                t4 match {
                  case "hdlr" =>
                    kind = if (fourcc(b, s4 + 8) == "vide") "video" else "other"
                  case "minf" => boxes(b, s4, e4) { (t5, s5, e5) =>
                    if (t5 == "stbl") boxes(b, s5, e5) { (t6, s6, e6) =>
                      t6 match {
                        // frame decode reads entry_count, not just the first
                        // fourcc: a multi-entry stsd can code samples under a
                        // SECOND description (stsc sample_description_index),
                        // so a first-entry-'jpeg' track could hand non-JPEG
                        // sample bytes out as "MJPEG frames" (r15 advice).
                        // entry_count == 1 makes every sample provably the
                        // jpeg description; [[parse]] keeps the first-entry
                        // read — it reports metadata, it never hands bytes out
                        case "stsd" if e6 - s6 >= 16 =>
                          codec = if (u32(b, s6 + 4) == 1L) fourcc(b, s6 + 12) else ""
                        case "stsz" if e6 - s6 >= 12 =>
                          val fixed = u32(b, s6 + 4)
                          val n = u32(b, s6 + 8)
                          if (n > MaxFrames)
                            throw new IllegalArgumentException(s"stsz count $n over budget")
                          sizes =
                            if (fixed != 0) Array.fill(n.toInt)(fixed.toInt)
                            else {
                              if (s6 + 12 + n * 4 > e6)
                                throw new IllegalArgumentException("stsz short")
                              Array.tabulate(n.toInt)(i => u32(b, s6 + 12 + i * 4).toInt)
                            }
                        case "stsc" if e6 - s6 >= 8 =>
                          val n = u32(b, s6 + 4)
                          if (n > MaxFrames)
                            throw new IllegalArgumentException("stsc count over budget")
                          if (s6 + 8 + n * 12 > e6)
                            throw new IllegalArgumentException("stsc short")
                          stsc = Array.tabulate(n.toInt)(i =>
                            (u32(b, s6 + 8 + i * 12), u32(b, s6 + 12 + i * 12)))
                        case "stco" | "co64" if e6 - s6 >= 8 =>
                          val wide = t6 == "co64"
                          val n = u32(b, s6 + 4)
                          if (n > MaxFrames)
                            throw new IllegalArgumentException("stco count over budget")
                          val step = if (wide) 8 else 4
                          if (s6 + 8 + n * step > e6)
                            throw new IllegalArgumentException("stco short")
                          chunkOffs = Array.tabulate(n.toInt)(i =>
                            if (wide) u64(b, s6 + 8 + i * 8) else u32(b, s6 + 8 + i * 4))
                        case _ => ()
                      }
                    }
                  }
                  case _ => ()
                }
              }
            }
            if (kind == "video" && MjpegCodecs.contains(codec) &&
                sizes != null && stsc != null && chunkOffs != null &&
                stsc.nonEmpty && chunkOffs.nonEmpty) {
              // resolve samples to byte ranges: stsc entries are runs —
              // entry i applies from its first_chunk (1-based) until the
              // next entry's; samples lie consecutively inside a chunk
              var total = 0L
              val frames = Array.newBuilder[Array[Byte]]
              var sample = 0
              var sci = 0
              var chunk = 1
              while (sample < sizes.length && chunk <= chunkOffs.length) {
                while (sci + 1 < stsc.length && stsc(sci + 1)._1 <= chunk) sci += 1
                if (stsc(sci)._1 > chunk)
                  throw new IllegalArgumentException("stsc first_chunk gap")
                val perChunk = stsc(sci)._2
                if (perChunk <= 0 || perChunk > MaxFrames)
                  throw new IllegalArgumentException("stsc run over budget")
                var off = chunkOffs(chunk - 1)
                var k = 0L
                while (k < perChunk && sample < sizes.length) {
                  val sz = sizes(sample)
                  if (sz < 0 || off < 0 || off + sz > b.length)
                    throw new IllegalArgumentException("sample outside payload")
                  total += sz
                  if (total > MaxTotalSampleBytes)
                    throw new IllegalArgumentException("sample bytes over budget")
                  frames += java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + sz)
                  off += sz
                  sample += 1
                  k += 1
                }
                chunk += 1
              }
              if (sample < sizes.length)
                throw new IllegalArgumentException("chunk table exhausted before samples")
              out = Some(frames.result().toSeq)
            }
          }
        }
      }
      out
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
  }

  /** Minimal single-track MJPEG muxer — the write-side twin the q133
    * fixture and specs synthesize REAL containers with (the
    * SimpleJpeg.encode precedent: a codec earns its decoder a
    * round-trip oracle). One 'jpeg' video track, 1-tick frame durations
    * at the given timescale. The output parses with [[parse]]
    * (brand/dims/nSamples) AND [[mjpegFrames]].
    *
    * Chunk layout is a knob (r15 verdict #2: the decoder's multi-run
    * stsc advance, multi-chunk stco walk, and co64 branch had green-path
    * coverage only through refusal fixtures, because this muxer emitted
    * exactly one layout): `chunkSizes` partitions the samples into
    * chunks (empty = the legacy all-in-one-chunk layout, byte-identical
    * output), consecutive equal counts compress into one stsc run so
    * varying sizes exercise the run-advance loop; `co64` writes 64-bit
    * chunk offsets; `chunkGap` inserts dead bytes BETWEEN chunks inside
    * mdat (legal — samples are located by offset, so real-world
    * interleaved files have exactly such non-contiguous chunks).
    */
  def muxMjpeg(width: Int, height: Int, frames: Seq[Array[Byte]],
               timescale: Long = 30, chunkSizes: Seq[Int] = Nil,
               co64: Boolean = false, chunkGap: Int = 0): Array[Byte] = {
    require(frames.nonEmpty && width > 0 && height > 0, "muxMjpeg: empty input")
    // stsd carries width/height as u16 while tkhd carries 16.16 — a
    // value over 65535 would silently truncate in one and not the other,
    // emitting a self-disagreeing container (r15 advice); timescale is a
    // u32 field in mvhd/mdhd
    require(width <= 0xFFFF && height <= 0xFFFF,
      s"muxMjpeg: dimensions ${width}x$height exceed the u16 sample-entry fields")
    require(timescale > 0 && timescale <= 0xFFFFFFFFL,
      s"muxMjpeg: timescale $timescale outside u32")
    // the round-trip guarantee in the scaladoc holds only INSIDE the
    // decoder's own budgets — refuse loudly here rather than hand a
    // caller a well-formed container mjpegFrames will None (r15 review)
    require(frames.length <= MaxFrames,
      s"muxMjpeg: ${frames.length} frames exceeds the $MaxFrames decode budget")
    require(frames.iterator.map(_.length.toLong).sum <= MaxTotalSampleBytes,
      s"muxMjpeg: total sample bytes exceed the $MaxTotalSampleBytes decode budget")
    require(chunkGap >= 0, s"muxMjpeg: negative chunkGap $chunkGap")
    require(chunkSizes.isEmpty ||
        (chunkSizes.forall(_ > 0) && chunkSizes.sum == frames.length),
      s"muxMjpeg: chunkSizes must be positive and sum to ${frames.length}")
    val bo = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def u64b(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xFFFFFFFFL)
    def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      u32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
    }
    val n = frames.length
    val chunks: Seq[Seq[Array[Byte]]] = {
      val sizes = if (chunkSizes.isEmpty) Seq(n) else chunkSizes
      val (out, rest) = sizes.foldLeft((Vector.empty[Seq[Array[Byte]]], frames)) {
        case ((acc, rem), sz) => (acc :+ rem.take(sz), rem.drop(sz))
      }
      assert(rest.isEmpty); out
    }
    // dead gap bytes go BETWEEN chunks only — the single-chunk default
    // stays byte-identical to the pre-knob layout. One linear pass into
    // a stream: a reduce of array ++ array re-copies the accumulated
    // prefix per chunk — O(chunks²) bytes near the 4096-chunk budget
    // (r16 self-review)
    val mdatPayload = {
      val mb = new java.io.ByteArrayOutputStream()
      var first = true
      chunks.foreach { c =>
        if (!first && chunkGap > 0) mb.write(new Array[Byte](chunkGap))
        first = false
        c.foreach(mb.write)
      }
      mb.toByteArray
    }
    val ftyp = box("ftyp", "isom".getBytes, u32(0), "isom".getBytes)
    val firstSampleOff = ftyp.length + 8 // mdat header follows ftyp
    val chunkOffsets = chunks.map(_.iterator.map(_.length.toLong).sum)
      .scanLeft(firstSampleOff.toLong)((off, bytes) => off + bytes + chunkGap)
      .dropRight(1)
    val dur = n.toLong // 1 tick per frame
    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(dur),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      // identity matrix
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L),
      Array.fill(24)(0.toByte), u32(2))
    val tkhd = box("tkhd", u32(7) /* v0 + enabled|in-movie|in-preview */,
      u32(0), u32(0), u32(1), u32(0), u32(dur), u32(0), u32(0),
      u16(0), u16(0), u16(0), u16(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L),
      u32(width.toLong << 16), u32(height.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(timescale), u32(dur),
      u16(0x55C4) /* 'und' */, u16(0))
    val hdlr = box("hdlr", u32(0), u32(0), "vide".getBytes,
      u32(0), u32(0), u32(0), Array(0.toByte))
    val sampleEntry =
      u32(86L) ++ "jpeg".getBytes ++ Array.fill(6)(0.toByte) ++ u16(1) ++
        u16(0) ++ u16(0) ++ Array.fill(12)(0.toByte) ++
        u16(width) ++ u16(height) ++ u32(0x00480000L) ++ u32(0x00480000L) ++
        u32(0) ++ u16(1) ++ Array.fill(32)(0.toByte) ++ u16(24) ++ u16(0xFFFF)
    val stsd = box("stsd", u32(0), u32(1), sampleEntry)
    val stts = box("stts", u32(0), u32(1), u32(n.toLong), u32(1))
    // consecutive equal samples-per-chunk compress into one run — the
    // §8.7.4 encoding the decoder's run-advance loop walks
    val stscRuns = chunks.map(_.length).zipWithIndex.foldLeft(Vector.empty[(Int, Int)]) {
      case (acc, (spc, i)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc else acc :+ ((i + 1, spc))
    }
    val stsc = box("stsc", u32(0), u32(stscRuns.length.toLong),
      stscRuns.toArray.flatMap { case (fc, spc) =>
        u32(fc.toLong) ++ u32(spc.toLong) ++ u32(1) })
    val stsz = box("stsz", u32(0), u32(0), u32(n.toLong),
      frames.toArray.flatMap(f => u32(f.length.toLong)))
    val stco =
      if (co64) box("co64", u32(0), u32(chunkOffsets.length.toLong),
        chunkOffsets.toArray.flatMap(u64b))
      else box("stco", u32(0), u32(chunkOffsets.length.toLong),
        chunkOffsets.toArray.flatMap(u32))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = box("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0))
    val dref = box("dref", u32(0), u32(1), box("url ", u32(1)))
    val dinf = box("dinf", dref)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    bo.write(ftyp)
    bo.write(box("mdat", mdatPayload))
    bo.write(moov)
    bo.toByteArray
  }
}

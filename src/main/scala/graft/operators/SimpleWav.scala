package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF/PCM) codec — the audio twin of [[SimplePng]]. No
  * audio library exists in this container and none is needed: canonical
  * WAV is a RIFF container (chunked, little-endian) around raw PCM
  * samples. Decodes integer PCM (format tag 1) at 8-bit unsigned or
  * 16-bit signed little-endian depth, any channel count; anything else
  * (float PCM, extensible, ADPCM) returns None and the caller falls
  * back. The encoder exists so tests and the oracle gate can roundtrip
  * REAL bytes through the decoder — decode(encode(x)) = x is the
  * strongest oracle-expressible check of a binary codec.
  *
  * Reference behavior target: the multimodal ingestion surface of
  * /root/reference (media as opaque payloads + typed metadata); the
  * container layout follows the public RIFF/WAVE spec.
  */
object SimpleWav {

  /** Interleaved integer samples: 8-bit holds 0..255, 16-bit holds
    * -32768..32767. `frames` = samples.length / channels.
    */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                         samples: Array[Int]) {
    require(channels > 0 && sampleRate > 0, "positive rate/channels")
    require(bitsPerSample == 8 || bitsPerSample == 16, "8- or 16-bit PCM only")
    require(samples.length % channels == 0, "samples not frame-aligned")
    def frames: Int = samples.length / channels
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  // ── encode ──

  def encode(a: Audio): Array[Byte] = {
    val bytesPerSample = a.bitsPerSample / 8
    val blockAlign = a.channels * bytesPerSample
    val dataLen = a.samples.length * bytesPerSample
    val pad = dataLen % 2 // RIFF chunks pad to even length
    val riffLen = 4 + (8 + 16) + (8 + dataLen + pad)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                        // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * blockAlign)          // byte rate
      .putShort(blockAlign.toShort)
      .putShort(a.bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < a.samples.length) {
      if (a.bitsPerSample == 8) buf.put((a.samples(i) & 0xFF).toByte)
      else buf.putShort(a.samples(i).toShort)
      i += 1
    }
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  // ── decode ──

  /** Chunk-scans the RIFF body (skipping ancillary chunks like LIST/fact,
    * honoring odd-length padding), reads `fmt `, then decodes `data`.
    * Truncated data decodes to the whole frames actually present.
    */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (!isWav(bytes)) return None
    try {
      var pos = 12
      var fmtTag, channels, sampleRate, bits = -1
      var audio: Option[Audio] = None
      while (audio.isEmpty && pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val len = ByteBuffer.wrap(bytes, pos + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        if (len < 0) return None
        val body = pos + 8
        id match {
          case "fmt " =>
            if (len < 16 || body + 16 > bytes.length) return None
            val b = ByteBuffer.wrap(bytes, body, 16).order(ByteOrder.LITTLE_ENDIAN)
            fmtTag = b.getShort & 0xFFFF
            channels = b.getShort & 0xFFFF
            sampleRate = b.getInt
            b.getInt; b.getShort // byte rate, block align (derived; ignored)
            bits = b.getShort & 0xFFFF
          case "data" =>
            if (fmtTag != 1 || (bits != 8 && bits != 16) ||
                channels <= 0 || sampleRate <= 0) return None
            val avail = math.min(len, bytes.length - body)
            val bytesPerSample = bits / 8
            val blockAlign = channels * bytesPerSample
            val nFrames = avail / blockAlign
            val n = nFrames * channels
            val samples = new Array[Int](n)
            val b = ByteBuffer.wrap(bytes, body, nFrames * blockAlign)
              .order(ByteOrder.LITTLE_ENDIAN)
            var i = 0
            while (i < n) {
              samples(i) = if (bits == 8) b.get & 0xFF else b.getShort.toInt
              i += 1
            }
            audio = Some(Audio(sampleRate, channels, bits, samples))
          case _ => () // ancillary chunks (LIST, fact, cue…) skipped
        }
        pos = body + len + (len % 2) // RIFF pads odd chunks
      }
      audio
    } catch { case _: Exception => None }
  }
}

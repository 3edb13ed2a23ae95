package graft.operators

/** Perceptual average-hash (aHash) over decoded images — the image-dedup
  * primitive: two renders of the same content hash identically (or within
  * a few bits) even when brightness, encoding, or small patches differ,
  * so near-duplicate IMAGES reduce to a Hamming join exactly like SimHash
  * does for text (q26/q31).
  *
  * The hash is the classic 8×8 average hash: box-downsample the luma
  * plane to an 8×8 grid, then bit b = 1 iff block (b/8, b%8)'s mean is ≥
  * the global mean. All arithmetic is EXACT integers — the mean
  * comparison cross-multiplies (blockSum·64 ≥ totalSum) instead of
  * dividing, which also makes the hash invariant under any uniform
  * brightness shift by construction: both sides of the comparison gain
  * the same term. Emitted as a 64-char '0'/'1' string so downstream SQL
  * (banding, Hamming) is engine-portable with no 64-bit sign traps.
  */
object ImageHash {

  /** Integer luma per pixel: gray passthrough for 1-2 channels (alpha
    * ignored), BT.601-weighted (299r+587g+114b)/1000 for RGB(A). */
  private def luma(img: SimplePng.Image, idx: Int): Long = {
    val ch = img.channels
    val base = idx * ch
    def u(i: Int): Long = img.pixels(i) & 0xffL
    if (ch <= 2) u(base)
    else (299L * u(base) + 587L * u(base + 1) + 114L * u(base + 2)) / 1000L
  }

  /** 64-char aHash bit string; requires dims divisible by 8 (box
    * downsample stays exact — no resampling arithmetic to disagree on). */
  def aHash(img: SimplePng.Image): String = {
    require(img.width % 8 == 0 && img.height % 8 == 0,
      s"aHash: dims must be multiples of 8, got ${img.width}x${img.height}")
    val bw = img.width / 8
    val bh = img.height / 8
    val blockSum = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val v = luma(img, y * img.width + x)
        blockSum((y / bh) * 8 + (x / bw)) += v
        total += v
        x += 1
      }
      y += 1
    }
    val sb = new StringBuilder(64)
    var b = 0
    while (b < 64) {
      sb += (if (blockSum(b) * 64L >= total) '1' else '0')
      b += 1
    }
    sb.toString
  }

  /** Decode a PNG payload and hash it; None for non-PNG/corrupt bytes —
    * and for dims the exact box-downsample can't hash (not multiples of
    * 8): aHash's require would otherwise throw on a perfectly valid
    * 100x50 PNG inside an orNull UDF that promises null-for-unhashable
    * (r11 review). */
  def aHashPng(bytes: Array[Byte]): Option[String] =
    SimplePng.decode(bytes)
      .filter(i => i.width > 0 && i.height > 0 &&
        i.width % 8 == 0 && i.height % 8 == 0)
      .map(aHash)
}

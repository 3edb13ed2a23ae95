package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ImageHashSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, f: Int => Int): SimplePng.Image =
    SimplePng.Image(w, h, 1, Array.tabulate(w * h)(i => f(i).toByte))

  test("known 16x16 gradient: top-half dark, bottom-half bright") {
    // rows 0-7 value 10, rows 8-15 value 200 → bottom 32 blocks above mean
    val img = gray(16, 16, i => if (i / 16 < 8) 10 else 200)
    val h = ImageHash.aHash(img)
    assert(h === "0" * 32 + "1" * 32)
  }

  test("uniform brightness shift leaves the hash EXACTLY unchanged") {
    val base = gray(16, 16, i => (i * 7) % 200)
    val shifted = gray(16, 16, i => (i * 7) % 200 + 55)
    assert(ImageHash.aHash(base) === ImageHash.aHash(shifted))
  }

  test("a small corner patch flips few bits; distinct content flips many") {
    // decisive light/dark blocks (a wrapping ramp leaves every block mean
    // near the global mean — fragile bits that a patch cascades through)
    def blockPat(seed: Int)(i: Int): Int = {
      val b = (i / 16 / 2) * 8 + (i % 16) / 2
      if ((b * 37 + seed) % 5 < 2) 200 else 40
    }
    val base = gray(16, 16, blockPat(0))
    val patched = gray(16, 16, i =>
      if (i / 16 < 4 && i % 16 < 4) 255 else blockPat(0)(i))
    val other = gray(16, 16, blockPat(3))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val near = ham(ImageHash.aHash(base), ImageHash.aHash(patched))
    val far = ham(ImageHash.aHash(base), ImageHash.aHash(other))
    assert(near <= 6, s"corner patch flipped $near bits")
    assert(far > near, s"distinct content ($far) should exceed patch ($near)")
  }

  test("RGB luma weighting: pure-green brighter than pure-blue") {
    def rgb(w: Int, h: Int, r: Int, g: Int, b: Int) =
      SimplePng.Image(w, h, 3, Array.tabulate(w * h * 3)(i => (i % 3 match {
        case 0 => r; case 1 => g; case _ => b
      }).toByte))
    // mixed image: left half green, right half blue → green half wins
    val mixed = SimplePng.Image(16, 16, 3, Array.tabulate(16 * 16 * 3) { i =>
      val px = i / 3
      val ch = i % 3
      (if (px % 16 < 8) { if (ch == 1) 200 else 0 }
       else { if (ch == 2) 200 else 0 }).toByte
    })
    val h = ImageHash.aHash(mixed)
    // each row: blocks 0-3 green (luma 117), 4-7 blue (luma 22) → mean ~70
    assert(h === ("1" * 4 + "0" * 4) * 8)
    assert(rgb(8, 8, 0, 0, 0) != null) // helper exercised
  }

  test("decode→hash round trip through a real PNG") {
    val img = gray(16, 16, i => (i * 13 + 5) % 256)
    val png = SimplePng.encode(img)
    assert(ImageHash.aHashPng(png).contains(ImageHash.aHash(img)))
    assert(ImageHash.aHashPng(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("non-multiple-of-8 dims are rejected loudly") {
    intercept[IllegalArgumentException](ImageHash.aHash(gray(15, 16, _ => 0)))
  }

  test("aHashPng honors its None-for-unhashable contract on valid non-x8 PNGs (r11)") {
    // a perfectly valid 100x50 PNG can't be exact-box-downsampled; the
    // orNull UDF wrapping aHashPng expects None, not a throw
    val png = SimplePng.encode(gray(100, 50, i => (i * 7) % 256))
    assert(SimplePng.decode(png).isDefined, "fixture must be a decodable PNG")
    assert(ImageHash.aHashPng(png).isEmpty)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-10 proofs for q46's adaptive band width.
  *
  * Fixed-width LSH banding has Θ(n²/2^b) candidate volume — a constant
  * 64-bucket space melted at sf1 (AbQ46: 20.5 s steady vs 4.2 s with
  * 8-bit bands, identical scheme). rpBandBits makes the width part of
  * the DEFINED semantics (min b in 4..8 with 125·2^b ≥ n, the q48
  * probe-pass regime, oracle-mirrored from count(*)), so this spec must
  * pin three things: the integer-exact width boundaries, the LCG
  * prefix property that keeps both gate scales byte-identical to the
  * round-4 16-plane semantics, and the end-to-end equivalence of the
  * adaptive query with an independently-computed fixed-4-bit reference
  * below the first boundary.
  */
class Q46AdaptiveSpec extends SparkSpec {

  test("rpBandBits: integer-exact boundaries, never a float log near the semantics") {
    assert(VectorQueries.rpBandBits(1L) === 4)
    assert(VectorQueries.rpBandBits(200L) === 4, "sf0.01 resolves to the old semantics")
    assert(VectorQueries.rpBandBits(2000L) === 4, "sf0.1 sits exactly on the 4-bit boundary")
    assert(VectorQueries.rpBandBits(2001L) === 5, "one row past the boundary widens the band")
    assert(VectorQueries.rpBandBits(20000L) === 8, "sf1 resolves to 8-bit bands")
    assert(VectorQueries.rpBandBits(32000L) === 8, "the old 8-bit regime's upper edge is unchanged")
    assert(VectorQueries.rpBandBits(60000L) === 9, "sf3 widens past the old ceiling (r16: 10x-on-3x-data knee)")
    assert(VectorQueries.rpBandBits(512000L) === 12)
    assert(VectorQueries.rpBandBits(10000000L) === 12, "past the 12-bit ceiling the width clamps (extend RpBitsMax to keep scaling)")
  }

  test("plane matrix is a prefix extension: rows 0..15 equal the round-4 16-plane constants") {
    // independent re-derivation of the original 16-row LCG stream — if
    // extending RpBitsMax had reseeded or reordered the stream, every
    // 4-bit-regime corpus (both gate scales) would silently change output
    var s = 715225739L
    def next(): Long = {
      s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s
    }
    val expected = Array.fill(16, 64)(if (((next() >>> 32) & 1L) == 1L) 1.0 else -1.0)
    for (b <- 0 until 16)
      assert(VectorQueries.Hyperplanes(b).toSeq === expected(b).toSeq,
        s"plane $b must be byte-identical to the 16-plane matrix")
  }

  test("q46 adaptive == fixed-4-bit reference below the first boundary") {
    import spark.implicits._
    // 60 crafted 64-dim embeddings in 3 clusters → n = 60 ≤ 2000 means
    // the adaptive width MUST resolve to 4 bits; the reference below
    // recomputes the full fixed-4-bit pipeline from first principles
    val rnd = new scala.util.Random(7)
    val clusters = Seq.fill(3)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 60).map { i =>
      val c = clusters(i % 3)
      val v = c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v)
    }
    val dir = Files.createTempDirectory("q46-adaptive").toString
    rows.toDF("vec_id", "embedding")
      .withColumn("label", lit("x"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = VectorQueries.defs.find(_.name == "q46_rplsh_neardup").get
      .fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // fixed-4-bit reference, driver-side
    def bit(v: Array[Float], plane: Array[Double]): Int = {
      var d = 0.0; var i = 0
      while (i < 64) { d += v(i) * plane(i); i += 1 }
      if (d >= 0) 1 else 0
    }
    val sigs = rows.map { case (id, v) =>
      id -> (0 until 16).map(b => bit(v, VectorQueries.Hyperplanes(b)))
    }.toMap
    def bandVal(bits: Seq[Int], j: Int): Int =
      bits(4 * j) * 8 + bits(4 * j + 1) * 4 + bits(4 * j + 2) * 2 + bits(4 * j + 3)
    val cand = (for {
      (a, _) <- rows; (b, _) <- rows if a < b
      if (0 until 4).exists(j => bandVal(sigs(a), j) == bandVal(sigs(b), j))
    } yield (a, b)).toSet
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < 64) { d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i); i += 1 }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val vecs = rows.toMap
    val expected = cand.toSeq
      .map { case (a, b) =>
        (a, b, BigDecimal(cos(vecs(a), vecs(b))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .filter(_._3 >= 0.4)
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty, "clustered fixture must produce near-dup pairs")
    assert(got === expected, "adaptive q46 must equal the fixed-4-bit reference in the 4-bit regime")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B harness that MOTIVATED q46's adaptive band width.
  *
  * Until round 10, q46's semantics were 16 sign-bit hyperplanes banded
  * 4×4 — a CONSTANT 64-bucket space, so raw candidates were Θ(n²/64)
  * (measured: 515k raw pairs at sf0.1 → 51.6M at sf1, max bucket 1795).
  * A q31-style bucket cap is the WRONG cure here: with 16 values per
  * band the mean sf1 bucket (~1250) already exceeds any sane cap, so
  * capping would empty the candidate set rather than trim a saturated
  * tail. This harness measured the width lever (4-bit 20.5 s steady at
  * sf1 vs 8-bit 4.2 s, 6-bit between) — the numbers behind
  * `VectorQueries.rpBandBits`, whose adaptive width is now the gated,
  * oracle-mirrored semantics. "registered" mode therefore now runs the
  * ADAPTIVE query; the fixed-width modes remain for re-measuring the
  * cliff.
  *
  * `sbt 'runMain graft.tools.AbQ46 /root/repo/testdata-sf1'`
  */
object AbQ46 {
  private val RpDim = 64

  /** Same LCG as VectorQueries' hyperplaneSigns, extended to `bits`
    * rows — a PREFIX extension: rows 0..15 equal the gated matrix. */
  private def signs(bits: Int): Array[Array[Double]] = {
    var s = 715225739L
    def next(): Long = {
      s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s
    }
    Array.fill(bits, RpDim)(if (((next() >>> 32) & 1L) == 1L) 1.0 else -1.0)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .appName("ab-q46").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q46] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // registered 4-bit shape, end-to-end like Bench
    val fn = graft.VectorQueries.defs.find(_.name == "q46_rplsh_neardup").get.fn
    for (rep <- 1 to 2) {
      tick(s"4-bit registered rep$rep")(
        fn(spark, dir).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }

    // wide-band variant: identical pipeline, 4 bands × `bitsPerBand` bits
    for (bitsPerBand <- Seq(6, 8)) {
      val bands = 4
      val planes = signs(bands * bitsPerBand)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val bitCols = (0 until bands * bitsPerBand).map { b =>
        (graft.functions.VectorKernels.dotFast(col("embedding"),
          planes(b)) >= 0).cast("int")
      }
      val withBits = e.select(col("vec_id"), col("embedding"),
        array(bitCols: _*).as("bits"))
      val bandCols = (0 until bands).map { j =>
        struct(lit(j).as("band_idx"),
          (0 until bitsPerBand).map(k =>
            element_at(col("bits"), j * bitsPerBand + k + 1) *
              (1 << (bitsPerBand - 1 - k))).reduce(_ + _).as("band_val"))
      }
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val banded = withBits
          .select(col("vec_id"), explode(array(bandCols: _*)).as("band"))
          .select(col("vec_id"),
            col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
          .persist()
        val a = banded.select(col("band_idx"), col("band_val"), col("vec_id").as("id_a"))
        val b = banded.select(col("band_idx"), col("band_val"), col("vec_id").as("id_b"))
        val cand = a.join(b, Seq("band_idx", "band_val"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .dropDuplicates("id_a", "id_b")
        val out = cand
          .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va")), Seq("id_a"))
          .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")), Seq("id_b"))
          .withColumn("score",
            round(graft.functions.VectorKernels.cosineFast(col("va"), col("vb")), 6))
          .filter(col("score") >= 0.4)
          .select(col("id_a"), col("id_b"), col("score"))
        val n = out.count()
        println(f"[q46] $bitsPerBand-bit rep$rep: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s, $n surviving pairs")
        banded.unpersist()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

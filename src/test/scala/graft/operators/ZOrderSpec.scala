package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def fileRanges(path: String): Seq[(Double, Double, Double, Double)] = {
    new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min($"x").cast("double"), max($"x").cast("double"),
            min($"y").cast("double"), max($"y").cast("double")).head()
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
  }

  test("zorder layout gives compact per-file ranges on BOTH dimensions; lexicographic does not") {
    // a 64x64 grid: x and y are independent, each uniform on 0..63
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/z"
    val lexDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/lex"
    ZOrder.layout(grid, 16, 64, "x", "y")
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(16, $"x", $"y").sortWithinPartitions($"x", $"y")
      .write.mode("overwrite").parquet(lexDir)

    def meanSpan(rs: Seq[(Double, Double, Double, Double)], dim: Char): Double = {
      val spans = rs.map { case (x0, x1, y0, y1) =>
        if (dim == 'x') (x1 - x0) / 63.0 else (y1 - y0) / 63.0
      }
      spans.sum / spans.size
    }
    val zr = fileRanges(zDir)
    val lr = fileRanges(lexDir)
    assert(zr.size > 4, s"expected multiple z files, got ${zr.size}")
    // 16 files over a 2-D z-curve → each file ≈ a 16x16 block: both
    // dimensions stay compact (≈25% of the domain; allow slop for
    // unaligned file splits)
    assert(meanSpan(zr, 'x') <= 0.5, s"x spans too wide: ${meanSpan(zr, 'x')}")
    assert(meanSpan(zr, 'y') <= 0.5, s"y spans too wide: ${meanSpan(zr, 'y')}")
    // lexicographic prunes x but every file spans (almost) all of y — the
    // failure mode zorder exists to fix
    assert(meanSpan(lr, 'x') <= 0.25)
    assert(meanSpan(lr, 'y') >= 0.9, s"lex y spans: ${meanSpan(lr, 'y')}")
    // same rows, just re-laid-out
    assert(spark.read.parquet(zDir).count() === 4096)
    assert(spark.read.parquet(zDir).agg(sum($"id")).head.getLong(0) ===
      grid.agg(sum($"id")).head.getLong(0))
  }

  test("zvalue interleaves bucket bits round-robin") {
    // two columns, 4 buckets each (2 bits): boundaries at 1,2,3 → bucket
    // = the value itself for v in 0..3; z = x bits at even positions, y
    // bits at odd
    val bounds = Seq("x" -> Array(1.0, 2.0, 3.0), "y" -> Array(1.0, 2.0, 3.0))
    val rows = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L)).toDF("x", "y")
    val got = rows.withColumn("z", ZOrder.zvalue(bounds))
      .select($"x", $"y", $"z").as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => ((x, y), z) }.toMap
    assert(got((0L, 0L)) === 0L)
    assert(got((3L, 0L)) === 5L)   // x=0b11 at z bits 0,2
    assert(got((0L, 3L)) === 10L)  // y=0b11 at z bits 1,3
    assert(got((3L, 3L)) === 15L)
    assert(got((1L, 2L)) === 9L)   // x bit0 -> z bit0; y bit1 -> z bit3
  }

  test("zorder refuses non-power-of-two buckets and single columns") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException](ZOrder.boundaries(df, Seq("x"), 16))
    intercept[IllegalArgumentException](ZOrder.boundaries(df, Seq("x", "y"), 100))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Round-11 verdict #2: q13 keeps the reference's J4 contract (the
  * within-label similarity matrix IS the output), so its cost is
  * Θ(Σ block²) with block sizes defined by the DATA. It cannot be
  * bounded without changing the contracted output — so it must REFUSE
  * loudly when a label block exceeds the cap (the SchemaGuard pattern
  * applied to data shape), instead of silently running a quadratic
  * flood at 100×. These tests prove the guard trips on a skewed-label
  * flood and stays silent on healthy block sizes.
  */
class Q13GuardSpec extends SparkSpec {
  import spark.implicits._

  private def frame(blocks: (String, Int)*) =
    blocks.flatMap { case (lbl, n) => (0 until n).map(i => (lbl, i.toLong)) }
      .toDF("label", "vec_id")

  test("a label block over the cap throws, naming the offender and the override knob") {
    val e = intercept[IllegalStateException] {
      VectorQueries.guardBlocks(frame("ok" -> 5, "flood" -> 13), cap = 10)
    }
    assert(e.getMessage.contains("q13 block guard"))
    assert(e.getMessage.contains("flood=13"), e.getMessage)
    assert(e.getMessage.contains("SPARK_GRAFT_Q13_BLOCK_CAP"), e.getMessage)
  }

  test("blocks at or under the cap pass silently") {
    VectorQueries.guardBlocks(frame("a" -> 10, "b" -> 3), cap = 10)
  }

  test("default cap clears the gate corpora with headroom but trips before a 100x block") {
    // sf1's worst block is 2,065 rows; the default must pass that
    // comfortably and refuse a 100x-skewed block (~200k) decisively.
    assert(VectorQueries.q13BlockCap >= 4 * 2065,
      "default cap must give the sf1 maximum block real headroom")
    assert(VectorQueries.q13BlockCap < 200000,
      "default cap must trip well before a 100x-scaled block")
  }

  test("q13 itself runs the guard: a crafted flood corpus is refused end to end") {
    val dir = java.nio.file.Files.createTempDirectory("q13-guard").toString
    val n = VectorQueries.q13BlockCap + 1
    spark.range(n)
      .select(col("id").as("vec_id"), lit("flood").as("label"),
        array(Seq.fill(4)(lit(0.1f)): _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      VectorQueries.defs.find(_.name == "q13_neardup_cosine").get.fn(spark, dir)
    }
    assert(e.getMessage.contains("q13 block guard"))
  }
}

package graft

import org.apache.spark.sql.functions._

/** The two `ExactPercentiles.ranked` regimes must be EXACTLY equivalent:
  * the bucketed shape (offs + local sorts, the >SmallSortRows path that
  * only sf1-scale data reaches in production) and the plain window shape
  * must assign identical (rn, n) to every row — ranks are counted, not
  * approximated, so the probe's boundary quality (r13: per-key merged
  * cuts, thinned to <= 31) may shift BUCKETS but never ranks. Also pins
  * the r13 probe-folded approx: the per-key value returned by
  * rankedWithApprox must equal a dedicated percentile_approx aggregate
  * at the same accuracy (same sketch → bit-identical), which is what let
  * q48 drop its separate full-corpus sketch pass.
  */
class ExactPercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def li = spark.read.parquet(s"$sf/lineitem.parquet")
    .select(col("l_returnflag"), col("l_extendedprice"))

  test("bucketed regime assigns identical (rn, n) to the window regime on every row") {
    val (win, _) = ExactPercentiles.rankedWithApprox(
      li, "l_returnflag", "l_extendedprice", 100, Long.MaxValue)
    val (buk, _) = ExactPercentiles.rankedWithApprox(
      li, "l_returnflag", "l_extendedprice", 100, 0L) // force bucketed
    // ties order arbitrarily WITHIN equal v, so compare the (key, v, rn)
    // relation as sorted sets — for every key the multiset of (v, rn)
    // must match exactly (equal v's get the same rank RANGE either way)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"), col("v"))
        .agg(count(lit(1)).as("cnt"), min(col("rn")).as("min_rn"),
          max(col("rn")).as("max_rn"), max(col("n")).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(t => (t._1, t._2))
    val (a, b) = (canon(win), canon(buk))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("high-cardinality grouping key fails loudly at the probe, before the driver collect") {
    val wide = spark.range(70000)
      .selectExpr("CAST(id AS STRING) AS k", "CAST(id AS DOUBLE) AS v")
    val e = intercept[IllegalArgumentException] {
      ExactPercentiles.rankedWithApprox(wide, "k", "v", 100)
    }
    assert(e.getMessage.contains("cardinality"), e.getMessage)
  }

  test("Par on a streaming frame keeps the unconditional spread instead of throwing at the probe") {
    val stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    val out = Par(stream) // pre-r13 behavior: plain repartition, no plan probe
    assert(out.isStreaming)
  }

  test("probe-folded approx equals a dedicated percentile_approx aggregate at the same accuracy") {
    val (_, approx) = ExactPercentiles.rankedWithApprox(
      li, "l_returnflag", "l_extendedprice", 1000, Long.MaxValue)
    val direct = li.filter(col("l_extendedprice").isNotNull)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.size === direct.size)
    approx.foreach { case (k, a) =>
      assert(a.isDefined && a.get === direct(k.asInstanceOf[String]),
        s"key $k: folded ${a} != direct ${direct(k.asInstanceOf[String])}")
    }
  }
}

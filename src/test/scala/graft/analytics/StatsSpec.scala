package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r11: graft.analytics.Stats had ZERO callers and zero coverage — the
  * avg_len null-deflation bug shipped precisely because nothing executed
  * it. These pins exercise every public method, including the null-text
  * case that exposed the defect.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("textLengthStats: avg over NON-null lengths, like min/max and the reference's pandas mean") {
    val df = Seq(Option("abcd"), Option("ab"), None).toDF("text")
    val r = Stats.textLengthStats(df).head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Int]("min_len") === 2)
    assert(r.getAs[Int]("max_len") === 4)
    assert(r.getAs[Double]("avg_len") === 3.0,
      "null text must be absent from the average, not counted as length 0")
  }

  test("distribution: ordered categorical counts") {
    val df = Seq("b", "a", "b", "c", "b").toDF("k")
    val got = Stats.distribution(df, "k").as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 1L), ("b", 3L), ("c", 1L)))
  }

  test("vectorElementStats: global min/max element and mean L2 norm") {
    val df = Seq(Seq(3.0, 4.0), Seq(-1.0, 0.0)).toDF("vector")
    val r = Stats.vectorElementStats(df).head()
    assert(r.getAs[Double]("min_elem") === -1.0)
    assert(r.getAs[Double]("max_elem") === 4.0)
    assert(math.abs(r.getAs[Double]("avg_norm") - 3.0) < 1e-12) // (5 + 1) / 2
    assert(r.getAs[Long]("n") === 2L)
  }
}

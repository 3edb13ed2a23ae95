package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedAvgSpec extends SparkSpec {
  import spark.implicits._

  test("weighted mean over integer cents is exact") {
    val wavg = udaf(WeightedAvg.centsAggregator)
    // prices 1.00, 2.00, 10.00 with weights 1, 3, 1 → (100 + 600 + 1000)/5 = 340 cents
    val df = Seq((100L, 1L), (200L, 3L), (1000L, 1L)).toDF("cents", "w")
    val got = df.agg(wavg($"cents", $"w")).as[Double].head()
    assert(got === 3.40)
  }

  test("zero total weight yields NaN, not a crash") {
    val wavg = udaf(WeightedAvg.centsAggregator)
    val df = Seq((100L, 0L), (200L, 0L)).toDF("cents", "w")
    assert(df.agg(wavg($"cents", $"w")).as[Double].head().isNaN)
  }

  test("partial/final merge equals single-pass result across partitions") {
    val wavg = udaf(WeightedAvg.centsAggregator)
    val rows = (1 to 1000).map(i => (i.toLong * 7L, (i % 5 + 1).toLong))
    val one = rows.toDF("cents", "w").coalesce(1).agg(wavg($"cents", $"w")).as[Double].head()
    val many = rows.toDF("cents", "w").repartition(13).agg(wavg($"cents", $"w")).as[Double].head()
    // long-pair buffer → order-independent, so bitwise equality is required
    assert(java.lang.Double.doubleToLongBits(one) === java.lang.Double.doubleToLongBits(many))
  }
}

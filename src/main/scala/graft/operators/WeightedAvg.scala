package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed aggregation (SURVEY.md §2.4 family): exact weighted mean
  * over integer cents.
  *
  * Demonstrates the Dataset `Aggregator` extension point (the preferred
  * Spark-native custom-aggregate tier: typed buffer, map-side partial
  * aggregation, codegen'd via ScalaUDAF) with arithmetic chosen for
  * cross-engine determinism — the buffer is a pair of longs, so partial
  * and final merges are exact and order-independent; only the final
  * division touches floating point, with both operands exactly
  * representable (sums stay far below 2^53).
  */
object WeightedAvg {

  final case class Buf(num: Long, den: Long)

  /** Input: (valueCents, weight) — both long. Output: weighted mean in
    * currency units (cents / 100), NaN on empty/zero-weight groups.
    */
  val centsAggregator: Aggregator[(Long, Long), Buf, Double] =
    new Aggregator[(Long, Long), Buf, Double] {
      def zero: Buf = Buf(0L, 0L)
      def reduce(b: Buf, a: (Long, Long)): Buf = Buf(b.num + a._1 * a._2, b.den + a._2)
      def merge(x: Buf, y: Buf): Buf = Buf(x.num + y.num, x.den + y.den)
      def finish(b: Buf): Double =
        if (b.den == 0L) Double.NaN else b.num.toDouble / b.den.toDouble / 100.0
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}

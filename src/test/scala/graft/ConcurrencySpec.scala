package graft

import org.apache.spark.sql.DataFrame
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Verify's dump pool runs MANY queries concurrently on ONE SparkSession,
  * and two query families mutate session conf for the duration of their
  * training windows (bpeTrain and logregTrain: AQE off, narrow shuffle
  * partitions) behind a shared JVM lock. The r11 review showed what an
  * unserialized window does (one trainer's finally restores mid-training
  * of the other, then the other's finally leaves TRAINING conf live for
  * the rest of the session); this spec pins the whole design end to end:
  * the four trainer queries plus a conf-sensitive relational query run
  * CONCURRENTLY, and every result must be row-identical to its serial
  * baseline — regardless of interleaving, because results are engineered
  * partition-independent and the conf windows serialize.
  */
class ConcurrencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val names = Seq("q117_logreg_quality", "q128_bpe_train",
    "q129_bpe_fertility", "q130_calibration", "q01_pricing_summary")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("trainer conf windows serialize: concurrent runs are row-identical to serial runs") {
    val serial = names.map(n => n -> rows(SparkEntry.queries(n)(spark, sf))).toMap
    // two full concurrent rounds so trainer/trainer AND trainer/relational
    // overlaps actually occur with high probability
    for (round <- 1 to 2) {
      val concurrent = Await.result(
        Future.traverse(names)(n =>
          Future(n -> rows(SparkEntry.queries(n)(spark, sf)))),
        Duration.Inf).toMap
      names.foreach { n =>
        assert(concurrent(n) === serial(n),
          s"round $round: $n diverged under concurrency")
      }
    }
    // the training windows must have restored the session conf
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") === "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4") // SparkSpec's pin
  }
}

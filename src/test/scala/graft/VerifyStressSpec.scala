package graft

import org.apache.spark.sql.DataFrame
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** The r17 driver gate flaked q130_calibration red (1 row vs 9) in a shape
  * NO spec exercised: Verify's 8-thread pool runs queries that persist()
  * the IDENTICAL logregFeatures plan (q117 + q130 dedupe onto ONE cache
  * entry — "Data has already been cached"), a periodic clearCache() fires
  * every 16 completions, and q130 returned a LAZY frame evaluated after
  * its `finally unpersist` had already dropped the shared entry. This
  * spec reproduces that harness shape deliberately and repeatedly:
  * q117+q130 (both persisting logregFeatures) + one BPE trainer (the
  * conf-lock interaction) run concurrently ×20 with a clearCache thread
  * firing throughout, and EVERY iteration's rows must equal the serial
  * baseline. This spec EARNED ITS KEEP in round 18: the first fix
  * (eager localCheckpoint of the `b.union(ece)` result) still collapsed
  * to 1 row once in 20 iterations under this hammering — the union's
  * ece branch re-reads the persisted bin frame while clearCache drops
  * it — which forced the race-immune-by-construction rewrite (ONE
  * bounded collect of the decile frame, ece computed in driver-side
  * integer arithmetic, a row-conservation require as the tripwire).
  */
class VerifyStressSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val names = Seq("q117_logreg_quality", "q130_calibration",
    "q128_bpe_train")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("Verify-shaped stress: shared-persist queries survive 20 concurrent rounds with clearCache interference") {
    val serial = names.map(n => n -> rows(SparkEntry.queries(n)(spark, sf))).toMap
    assert(serial("q130_calibration").size === 9,
      "baseline: 8 occupied decile bins at sf0.001 + 1 ece row — the flake collapsed this to 1")

    for (iter <- 1 to 20) {
      @volatile var queriesRunning = true
      // the interference thread: Verify clears every 16 completions; here
      // we clear continuously while the three queries are in flight so an
      // unlucky window is hit with near-certainty across 20 iterations
      val clearer = new Thread(() => {
        while (queriesRunning) {
          spark.catalog.clearCache()
          Thread.sleep(15)
        }
      })
      clearer.setDaemon(true)
      clearer.start()
      try {
        val concurrent = Await.result(
          Future.traverse(names)(n =>
            Future(n -> rows(SparkEntry.queries(n)(spark, sf)))),
          Duration.Inf).toMap
        names.foreach { n =>
          assert(concurrent(n).size === serial(n).size,
            s"iter $iter: $n row count diverged under clearCache " +
              s"interference; got:\n${concurrent(n).mkString("\n")}")
          assert(concurrent(n) === serial(n),
            s"iter $iter: $n rows diverged under clearCache interference")
        }
      } finally {
        queriesRunning = false
        clearer.join()
      }
    }
  }
}

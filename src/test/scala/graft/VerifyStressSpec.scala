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

  /** r18 verdict #6 + advice: the q130 class proved this harness shape
    * finds races specs don't, and the heaviest shared-helper surface
    * left is the minhashBands family (q27/q49/q140/q144/q145 all consume
    * the shared band frames through the release-thunk pattern) plus the
    * other multi-branch persisted-frame readers the r18 advice named
    * (q141's grp feeds ranked+tot; q146's toks/exptf read multiply). */
  private val bandFamily = Seq("q27_minhash_lsh", "q49_dedup_clusters",
    "q140_cluster_split", "q144_curation_funnel", "q145_fuzzy_decontam",
    "q141_code_switch", "q146_prf_expand")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** Run `qs` concurrently `iters` times under a continuous clearCache
    * hammer, asserting every iteration reproduces the serial baseline. */
  private def stress(qs: Seq[String], iters: Int,
                     baselineCheck: Map[String, Seq[String]] => Unit = _ => ()): Unit = {
    val serial = qs.map(n => n -> rows(SparkEntry.queries(n)(spark, sf))).toMap
    baselineCheck(serial)
    for (iter <- 1 to iters) {
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
          Future.traverse(qs)(n =>
            Future(n -> rows(SparkEntry.queries(n)(spark, sf)))),
          Duration.Inf).toMap
        qs.foreach { n =>
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

  test("Verify-shaped stress: shared-persist queries survive 20 concurrent rounds with clearCache interference") {
    stress(names, 20, serial =>
      assert(serial("q130_calibration").size === 9,
        "baseline: 8 occupied decile bins at sf0.001 + 1 ece row — the flake collapsed this to 1"))
  }

  test("Verify-shaped stress: the minhashBands family and multi-branch persisted readers survive 20 concurrent rounds with clearCache interference") {
    stress(bandFamily, 20, serial =>
      bandFamily.foreach(n => assert(serial(n).nonEmpty,
        s"baseline: $n returned no rows at sf0.001 — the stress compare would be vacuous")))
  }

  /** r20: the collection-persist family (q41/q42/q148/q154 share the
    * scan+embed persist shape; q157 composes the funnel base persist,
    * the q157-tagged minhashBands, AND mid-fn localCheckpoints) — these
    * run concurrently in Verify's pool, so the `_q` cache-identity tags
    * must keep one query's release from dropping blocks under another
    * (the r17 logregFeatures flake class), and an evicted cache must
    * recompute identically. */
  private val ragPersistFamily = Seq("q41_rag_answer", "q42_rag_eval",
    "q148_rag_eval_audit", "q154_rag_answer_audit", "q157_curation_dag")

  test("Verify-shaped stress: the collection-persist RAG family and the q157 funnel survive 12 concurrent rounds with clearCache interference") {
    stress(ragPersistFamily, 12, serial =>
      ragPersistFamily.foreach(n => assert(serial(n).nonEmpty,
        s"baseline: $n returned no rows at sf0.001 — the stress compare would be vacuous")))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Cross-query consistency: q144's funnel counts must cohere with the
  * independently oracle-gated q20 (exact dedup) and q49 (near-dup
  * clusters) on the REAL driver corpus — not just on constructed specs.
  * These invariants hold for ANY corpus, so they re-run meaningfully
  * when the driver regenerates testdata between rounds.
  */
class FunnelConsistencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def q(name: String) = QueryRegistry.all.find(_.name == name).get

  private lazy val funnel = q("q144_curation_funnel").fn(spark, sf).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("totals cover the corpus and stages only shrink") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(funnel.map(_._2).sum == docs)
    funnel.foreach { case (src, tot, qual, exact, near) =>
      assert(tot >= qual && qual >= exact && near <= exact,
        s"$src: monotone per-source stages (cross-source reps can only " +
          "reduce near below exact)")
    }
  }

  test("exact stage agrees with q20: a dup-free corpus drops nothing there") {
    val exactDups = q("q20_dedup_exact").fn(spark, sf).count()
    if (exactDups == 0L)
      funnel.foreach { case (src, _, qual, exact, _) =>
        assert(exact == qual, s"$src: no exact dups => exact stage is pass-through")
      }
  }

  test("near-dup stage agrees with q49: drops are bounded by clustered docs") {
    val clusters = q("q49_dedup_clusters").fn(spark, sf)
      .select(col("doc_id"), col("cluster_id")).cache()
    val clustered = clusters.count()
    val components = clusters.select(col("cluster_id")).distinct().count()
    val dropped = funnel.map(f => f._4 - f._5).sum
    assert(dropped >= 0L && dropped <= clustered,
      s"funnel dropped $dropped near-dups but only $clustered docs are clustered")
    // when NOTHING left the pipeline before the near stage (all docs
    // quality, no exact dups), keep-best retains exactly one doc per
    // component: dropped == clustered - components, an exact tie to q49
    val allQuality = funnel.forall(f => f._2 == f._3)
    val noExactDups = q("q20_dedup_exact").fn(spark, sf).count() == 0L
    if (allQuality && noExactDups)
      assert(dropped == clustered - components,
        s"expected ${clustered - components} keep-best drops, got $dropped")
  }
}

package graft

import org.apache.spark.sql.functions._

/** q136_cluster_sample: the cluster-balanced eval-set draw. The oracle
  * pins exact rows; this spec pins the sampling CONTRACT — every
  * non-empty learned cluster is represented, ranks are contiguous and
  * capped, members really belong to the cluster the trained quantizer
  * assigns them to, and the draw is deterministic.
  */
class ClusterSampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val q = QueryRegistry.all.find(_.name == "q136_cluster_sample").get
  private lazy val out = q.fn(spark, sf).cache()

  /** One shared training run for the ground-truth assignment —
    * trainedKMeans is deliberately un-memoized (each call pays Lloyd's),
    * so per-test re-derivation would triple the suite's training work
    * (r16 review). */
  private lazy val truth = {
    val (qf, cents) = VectorQueries.trainedKMeans(spark, sf)
    graft.vector.IvfKMeans.assignCells(qf, "qv", cents, VectorQueries.KmScale)
      .select(col("vec_id"), col("cell").as("true_cell")).cache()
  }

  test("every non-empty cluster is represented, with contiguous ranks capped at 5") {
    val shape = out.groupBy("cell")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"),
        min(col("rnk")).as("mn"), countDistinct(col("vec_id")).as("nd"))
      .collect()
    // the trained quantizer seeds >= KmK cells; tiny fixtures may leave
    // some empty, but the draw must cover all that are not
    assert(shape.nonEmpty)
    shape.foreach { r =>
      val (n, mx, mn, nd) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n <= 5L && mx === n && mn === 1L && nd === n,
        s"cell ${r.get(0)}: n=$n mx=$mx mn=$mn distinct=$nd")
    }
    // balanced by construction: no cluster exceeds the cap while another
    // non-empty one is unrepresented (representation == appearing at all)
    val cells = shape.map(_.get(0)).toSet
    val assignedCells =
      truth.select(col("true_cell")).distinct().collect().map(_.get(0)).toSet
    assert(cells === assignedCells, "sample must cover every non-empty cluster")
  }

  test("sampled members belong to the cluster the trained quantizer assigns them to") {
    val wrong = out.join(truth, Seq("vec_id"))
      .filter(col("cell") =!= col("true_cell")).count()
    assert(wrong === 0L)
  }

  test("the draw is deterministic across executions") {
    val again = q.fn(spark, sf)
    assert(out.exceptAll(again).count() === 0L)
    assert(again.exceptAll(out).count() === 0L)
  }
}

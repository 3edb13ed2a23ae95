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

  // ── sample-trained production twin (r16 verdict #4) ──────────────────
  // The gate trains Lloyd's on the full corpus to stay oracle-exact; the
  // stated 100 TB shape trains on a SAMPLE and assigns map-only. These
  // tests execute that mode (trainedKMeans trainFrac=0.1) on a seeded
  // STRUCTURED corpus — the ClusteredRecallSpec argument: IID-random
  // embeddings are the no-structure worst case where any two k-means
  // runs legitimately disagree, so they detect collapse but gate no
  // quality; real corpora have cluster structure, which is what a 10%
  // sample must recover for the mode to be production-usable.

  private val Dim = 64
  private val Clusters = 20
  private val PerCluster = 100

  private lazy val structDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-clustersample").toString
    val rnd = new scala.util.Random(1711)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val a = Array.fill(Dim, 8)(rnd.nextGaussian())
    def lift(z: Array[Double]): Array[Double] =
      Array.tabulate(Dim) { dd =>
        var s = 0.0; var i = 0
        while (i < 8) { s += a(dd)(i) * z(i); i += 1 }; s
      }
    val centers = Array.fill(Clusters)(
      unit(lift(Array.fill(8)(rnd.nextGaussian()))))
    import spark.implicits._
    (0 until Clusters * PerCluster).map { id =>
      val c = centers(id % Clusters)
      // tighter intra-cluster spread than ClusteredRecallSpec's 0.35:
      // that spec WANTS blurred clusters (so PQ recall doesn't collapse
      // to tie order); this one gates co-assignment purity, which needs
      // clusters a correct quantizer can actually keep together (0.35
      // measured purity 0.46 even for the FULL train — the geometry,
      // not the trainer)
      val spread = lift(Array.fill(8)(rnd.nextGaussian() * 0.15))
      val v = Array.tabulate(Dim)(dd =>
        c(dd) + spread(dd) / math.sqrt(Dim.toDouble) + rnd.nextGaussian() * 0.02)
      (id.toLong, unit(v).map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val fullTrained = {
    val (qf, cents) = VectorQueries.trainedKMeans(spark, structDir)
    (graft.vector.IvfKMeans.assignCells(qf, "qv", cents, VectorQueries.KmScale)
      .select(col("vec_id"), col("cell"), col("dist6")).cache(), cents)
  }
  private lazy val sampleTrained = {
    val (qf, cents) =
      VectorQueries.trainedKMeans(spark, structDir, trainFrac = 0.1, seed = 17L)
    (graft.vector.IvfKMeans.assignCells(qf, "qv", cents, VectorQueries.KmScale)
      .select(col("vec_id"), col("cell"), col("dist6")).cache(), cents)
  }

  test("sample-trained mode: the draw covers every non-empty cell, ranks contiguous and capped") {
    val draw = VectorQueries.clusterDraw(sampleTrained._1, 5)
    val shape = draw.groupBy("cell")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"), min(col("rnk")).as("mn"))
      .collect()
    shape.foreach { r =>
      assert(r.getLong(1) <= 5L && r.getLong(2) === r.getLong(1) && r.getLong(3) === 1L,
        s"cell ${r.get(0)}")
    }
    val drawn = shape.map(_.get(0)).toSet
    val assigned = sampleTrained._1.select(col("cell")).distinct()
      .collect().map(_.get(0)).toSet
    assert(drawn === assigned,
      "the per-cluster draw must cover every cell the sample-trained quantizer assigns")
  }

  test("sample-trained mode: bounded cell skew") {
    val sizes = sampleTrained._1.groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val mean = sizes.sum.toDouble / sizes.length
    val skew = sizes.max / mean
    info(f"sample-trained cells=${sizes.length} max=${sizes.max} mean=$mean%.1f skew=$skew%.2fx")
    // 8 learned cells over 20 equal true clusters: a perfectly balanced
    // quantizer reads 1.0-1.5x (cells hold 2-3 true clusters); a
    // sample-starved one collapses clusters into one giant cell
    assert(skew <= 3.0, f"cell skew $skew%.2fx — sample-trained quantizer is collapsing")
  }

  /** Centroid-matched label agreement between two assignments: map each
    * left-centroid to its nearest right-centroid, then the fraction of
    * vectors landing in the matched cell. Reported, not gated — see the
    * control test below for why. */
  private def labelAgreement(left: (org.apache.spark.sql.DataFrame, Seq[(Long, Seq[Double])]),
                             right: (org.apache.spark.sql.DataFrame, Seq[(Long, Seq[Double])])): Double = {
    def sq(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val mapping = left._2.map { case (sid, sv) =>
      sid -> right._2.minBy { case (_, fv) => sq(sv, fv) }._1
    }.toMap
    val mapExpr = typedLit(mapping)
    val joined = left._1.select(col("vec_id"), mapExpr(col("cell")).as("mapped"))
      .join(right._1.select(col("vec_id"), col("cell").as("r_cell")), Seq("vec_id"))
    joined.filter(col("mapped") === col("r_cell")).count().toDouble / joined.count()
  }

  /** Mean same-true-cluster co-assignment: for each generated cluster
    * (vec_id % Clusters), the probability two of its members share a
    * learned cell. THE quality measure for a coarse quantizer over
    * structured data — unlike label agreement it is invariant to WHICH
    * clusters a k=8 quantizer merges into a cell. */
  private def truthPurity(asg: org.apache.spark.sql.DataFrame): Double = {
    val tbl = asg
      .withColumn("truth", pmod(col("vec_id"), lit(Clusters.toLong)))
      .groupBy(col("truth"), col("cell")).agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getLong(0))
    val per = tbl.map { case (_, rows) =>
      val ns = rows.map(_.getLong(2))
      val tot = ns.sum
      ns.map(n => n * (n - 1)).sum.toDouble / (tot * (tot - 1))
    }
    per.sum / per.size
  }

  test("sample-trained quantizer matches full-train QUALITY: distortion and truth-pair purity") {
    // distortion: mean squared distance to the assigned centroid — the
    // quantity Lloyd's minimizes and the standard justification for
    // sample-training an IVF (FAISS trains on samples): a 10% trainer
    // must quantize the FULL corpus nearly as tightly as the full train
    val fullD = fullTrained._1.agg(avg(col("dist6"))).head().getDouble(0)
    val sampD = sampleTrained._1.agg(avg(col("dist6"))).head().getDouble(0)
    info(f"distortion full=$fullD%.4g sample=$sampD%.4g ratio=${sampD / fullD}%.3f")
    assert(sampD <= fullD * 1.15,
      f"sample-trained distortion ${sampD / fullD}%.3fx the full train")
    // purity: members of the same TRUE cluster must co-assign — the
    // property that makes the per-cluster draw a stratified sample of
    // the corpus's real structure
    val fullP = truthPurity(fullTrained._1)
    val sampP = truthPurity(sampleTrained._1)
    info(f"truth-pair purity full=$fullP%.3f sample=$sampP%.3f")
    // floors with measured headroom: full train reads 0.899 here (a
    // 2-round k=8 quantizer over 20 clusters legitimately straddles a
    // few boundaries), sample 0.825; a collapsed/blurred trainer reads
    // ~0.40 (the 0.35-spread measurement above)
    assert(sampP >= 0.75, f"sample-trained purity $sampP%.3f")
    assert(sampP >= fullP - 0.10,
      f"sample purity $sampP%.3f trails full purity $fullP%.3f by > 0.10")
  }

  test("sample-vs-full label agreement is bounded by k-means seeding multimodality, not by the sample (control)") {
    // The naive gate — "sample assignment == full assignment after
    // centroid matching" — measured 0.496 while building this spec. The
    // CONTROL shows why that is not a sample defect: with nlist=8 cells
    // over 20 true clusters there are many equally-good ways to merge
    // clusters into cells, and WHICH merge Lloyd's lands in follows the
    // initialization. Two DIFFERENT half-sample trainings (same size,
    // different seeds) disagree with each other in the same band — so
    // the sample adds no disagreement beyond reseeding, which is the
    // production question for trainFrac. Quality (distortion, purity)
    // is gated above; the agreement numbers are recorded for SCALE.md.
    val svf = labelAgreement(sampleTrained, fullTrained)
    val halfA = {
      val (qf, cents) =
        VectorQueries.trainedKMeans(spark, structDir, trainFrac = 0.5, seed = 101L)
      (graft.vector.IvfKMeans.assignCells(qf, "qv", cents, VectorQueries.KmScale)
        .select(col("vec_id"), col("cell"), col("dist6")), cents)
    }
    val halfB = {
      val (qf, cents) =
        VectorQueries.trainedKMeans(spark, structDir, trainFrac = 0.5, seed = 202L)
      (graft.vector.IvfKMeans.assignCells(qf, "qv", cents, VectorQueries.KmScale)
        .select(col("vec_id"), col("cell"), col("dist6")), cents)
    }
    val control = labelAgreement(halfA, halfB)
    info(f"label agreement sample-vs-full=$svf%.3f; half-vs-half control=$control%.3f")
    // the sample-vs-full agreement must not sit far BELOW the seeding
    // noise floor the control establishes — that gap, not the absolute
    // number, would indicate the 10% trainer is learning different
    // geometry rather than a different merge
    assert(svf >= control - 0.15,
      f"sample-vs-full $svf%.3f far below the $control%.3f seeding-noise control")
  }
}

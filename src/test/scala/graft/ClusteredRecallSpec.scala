package graft

import org.apache.spark.sql.functions._

/** Recall gates for the quantized ANN tier on a STRUCTURED corpus
  * (verdict-r12 #5). The driver's embeddings.parquet is IID random — the
  * documented worst case for product quantization (no correlation for
  * subspace codebooks to exploit), so `VectorQueriesSpec`'s q86 number
  * (0.26 @ recall@5, chance 0.10) detects collapse but gates no quality.
  * Real embedding corpora are topic-clustered with low intrinsic
  * dimension — where PQ earns its memory win — so this spec builds a
  * seeded Gaussian-mixture corpus in the production schema
  * (vec_id, embedding float[64]), writes it as a temp `embeddings.parquet`
  * table, and runs the REGISTERED q45/q86/q88 pipelines over it
  * unchanged, asserting literature-grade floors vs exact ground truth.
  *
  * Geometry: 20 well-separated cluster centers on the unit sphere, 20
  * members each (center + sigma=0.05 noise, L2-normalized). Queries are
  * the pipelines' own convention (vec_id < 10), assigned to 10 distinct
  * clusters; ids interleave clusters (vec_id % 20) so the codebook seed
  * rows (first PqK/nlist ids) span distinct clusters.
  */
class ClusteredRecallSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val Clusters = 20
  private val PerCluster = 20

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-clustered").toString
    val rnd = new scala.util.Random(421)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(Clusters)(unit(Array.fill(Dim)(rnd.nextGaussian())))
    val rows = (0 until Clusters * PerCluster).map { id =>
      val c = centers(id % Clusters)
      val v = unit(c.zip(Array.fill(Dim)(rnd.nextGaussian() * 0.05)).map { case (a, b) => a + b })
      (id.toLong, v.map(_.toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val vecs: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

  /** Exact top-5 by squared L2 in the pipelines' ×1e6-quantized space
    * (the metric q86/q88 approximate), excluding the query itself. */
  private def exactTop5Sq(qid: Long): Set[Long] = {
    val q = vecs.find(_._1 == qid).get._2.map(v => math.floor(v * 1e6 + 0.5))
    vecs.filter(_._1 != qid)
      .map { case (nid, nv) =>
        var s = 0.0; var i = 0
        val n2 = nv.map(v => math.floor(v * 1e6 + 0.5))
        while (i < q.length) { val d = q(i) - n2(i); s += d * d; i += 1 }
        (nid, s)
      }.sortBy { case (nid, d) => (d, nid) }.take(5).map(_._1).toSet
  }

  /** Exact top-5 by cosine on raw floats (q45's metric). */
  private def exactTop5Cos(qid: Long): Set[Long] = {
    val q = vecs.find(_._1 == qid).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    vecs.filter(_._1 != qid)
      .map { case (nid, nv) => (nid, cos(q, nv)) }
      .sortBy { case (nid, s) => (-s, nid) }.take(5).map(_._1).toSet
  }

  private def recallAt5(name: String, exact: Long => Set[Long]): Double = {
    val got = SparkEntry.queries(name)(spark, dir)
      .select($"qid", $"nid").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(got.size === 10, s"$name returned ${got.size} query groups")
    val rs = got.map { case (qid, top) =>
      val e = exact(qid)
      e.intersect(top).size.toDouble / e.size
    }
    val mean = rs.sum / rs.size
    info(f"$name recall@5 on clustered corpus = $mean%.2f over ${rs.size} queries")
    mean
  }

  test("q45 SQ8 on a clustered corpus: recall@5 >= 0.9 vs exact cosine") {
    assert(recallAt5("q45_sq8_ann", exactTop5Cos) >= 0.9)
  }

  test("q86 flat PQ/ADC on a clustered corpus: recall@5 >= 0.7 vs exact L2") {
    // Jégou TPAMI'11 reports >=0.7 recall regimes on structured (SIFT/GIST)
    // data at comparable code budgets; IID-random measured only 0.26
    assert(recallAt5("q86_pq_adc", exactTop5Sq) >= 0.7)
  }

  test("q88 IVF_PQ on a clustered corpus: recall@5 >= 0.6 vs exact L2") {
    // q88 adds the coarse nprobe=2 filter on top of PQ error, so its floor
    // sits below flat PQ's; misses here are probe misses, not code collapse
    assert(recallAt5("q88_ivfpq", exactTop5Sq) >= 0.6)
  }
}

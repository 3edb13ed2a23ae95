package graft

import org.apache.spark.sql.functions._

class VectorQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q45: SQ8 reconstruction error is bounded by half a quantization step") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // same staged quantize/reconstruct shape as q45_sq8_ann
    val checked = e
      .withColumn("mn", array_min(col("embedding")).cast("double"))
      .withColumn("scale",
        (array_max(col("embedding")).cast("double") - col("mn")) / 255.0)
      .withColumn("codes", transform(col("embedding").cast("array<double>"),
        v => floor((v - col("mn")) / col("scale") + 0.5)))
      .withColumn("recon", transform(col("codes"), c => col("mn") + col("scale") * c))
      .withColumn("max_err",
        aggregate(zip_with(col("embedding").cast("array<double>"), col("recon"),
          (a, b) => abs(a - b)), lit(0.0), (acc, x) => greatest(acc, x)))
      // codes must land in the int8-addressable range
      .withColumn("code_ok",
        aggregate(col("codes"), lit(true),
          (acc, c) => acc && c >= 0.0 && c <= 255.0))
    val bad = checked
      .filter(!col("code_ok") || col("max_err") > col("scale") * 0.5 + lit(1e-12))
    assert(bad.isEmpty)
    assert(checked.count() > 0)
  }

  test("q45: HOF cosine fuses to the CosineSim kernel under KernelRewrite") {
    val plan = VectorQueries.defs.find(_.name == "q45_sq8_ann").get
      .fn(spark, "/root/testdata/sf0.001").queryExecution.analyzed
    val after = graft.functions.KernelRewrite(plan)
    // the cosine sits in a mid-plan Project, so walk every node
    val fused = after.collect { case node =>
      node.expressions.flatMap(_.collect { case c: graft.functions.CosineSim => c })
    }.flatten
    assert(fused.nonEmpty)
  }

  test("q45: quantized top-1 neighbor usually agrees with exact top-1") {
    val sf = "/root/testdata/sf0.001"
    val sq8 = VectorQueries.defs.find(_.name == "q45_sq8_ann").get.fn(spark, sf)
      .filter($"rnk" === 1L).select($"qid", $"nid".as("sq8_nid"))
    val exact = VectorQueries.defs.find(_.name == "q11_ann_topk").get.fn(spark, sf)
      .filter($"rnk" === 1L).select($"qid", $"nid".as("exact_nid"))
    val joined = sq8.join(exact, "qid")
    val agree = joined.filter($"sq8_nid" === $"exact_nid").count()
    val total = joined.count()
    assert(total === 10)
    // 8-bit quantization on 64-dim vectors keeps cosine ordering almost
    // always; deterministic data makes this a fixed, not flaky, number
    assert(agree >= total * 8 / 10, s"SQ8 top-1 recall too low: $agree/$total")
  }

  test("q86: PQ/ADC recall@5 vs exact L2 is reported and bounded") {
    // Regression tripwire for the PQ pipeline (Jégou TPAMI'11): ADC ranks
    // by table-lookup distance over 4 per-subspace codebooks; compare
    // against exact squared L2 in the same quantized space. Context for
    // the bound: this corpus is IID random — the documented WORST case
    // for PQ (no correlation structure for subspace codebooks to exploit,
    // so quantization residual dominates; measured 0.26 at k=16, and
    // k=32 does not improve it). Chance recall is 5/49 ≈ 0.10 and a
    // broken codebook/code/table path measures at or below that, so the
    // tripwire detects COLLAPSE, not quality — real embedding corpora
    // with low intrinsic dimension are where PQ earns its 16× memory
    // win. The oracle-checked gate already pins exact arithmetic.
    val sf = "/root/testdata/sf0.001"
    val pq = VectorQueries.defs.find(_.name == "q86_pq_adc").get.fn(spark, sf)
      .select($"qid", $"nid").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6 + 0.5)).toArray)
    val byId = vecs.toMap
    def sqdist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val recalls = pq.map { case (qid, pqTop) =>
      val qv = byId(qid)
      val exact = vecs.filter(_._1 != qid)
        .sortBy { case (nid, nv) => (sqdist(qv, nv), nid) }
        .take(5).map(_._1).toSet
      exact.intersect(pqTop).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ/ADC recall@5 (4 subspaces × 16 codes, IID-random corpus) = $mean%.2f over ${recalls.size} queries (chance ≈ 0.10)")
    assert(recalls.size === 10)
    assert(mean >= 0.15, f"PQ recall collapsed to chance: $mean%.2f")
  }
}

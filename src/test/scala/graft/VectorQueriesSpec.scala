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
}

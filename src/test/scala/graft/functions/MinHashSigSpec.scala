package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("fused kernel equals the per-permutation HOF formulation") {
    val perms = XHash.permParams(16)
    val df = Seq(
      Seq(5L, 123456L, 999999999L),
      Seq(42L),
      (1L to 200L).toSeq
    ).toDF("h31")
    val viaKernel = df.select(MinHashSig($"h31", 16).as("sig")).as[Seq[Long]].collect()
    val hofCols = perms.map { case (a, b) =>
      array_min(transform($"h31", h => XHash.permute(h, a, b)))
    }
    val viaHof = df.select(array(hofCols: _*).as("sig")).as[Seq[Long]].collect()
    viaKernel.zip(viaHof).foreach { case (k, h) => assert(k === h) }
  }

  test("empty array yields null (matches array_min-over-empty)") {
    val r = Seq(Seq.empty[Long]).toDF("h31").select(MinHashSig($"h31", 4)).head()
    assert(r.isNullAt(0))
  }

  test("runs inside whole-stage codegen when fed a staged attribute") {
    // (a) literal input constant-folds to LocalTableScan; (b) an inline
    // transform(...) child is a non-codegen HOF that breaks the stage —
    // real usage (q25/q27) feeds a STAGED h31 column across an exchange,
    // so the kernel's projection codegens on its own
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("h31", transform($"embedding", x => x.cast("long")))
      .repartition(2)
    val q = e.select(MinHashSig($"h31", 4).as("s"))
    q.collect() // AQE: codegen stages appear only in the FINAL plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains(") Project [minhash_sig") && plan.contains("*("), plan)
  }
}

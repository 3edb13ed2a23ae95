package graft

import org.apache.spark.sql.functions._

/** The batched-superstep BPE trainer must be indistinguishable from the
  * one-merge-per-barrier trainer: same merge table (order, counts,
  * token audits) and same final tokenization. `maxBatch = 1` IS the
  * sequential trainer (the selection loop admits exactly the argmax),
  * so equality across maxBatch settings pins the batching rule — on a
  * corpus crafted to stress every clause: self-pair overlap runs
  * (`a a a a`), chained conflicts (the top pair's tokens reappearing in
  * the runner-up), and merges whose minted token immediately forms a
  * hot new pair. */
class BpeBatchSpec extends SparkSpec {

  private def corpusDir(): String = {
    import spark.implicits._
    // doc 0/4/8: "a a a a" runs (leftmost-greedy keeps ceil(run/2));
    // "b c" dominates; "c d" conflicts with it; "e f" disjoint;
    // repeated "b c b c" so the minted b_c token forms (b_c, b_c) pairs
    val texts = Seq(
      "b c b c b c e f a a a a a",
      "b c d e f g h b c e f",
      "c d c d b c a a a a",
      "e f e f b c d g h x y",
      "b c b c e f c d a a",
      "x y x y b c e f g h",
      "a a a b c c d e f x y",
      "b c e f b c d c d g h")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bpebatch").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("batched supersteps ≡ one-merge-per-barrier on overlap/conflict runs") {
    val dir = corpusDir()
    for (target <- Seq(6, 12); batch <- Seq(16, 32)) {
      val (seqMerges, seqToks) =
        CurationQueries.bpeTrain(spark, dir, target = target, maxBatch = 1)
      val (batMerges, batToks) =
        CurationQueries.bpeTrain(spark, dir, target = target, maxBatch = batch)
      assert(batMerges === seqMerges,
        s"target=$target batch=$batch: merge tables diverge\nseq: $seqMerges\nbat: $batMerges")
      val a = seqToks.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      val b = batToks.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      assert(a === b, s"target=$target batch=$batch: final tokenizations diverge")
      seqToks.unpersist(); batToks.unpersist()
    }
  }

  test("certified-chain batching ≡ sequential on a hot-shared-token corpus") {
    // The r11 simulation's reason to exist: the count-ordered prefix is a
    // CHAIN of pairs sharing one hot token ((the,quick), (the,brown), …),
    // which the r10 disjointness rule cut at size 1. Sequential equality
    // here exercises the exact-decrease path: left-shared chains (decrease
    // 0), right-side consumers ((w,the) losing #(w,the,·) sites), the
    // reversed pair (poisoned via the dirty guard), and a self-run block.
    import spark.implicits._
    val texts = Seq(
      "the quick the brown the slow the fast the quick the brown",
      "of the quick of the brown of the slow on the quick",
      "the quick brown the quick slow the brown fast q q q q",
      "on the quick the the quick the of of the brown the",
      "the quick the quick the brown the slow of the fast on",
      "quick the brown the slow the of the quick the brown q q")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bpechain").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (target <- Seq(8, 16)) {
      val (seqMerges, seqToks) =
        CurationQueries.bpeTrain(spark, dir, target = target, maxBatch = 1)
      val (batMerges, batToks) =
        CurationQueries.bpeTrain(spark, dir, target = target, maxBatch = 32)
      assert(batMerges === seqMerges,
        s"target=$target: merge tables diverge\nseq: $seqMerges\nbat: $batMerges")
      val a = seqToks.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      val b = batToks.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      assert(a === b, s"target=$target: final tokenizations diverge")
      seqToks.unpersist(); batToks.unpersist()
    }
  }

  test("batching actually batches: 32 sample merges need far fewer than 32 supersteps") {
    val sf = "/root/testdata/sf0.001"
    val steps = new java.util.concurrent.atomic.AtomicInteger(0)
    val (merges, toks) = CurationQueries.bpeTrain(spark, sf,
      sampleOnly = true, target = CurationQueries.BpeSampleMerges,
      supersteps = Some(steps))
    toks.unpersist()
    assert(merges.length === CurationQueries.BpeSampleMerges)
    assert(steps.get() <= CurationQueries.BpeSampleMerges / 2,
      s"${steps.get()} supersteps for ${merges.length} merges — batching is not batching")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Randomized equality fence for the r11 certified-chain BPE batch
  * simulation — the riskiest driver-side logic in the trainer. The
  * simulation admits CONFLICTING merges by maintaining exact pair
  * counts from snapshot neighbor-triples, with conservative poisoning
  * for every staleness channel; its soundness argument is written in
  * prose in bpeTrain. This spec checks the only thing that matters —
  * batched ≡ one-merge-per-barrier — on seeded RANDOM corpora drawn
  * from a tiny alphabet, which maximizes exactly the hazards the
  * crafted BpeBatchSpec corpora enumerate by hand: reversed pairs,
  * self-runs, chained hot tokens, merges whose minted token immediately
  * pairs, and tie-breaks (small alphabets collide counts constantly, so
  * the (c, x, y) ordering is exercised for real).
  *
  * The end-of-training token audit inside bpeTrain independently
  * cross-checks every applied-occurrence count on each run.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    // alphabet of 5 letters; short docs; heavy repetition → hot shared
    // tokens, runs ('c c c'), and count ties everywhere
    val letters = Vector("a", "b", "c", "d", "e")
    val texts = (0 until 12).map { _ =>
      (0 until (4 + rnd.nextInt(14)))
        .map(_ => letters(rnd.nextInt(letters.length))).mkString(" ")
    }
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"s${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory(s"bpeprop$seed").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("batched ≡ sequential on seeded random small-alphabet corpora") {
    for (seed <- Seq(1, 7, 13, 20260814)) {
      val dir = corpus(seed)
      val target = 10
      val (seqMerges, seqToks) =
        CurationQueries.bpeTrain(spark, dir, target = target, maxBatch = 1)
      val (batMerges, batToks) =
        CurationQueries.bpeTrain(spark, dir, target = target, maxBatch = 32)
      assert(batMerges === seqMerges,
        s"seed=$seed: merge tables diverge\nseq: $seqMerges\nbat: $batMerges")
      val a = seqToks.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      val b = batToks.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
      assert(a === b, s"seed=$seed: final tokenizations diverge")
      seqToks.unpersist(); batToks.unpersist()
    }
  }
}

package graft

import java.nio.file.Files

/** q155_ngram_decontam: exact 13-gram decontamination vs the pseudo-
  * holdout (doc_id % 10 = 7). The defining property vs q145's fuzzy
  * pass: a VERBATIM 13-token benchmark span inside an otherwise-novel
  * doc flags exactly once, while a 12-token overlap — one token short
  * of the window — stays clean, regardless of how much of the doc is
  * novel (Jaccard would read both as ~0). Also pins the eligibility
  * convention (sub-13-token docs absent from every count) and that
  * clean docs still count into n_checked/n_grams.
  */
class NgramDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def toks(tag: String, n: Int) =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-decontam-").toFile
    d.deleteOnExit()
    val bench = (0 until 20).map(i => s"h$i") // the holdout doc's tokens
    val rows = Seq(
      // the benchmark doc (7 % 10 = 7): 20 tokens → 8 distinct 13-grams
      (7L, bench.mkString(" "), "bench"),
      // corpus doc embedding EXACTLY the holdout's first 13 tokens, then
      // unique tail → precisely ONE colliding 13-gram (h0..h12); the
      // window at position 1 already mixes in u0 and misses
      (0L, (bench.take(13) ++ (0 until 7).map(i => s"u$i")).mkString(" "), "web"),
      // 12-token overlap — one short of the window → clean
      (1L, (bench.take(12) ++ (0 until 8).map(i => s"v$i")).mkString(" "), "web"),
      // fully novel 20-token doc → clean, still counted
      (2L, toks("w", 20), "web"),
      // 12 tokens → no 13-gram → ineligible, absent from every count
      (3L, toks("x", 12), "web"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("verbatim 13-token span flags once; 12-token overlap stays clean; short docs drop") {
    val rows = SparkEntry.queries("q155_ngram_decontam")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // web: docs 0,1,2 eligible (doc 3 short); 8 grams each (20 tokens);
    // doc 0 dirty with exactly 1 collision
    assert(rows("web") === ((3L, 24L, 1L, 1L, 0.333333)))
    // the holdout source has no non-holdout docs → absent entirely
    assert(!rows.contains("bench"))
    assert(rows.size === 1)
  }

  test("broadcast gate fallback (r20 verdict #4): over-cap holdout shuffle-joins, same rows") {
    // the size gate must actually bind: with the cap at 0 the holdout
    // gram set may NOT broadcast (a corpus-derived split at 100 TB
    // outgrows the driver), the join degrades to a shuffle — and the
    // answer is bit-identical to the broadcast path
    val expected = SparkEntry.queries("q155_ngram_decontam")(spark, dir)
      .collect().map(_.toSeq).toSeq
    // cap=0 suppresses the HINT; auto-broadcast must be off too or the
    // planner re-broadcasts the (locally tiny) holdout on size estimates
    // — at 100 TB those estimates are what keep the corpus-derived split
    // out of the driver, so the fallback under test is the join shape
    // with BOTH paths closed
    spark.conf.set("spark.graft.broadcastMaxRows", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      PlanProbe.setEnabled(true)
      val got = try {
        val df = SparkEntry.queries("q155_ngram_decontam")(spark, dir)
        val rows = df.collect().map(_.toSeq).toSeq
        val inner = PlanProbe.get("q155_ngram_decontam")
          .getOrElse(fail("q155 must probe its pre-checkpoint plan"))
        assert(!inner.contains("BroadcastHashJoin"),
          "cap=0 must suppress the holdout broadcast hint:\n" + inner.take(3000))
        assert(inner.contains("SortMergeJoin") || inner.contains("ShuffledHashJoin"),
          "the fallback must be a shuffle join, not a nested loop:\n" + inner.take(3000))
        rows
      } finally PlanProbe.setEnabled(false)
      assert(got === expected)
    } finally {
      spark.conf.unset("spark.graft.broadcastMaxRows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}

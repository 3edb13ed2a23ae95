package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}

/** r19 verdict #2: the one-frame-multi-read audit queries must execute
  * their corpus stage ONCE at runtime — a claim their scaladocs made via
  * AQE stage reuse or the release-thunk persist, but which nothing
  * asserted (ExplainDump's static dumps show the duplicated branches
  * whether or not runtime reuse dedupes them; if it silently fails to
  * fire, a query pays 2-4× redundant corpus tokenization at 100 TB).
  *
  * This spec measures the ground truth: after running each query on a
  * counted corpus, it walks the executed plan (through query stages,
  * reused exchanges, and cached-relation bodies — PlanWalk), collects
  * every FileSourceScanExec over documents.parquet, dedupes by object
  * REFERENCE (a reused stage holds the SAME scan node; a re-executed
  * duplicate branch holds a structurally-equal but distinct one), and
  * sums their `numOutputRows` metrics. That total is exactly
  * (runtime corpus passes) × N — no plan-string heuristics.
  *
  * Expected passes per query (the design claims being pinned):
  *  - q149/q152: 1 — the r20 release-thunk persist computes the
  *    segment/gram frame once (their two aggregation branches key
  *    differently, so AQE stage reuse provably cannot dedupe them);
  *  - q154: 1 — answerBatch's four collection branches (cosine leg,
  *    BM25 stats, BM25 tf, context join-back) read one persisted
  *    scan+embed;
  *  - q153: 1 — the (ph, source) partial-aggregate exchange is
  *    canonically identical in both its consumers (the grp rollup and
  *    the flag join), so AQE runtime stage reuse dedupes it — measured
  *    here, not assumed;
  *  - q156: 1 — same mechanism: all four branches read the one
  *    distinct-(source, h) exchange;
  *  - q155: 2 — the two passes are DISJOINT work (complementary
  *    doc_id % 10 filters of the pseudo-holdout stand-in), not
  *    redundancy: each doc is tokenized once; with a real benchmark-
  *    sized holdout table the corpus side is a single pass by
  *    construction (see the q155 scaladoc).
  */
class StageReuseSpec extends SparkSpec {
  import spark.implicits._

  private val NDocs = 600L

  /** 40 tokens per doc (≥ 32 so every doc is q153-eligible, ≥ 13 so
    * 13-gram shingles are non-empty), 3 sources. EVERY branch of every
    * measured query must produce rows on this corpus: AQE's
    * empty-relation propagation REWRITES the final plan around an
    * empty stage, dropping the already-executed subtree (and its scan
    * metrics) from the walk — an empty branch under-counts passes (the
    * debugging finding behind this fixture). So: a stopword suffix
    * keeps the q157 quality stage non-empty, every 10th doc shares one
    * text (exact/near-dup families and LSH pairs exist), and docs
    * ≡ 4 (mod 10) carry a 13-token run shared with the ≡ 7 holdout
    * docs (the decontam branches flag someone). */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-reuse-").toFile
    d.deleteOnExit()
    val shared = (0 until 36).map(i => s"shared$i").mkString(" ") + " the of and a"
    val runR = (0 until 13).map(i => s"hr$i").mkString(" ")
    val rows = (0L until NDocs).map { id =>
      val text =
        if (id % 10 == 3) shared
        else if (id % 10 == 4 || id % 10 == 7)
          runR + " " + (0 until 23).map(i => s"d${id}t$i").mkString(" ") + " the of and a"
        else (0 until 36).map(i => s"d${id}t$i").mkString(" ") + " the of and a"
      (id, text, "en", s"s${id % 3}", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  /** Runs the query probed; lazy frames are forced by collect() (the
    * persist-discipline queries already materialized inside fn). Returns
    * every execution that carried the run's work — the main frame plus
    * any mid-fn materializations probed under `name#<sub>` keys. */
  private def runProbed(name: String): Seq[QueryExecution] = {
    PlanProbe.setEnabled(true)
    try {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val tree = PlanProbe.getExecutionTree(name)
      if (tree.nonEmpty) tree else Seq(df.queryExecution)
    } finally PlanProbe.setEnabled(false)
  }

  /** (distinct executed corpus scans, total rows they emitted) across
    * every execution of the run — reference-dedup spans them, so a
    * cached scan read by several executions counts once. */
  private def corpusScanRows(qes: Seq[QueryExecution]): (Int, Long) = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val scans = qes.flatMap(qe => PlanWalk.all(qe.executedPlan)).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => f
    }.filter(seen.add)
    (scans.size, scans.map(_.metrics("numOutputRows").value).sum)
  }

  private def assertPasses(name: String, expected: Long): Unit = {
    def once(): (Int, Long) = {
      spark.catalog.clearCache() // a stale cache would hide a scan entirely
      corpusScanRows(runProbed(name))
    }
    val first = once()
    // Spark does not synchronize cache population across one job's
    // independent stages: branches racing on a freshly-persisted frame
    // can compute a partition twice before its block lands, inflating
    // the row total spuriously (r20 advice). An OVER-count gets one
    // retry — a reproducible over-count is a real duplicated branch and
    // still fails; an UNDER-count fails immediately (a missing pass is
    // never a race artifact).
    val (nScans, rows) =
      if (first._2 > expected * NDocs) once() else first
    assert(rows === expected * NDocs,
      s"$name: $rows corpus rows read across $nScans executed scans — " +
        s"expected exactly $expected pass(es) × $NDocs docs; a higher " +
        "count means a duplicated branch re-executed (stage reuse or the " +
        "persist failed to dedupe it)" +
        (if (first._2 != rows) s" [reproduced after retry; first read ${first._2}]" else ""))
  }

  test("q149_boilerplate reads the corpus once (persisted segment frame)") {
    assertPasses("q149_boilerplate", 1L)
  }

  test("q152_ngram_novelty reads the corpus once (persisted gram frame)") {
    assertPasses("q152_ngram_novelty", 1L)
  }

  test("q153_prefix_cache reads the corpus once (AQE stage reuse on the (ph, source) exchange)") {
    assertPasses("q153_prefix_cache", 1L)
  }

  test("q154_rag_answer_audit reads the corpus once (persisted scan+embed behind four branches)") {
    assertPasses("q154_rag_answer_audit", 1L)
  }

  test("q155_ngram_decontam reads the corpus exactly twice (disjoint holdout/corpus passes — stand-in shape)") {
    assertPasses("q155_ngram_decontam", 2L)
  }

  test("q156_source_overlap reads the corpus once (AQE stage reuse on the distinct-(source, h) exchange)") {
    assertPasses("q156_source_overlap", 1L)
  }

  test("q42_rag_eval reads the corpus once (persisted scan+embed; the QA frame derives from the same cache)") {
    assertPasses("q42_rag_eval", 1L)
  }

  test("q148_rag_eval_audit reads the corpus once (persisted scan+embed; QA from the same cache)") {
    assertPasses("q148_rag_eval_audit", 1L)
  }

  test("q144_curation_funnel reads the corpus once (LSH labels derive from the persisted quality base)") {
    // r21: lshClusterLabels used to re-scan documents.parquet for its
    // shingle frame; q144's base already holds (doc_id, text) in cache,
    // so the label stage now derives from it — one parquet pass total
    // (the #edges probe exposes the materialization that carries it)
    assertPasses("q144_curation_funnel", 1L)
  }

  test("q157_curation_dag reads the corpus exactly twice (funnel base + holdout grams; LSH derives from the base pass)") {
    // two DISTINCT per-doc projections, each computed once behind its
    // own persist: the funnel base (metrics+fingerprint+13-gram AND
    // 3-gram shingles over the non-holdout split) and the holdout gram
    // set. r21 (verdict #2): the LSH stage no longer re-scans the
    // corpus — its shingles ride the base pass and only the stage-3
    // SURVIVORS are minhashed/banded (was 3 passes, with the bands pass
    // shingling holdout + already-dropped docs it could never use)
    assertPasses("q157_curation_dag", 2L)
  }
}

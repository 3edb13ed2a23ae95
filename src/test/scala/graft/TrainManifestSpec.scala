package graft

import org.apache.spark.sql.functions._

/** q137/q138/q139 — the round-17 training-manifest family. The oracles
  * pin exact rows over the gate corpus; this spec pins the CONTRACTS a
  * loader relies on (boundary offsets that tile the sequence, budgets
  * that fill minimally, a leak guard that actually fires) including the
  * paths the gate corpus cannot exercise (cross-split duplicates).
  */
class TrainManifestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String, dir: String = sf) =
    QueryRegistry.all.find(_.name == name).get.fn(spark, dir)

  // ── q137 pack manifest ────────────────────────────────────────────

  test("q137: bounds tile each sequence — strictly positive steps ending at seq_toks, n_docs entries") {
    val rows = run("q137_pack_manifest")
      .select("source", "seq_id", "n_docs", "seq_toks", "pad_toks", "bounds")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, seqToks, pad) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val bounds = r.getString(5).split(",").map(_.toLong)
      assert(bounds.length === nDocs, s"${r.get(0)}/${r.get(1)}: bounds count")
      assert(bounds.last === seqToks, s"${r.get(0)}/${r.get(1)}: last bound")
      // end offsets strictly increase (gate docs are all non-empty)
      bounds.sliding(2).foreach { case Array(a, b) => assert(a < b); case _ => }
      assert(pad === math.max(256L - seqToks, 0L))
    }
  }

  test("q137: one manifest row per q126 sequence, token totals agree") {
    val packed = run("q126_seq_pack")
    val manifest = run("q137_pack_manifest")
    val fromPacked = packed.groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("p_n_docs"), sum(col("n_tok")).as("p_toks"))
    val mismatch = manifest.join(fromPacked, Seq("source", "seq_id"), "full")
      .filter(col("n_docs").isNull || col("p_n_docs").isNull ||
        col("n_docs") =!= col("p_n_docs") ||
        col("seq_toks") =!= col("p_toks"))
      .count()
    assert(mismatch === 0L)
  }

  // ── q138 token budget ─────────────────────────────────────────────

  test("q138: each source's selection fills its tail budget minimally, in shard-major hash order") {
    val sel = run("q138_token_budget").collect()
      .groupBy(_.getString(0))
    val quotas = run("q127_mix_resample")
      .select("source", "tail_toks").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    quotas.foreach { case (source, tail) =>
      val picked = sel.getOrElse(source, Array.empty)
      if (tail == 0L) assert(picked.isEmpty, s"$source: tail=0 must select nothing")
      else {
        val byCum = picked.sortBy(_.getLong(4))
        val toks = byCum.map(_.getLong(3))
        assert(toks.sum >= tail, s"$source: budget not filled")
        // minimal prefix: without the boundary-crossing doc (the LAST in
        // cum order) the selection is under budget
        assert(toks.sum - toks.last < tail, s"$source: over-selected")
        // cum_toks is the gapless running sum from zero — the selection
        // really is the PREFIX of the shard-major order
        var acc = 0L
        byCum.foreach { r =>
          acc += r.getLong(3)
          assert(r.getLong(4) === acc, s"$source: cum_toks chain broken")
        }
      }
    }
  }

  test("q138: deterministic across executions") {
    val a = run("q138_token_budget")
    val b = run("q138_token_budget")
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  // ── q139 split + leak guard ───────────────────────────────────────

  test("q139: split proportions near 80/10/10, assignment deterministic, gate corpus leak-free") {
    val out = run("q139_split_leakguard").cache()
    val n = out.count().toDouble
    val frac = out.groupBy("split").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
    // hash-bucket split on ~200 docs: generous bands around 0.8/0.1/0.1
    assert(frac("train") > 0.70 && frac("train") < 0.90, frac.toString)
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac("val") < 0.20, frac.toString)
    assert(frac.getOrElse("test", 0.0) > 0.03 && frac("test") < 0.20, frac.toString)
    assert(out.filter(col("leaked") =!= 0L).count() === 0L,
      "the gate corpus has no cross-split exact duplicates")
    val again = run("q139_split_leakguard")
    assert(out.exceptAll(again).count() === 0L)
  }

  test("q139: the leak guard FIRES on an injected cross-split duplicate and stays quiet within-train") {
    // build a corpus where doc A (train) and doc B (val/test) share text,
    // and two other TRAIN docs share text (a dup that is NOT leakage) —
    // bucket values are fixed by hash60('split:'||doc_id), so probe ids
    // until we find ids landing in the wanted splits
    import spark.implicits._
    val probe = spark.range(0, 500)
      .select(col("id").as("doc_id"),
        pmod(graft.functions.XHash.hash60(
          concat(lit("split:"), col("id").cast("string"))), lit(100L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = probe.filter(_._2 < 80L).keys.toSeq.sorted
    val evalIds = probe.filter(_._2 >= 80L).keys.toSeq.sorted
    assert(trainIds.size >= 3 && evalIds.nonEmpty)
    val d = java.nio.file.Files.createTempDirectory("graft-leak").toString
    Seq(
      (trainIds(0), "the shared leaked text"),
      (evalIds(0), "the shared leaked text"),  // cross-split dup -> leak
      (trainIds(1), "train only duplicate"),
      (trainIds(2), "train only duplicate"),   // within-train dup -> fine
      (evalIds(1), "unique eval text")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = run("q139_split_leakguard", d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(evalIds(0))._1 != "train" && out(evalIds(0))._2 === 1L,
      "cross-split duplicate must flag")
    assert(out(trainIds(1))._2 === 0L && out(trainIds(2))._2 === 0L,
      "within-train duplicates are not leakage")
    assert(out(evalIds(1))._2 === 0L, "unique eval text is clean")
    assert(out(trainIds(0))._2 === 0L, "train rows never flag")
  }
}

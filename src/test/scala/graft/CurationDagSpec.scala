package graft

import java.nio.file.Files
import graft.functions.XHash

/** q157_curation_dag — the end-to-end funnel (r19 verdict #6), on a
  * corpus engineered so every stage drops a KNOWN set of docs, with each
  * stage's drop count reconciled against the STANDALONE query that owns
  * that stage's machinery (q95 quality, q20 exact dedup, q27 LSH pairs,
  * q155 decontam). The near-dup docs differ only by punctuation — same
  * token stream (LSH jaccard 1.0, candidate GUARANTEED by identical
  * minhash signatures) but different raw text (fingerprints differ, so
  * they survive exact dedup) — and the exact-dup family tests the
  * survivor-restriction semantics: its members are LSH-identical too,
  * but only the canonical survives quality+exact-dedup, so the
  * restricted edge set must NOT re-drop it at near-dedup. Quota and
  * split hashes are re-derived driver-side from the shared md5-prefix
  * primitive.
  */
class CurationDagSpec extends SparkSpec {
  import spark.implicits._

  private val Suffix = "the of and a" // 4 stopword tokens → stop_hits ≥ 2
  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"${tag}w$i").mkString(" ")
  private val RunR = (0 until 13).map(i => s"hr$i").mkString(" ") // shared 13-gram

  /** 50 docs, holdout = {7,17,27,37,47}. Engineered drops:
    * quality {1,2} (10 tokens), exact dedup {4,5} (text identical to 3),
    * near dedup {9,22} (punctuation twins of 8/20), decontam {12,13}
    * (carry RunR, shared with holdout doc 7). Everyone else: 40-token
    * unique quality-passing docs. */
  private lazy val fixture: (String, Map[Long, Int], Set[Long]) = {
    val d = Files.createTempDirectory("graft-dag-").toFile
    d.deleteOnExit()
    val dupText = uniq("dup", 36) + " " + Suffix
    def text(id: Long): String = id match {
      case 1 | 2   => uniq(s"lq$id", 10)
      case 3 | 4 | 5 => dupText
      case 7       => RunR + " " + uniq("h7", 23) + " " + Suffix
      case 9       => (uniq("p8", 36) + " " + Suffix).replaceFirst(" ", ", ")
      case 8       => uniq("p8", 36) + " " + Suffix
      case 22      => (uniq("p20", 36) + " " + Suffix).replaceFirst(" ", ", ")
      case 20      => uniq("p20", 36) + " " + Suffix
      case 12 | 13 => RunR + " " + uniq(s"c$id", 23) + " " + Suffix
      case _       => uniq(s"d$id", 36) + " " + Suffix
    }
    val holdout = Set(7L, 17L, 27L, 37L, 47L)
    val drops = Set(1L, 2L, 4L, 5L, 9L, 22L, 12L, 13L)
    val survivors = (0L until 50L).filterNot(holdout).filterNot(drops)
    assert(survivors.size == 37)
    // 19/18 split keeps quota vacuous: cap = ceil(37/2) = 19 ≥ both
    val srcOf = survivors.zipWithIndex
      .map { case (id, i) => id -> (if (i < 19) "sa" else "sb") }.toMap
    val rows = (0L until 50L).map { id =>
      val t = text(id)
      (id, t, "en", srcOf.getOrElse(id, if (id % 2 == 0) "sa" else "sb"),
        t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    val nTokens = (0L until 50L).map { id =>
      id -> (id match { case 1 | 2 => 10; case _ => 40 })
    }.toMap
    (d.getAbsolutePath, nTokens, survivors.toSet)
  }

  /** Driver-side twin of XHash.hash60 (the shared md5-prefix primitive). */
  private def hash60(s: String): Long =
    XHash.md5Prefix60(XHash.Md5.get.digest(s.getBytes("UTF-8")))

  test("q157: every stage drops exactly its engineered set; counts reconcile with q95/q20/q27/q155") {
    val (dir, nTok, survivors) = fixture
    val out = SparkEntry.queries("q157_curation_dag")(spark, dir)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap

    def toks(ids: Iterable[Long]): Long = ids.map(nTok(_).toLong).sum
    val nonHold = (0L until 50L).filterNot(Set(7L, 17L, 27L, 37L, 47L))
    assert(out("ingest") === ((45L, toks(nonHold))))
    val s2 = nonHold.filterNot(Set(1L, 2L))
    assert(out("quality") === ((43L, toks(s2))))
    val s3 = s2.filterNot(Set(4L, 5L))
    assert(out("exact_dedup") === ((41L, toks(s3))))
    // the exact-dup canonical (3) is LSH-identical to its dropped
    // twins, but survivor-restricted edges must not re-drop it here
    val s4 = s3.filterNot(Set(9L, 22L))
    assert(out("near_dedup") === ((39L, toks(s4))))
    val s5 = s4.filterNot(Set(12L, 13L))
    assert(out("decontam") === ((37L, toks(s5))))
    assert(s5.toSet === survivors)
    // quota vacuous by construction (19/18 ≤ cap 19)
    assert(out("quota") === ((37L, toks(s5))))
    val valIds = s5.filter(id => hash60(s"split:$id") % 20 == 0)
    assert(out("split_val") === ((valIds.size.toLong, toks(valIds))))
    assert(out("split_train") ===
      ((37L - valIds.size, toks(s5) - toks(valIds))))

    // ── cross-query reconciliation: each stage against its owner ──
    val q95 = SparkEntry.queries("q95_gopher_rules")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(nonHold.count(q95(_) == 1L).toLong === out("quality")._1)

    val q20 = SparkEntry.queries("q20_dedup_exact")(spark, dir).collect()
    assert(q20.length === 1 && q20.head.getLong(1) === 3L &&
      q20.head.getLong(2) === 3L, "exactly the engineered 3-way dup family")
    assert(out("quality")._1 - out("exact_dedup")._1 === q20.head.getLong(1) - 1)

    val q27 = SparkEntry.queries("q27_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q27 === Set((3L, 4L), (3L, 5L), (4L, 5L), (8L, 9L), (20L, 22L)))
    // restricted to s3 survivors, only (8,9) and (20,22) remain → 2 drops
    assert(out("exact_dedup")._1 - out("near_dedup")._1 === 2L)

    val q155 = SparkEntry.queries("q155_ngram_decontam")(spark, dir).collect()
    assert(q155.map(_.getLong(3)).sum === 2L, "q155 flags exactly the two RunR carriers")
    assert(out("near_dedup")._1 - out("decontam")._1 === 2L)
  }

  test("q157 broadcast gate fallback (r20 verdict #4): over-cap holdout shuffle-joins, identical funnel") {
    val (dir, _, _) = fixture
    val expected = SparkEntry.queries("q157_curation_dag")(spark, dir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.broadcastMaxRows", "0")
    try {
      val got = SparkEntry.queries("q157_curation_dag")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got === expected)
    } finally spark.conf.unset("spark.graft.broadcastMaxRows")
  }

  test("q157 quota stage: oversized source thins to the hash predicate exactly; small source keeps all") {
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("graft-dag-quota-").toFile
    d.deleteOnExit()
    // 27 quality-passing unique docs (holdout 7/17/27 excluded from the
    // funnel): sa = 18 docs (> cap), sb = 9 (≤ cap); cap = ceil(27/2) = 14
    val rows = (0L until 30L).map { id =>
      val t = uniq(s"q$id", 36) + " " + Suffix
      (id, t, "en", if (id < 20) "sa" else "sb", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    val out = SparkEntry.queries("q157_curation_dag")(spark, d.getAbsolutePath)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("decontam") === 27L)
    val sa = (0L until 20L).filterNot(Set(7L, 17L))
    val expectedSa = sa.count(id =>
      (hash60(s"mix:$id") % 1000000L) * 18L < 14L * 1000000L)
    assert(expectedSa < 18, "the fixture must actually thin sa")
    assert(out("quota") === expectedSa.toLong + 9L)
  }
}

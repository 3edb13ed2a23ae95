package graft

import java.nio.file.Files

/** q144_curation_funnel: sequential-stage survivorship. The oracle gate
  * pins exact rows at sf0.01 (where the corpus has no exact dups, so the
  * exact stage is pass-through); this spec constructs a corpus where
  * EVERY stage bites and the two subtle semantics are exercised: a
  * low-quality cluster MINIMUM must not steal keep-best from surviving
  * members, and a cross-source cluster credits its single survivor to
  * the representative's source.
  */
class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): IndexedSeq[String] =
    (0 until n).map(j => s"$prefix$j")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-funnel-").toFile
    d.deleteOnExit()
    val dupText = words("dup", 40).mkString(" ")
    def variant(prefix: String, m: Int): String =
      words(prefix, 40).updated(20, s"var$m").mkString(" ")
    val rows = Seq(
      // srcA ---------------------------------------------------------
      (1L, "a b c", "srcA"),                       // <5 tokens: dies at quality
      (2L, dupText, "srcA"),                       // exact dup pair: 2 kept,
      (3L, dupText, "srcA"),                       //   3 dies at exact stage
      // near-dup trio labeled by min id 10 — but 10 itself dies at
      // quality (punctuation appended; tokens unchanged, so it still
      // CLUSTERS with 11/12): keep-best must fall to 11
      (10L, variant("q", 0) + " " + ("!" * 80), "srcA"),
      (11L, variant("q", 1), "srcA"),
      (12L, variant("q", 2), "srcA"),
      (20L, variant("x", 0), "srcA"),              // cross-source pair rep
      // srcB ---------------------------------------------------------
      (21L, variant("x", 1), "srcB"),              // loses to rep 20 in srcA
      (30L, words("s30w", 40).mkString(" "), "srcB"),
      (31L, words("s31w", 40).mkString(" "), "srcB"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private def q(name: String) = QueryRegistry.all.find(_.name == name).get

  test("the construction clusters as intended") {
    val labels = q("q49_dedup_clusters").fn(spark, dir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(labels == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L,
      12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("every stage bites and the per-source funnel is exact") {
    val got = q("q144_curation_funnel").fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // srcA: 7 docs; quality drops 1 (short) and 10 (punct); exact drops 3
    // (dup of 2); near keeps 2 (its cluster's sole survivor), 11
    // (keep-best after the low-quality minimum died upstream), and 20
    // (cross-source rep beats 21 from srcB)
    assert(got("srcA") == ((7L, 5L, 4L, 3L)))
    // srcB: 3 docs, all quality, no exact dups; 21 lost to srcA's rep
    assert(got("srcB") == ((3L, 3L, 3L, 2L)))
  }
}

package graft

import java.nio.file.Files

/** q145_fuzzy_decontam: two-sided near-dup join against the held-out set.
  * The oracle gate pins exact rows at sf0.01; this spec pins the JOIN
  * SIDEDNESS on a constructed corpus — paraphrase and verbatim leaks into
  * the holdout are flagged, while near-dup pairs living entirely inside
  * the corpus (q27's job) or entirely inside the holdout are NOT.
  */
class FuzzyDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): IndexedSeq[String] =
    (0 until n).map(j => s"$prefix$j")
  private def variant(prefix: String, m: Int): String =
    words(prefix, 40).updated(20, s"var$m").mkString(" ")

  // holdout = doc_id % 10 == 7
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-decontam-").toFile
    d.deleteOnExit()
    val verbatim = words("verb", 40).mkString(" ")
    val rows = Seq(
      (101L, variant("leak", 0), "srcA"),  // corpus: paraphrase of 107
      (107L, variant("leak", 1), "srcA"),  // holdout twin — must flag
      (201L, verbatim, "srcA"),            // corpus: verbatim copy of 207
      (207L, verbatim, "srcA"),            // holdout twin — must flag (jac 1)
      (301L, variant("intra", 0), "srcB"), // near-dups BOTH in corpus:
      (302L, variant("intra", 1), "srcB"), //   q27's business, not q145's
      (317L, variant("hold", 0), "srcB"),  // near-dups BOTH in holdout:
      (327L, variant("hold", 1), "srcB"),  //   not a training leak either
      (400L, words("solo", 40).mkString(" "), "srcB"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val out = QueryRegistry.all.find(_.name == "q145_fuzzy_decontam")
    .get.fn(spark, dir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("paraphrase and verbatim leaks into the holdout are flagged") {
    assert(out.map(p => (p._1, p._2)).toSet == Set((101L, 107L), (201L, 207L)))
    val verbatimJac = out.find(_._1 == 201L).get._3
    assert(verbatimJac == 1.0)
    assert(out.forall(_._3 >= 0.5))
  }

  test("the join is SIDED: intra-corpus and intra-holdout near-dups stay out") {
    val ids = out.flatMap(p => Seq(p._1, p._2)).toSet
    assert(!ids.contains(301L) && !ids.contains(302L),
      "corpus-internal near-dups are q27's output, not contamination")
    assert(!ids.contains(317L) && !ids.contains(327L),
      "holdout-internal near-dups are not a training leak")
  }
}

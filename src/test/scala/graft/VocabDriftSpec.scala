package graft

import java.nio.file.Files

/** q147_vocab_drift: per-term Jensen-Shannon drift attribution between
  * corpus halves. The oracle gate pins exact rows at sf0.01; this spec
  * pins the ARITHMETIC on a corpus engineered for exact expectations:
  * a term replaced wholesale between halves (the mover), its mirror
  * image (same contribution by JSD symmetry — the tie must break
  * lexically), and a balanced background term (contribution exactly 0).
  */
class VocabDriftSpec extends SparkSpec {
  import spark.implicits._

  // ids 0..9 → old = {0..4} (2·id ≤ 9), new = {5..9}; each doc 10 tokens:
  // old docs say alpha, new docs say beta, everyone says bg
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-drift-").toFile
    d.deleteOnExit()
    val rows = (0 until 10).map { i =>
      val main = if (i <= 4) "alpha" else "beta"
      val t = (Seq.fill(5)(main) ++ Seq.fill(5)("bg")).mkString(" ")
      (i.toLong, t, "en", "srcA", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val out = QueryRegistry.all.find(_.name == "q147_vocab_drift")
    .get.fn(spark, dir).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("movers rank first; the balanced term contributes exactly zero") {
    assert(out.length == 3)
    val byTerm = out.map(r => r._2 -> r).toMap
    assert(byTerm("bg")._5 == 0L, "equal counts over equal totals: p = q")
    assert(byTerm("alpha")._5 > 0L && byTerm("beta")._5 > 0L)
    assert(byTerm("bg")._1 == 3L)
  }

  test("JSD symmetry: mirror-image movers tie, lexical tiebreak orders them") {
    val byTerm = out.map(r => r._2 -> r).toMap
    assert(byTerm("alpha")._5 == byTerm("beta")._5,
      "swap p and q: the contribution is symmetric")
    assert(byTerm("alpha")._1 == 1L && byTerm("beta")._1 == 2L)
  }

  test("half assignment and counts are exact") {
    val byTerm = out.map(r => r._2 -> r).toMap
    assert(byTerm("alpha")._3 == 25L && byTerm("alpha")._4 == 0L)
    assert(byTerm("beta")._3 == 0L && byTerm("beta")._4 == 25L)
    assert(byTerm("bg")._3 == 25L && byTerm("bg")._4 == 25L)
  }
}

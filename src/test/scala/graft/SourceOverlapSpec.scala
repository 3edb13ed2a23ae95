package graft

import java.nio.file.Files

/** q156_source_overlap: cross-source content-overlap matrix. Pins the
  * set semantics on a constructed corpus: shared-gram counts are
  * DISTINCT-gram counts (a gram repeated in many docs of a source
  * counts once), the containment fraction divides by the SMALLER side,
  * disjoint source pairs emit no row, and sub-width docs contribute
  * nothing.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def toks(tag: String, n: Int, from: Int = 0) =
    (from until from + n).map(i => s"$tag${i}").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-overlap-").toFile
    d.deleteOnExit()
    val shared = toks("s", 9) // 9 tokens → 5 distinct 5-grams
    val rows = Seq(
      // srcA: the shared block + a unique tail (block repeated in TWO
      // docs — distinctness must collapse it to 5 grams once)
      (0L, s"$shared ${toks("a", 9)}", "srcA"),
      (1L, s"$shared ${toks("b", 9)}", "srcA"),
      // srcB: the same shared block, its own tail
      (2L, s"$shared ${toks("c", 9)}", "srcB"),
      // srcC: fully disjoint content
      (3L, toks("z", 30), "srcC"),
      // srcC: a 4-token doc — below the gram width, contributes nothing
      (4L, toks("w", 4), "srcC"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("shared grams count distinct-once; frac divides by the smaller side; disjoint pairs absent") {
    val rows = SparkEntry.queries("q156_source_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // each 18-token doc has 14 grams; only the 5 grams fully interior
    // to the 9-token shared block collide (boundary grams mix in the
    // per-doc tail). srcA distinct: 5 shared + 9 + 9 tails = 23;
    // srcB: 5 + 9 = 14. n_shared = 5 — the block appearing in TWO srcA
    // docs must still count its grams once. frac = 5/min(23,14) = 5/14.
    assert(rows(("srcA", "srcB")) === ((5L, 0.357143)))
    // srcC shares nothing with anyone → no rows
    assert(rows.size === 1)
  }
}

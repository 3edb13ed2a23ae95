package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q129's one-pass merge automaton (`encodeWithMerges`) to the
  * semantics it replaces and the DuckDB oracle replays: composing
  * `mergeScan` once per merge, in rank order. Pure-JVM — no Spark.
  */
class BpeEncodeSpec extends AnyFunSuite {

  private def sequential(toks: Seq[String], ms: Seq[(String, String)]): Seq[String] =
    ms.foldLeft(toks) { case (cur, (x, y)) => CurationQueries.mergeScan(cur, x, y) }

  private def both(toks: Seq[String], ms: Seq[(String, String)]): Unit =
    assert(CurationQueries.encodeWithMerges(toks, ms) === sequential(toks, ms),
      s"input=$toks merges=$ms")

  test("crafted overlap runs match the sequential composition exactly") {
    // leftmost-greedy on runs: "a a a a a" keeps the odd tail unmerged
    both(Seq("a", "a", "a", "a", "a"), Seq(("a", "a")))
    // pass boundary: (a_a, a_a) minted during rank 0 merges only at rank 1
    both(Seq("a", "a", "a", "a"), Seq(("a", "a"), ("a_a", "a_a")))
    // rank-r pair CREATED during rank r must NOT merge (scan moved past)
    both(Seq("b", "c", "c"), Seq(("b", "c"), ("b_c", "c")))
    // earlier-rank pair formed by a later merge stays unmerged forever
    both(Seq("a", "b", "c"), Seq(("b", "c"), ("a", "b")))
    // cascade chain across ranks, left and right attachments
    both(Seq("x", "a", "b", "y"), Seq(("a", "b"), ("x", "a_b"), ("x_a_b", "y")))
    // interleaved same-pair occurrences after a mid-sequence merge
    both(Seq("b", "c", "b", "c", "b", "c"), Seq(("b", "c"), ("b_c", "b_c")))
    // empty / single / no-match edges
    both(Seq.empty[String], Seq(("a", "b")))
    both(Seq("a"), Seq(("a", "a")))
    both(Seq("q", "r", "s"), Seq(("a", "b"), ("c", "d")))
  }

  test("2000 random (doc, merge-table) samples agree (seeded)") {
    val rnd = new scala.util.Random(1129)
    val baseVocab = Vector("a", "b", "c", "d", "e")
    for (_ <- 1 to 2000) {
      val doc = Seq.fill(rnd.nextInt(41))(baseVocab(rnd.nextInt(baseVocab.length)))
      // chain minted tokens so later ranks consume earlier outputs
      var vocab = baseVocab
      var ms = Vector.empty[(String, String)]
      for (_ <- 0 until rnd.nextInt(9)) {
        val p = (vocab(rnd.nextInt(vocab.length)), vocab(rnd.nextInt(vocab.length)))
        if (!ms.contains(p)) { ms :+= p; vocab :+= s"${p._1}_${p._2}" }
      }
      both(doc, ms)
    }
  }

  test("duplicate-pair merge tables fall back to the sequential path") {
    val ms = Seq(("a", "a"), ("b", "c"), ("a", "a"))
    both(Seq("a", "a", "a", "b", "c", "a", "a"), ms)
  }
}

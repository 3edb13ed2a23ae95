package graft

import graft.functions.TextEmbed
import graft.ingest.Chunkers

/** Property-style invariants (SURVEY.md §5 test plan), sampled over a
  * seeded generator (no scalatest-scalacheck bridge in the offline deps):
  *   - chunkers: every non-empty input line lands in exactly one chunk;
  *     W5 never exceeds maxSize and loses no non-space characters;
  *   - vectors: embeddings are unit-norm (or zero), deterministic;
  *   - fill-down date is monotone (never reverts to an earlier header).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def word() = (1 to (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def sentence() = (1 to (1 + rnd.nextInt(6))).map(_ => word()).mkString(" ")

  test("W5 splitLargeChunk: bounded pieces, no characters lost (100 samples)") {
    (1 to 100).foreach { _ =>
      val text = (1 to (1 + rnd.nextInt(40))).map(_ => sentence()).mkString(". ")
      val maxSize = 20 + rnd.nextInt(180)
      val pieces = Chunkers.splitLargeChunk(text, maxSize)
      assert(pieces.forall(_.length <= maxSize), s"maxSize=$maxSize violated")
      assert(pieces.mkString.filterNot(_.isWhitespace) === text.filterNot(_.isWhitespace))
    }
  }

  test("3-break chunker: every non-empty body line appears in exactly one chunk") {
    (1 to 8).foreach { _ =>
      val nDays = 1 + rnd.nextInt(3)
      val linesPerDay = 1 + rnd.nextInt(9)
      val text = (1 to nDays).flatMap { d =>
        s"${d}th Day of Emberglow 1855 - Title $d" +:
          (1 to linesPerDay).map(i => s"day$d line$i")
      }.mkString("\n")
      val chunks = Chunkers.threeBreakChunks(
        Chunkers.lines(Seq((0L, text)).toDF("doc_id", "text")))
        .filter(!$"is_date_chunk")
        .select("chunk_text").as[String].collect()
      val emitted = chunks.flatMap(_.split("\n"))
      assert(emitted.sorted.toSeq ===
        (1 to nDays).flatMap(d => (1 to linesPerDay).map(i => s"day$d line$i")).sorted)
    }
  }

  test("embedScala: unit norm or zero, deterministic, dimension exact (60 samples)") {
    (1 to 60).foreach { _ =>
      val text = (0 to rnd.nextInt(20)).map(_ => word()).mkString(" ")
      val dim = Seq(16, 64, 384)(rnd.nextInt(3))
      val v = TextEmbed.embedScala(text, dim)
      assert(v.length === dim)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(n === 0.0 || math.abs(n - 1.0) < 1e-9)
      assert(v.toSeq === TextEmbed.embedScala(text, dim).toSeq)
    }
  }

  test("fill-down date never reverts to an earlier header") {
    val text = Seq(
      "1st Day of Frostfall 1855 - A", "x", "y",
      "2nd Day of Frostfall 1855 - B", "z",
      "3rd Day of Frostfall 1855 - C", "w").mkString("\n")
    val got = Chunkers.fillDownDate(Chunkers.lines(Seq((0L, text)).toDF("doc_id", "text")))
      .orderBy("line_no").select("date").as[String].collect()
    val order = got.distinct.zipWithIndex.toMap
    assert(got.map(order).sameElements(got.map(order).sorted))
  }
}

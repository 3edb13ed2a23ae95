package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcCutsSpec extends SparkSpec {
  import spark.implicits._

  private def cutsOf(text: String): Seq[Int] =
    Seq(text).toDF("t").select(CdcCuts($"t").as("c"))
      .as[Seq[Int]].head()

  private def chunksOf(text: String): Seq[String] = {
    val cuts = cutsOf(text)
    val bounds = 0 +: cuts :+ text.length
    bounds.sliding(2).map { case Seq(a, b) => text.substring(a, b) }.toSeq
  }

  // deterministic pseudo-text long enough to contain many cut points
  private val base = {
    var s = 42L
    val sb = new StringBuilder
    (1 to 4000).foreach { _ =>
      s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      sb += ('a' + (s % 26)).toChar
      if (s % 7 == 0) sb += ' '
    }
    sb.toString
  }

  test("cuts are in-range, sorted, and reassemble the document") {
    val cuts = cutsOf(base)
    assert(cuts.nonEmpty) // mask 64 on 4000+ chars → expect ~dozens
    assert(cuts === cuts.sorted && cuts.distinct === cuts)
    assert(cuts.forall(p => p >= 16 && p < base.length))
    assert(chunksOf(base).mkString === base)
  }

  test("short or empty input yields no cuts (single chunk)") {
    assert(cutsOf("") === Seq.empty)
    assert(cutsOf("a" * 16) === Seq.empty)
    assert(chunksOf("tiny").mkString === "tiny")
  }

  test("chunk identity survives a prefix insertion (the point of CDC)") {
    val shifted = "INSERTED-PREFIX-" + base
    val orig = chunksOf(base).toSet
    val after = chunksOf(shifted).toSet
    val survived = (orig intersect after).size
    // all but the first chunk(s) around the edit must keep their identity;
    // offset-based chunking would preserve none of them
    assert(survived >= orig.size - 2,
      s"only $survived of ${orig.size} chunks survived the shift")
  }
}

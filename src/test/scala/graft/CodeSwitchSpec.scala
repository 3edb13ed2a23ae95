package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q141_code_switch: segment-level mixed-language detection. The oracle
  * gate pins exact rows at sf0.01; this spec pins the SEMANTICS on a
  * constructed corpus with known segment structure — majority election,
  * the mixed fraction, the unknown class, q23's tie convention, and the
  * sub-segment-width edge.
  */
class CodeSwitchSpec extends SparkSpec {
  import spark.implicits._

  // 12-token segments; en markers from LangMarkers ("the", "value", ...),
  // fr markers ("le", "est", ...), fillers match no marker list
  private def seg(marker: String): String =
    (marker +: (1 until 12).map(i => s"fill$i")).mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-cswitch-").toFile
    d.deleteOnExit()
    val rows = Seq(
      // two en segments + one fr → majority en, mixed 1/3
      (1L, Seq(seg("the"), seg("value"), seg("le")).mkString(" ")),
      // pure fr, two segments → majority fr, mixed 0
      (2L, Seq(seg("le"), seg("est")).mkString(" ")),
      // no markers anywhere → majority unknown, mixed 0
      (3L, Seq(seg("fillx"), seg("filly")).mkString(" ")),
      // one en + one fr segment → counts tie, lexically larger tag wins
      (4L, Seq(seg("the"), seg("le")).mkString(" ")),
      // 5 tokens < one segment width → a single (clipped) segment
      (5L, "the of and tiny doc"))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val byDoc: Map[Long, (String, Long, Double)] =
    QueryRegistry.all.find(_.name == "q141_code_switch").get
      .fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("majority election and mixed fraction") {
    assert(byDoc(1L) == (("en", 3L, 0.333333)))
    assert(byDoc(2L) == (("fr", 2L, 0.0)))
  }

  test("marker-free docs are a coherent unknown class, not noise") {
    assert(byDoc(3L) == (("unknown", 2L, 0.0)))
  }

  test("segment-count ties break to the lexically larger tag (q23 convention)") {
    assert(byDoc(4L)._1 == "fr")
    assert(byDoc(4L)._3 == 0.5)
  }

  test("docs shorter than one segment width form a single segment") {
    assert(byDoc(5L) == (("en", 1L, 0.0)))
  }
}

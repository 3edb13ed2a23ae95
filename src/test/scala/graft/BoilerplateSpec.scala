package graft

import java.nio.file.Files

/** q149_boilerplate: CCNet-style boilerplate-segment audit. The oracle
  * gate pins exact rows at sf0.01/sf0.1; this spec pins the SEMANTICS on
  * a constructed corpus: the ≥3-distinct-docs threshold (a 2-doc repeat
  * must NOT flag), per-source instance counting, and partial trailing
  * segments counting as segments.
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = (0 until 12).map(i => s"nav$i").mkString(" ")
  private val segX = (0 until 12).map(i => s"twice$i").mkString(" ")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-boiler-").toFile
    d.deleteOnExit()
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val rows = Seq(
      // boiler appears in 3 distinct docs (2×srcA + 1×srcB) → flagged
      (0L, s"$boiler ${uniq("u0", 2)}", "en", "srcA"),  // segs: boiler + 2-token partial
      (1L, boiler, "en", "srcA"),                       // segs: boiler
      (2L, s"$boiler ${uniq("u2", 12)}", "en", "srcB"), // segs: boiler + unique
      (3L, uniq("u3", 12), "en", "srcB"),               // segs: unique
      // segX appears in only 2 docs → below the ≥3 threshold, NOT flagged
      (4L, segX, "en", "srcC"),
      (5L, segX, "en", "srcC"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val rows = QueryRegistry.all.find(_.name == "q149_boilerplate")
    .get.fn(spark, dir).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toMap

  test("a segment in >=3 distinct docs flags every instance; per-source funnels are exact") {
    // srcA: 3 segments total (boiler, 2-token partial, boiler), 2 boiler
    assert(rows("srcA") === ((3L, 2L, 0.666667)))
    // srcB: boiler + unique + unique-doc — only the boiler instance flags
    assert(rows("srcB") === ((3L, 1L, 0.333333)))
  }

  test("a 2-doc repeat stays below the boilerplate threshold") {
    assert(rows("srcC") === ((2L, 0L, 0.0)))
  }
}

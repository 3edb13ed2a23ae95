package graft

import java.nio.file.Files

/** q152_ngram_novelty: crawl-order first-owner attribution. The oracle
  * gate pins exact rows; this spec pins the SEMANTICS: an exact copy of
  * an earlier doc scores 0, a half-overlapping doc scores exactly its
  * new-gram fraction, first-ownership goes to the SMALLEST doc_id, and
  * sub-shingle-width docs drop out instead of emitting empty rows.
  */
class NgramNoveltySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-novel-").toFile
    d.deleteOnExit()
    val rows = Seq(
      // doc 0: tokens t1..t6 → 5-gram shingles [t1..t5], [t2..t6] — both
      // first-owned here → novelty 1.0
      (0L, "t1 t2 t3 t4 t5 t6", "en", "srcA"),
      // doc 1: exact copy → both grams owned by doc 0 → novelty 0.0
      (1L, "t1 t2 t3 t4 t5 t6", "en", "srcA"),
      // doc 2: t2..t6 t7 → [t2..t6] owned by doc 0, [t3..t7] new → 0.5
      (2L, "t2 t3 t4 t5 t6 t7", "en", "srcB"),
      // doc 3: too short for a 5-gram → no output row
      (3L, "x1 x2 x3 x4", "en", "srcB"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("novelty = fraction of grams first owned; copies score 0; short docs drop") {
    val rows = QueryRegistry.all.find(_.name == "q152_ngram_novelty")
      .get.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    assert(rows(0L) === ((2L, 2L, 1.0)))
    assert(rows(1L) === ((2L, 0L, 0.0)))
    assert(rows(2L) === ((2L, 1L, 0.5)))
  }
}

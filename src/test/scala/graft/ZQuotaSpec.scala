package graft

import java.nio.file.Files

/** q143_quality_zquota: per-domain z-normalized quality quota. The oracle
  * gate pins exact rows at sf0.01; this spec pins the ARITHMETIC on a
  * corpus engineered so two of the three signals are constant (their
  * variance guard must yield z = 0) and the third has a hand-computable
  * population z-score — plus the degenerate all-constant source.
  */
class ZQuotaSpec extends SparkSpec {
  import spark.implicits._

  // srcZ: token counts 10/20/30/40, every token distinct within its doc
  // (m2 ≡ 1e6), no punctuation (m3 ≡ 0) → zq = z(m1)/3 exactly.
  // srcC: three signal-identical docs → every z = 0.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-zquota-").toFile
    d.deleteOnExit()
    val rows =
      Seq(10, 20, 30, 40).zipWithIndex.map { case (nTok, i) =>
        val t = (0 until nTok).map(j => s"z${i}t$j").mkString(" ")
        (i.toLong, t, "en", "srcZ", t.length.toLong)
      } ++ (0 until 3).map { i =>
        val t = (0 until 10).map(j => s"c${i}t$j").mkString(" ")
        (100L + i, t, "en", "srcC", t.length.toLong)
      }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  private lazy val rows = QueryRegistry.all.find(_.name == "q143_quality_zquota")
    .get.fn(spark, dir).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("quota takes exactly 3 per source, best-first") {
    assert(rows.count(_._1 == "srcZ") == 3)
    assert(rows.count(_._1 == "srcC") == 3)
    val srcZ = rows.filter(_._1 == "srcZ").sortBy(_._2)
    // 40 > 30 > 20 tokens win in order; the 10-token doc is cut
    assert(srcZ.map(_._3).toSeq == Seq(3L, 2L, 1L))
  }

  test("hand-computed population z on the varying signal") {
    // counts 10/20/30/40: mean 25, pop var 125; z(40) = 15/sqrt(125),
    // constant signals contribute 0 → zq = z/3 = 0.447214 at 6dp
    val top = rows.find(r => r._1 == "srcZ" && r._2 == 1L).get
    assert(top._4 == 0.447214)
    val second = rows.find(r => r._1 == "srcZ" && r._2 == 2L).get
    assert(second._4 == 0.149071) // z(30) = 5/sqrt(125) / 3
  }

  test("all-constant source: the variance guard yields zq = 0, doc_id order") {
    val srcC = rows.filter(_._1 == "srcC").sortBy(_._2)
    assert(srcC.forall(_._4 == 0.0))
    assert(srcC.map(_._3).toSeq == Seq(100L, 101L, 102L))
  }
}

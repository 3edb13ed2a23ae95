package graft

import java.nio.file.Files

/** q151_embed_outliers: vector-space outlier audit. The oracle gate pins
  * exact rows; this spec pins the ARITHMETIC on an engineered embeddings
  * table where every step is hand-computable: integer-div centroid,
  * integer squared distances, population z with an exact closed form
  * (√3), plus the vec_id tiebreak among equal-z members and the
  * constant-distance variance guard.
  */
class EmbedOutliersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-embout-").toFile
    d.deleteOnExit()
    // label 0: milli-lifts 2/2/2/14 on dim 1 (0 elsewhere) → centroid
    //   sums 20 div 4 = 5; d2 = (2−5)² = 9,9,9 and (14−5)² = 81;
    //   mean 27, pop var 972 → z_outlier = 54/√972 = √3 = 1.732051,
    //   z_others = −18/√972 = −0.577350 (tie → vec_id asc)
    // label 1: four identical vectors → var 0 → guard yields z = 0
    val rows = Seq(
      (0L, Array(0.002f, 0f), 0), (1L, Array(0.002f, 0f), 0),
      (2L, Array(0.002f, 0f), 0), (3L, Array(0.014f, 0f), 0),
      (10L, Array(0.001f, 0.001f), 1), (11L, Array(0.001f, 0.001f), 1),
      (12L, Array(0.001f, 0.001f), 1), (13L, Array(0.001f, 0.001f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/embeddings.parquet")
    d.getAbsolutePath
  }

  private lazy val rows = QueryRegistry.all.find(_.name == "q151_embed_outliers")
    .get.fn(spark, dir).collect()
    .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("hand-computed z: the far vector tops its label at exactly sqrt(3)") {
    val l0 = rows.filter(_._1 == 0).sortBy(_._2)
    assert(l0.map(_._3).toSeq === Seq(3L, 0L, 1L)) // outlier, then id-asc ties
    assert(l0(0)._4 === 1.732051)
    assert(l0(1)._4 === -0.577350 && l0(2)._4 === -0.577350)
  }

  test("constant-distance label: the variance guard yields z = 0 for all ranks") {
    val l1 = rows.filter(_._1 == 1).sortBy(_._2)
    assert(l1.map(_._3).toSeq === Seq(10L, 11L, 12L)) // pure vec_id tiebreak
    assert(l1.forall(_._4 == 0.0))
  }
}

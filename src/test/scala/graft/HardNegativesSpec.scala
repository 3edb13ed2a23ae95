package graft

import org.apache.spark.sql.functions._

/** q135_hard_negatives: the contrastive-pair mining manifest. The oracle
  * gate pins exact rows; this spec pins the CONTRACT a trainer relies
  * on — negatives never share the anchor's label, the hard and uniform
  * pools are disjoint, the hard pool really is the similarity maximum
  * over the eligible set (every uniform draw scores at or below the
  * 3rd hard pick), and the draw is deterministic.
  */
class HardNegativesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val q = QueryRegistry.all.find(_.name == "q135_hard_negatives").get
  private lazy val out = q.fn(spark, sf).cache()

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("label"))

  test("every anchor gets exactly 3 hard + 2 rand negatives, disjoint") {
    val shape = out.groupBy("anchor_id")
      .agg(sum(when(col("kind") === "hard", 1).otherwise(0)).as("nh"),
        sum(when(col("kind") === "rand", 1).otherwise(0)).as("nr"),
        countDistinct(col("neg_id")).as("nd"))
      .collect()
    assert(shape.nonEmpty)
    shape.foreach { r =>
      assert(r.getLong(1) === 3L, s"anchor ${r.get(0)}: hard count")
      assert(r.getLong(2) === 2L, s"anchor ${r.get(0)}: rand count")
      assert(r.getLong(3) === 5L, s"anchor ${r.get(0)}: pools overlap")
    }
  }

  test("no negative shares its anchor's label") {
    val anchors = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("anchor_id"), col("label").as("alabel"))
    val sameLabel = out
      .join(anchors, Seq("anchor_id"))
      .join(emb.select(col("vec_id").as("neg_id"), col("label").as("nlabel")),
        Seq("neg_id"))
      .filter(col("alabel") === col("nlabel"))
      .count()
    assert(sameLabel === 0L)
  }

  test("hard negatives dominate: every rand draw scores <= the anchor's 3rd hard pick") {
    val hard3 = out.filter(col("kind") === "hard" && col("rnk") === 3L)
      .select(col("anchor_id"), col("score").as("h3"))
    val violations = out.filter(col("kind") === "rand")
      .join(hard3, Seq("anchor_id"))
      .filter(col("score") > col("h3"))
      .count()
    assert(violations === 0L)
  }

  test("the uniform draw is deterministic: two executions agree row for row") {
    val again = q.fn(spark, sf)
    assert(out.exceptAll(again).count() === 0L)
    assert(again.exceptAll(out).count() === 0L)
  }
}

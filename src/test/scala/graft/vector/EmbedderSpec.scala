package graft.vector

import graft.SparkSpec
import graft.functions.TextEmbed

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions embedder produces the same vectors as the column pipeline") {
    val df = Seq((0L, "spark window join"), (1L, "the quick brown fox"), (2L, ""))
      .toDF("id", "text")
    val viaPartitions = Embedder.withEmbedding(df, "text", "v", new HashingEmbedder())
      .orderBy("id").select("v").as[Seq[Double]].collect()
    val viaColumns = TextEmbed.withEmbed(df, "text", "v")
      .orderBy("id").select("v").as[Seq[Double]].collect()
    viaPartitions.zip(viaColumns).foreach { case (a, b) => assert(a === b) }
  }

  test("NULL text embeds to NULL through the mapPartitions path too — both embed paths agree (r11)") {
    // the old ""-coercion emitted a zero vector that still participated
    // in cosine ranking, silently diverging from the column path's
    // NULL-in → NULL-out (TextEmbedSpec pins that side)
    val df = Seq((0L, Option("real text")), (1L, None: Option[String]))
      .toDF("id", "text")
    val viaPartitions = Embedder.withEmbedding(df, "text", "v", new HashingEmbedder())
      .orderBy("id").select(org.apache.spark.sql.functions.col("v").isNull)
      .as[Boolean].collect()
    assert(viaPartitions.toSeq === Seq(false, true))
    val viaColumns = TextEmbed.withEmbed(df, "text", "v")
      .orderBy("id").select(org.apache.spark.sql.functions.col("v").isNull)
      .as[Boolean].collect()
    assert(viaColumns.toSeq === viaPartitions.toSeq, "the two paths must agree on null rows")
  }

  test("batching covers partitions larger than batchSize") {
    val df = (0 until 300).map(i => (i.toLong, s"token$i text")).toDF("id", "text")
    val out = Embedder.withEmbedding(df.repartition(2), "text", "v",
      new HashingEmbedder(), batchSize = 32)
    assert(out.count() === 300)
    assert(out.schema("v").dataType.typeName === "array")
  }
}

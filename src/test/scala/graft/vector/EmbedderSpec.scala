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

  test("batching covers partitions larger than batchSize") {
    val df = (0 until 300).map(i => (i.toLong, s"token$i text")).toDF("id", "text")
    val out = Embedder.withEmbedding(df.repartition(2), "text", "v",
      new HashingEmbedder(), batchSize = 32)
    assert(out.count() === 300)
    assert(out.schema("v").dataType.typeName === "array")
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("column pipeline and driver-side Scala embedder are bit-identical") {
    val texts = Seq("spark batch window join", "the quick brown fox", "", "a a a b")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val got = TextEmbed.withEmbed(df, "text", "v").orderBy("id")
      .select("v").as[Seq[Double]].collect()
    texts.zip(got).foreach { case (t, v) =>
      assert(v.toArray.sameElements(TextEmbed.embedScala(t)), s"mismatch for '$t'")
    }
  }

  test("embeddings are L2-normalized with the right dimension") {
    val df = Seq((1L, "hello world again")).toDF("id", "text")
    val v = TextEmbed.withEmbed(df, "text", "v").select("v").as[Seq[Double]].head()
    assert(v.size === TextEmbed.DefaultDim)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
  }

  test("deterministic and similarity-preserving") {
    val a = TextEmbed.embedScala("spark window aggregation")
    val b = TextEmbed.embedScala("spark window aggregation")
    assert(a.sameElements(b))
    def cos(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
    val near = cos(TextEmbed.embedScala("spark window agg"), TextEmbed.embedScala("spark window join"))
    val far = cos(TextEmbed.embedScala("spark window agg"), TextEmbed.embedScala("zebra quantum piano"))
    assert(near > far)
  }

  test("hash60 matches DuckDB semantics (md5-prefix)") {
    // md5('abc') = 900150983cd24fb0... → first 15 hex = 900150983cd24fb → 648541476951500027
    val h = Seq("abc").toDF("s").select(XHash.hash60(col("s"))).head().getLong(0)
    assert(h === 648541476951500027L)
  }
}

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

  test("NULL text / NULL token array embeds to NULL (intended kernel semantics)") {
    // The EmbedSig kernel deliberately diverges from the retired HOF
    // pipeline here: HOF produced an array of `dim` nulls for a null
    // token array, the kernel propagates SQL NULL. Pin the intent so a
    // future refactor can't silently flip it back (ADVICE r10).
    val df = Seq((1L, Option("real text")), (2L, None: Option[String]))
      .toDF("id", "text")
    val got = TextEmbed.withEmbed(df, "text", "v").orderBy("id")
      .select(col("v").isNull).as[Boolean].collect()
    assert(got === Seq(false, true))
    // same through the from-tokens entrypoint with an explicitly null array
    val toks = Seq((1L, Option(Seq("a", "b"))), (2L, None: Option[Seq[String]]))
      .toDF("id", "toks")
    val got2 = TextEmbed.withEmbedFromTokens(toks, "toks", "v").orderBy("id")
      .select(col("v").isNull).as[Boolean].collect()
    assert(got2 === Seq(false, true))
  }

  test("hash60 matches DuckDB semantics (md5-prefix)") {
    // md5('abc') = 900150983cd24fb0... → first 15 hex = 900150983cd24fb → 648541476951500027
    val h = Seq("abc").toDF("s").select(XHash.hash60(col("s"))).head().getLong(0)
    assert(h === 648541476951500027L)
  }
}

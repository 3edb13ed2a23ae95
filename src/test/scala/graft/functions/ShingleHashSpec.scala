package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  test("fused kernel equals distinct-shingles → hash60 composition") {
    val df = Seq(
      Seq("a", "b", "c", "d", "e"),
      Seq("x", "y"),              // fewer than n → empty
      Seq("a", "b", "c", "a", "b", "c", "a", "b", "c") // repeats → distinct
    ).toDF("toks")
    val viaKernel = df.select(ShingleHash60($"toks", 3).as("h")).as[Seq[Long]].collect()
    val viaComposition = df.select(
      transform(array_distinct(TextOps.shinglesFromTokens($"toks", 3)),
        t => XHash.hash60(t)).as("h")).as[Seq[Long]].collect()
    viaKernel.zip(viaComposition).foreach { case (k, c) =>
      assert(k.sorted === c.sorted)
    }
  }

  test("hash value matches XHash.hash60 exactly") {
    val viaKernel = Seq(Seq("alpha", "beta", "gamma")).toDF("toks")
      .select(ShingleHash60($"toks", 3)).as[Seq[Long]].head().head
    val viaHash = Seq("alpha beta gamma").toDF("s")
      .select(XHash.hash60($"s")).as[Long].head()
    assert(viaKernel === viaHash)
  }
}

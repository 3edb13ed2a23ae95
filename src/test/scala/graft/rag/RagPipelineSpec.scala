package graft.rag

import graft.SparkSpec
import graft.functions.TextEmbed
import org.apache.spark.sql.functions._

class RagPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def collection = {
    val docs = Seq(
      (0L, "the currency of veridia is called the veridian crown and is minted in the capital"),
      (1L, "queen isolde rules the country with patronage of the arts"),
      (2L, "the dawnspire is a tall tower visible from the harbor")
    ).toDF("id", "text")
    TextEmbed.withEmbed(docs, "text", "vector").select("id", "text", "vector")
  }

  test("answerBatch retrieves the right doc and extracts an overlapping span") {
    val qs = Seq((0L, "what is the currency of veridia called")).toDF("qid", "question")
    val got = RagPipeline.answerBatch(qs, collection, k = 2).collect().head
    assert(got.getAs[Boolean]("success"))
    val answer = got.getAs[String]("answer")
    assert(answer.contains("currency") && answer.contains("veridia"))
    assert(got.getAs[Int]("n_context") === 2)
    assert(got.getAs[Seq[Long]]("source_ids").head === 0L)
  }

  test("strict-compat k=1 reproduces the reference's single-chunk retrieval quirk") {
    // the reference hard-codes limit=1 against its own k=5 default
    // (scripts/milvus_db.py:112) — the engine honors k, so strict-compat
    // callers just pass k=1 and get the reference's (weaker) behavior
    val qs = Seq((0L, "what is the currency of veridia called")).toDF("qid", "question")
    val got = RagPipeline.answerBatch(qs, collection, k = 1).collect().head
    assert(got.getAs[Int]("n_context") === 1)
    assert(got.getAs[Seq[Long]]("source_ids").size === 1)
  }

  test("no-overlap question yields the reference's verbatim fallback string") {
    assert(ExtractiveLlm.answer("zzz qqq", Seq("totally unrelated text")) ===
      "Could not find relevant data within the document")
    assert(ExtractiveLlm.answer("anything", Nil) === ExtractiveLlm.Fallback)
  }

  test("judge: F1-style grade in [0,1], 1.0 on exact match, 0.0 on disjoint") {
    assert(ExtractiveLlm.judge("q", "the veridian crown", "the veridian crown") === 1.0)
    assert(ExtractiveLlm.judge("q", "alpha beta", "gamma delta") === 0.0)
    val g = ExtractiveLlm.judge("q", "the veridian crown", "the crown")
    assert(g > 0.0 && g < 1.0)
  }

  test("evalBatch produces graded records with mean grade computable") {
    val qa = Seq(
      (0L, "currency of veridia", "the veridian crown"),
      (1L, "who rules the country", "queen isolde")
    ).toDF("qid", "question", "expected_answer")
    val out = RagPipeline.evalBatch(qa, collection, k = 2)
    val rows = out.select("qid", "grade").as[(Long, Double)].collect().toMap
    assert(rows.size === 2)
    assert(rows.values.forall(g => g >= 0.0 && g <= 1.0))
    val mean = out.agg(avg(col("grade"))).head().getDouble(0)
    assert(mean > 0.0) // retrieval should land on the right docs
  }
}

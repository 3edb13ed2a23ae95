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

  test("a question with ZERO retrieval hits surfaces as a fallback success=false row, not a vanished row (r11)") {
    val emptyColl = collection.filter(col("id") < 0) // zero rows
    val qs = Seq((0L, "what is the currency of veridia called"),
      (1L, "who rules the country")).toDF("qid", "question")
    val got = RagPipeline.answerBatch(qs, emptyColl, k = 3)
      .orderBy("qid").collect()
    assert(got.length === 2, "every input question must produce an output row")
    got.foreach { r =>
      assert(r.getAs[String]("answer") === ExtractiveLlm.Fallback)
      assert(!r.getAs[Boolean]("success"))
      assert(r.getAs[Int]("n_context") === 0)
    }
  }

  test("a null-text row ranking into the top-k does not NPE the LLM boundary (r11)") {
    val withNull = collection.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("id", "text")
        .withColumn("vector",
          typedlit(TextEmbed.embedScala("currency of veridia crown").toSeq)))
    val qs = Seq((0L, "what is the currency of veridia called")).toDF("qid", "question")
    val got = RagPipeline.answerBatch(qs, withNull, k = 3).collect().head
    assert(got.getAs[Boolean]("success"), "real context must still answer")
  }

  test("answerWithCot keeps the ORIGINAL question for the LLM and the output (r11)") {
    val q = "what is the currency of veridia called"
    val recorded = new RecordedLlm(Map(q -> "The Veridian Crown."))
    val got = graft.rag.Agents.answerWithCot(
      Seq((0L, q)).toDF("qid", "question"), collection, k = 2, llm = recorded)
      .collect().head
    assert(got.getAs[String]("question") === q,
      "output question column must be the caller's text, not the widened retrieval text")
    assert(got.getAs[String]("answer") === "The Veridian Crown.",
      "a RecordedLlm keyed on the real question must hit")
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

  test("bm25All refuses a question frame whose distinct-TERM set exceeds the isin-literal bound (r16 advice)") {
    // the plan-size hazard is the distinct-term isin() literal list, so
    // the guard binds on terms inside Bm25.scoreTopK — a "question
    // batch" with 5000 distinct terms is a corpus wearing the qid column
    val hostile = spark.range(0, 5000)
      .select(col("id").as("qid"),
        concat(lit("zz"), col("id").cast("string")).as("question"))
    val e = intercept[IllegalArgumentException](
      RagPipeline.bm25All(hostile, collection, 3).collect())
    assert(e.getMessage.contains("distinct query terms"))
    assert(e.getMessage.contains("4096"))
  }

  test("bm25All accepts many (qid, term) pairs over a small shared vocabulary (r16 advice)") {
    // >4096 distinct pairs but only 3 distinct terms: the old pair cap
    // threw here even though the isin() list — the thing the cap was
    // protecting — had 3 literals. Pairs bound driver memory (65536);
    // terms bound the plan (4096, in the kernel).
    val shared = spark.range(0, 1500)
      .select(col("id").as("qid"),
        lit("veridia crown queen").as("question"))
    val out = RagPipeline.bm25All(shared, collection, 1)
    assert(out.select(countDistinct(col("qid"))).head().getLong(0) === 1500L)
  }
}

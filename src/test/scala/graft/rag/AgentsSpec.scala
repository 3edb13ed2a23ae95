package graft.rag

import graft.SparkSpec
import graft.functions.TextEmbed
import org.apache.spark.sql.functions._

class AgentsSpec extends SparkSpec {
  import spark.implicits._

  private val chunks = Seq(
    (0L, "the veridian crown is the currency of veridia"),
    (1L, "queen isolde patronizes the arts"),
    (2L, "completely unrelated gardening notes")
  ).toDF("chunk_id", "chunk_text")

  test("L5/L6: expert analyses parse strict JSON and filter on relevance > 0.4") {
    val got = Agents.expertAnalyses(chunks, "what is the currency of veridia")
    val rows = got.select($"chunk_id", $"analysis.relevance").as[(Long, Double)].collect().toMap
    assert(rows.contains(0L))
    assert(!rows.contains(2L)) // zero overlap → relevance 0 → filtered
    assert(rows(0L) > 0.4)
  }

  test("L6: malformed JSON rows are dropped, not errored") {
    val df = Seq("""{"key_findings": [], "missing_info": "x", "relevance": 0.9}""",
                 """{not json at all""").toDF("analysis_json")
    val parsed = df.withColumn("analysis",
        from_json($"analysis_json", Agents.AnalysisSchema))
      .filter($"analysis".isNotNull && $"analysis.relevance".isNotNull)
    assert(parsed.count() === 1)
  }

  test("L4: first relevant chunk early-exits with exactly one row") {
    val got = Agents.firstRelevantChunk(chunks, "currency of veridia")
    assert(got.count() === 1)
    assert(got.select("chunk_id").as[Long].head() === 0L)
  }

  test("L5: analyzeWithFeedback answers within round budget") {
    val (answer, rounds) = Agents.analyzeWithFeedback(chunks, "what is the currency of veridia")
    assert(answer.contains("currency"))
    assert(rounds >= 1 && rounds <= 3)
  }

  test("L3: CoT two-stage answers through the same batch plan") {
    val collection = TextEmbed.withEmbed(
      chunks.select($"chunk_id".as("id"), $"chunk_text".as("text")), "text", "vector")
    val qs = Seq((0L, "what is the currency of veridia called")).toDF("qid", "question")
    val got = Agents.answerWithCot(qs, collection, k = 2).collect().head
    assert(got.getAs[Boolean]("success"))
    assert(got.getAs[String]("answer").contains("currency"))
  }
}

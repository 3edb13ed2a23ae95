package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Agentic retrieval operators (SURVEY.md §2.8 L3-L6) — the reference's
  * notebook strategies re-expressed as Spark plans over the pluggable
  * LlmClient boundary.
  *
  * L3 `answer_with_cot` (`src/groq_cot_batch_agents.ipynb` cell 5): two
  *    chained map stages — generate retrieval "thoughts", then answer
  *    with doc + thoughts.
  * L4 `AsyncAgentSystem` (cells 9,14,15): fan out per-chunk analyses,
  *    stop at the first positive — `asyncio.gather` + Event becomes
  *    filter + limit(1), which Spark's incremental CollectLimit
  *    early-terminates without scheduling remaining partitions.
  * L5 `SmartAgentSystem` (`src/groq_cot_master_agent.ipynb` cell 3):
  *    per-chunk "expert" JSON analyses → relevance filter (P7, > 0.4) →
  *    driver-side "central" reduce, iterating with more chunks while the
  *    central agent reports incompleteness.
  * L6 structured-output validation: strict-schema from_json + null
  *    filter replaces the notebook's required_keys/retry loop.
  */
object Agents {

  /** Expert-analysis JSON contract (L5/L6). */
  val AnalysisSchema: StructType = StructType(Seq(
    StructField("key_findings", ArrayType(StringType)),
    StructField("missing_info", StringType),
    StructField("relevance", DoubleType)))

  /** Deterministic expert stub: emits the L5 JSON contract from token
    * overlap (a real LlmClient would prompt for it; the shape is what
    * matters to the plan). Invalid JSON from a real model is exactly what
    * the L6 validation downstream drops.
    */
  def expertAnalyzeJson(question: String, chunk: String): String = {
    val q = question.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    val t = chunk.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val hits = t.filter(q.contains).distinct.sorted
    val rel = if (q.isEmpty) 0.0 else math.rint(100.0 * hits.length / q.size) / 100.0
    val findings = hits.map(w => "\"" + w + "\"").mkString("[", ",", "]")
    s"""{"key_findings": $findings, "missing_info": "${if (rel >= 1.0) "" else "partial"}", "relevance": $rel}"""
  }

  /** L5 stage 1 + L6: expert analyses as a strict-schema parse; rows whose
    * JSON fails the contract become null structs and are dropped (the
    * notebook's required_keys check), then the P7 relevance filter.
    */
  def expertAnalyses(chunks: DataFrame, question: String,
                     relevanceThreshold: Double = 0.4): DataFrame = {
    val analyze = udf((text: String) => expertAnalyzeJson(question, text))
    chunks
      .withColumn("analysis_json", analyze(col("chunk_text")))
      // default PERMISSIVE mode: malformed/truncated JSON yields a struct
      // with null (or partially parsed) FIELDS — never a null struct — so
      // L6 must check every required key, exactly like the notebook's
      // required_keys validation. (FAILFAST would instead abort the whole
      // job on one bad record from a real LlmClient.)
      .withColumn("analysis", from_json(col("analysis_json"), AnalysisSchema))
      .filter(col("analysis.relevance").isNotNull &&
        col("analysis.key_findings").isNotNull &&
        col("analysis.missing_info").isNotNull) // L6
      .filter(col("analysis.relevance") > relevanceThreshold) // P7
  }

  /** L4: first relevant chunk — filter + limit(1); Spark schedules
    * partitions incrementally for CollectLimit, so a hit in the first
    * partition means later partitions never run (the asyncio.Event
    * early-exit, minus the manual batching).
    */
  def firstRelevantChunk(chunks: DataFrame, question: String,
                         relevanceThreshold: Double = 0.4): DataFrame =
    expertAnalyses(chunks, question, relevanceThreshold).limit(1)

  /** L5 central reduce + iterative driver loop (`analyze_with_feedback`):
    * take expert findings in relevance order, batchSize at a time, until
    * the synthesized answer covers the question or chunks run out.
    * The loop is DRIVER-side control flow around DataFrame actions — the
    * per-round work stays distributed.
    */
  def analyzeWithFeedback(
      chunks: DataFrame, question: String, llm: LlmClient = ExtractiveLlm,
      batchSize: Int = 3, maxRounds: Int = 3): (String, Int) = {
    val ranked = expertAnalyses(chunks, question)
      .orderBy(col("analysis.relevance").desc, col("chunk_text").asc)
      .select(col("chunk_text")).limit(batchSize * maxRounds).collect().map(_.getString(0))
    var round = 0
    var answer = ExtractiveLlm.Fallback
    while (round < maxRounds && {
      val ctx = ranked.take(batchSize * (round + 1)).toSeq
      // sentinel form (null ⇔ fell back): the retry must fire on the
      // client actually failing, not on extracted text that happens to
      // equal the fallback string (r19 advice)
      val raw = llm.answerOrNull(question, ctx)
      answer = Option(raw).getOrElse(ExtractiveLlm.Fallback)
      raw == null && ctx.size < ranked.length
    }) round += 1
    (answer, round + 1)
  }

  /** L3: CoT two-stage — stage 1 derives retrieval "thoughts" (here: the
    * question's salient tokens via the stub), stage 2 answers with
    * doc + thoughts appended to the question. Two chained map stages in
    * one plan. The notebook's SSE streaming variant of the same path is
    * served by `RagServer`'s `/query/stream` endpoint (batch plans don't
    * stream; the serving surface does).
    */
  def answerWithCot(questions: DataFrame, collection: DataFrame, k: Int = 3,
                    llm: LlmClient = ExtractiveLlm): DataFrame = {
    val thoughts = udf((q: String) => RagServer.retrievalThoughts(q))
    // the thoughts widen only the RETRIEVAL text; the original question
    // column rides through to the LLM and the output — overwriting it
    // made RecordedLlm (keyed on real questions) miss every lookup and
    // broke question-keyed joins on the result (r11 review). RagServer's
    // /query/stream has always had this split; the batch path now
    // matches it via answerBatch's retrievalCol.
    val staged = questions
      .withColumn("thoughts", thoughts(col("question")))
      .withColumn("__retrieval", concat_ws(" ", col("question"), col("thoughts")))
    RagPipeline.answerBatch(staged.select("qid", "question", "__retrieval"),
      collection, k, llm = llm, retrievalCol = "__retrieval")
  }
}

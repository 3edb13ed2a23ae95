package graft.rag

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextEmbed, VectorKernels}

/** Batch RAG pipeline (SURVEY.md §3.1 / §3.3), vectorized.
  *
  * The reference answers one question per HTTP round-trip (embed → Milvus
  * top-k → fetch-by-id → LLM, `app.py:59-111`); its eval loops that 55
  * times sequentially (`scripts/eval.py:72-120`). Here ALL questions are
  * answered in ONE plan: questions ⨯ (broadcast) → per-question top-k via
  * a rank window → contexts gathered with sort_array(collect_list) →
  * one LlmClient call per question. The search-then-get round trip
  * (`app.py:63-92`) collapses into the same plan — the top-k rows already
  * carry the text column.
  *
  * Scale shape: the collection side is never shuffled for retrieval —
  * questions are the broadcast side; the rank window partitions by
  * question id, so the only shuffle is |questions| × k rows.
  */
object RagPipeline {

  /** Per-question cosine top-k over a collection that has a `vector` column.
    * Emits all collection columns plus qid/score/rnk.
    */
  def retrieveAll(questions: DataFrame, collection: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("rnk_tiebreak").asc)
    collection
      .join(broadcast(questions), lit(true))
      .withColumn("score", round(VectorKernels.cosineFast(col("qv"), col("vector")), 6))
      .withColumn("rnk_tiebreak", col("id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .drop("rnk_tiebreak", "qv")
  }

  /** Full batch QA: embed questions, retrieve top-k, answer with the LLM
    * boundary. Output: qid, question, answer, source_ids, n_context, success.
    * `success=false` ⇔ the fallback answer (reference `app.py:105-111`
    * collapses failures to success=false).
    */
  def answerBatch(
      questions: DataFrame, // qid BIGINT, question STRING
      collection: DataFrame, // id BIGINT, text STRING, vector ARRAY<DOUBLE-ish>
      k: Int = 5,
      dim: Int = TextEmbed.DefaultDim,
      llm: LlmClient = ExtractiveLlm): DataFrame = {
    val q = TextEmbed.withEmbed(questions, "question", "qv", dim)
    val hits = retrieveAll(q, collection, k)
    val answerUdf = udf((question: String, ctx: Seq[String]) => llm.answer(question, ctx))
    hits
      .groupBy(col("qid"), col("question"))
      .agg(sort_array(collect_list(struct(col("rnk"), col("id"), col("text")))).as("hits"))
      .withColumn("context", transform(col("hits"), h => h.getField("text")))
      .withColumn("source_ids", transform(col("hits"), h => h.getField("id")))
      .withColumn("answer", answerUdf(col("question"), col("context")))
      .withColumn("n_context", size(col("context")))
      .withColumn("success", col("answer") =!= lit(ExtractiveLlm.Fallback))
      .select("qid", "question", "answer", "source_ids", "n_context", "success")
  }

  /** Eval harness (SURVEY.md §3.3): QA pairs → answer → judge → grade. */
  def evalBatch(
      qa: DataFrame, // qid, question, expected_answer
      collection: DataFrame,
      k: Int = 5,
      dim: Int = TextEmbed.DefaultDim,
      llm: LlmClient = ExtractiveLlm): DataFrame = {
    val judged = udf((q: String, e: String, p: String) => llm.judge(q, e, p))
    answerBatch(qa.select(col("qid"), col("question")), collection, k, dim, llm)
      .join(qa.select(col("qid"), col("expected_answer")), Seq("qid"))
      .withColumn("grade", judged(col("question"), col("expected_answer"), col("answer")))
  }
}

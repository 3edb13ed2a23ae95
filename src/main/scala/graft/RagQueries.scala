package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextEmbed, VectorKernels}
import graft.rag.RagPipeline

/** End-to-end RAG operators (SURVEY.md §3.1/§3.3) over the documents table.
  *
  * q40 (retrieval) is fully oracle-checkable because the deterministic
  * embedder is a pure column expression with a DuckDB twin. q41/q42 cross
  * the LlmClient boundary (extractive stub) — not SQL-expressible, so they
  * get the driver's rows-only check; their internals are covered by
  * ScalaTest instead.
  */
object RagQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Par(s.read.parquet(s"$dir/documents.parquet"))

  val QueryText = "spark batch window join customer value"

  val defs: Seq[QueryDef] = Seq(

    // ── q40: deterministic-embed retrieval, oracle-checked end to end.
    //    The query string embeds ONCE on the driver (TextEmbed.embedScala,
    //    bit-identical to the column pipeline) — like a real serving path:
    //    query vector broadcast, collection scanned once, top-k. ──
    QueryDef("q40_rag_retrieval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val qv = TextEmbed.embedScala(QueryText)
        // TakeOrderedAndProject does the top-k (parallel, no global sort);
        // the rank window then runs over only k rows.
        val top = TextEmbed.withEmbed(docs(s, dir), "text", "vector")
          .withColumn("score", round(VectorKernels.dotFast(col("vector"), typedLit(qv)), 6))
          .select(col("doc_id"), col("score"))
          .orderBy(col("score").desc, col("doc_id").asc).limit(5)
        top.withColumn("rnk",
            row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
          .select(col("rnk").cast("long").as("rnk"), col("doc_id"), col("score"))
          .orderBy(col("rnk"))
      },
      Some {
        val qv = TextEmbed.embedScala(QueryText).mkString("[", ", ", "]")
        val stages = TextEmbed.embedSqlStages("documents", "doc_id", "text")
        s"""
        WITH $stages,
        scored AS (
          SELECT doc_id,
                 round(list_sum(list_transform(range(1, 65), i -> vec[i] * ($qv)[i])), 6) AS score
          FROM e_vec),
        ranked AS (
          SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
          FROM scored)
        SELECT rnk, doc_id, score FROM ranked WHERE rnk <= 5 ORDER BY rnk"""
      }),

    // ── q41: batch RAG answering through the LlmClient boundary ──
    QueryDef("q41_rag_answer",
      (s, dir) => {
        val collection = TextEmbed.withEmbed(docs(s, dir), "text", "vector")
          .select(col("doc_id").as("id"), col("text"), col("vector"))
        val questions = s.createDataFrame(Seq(
          (0L, "spark batch window join customer value"),
          (1L, "hash agg row scan slow fast table"),
          (2L, "stream filter merge sort order group")
        )).toDF("qid", "question")
        RagPipeline.answerBatch(questions, collection, k = 3)
          .select(col("qid"), col("question"), col("answer"), col("n_context"), col("success"))
          .orderBy(col("qid"))
      },
      None),

    // ── q42: eval harness — QA pairs, judge grades, mean grade ──
    QueryDef("q42_rag_eval",
      (s, dir) => {
        val d = docs(s, dir)
        val collection = TextEmbed.withEmbed(d, "text", "vector")
          .select(col("doc_id").as("id"), col("text"), col("vector"))
        // QA pairs built from the corpus itself: the question is a snippet
        // of the doc, the expected answer is the doc's opening — retrieval
        // should find the source doc (a self-retrieval sanity corpus).
        val qa = d.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"),
            concat_ws(" ", slice(split(col("text"), " "), 3, 8)).as("question"),
            substring(col("text"), 1, 120).as("expected_answer"))
        RagPipeline.evalBatch(qa, collection, k = 3)
          .select(col("qid"), col("answer"), col("grade"), col("success"))
          .orderBy(col("qid"))
      },
      None)
  )
}

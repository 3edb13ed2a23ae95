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

    // ── q43: the reference's own 55-question diary eval, end to end.
    //   Sources are the reference's committed fixtures (read-only), not
    //   sfDir — this is the flagship capability check: ingest → W7 chunks
    //   → 384-d embed → retrieve k=10 → extractive answer → judge. The
    //   reference's archived run: mean grade 0.216, 46/55 fallbacks. ──
    QueryDef("q43_diary_eval",
      (s, dir) => {
        val ref = "/root/reference"
        val lines = s.read.option("multiLine", true)
          .json(s"$ref/tests/diary_line_chunks.json")
          .select(explode(col("chunks")).as("c"))
          .select(col("c.line_number").cast("long").as("line_no"), col("c.line_text").as("line"))
        val diary = lines.orderBy("line_no")
          .agg(concat_ws("\n", collect_list(col("line"))).as("text"))
        val chunks = diary
          .withColumn("toks", split(col("text"), "\\s+"))
          .withColumn("start", explode(expr(
            "sequence(0L, greatest((size(toks) - 1) div 40, 0L) * 40, 40L)")))
          .filter(col("start") === 0 || col("start") < size(col("toks")))
          .withColumn("chunk_text", array_join(slice(col("toks"), col("start") + 1, lit(50)), " "))
          .select(col("start").as("id"), col("chunk_text"))
        val collection = TextEmbed.withEmbed(Par(chunks), "chunk_text", "vector", 384)
          .select(col("id"), col("chunk_text").as("text"), col("vector"))
        val qa = graft.sources.QaSource.load(s,
            s"$ref/data/questions.txt", s"$ref/data/answers.txt")
          .select(col("qa_id").as("qid"), col("question"), col("expected_answer"))
        RagPipeline.evalBatch(qa, collection, k = 10, dim = 384)
          .select(col("qid"), col("question"), col("answer"), col("grade"), col("success"))
          .orderBy(col("qid"))
      },
      None,
      // fixture-constant work (reads the reference corpus, not sfDir) —
      // excluded from the sf-scaled bench line, still in the verify gate
      benchmark = false),

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

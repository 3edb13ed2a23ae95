package graft

import graft.functions.TextEmbed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared retrieval corpus for the end-to-end suites: the golden diary
  * line fixture reassembled and cut into W7 sliding word windows
  * (50 words, stride 40), embedded with the 384-d reference contract
  * (`scripts/prepare_data.py:22`). See EndToEndSpec for why windows beat
  * the 3-break chunks for retrieval (the reference README's own
  * "chunking too large" complaint).
  */
object DiaryFixture {
  val Dim = 384

  def windowedCollection(spark: SparkSession): DataFrame = {
    val ref = "/root/reference"
    val lines = spark.read.option("multiLine", true)
      .json(s"$ref/tests/diary_line_chunks.json")
      .select(explode(col("chunks")).as("c"))
      .select(lit(0L).as("doc_id"), col("c.line_number").cast("long").as("line_no"),
        col("c.line_text").as("line"))
    val diary = lines.orderBy("line_no")
      .agg(concat_ws("\n", collect_list(col("line"))).as("text"))
      .select(lit(0L).as("doc_id"), col("text"))
    val chunks = diary
      .withColumn("toks", split(col("text"), "\\s+"))
      .withColumn("start", explode(expr(
        "sequence(0L, greatest((size(toks) - 1) div 40, 0L) * 40, 40L)")))
      .filter(col("start") === 0 || col("start") < size(col("toks")))
      .withColumn("chunk_text", array_join(slice(col("toks"), col("start") + 1, lit(50)), " "))
      .select(col("start").as("id"), col("chunk_text"))
    TextEmbed.withEmbed(chunks, "chunk_text", "vector", Dim)
      .select(col("id"), col("chunk_text").as("text"), col("vector"))
  }
}

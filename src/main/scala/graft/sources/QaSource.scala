package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/J3: line-aligned QA-pair loading (`scripts/eval.py:30-56`).
  *
  * The reference zips two text files line-by-line, truncating to the
  * shorter (`min_len`, `scripts/eval.py:44-53`). Here each file is read
  * with stable line numbers and INNER-joined on line number — the inner
  * join IS the min_len truncation. Blank lines are KEPT and paired by raw
  * index exactly like the reference (which only `strip()`s each line); a
  * pair where one file has a blank line surfaces as an empty string, not
  * a silently dropped row.
  */
object QaSource {

  /** Stable (file-order) line numbering, no filtering. `spark.read.text`
    * preserves order within a file; zipWithIndex gives the global ordinal
    * without the monotonically_increasing_id partition-gap caveat.
    */
  def numberedLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .zipWithIndex()
      .map { case (l, i) => (i, l) }
      .toDF("line_no", "line")
  }

  def load(spark: SparkSession, questionsPath: String, answersPath: String): DataFrame = {
    val q = numberedLines(spark, questionsPath)
      .select(col("line_no").as("qa_id"), trim(col("line")).as("question"))
    val a = numberedLines(spark, answersPath)
      .select(col("line_no").as("qa_id"), trim(col("line")).as("expected_answer"))
    q.join(a, Seq("qa_id")) // inner join = zip-to-min-len
      .orderBy(col("qa_id"))
  }
}

package graft.analytics

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Collection analytics (SURVEY.md §2.4 A6-A9 — the reference's
  * `scripts/archive/test_vector.py` inspection ops, made first-class).
  */
object Stats {

  /** A6: text-length stats (`test_vector.py:44-47`). avg over NON-NULL
    * lengths like the reference's pandas mean (and like min/max here) —
    * sum/count(*) deflated the average on null-text rows (r11 review). */
  def textLengthStats(df: DataFrame, textCol: String = "text"): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      min(length(col(textCol))).as("min_len"),
      max(length(col(textCol))).as("max_len"),
      avg(length(col(textCol))).as("avg_len"))

  /** A7: distribution over a categorical column (`test_vector.py:50-58`). */
  def distribution(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).count().orderBy(col(keyCol))

  /** A8: vector element stats (`test_vector.py:77-83`). */
  def vectorElementStats(df: DataFrame, vecCol: String = "vector"): DataFrame =
    df.select(
        array_min(col(vecCol)).cast("double").as("mn"),
        array_max(col(vecCol)).cast("double").as("mx"),
        VectorOps.normL2(col(vecCol)).as("nrm"))
      .agg(min(col("mn")).as("min_elem"), max(col("mx")).as("max_elem"),
           avg(col("nrm")).as("avg_norm"), count(lit(1)).as("n"))
}

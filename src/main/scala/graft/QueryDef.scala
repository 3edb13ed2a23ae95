package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract notes (driver correctness gate):
  *   - column names must match between the Spark result and the oracle —
  *     the compare sorts columns by name before hashing values;
  *   - double-typed outputs must be bit-identical across engines, so
  *     aggregates over doubles go through DECIMAL(18,2) (exact,
  *     order-independent) and similarity scores are rounded;
  *   - hashes that reach output use the shared md5-prefix primitive
  *     (graft.functions.XHash), identical in both engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchmark: Boolean = true)

/** Spread a small-file scan across the cluster before compute-heavy
  * per-row work (embedding, hashing, shingling, cosine). A single parquet
  * file arrives as ONE partition; without this every downstream projection
  * runs on one core — locally and, worse, on one executor of a thousand.
  * The shuffle moves only the raw rows (cheap) and buys full parallelism
  * for the expensive projection that follows.
  */
object Par {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}

object QueryRegistry {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ AdvancedQueries.defs ++ VectorQueries.defs ++
      TextQueries.defs ++ RagQueries.defs ++ StreamQueries.defs
}

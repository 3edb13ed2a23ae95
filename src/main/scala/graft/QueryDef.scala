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

/** Session-builder helpers shared by the driver-contract mains. */
object GraftSession {
  /** SPARK_GRAFT_EXTRA_CONF="k=v;k=v" → ad-hoc session confs (e.g.
    * spark.sql.codegen.factoryMode=NO_CODEGEN to gate interpreted paths,
    * or cluster-tuning knobs). One owner so Bench and Verify can't drift.
    */
  def applyExtraConf(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    b
  }
}

/** Exact sort-based percentiles shared by q19/q48: window rank within the
  * key group, endpoint rows picked at floor/ceil of p·(n−1), linear
  * interpolation lower + (upper−lower)·frac — the formula both Spark's
  * `percentile` and DuckDB's `quantile_cont` use, without the boxed
  * value→count map Spark's aggregate builds.
  */
object ExactPercentiles {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  /** (key, v, rn, n): 0-based rank of v within key, and the group size.
    *
    * Scalable exact rank, NOT a per-key window: `row_number() OVER
    * (PARTITION BY key)` sorts each key's ENTIRE value set on one task —
    * with 3 return flags over sf1's 6M lineitem rows that was 3 tasks
    * sorting 2M rows each (q48 65 s / q19 21 s in the sf1 sweep). Here
    * rows bucket by APPROXIMATE value boundaries (accuracy irrelevant —
    * exactness comes from counting), each (key, bucket) sorts locally in
    * parallel, and the global rank is the bucket's exact counted offset
    * plus the local row_number. The offset rollup is (keys × buckets)
    * rows, and its hash exchange is byte-identical to the window's, so
    * ReuseExchange computes the bucketed frame once. Ties order
    * arbitrarily within equal v — rank endpoints pick the same v either
    * way, so lo/hi/interp are deterministic. */
  def ranked(df: DataFrame, key: String, value: String): DataFrame = {
    val base = df.select(col(key), col(value).as("v"))
    val nb = 32
    val bounds = base.stat
      .approxQuantile("v", (1 until nb).map(_.toDouble / nb).toArray, 0.01)
      .distinct.sorted
    val bucket =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("v") > lit(b), 1).otherwise(0))
        .reduce(_ + _)
    val withB = base.withColumn("b", bucket)
    val wLoc = Window.partitionBy(col(key), col("b")).orderBy(col("v"))
    val wOff = Window.partitionBy(col(key)).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withB.groupBy(col(key), col("b")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(key))))
      .select(col(key), col("b"), col("off"), col("n"))
    withB
      .withColumn("lrn", row_number().over(wLoc).cast("long") - 1L)
      .join(broadcast(offs), Seq(key, "b"))
      .select(col(key), col("v"), (col("off") + col("lrn")).as("rn"), col("n"))
  }

  def pos(p: Double): Column = lit(p) * (col("n") - 1).cast("double")
  /** aggregate pick of the interpolation endpoints (equal when pos is
    * integral, making the frac term vanish) */
  def lo(p: Double): Column = max(when(col("rn") === floor(pos(p)).cast("long"), col("v")))
  def hi(p: Double): Column = max(when(col("rn") === ceil(pos(p)).cast("long"), col("v")))
  /** post-aggregation interpolation over the picked lo/hi columns */
  def interp(p: Double, loCol: String, hiCol: String): Column = {
    val po = pos(p)
    round(col(loCol) + (col(hiCol) - col(loCol)) * (po - floor(po)), 6)
  }
}

object QueryRegistry {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ AdvancedQueries.defs ++ VectorQueries.defs ++
      TextQueries.defs ++ PipelineQueries.defs ++ CurationQueries.defs ++
      RagQueries.defs ++ StreamQueries.defs
}

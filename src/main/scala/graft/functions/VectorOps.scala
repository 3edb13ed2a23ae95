package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column operations over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns.
  *
  * Reference contract (SURVEY.md §2.7 V1-V5): COSINE metric over
  * L2-normalized 384-d vectors (reference `scripts/milvus_db.py:45`,
  * `scripts/prepare_data.py:54` `normalize_embeddings=True`) — normalized
  * vectors make cosine ≡ dot product, which the reference exploits
  * (`scripts/prepare_data.py:101-107`).
  *
  * Implemented as higher-order functions (`zip_with`/`aggregate`/`transform`)
  * so the whole expression stays inside Catalyst — no Scala UDF boxing, and
  * the plan remains whole-stage-codegen friendly. Elements are cast to
  * double before any arithmetic so float rounding never depends on Spark's
  * internal float representation (keeps results bit-identical with the
  * DuckDB oracle, which computes in double too).
  */
object VectorOps {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Dot product: sum_i a_i*b_i, left-to-right in array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def normL2(a: Column): Column =
    sqrt(aggregate(asD(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity. try_divide, not `/`: under Spark 4's default ANSI
    * mode a zero-norm vector would throw DIVIDE_BY_ZERO mid-job; the
    * engine's semantics (and the CosineSim kernel's) is NULL — undefined
    * cosine, sorts last in a descending top-k. */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), normL2(a) * normL2(b))

  /** Squared Euclidean distance. */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** L2-normalize; an all-zero vector normalizes to itself (not NaN).
    * COST: the norm aggregate sits inside the transform lambda, so it
    * re-evaluates per output element — O(dim²) per row (Catalyst has no
    * CSE inside lambdas; TextEmbed's header documents the blow-up). Fine
    * for specs and one-off columns; for a HOT path stage the norm as its
    * own column first (the EmbedSig kernel does exactly that for the
    * embed pipeline). */
  def l2Normalize(a: Column): Column = {
    val n = normL2(a)
    transform(asD(a), x => when(n === lit(0.0), lit(0.0)).otherwise(x / n))
  }
}

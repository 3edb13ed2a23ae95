package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic offline text embedder.
  *
  * The reference embeds with SentenceTransformer("Snowflake/
  * snowflake-arctic-embed-s"), dim 384, L2-normalized
  * (`scripts/prepare_data.py:21-22,50-54`). That model needs network +
  * native libs; this zero-egress stand-in preserves the CONTRACT the rest
  * of the engine relies on — fixed dimension, L2-normalized (cosine ≡
  * dot), deterministic, similar texts → similar vectors (hashed
  * bag-of-words) — while staying a pure column pipeline with an exact
  * DuckDB twin, so retrieval is oracle-checkable end to end.
  *
  * Shape: token → 60-bit md5 hash → bucket = h % dim; v[i] = #tokens in
  * bucket i; L2-normalize. (A hashed term-frequency vector.)
  *
  * IMPORTANT perf note: every stage is materialized as its own column via
  * `withEmbed` (never one nested Column expression). Catalyst does NOT do
  * common-subexpression elimination inside lambda functions, so a nested
  * l2Normalize(embedRaw(tokens(text))) tree re-evaluates tokenization and
  * md5 per output element — O(dim² · tokens) per row. Staged columns are
  * aliases, which the optimizer will not re-inline when referenced more
  * than once (CollapseProject only inlines cheap expressions).
  */
object TextEmbed {

  /** Default dim matches the driver testdata embeddings table (64-d). */
  val DefaultDim = 64

  /** Adds `outCol` = deterministic L2-normalized embedding of `textCol`.
    * Each intermediate (tokens, per-token buckets, raw counts, norm) is
    * one column evaluated once per row.
    */
  def withEmbed(df: DataFrame, textCol: String, outCol: String,
                dim: Int = DefaultDim): DataFrame = {
    val toks = "__embed_toks"
    val bkts = "__embed_buckets"
    val raw = "__embed_raw"
    val nrm = "__embed_norm"
    df.withColumn(toks, TextOps.tokens(col(textCol)))
      .withColumn(bkts, transform(col(toks), t => XHash.hash60(t) % lit(dim.toLong)))
      .withColumn(raw, transform(sequence(lit(0L), lit(dim - 1L)),
        i => size(filter(col(bkts), b => b === i)).cast("double")))
      .withColumn(nrm, sqrt(aggregate(col(raw), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn(outCol,
        when(col(nrm) === 0.0, col(raw))
          .otherwise(transform(col(raw), x => x / col(nrm))))
      .drop(toks, bkts, raw, nrm)
  }

  /** Driver-side Scala twin of `withEmbed` — for embedding query strings
    * once on the driver (broadcast as a literal), exactly matching the
    * column pipeline bit for bit. Asserted equal in TextEmbedSpec.
    */
  def embedScala(text: String, dim: Int = DefaultDim): Array[Double] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val v = new Array[Double](dim)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    toks.foreach { t =>
      val hex = mdig.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      v((h % dim).toInt) += 1.0
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** DuckDB twin (staged through CTE columns — DuckDB evaluates each
    * SELECT-list column once per row, so no blow-up there either).
    * Returns (withClauses, vecExpr): compose into `WITH s0 AS (...) ...`.
    */
  def embedSqlStages(srcTable: String, idCol: String, textExpr: String,
                     dim: Int = DefaultDim, prefix: String = "e"): String = {
    val toks = TextOps.tokensSql(textExpr)
    val h = XHash.hash60Sql("t")
    s"""${prefix}_toks AS (
       |  SELECT $idCol, list_transform($toks, t -> ($h % $dim)) AS bkts FROM $srcTable),
       |${prefix}_raw AS (
       |  SELECT $idCol, list_transform(range(0, $dim), i -> len(list_filter(bkts, b -> b = i))::DOUBLE) AS raw
       |  FROM ${prefix}_toks),
       |${prefix}_vec AS (
       |  SELECT $idCol,
       |         CASE WHEN sqrt(list_sum(list_transform(raw, x -> x*x))) = 0 THEN raw
       |              ELSE list_transform(raw, x -> x / sqrt(list_sum(list_transform(raw, y -> y*y)))) END AS vec
       |  FROM ${prefix}_raw)""".stripMargin
  }
}

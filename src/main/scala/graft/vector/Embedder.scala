package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._
import graft.functions.TextEmbed

/** V1: the pluggable embedding boundary (SURVEY.md §1.4 / §2.7).
  *
  * The reference calls `SentenceTransformer.encode(texts,
  * normalize_embeddings=True)` in batches (`scripts/prepare_data.py:50-54`)
  * — but re-loads the model on EVERY eval call (`scripts/eval.py:24-28`),
  * a perf bug SURVEY.md flags. This trait fixes the lifecycle: `open()`
  * runs once per partition (executor-lifetime model init), `embedBatch`
  * amortizes encoding across the partition's rows.
  *
  * Two interchangeable implementations of the same contract (fixed dim,
  * L2-normalized):
  *   - `TextEmbed.withEmbed` — pure Catalyst columns, used when the
  *     embedding must be oracle-checkable / stay inside codegen;
  *   - `HashingEmbedder` here — the mapPartitions path a real model
  *     (JNI/ONNX sentence-transformer) would use, batch-shaped.
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Called once per partition before any batch — model init goes here. */
  def open(): Unit = ()
  def embedBatch(texts: Seq[String]): Seq[Array[Double]]
}

/** Deterministic offline embedder — same vectors as TextEmbed.embedScala. */
final class HashingEmbedder(override val dim: Int = TextEmbed.DefaultDim) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
    texts.map(t => TextEmbed.embedScala(t, dim))
}

object Embedder {

  /** Adds `outCol` = embedder(textCol) via mapPartitions: one `open()` and
    * batched encoding per partition. Batches of `batchSize` bound memory
    * (the reference's insert batching, applied to encode).
    */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
                    embedder: Embedder, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType, containsNull = false)))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      embedder.open() // once per partition — executor-lifetime init point
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}

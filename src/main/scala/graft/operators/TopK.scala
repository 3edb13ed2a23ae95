package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Per-group top-k as a typed Aggregator — the scale-native alternative
  * to the window formulation. `row_number() OVER (PARTITION BY g ORDER BY
  * v)` must SORT every group's full row set inside the exchange; this
  * aggregator carries a bounded k-element buffer instead, so the
  * per-partition pass is O(n log k), the shuffle moves at most k rows per
  * group per map task (map-side partial aggregation — the win the window
  * can never have), and no sort of the full data ever happens. At 100 TB
  * with heavy groups that is the difference between spilling a sort and
  * streaming a heap.
  *
  * Determinism: ordering is (value DESC, id ASC) — ties cannot reorder
  * across partitionings because the id tiebreak is total. The buffer is
  * a sorted List (k is small by contract; insertion keeps it ordered) so
  * merge = ordered re-insertion, order-independent.
  */
object TopK {

  /** Sorted top-k buffer: items descending by value, id-ascending ties. */
  final case class Buf(items: List[(Double, Long)])

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Ordered insertion into a k-bounded sorted buffer — the single
    * primitive behind both the batch Aggregator (reduce AND merge) and
    * the streaming GroupState fold (`StreamingIngest.streamingTopK`):
    * one definition, so batch ≡ streaming by construction. */
  def insert(k: Int, buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // NaN never ranks (same contract as a NULL score) — see
    // TopKState.insert: a NaN would land order-dependently because every
    // comparison against it is false. Mirrored here so batch, native-agg,
    // and streaming folds agree on corrupt-score rows.
    if (x._1.isNaN) return buf
    val (before, after) = buf.span(e => lt(e, x))
    val merged = before ::: x :: after
    if (merged.length > k) merged.take(k) else merged
  }

  /** Top-k (value, id) pairs by value DESC, id ASC. Returns the sorted
    * buffer; callers explode `items` to rows. */
  def aggregator(k: Int): Aggregator[(Double, Long), Buf, Buf] =
    new Aggregator[(Double, Long), Buf, Buf] {
      def zero: Buf = Buf(Nil)
      def reduce(b: Buf, a: (Double, Long)): Buf = Buf(insert(k, b.items, a))
      def merge(x: Buf, y: Buf): Buf = Buf(y.items.foldLeft(x.items)(insert(k, _, _)))
      def finish(b: Buf): Buf = b
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }
}

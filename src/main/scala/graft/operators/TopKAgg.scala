package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer over two primitive arrays — the aggregation
  * state of [[TopKAgg]]. Ordering is (value DESC, id ASC), the same
  * total order as `TopK.insert`; k is small by contract so the ordered
  * insert's O(k) shift beats heap bookkeeping.
  */
final class TopKState(val k: Int) {
  require(k >= 1, s"topK: need k >= 1, got $k") // fail at construction,
  // not as an opaque ArrayIndexOutOfBounds inside the first insert
  val vs = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  def insert(v: Double, id: Long): Unit = {
    // NaN never ranks (same contract as a NULL score): every comparison
    // against NaN is false, so it would insert at the FRONT of a non-full
    // buffer but be REJECTED by a full one — an order-dependent result
    // that varies with partitioning. A NaN score is corrupt data (NaN
    // embedding cells); excluding it is the only deterministic total order.
    if (v != v) return
    if (n == k) {
      // full buffer: reject anything not better than the current tail
      val lv = vs(k - 1); val li = ids(k - 1)
      if (!(v > lv || (v == lv && id < li))) return
    }
    var pos = 0
    while (pos < n && (vs(pos) > v || (vs(pos) == v && ids(pos) < id))) pos += 1
    var j = math.min(n, k - 1)
    while (j > pos) { vs(j) = vs(j - 1); ids(j) = ids(j - 1); j -= 1 }
    vs(pos) = v; ids(pos) = id
    if (n < k) n += 1
  }
}

/** Native per-group top-k: a Catalyst `TypedImperativeAggregate` that
  * replaces the typed-Dataset `operators.TopK` Aggregator on the hot
  * paths. Same (value DESC, id ASC) contract and therefore the same
  * results — but the typed Aggregator forces a per-row encoder boundary
  * (`DeserializeToObject` → Scala tuples → product-encoded `Buf` List),
  * which measured 1.5-2× slower than the window formulation it was meant
  * to beat at sf0.1 candidate sizes. This expression reads its two
  * children straight off the `InternalRow` inside ObjectHashAggregate,
  * keeps state in primitive arrays, and serializes ONLY at the
  * partial→final shuffle boundary — O(n log k) asymptotics AND window-
  * beating constants. Output is `array<struct<v,id>>` sorted by the
  * buffer order; callers `posexplode` to rows.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] with BinaryLike[Expression] {

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(b: TopKState, row: InternalRow): TopKState = {
    val v = left.eval(row)
    if (v != null) {
      val id = right.eval(row)
      if (id != null) b.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKState, o: TopKState): TopKState = {
    var i = 0
    while (i < o.n) { b.insert(o.vs(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKState): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { out(i) = InternalRow(b.vs(i), b.ids(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.vs(i)).putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new TopKState(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { s.vs(i) = bb.getDouble(); s.ids(i) = bb.getLong(); i += 1 }
    s.n = n
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE, BIGINT), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.outType

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "top_k_pairs"
}

object TopKAgg {
  private[operators] val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** `top_k_pairs(value, id, k)` as a Column aggregate: top-k (v, id)
    * structs by (v DESC, id ASC). Pass plain attribute columns (compute
    * negations/casts in a prior select) so the codegen'd project feeds
    * the aggregate bound references, not interpreted subtrees. */
  def topK(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(value), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}

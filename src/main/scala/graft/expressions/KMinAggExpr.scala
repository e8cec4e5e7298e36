package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The KMV sketch state (k smallest DISTINCT longs, ascending) as a
  * binary-buffer [[TypedImperativeAggregate]] — the expression twin of
  * [[graft.operators.TopKAggregator.kMinDistinct]], exactly as
  * [[TopKAggExpr]] is the expression twin of the typed top-k
  * aggregator, and for the same reason (guide §"per-task work"): the
  * typed Aggregator route plans an `AppendColumns` closure that
  * deserializes every input row to a Scala tuple and re-serializes the
  * grouping key (breaking whole-stage codegen around the map side),
  * and its List[Long] buffer round-trips through an ExpressionEncoder
  * on every partial serialization. Here updates read the hash column
  * straight from the InternalRow, the buffer is a primitive long
  * array, and partial buffers ship as raw bytes. Same merge semantics
  * (sorted-distinct, bounded by k), same ascending output — the
  * retained set is independent of partition count and merge order, so
  * swapping the implementation cannot move a result
  * (ExpressionsSpec asserts bit-parity with the typed aggregator). */
object KMinAggExpr {
  /** Column builder: aggregate long values into the k smallest
    * DISTINCT values, as an ascending ARRAY<BIGINT>. */
  def kMinDistinct(value: Column, k: Int): Column =
    column(KMinAgg(expression(value), k)
      .toAggregateExpression(isDistinct = false))
}

/** Bounded ascending-distinct buffer of the k smallest longs. */
final class KMinBuf(val k: Int) {
  var n: Int = 0
  val vs: Array[Long] = new Array[Long](k)

  def insert(v: Long): Unit = {
    // a full buffer whose largest retained min is <= v cannot change
    if (n == k && v >= vs(n - 1)) return
    // binary search for the insertion point in the ascending prefix
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < n && vs(lo) == v) return // distinct: duplicates collapse
    val last = if (n < k) n else k - 1
    var j = last
    while (j > lo) { vs(j) = vs(j - 1); j -= 1 }
    vs(lo) = v
    if (n < k) n += 1
  }
}

case class KMinAgg(valueExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinBuf] {

  override def children: Seq[Expression] = Seq(valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmin_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be BIGINT, got ${valueExpr.dataType}")

  override def createAggregationBuffer(): KMinBuf = new KMinBuf(k)

  override def update(buf: KMinBuf, input: InternalRow): KMinBuf = {
    val v = valueExpr.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KMinBuf, b: KMinBuf): KMinBuf = {
    var i = 0
    while (i < b.n) { a.insert(b.vs(i)); i += 1 }
    a
  }

  override def eval(buf: KMinBuf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = buf.vs(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KMinBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KMinBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0))
}

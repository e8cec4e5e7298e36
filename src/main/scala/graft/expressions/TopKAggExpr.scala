package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Grouped top-k as a [[TypedImperativeAggregate]] — the binary-buffer
  * rendition of [[graft.operators.TopKAggregator]] (SURVEY.md §4 names
  * this as the dedicated custom piece). Same total order (score desc,
  * id asc ⇒ partition-count invariant, oracle-deterministic), but the
  * buffer is a primitive array serialized as raw bytes for shuffle —
  * no ExpressionEncoder round-trip per partial row, and updates run
  * against InternalRow directly, keeping the map side allocation-light.
  * Participates in partial aggregation: each partition ships at most k
  * candidates per group.
  */
object TopKAggExpr {
  /** Column builder: aggregate (id, score) pairs into the top-k
    * ARRAY<STRUCT<id, score>>, best-first. */
  def topK(id: Column, score: Column, k: Int): Column =
    column(TopKAgg(expression(id), expression(score), k)
      .toAggregateExpression(isDistinct = false))
}

/** Bounded best-k buffer over (score desc, id asc). The score order is
  * total (java.lang.Double.compare): NaN ranks greatest — matching
  * Spark's `orderBy(desc)` which sorts NaN first — and -0.0 is
  * normalized to 0.0 on insert, so a NaN or signed zero can never
  * break the sortedness invariant and silently drop candidates. */
final class TopKBuf(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  private def better(s: Double, i: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2)
    c > 0 || (c == 0 && i < i2)
  }

  def insert(id: Long, rawScore: Double): Unit = {
    val score = if (rawScore == 0.0d) 0.0d else rawScore // -0.0 -> 0.0
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    // find insertion point (arrays kept sorted best-first)
    var pos = n
    while (pos > 0 && better(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    val last = if (n < k) n else k - 1
    var j = last
    while (j > pos) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
    if (pos < k) { ids(pos) = id; scores(pos) = score }
    if (n < k) n += 1
  }
}

case class TopKAgg(idExpr: Expression, scoreExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be (BIGINT, DOUBLE), got (${idExpr.dataType}, ${scoreExpr.dataType})")

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val id = idExpr.eval(input)
    val sc = scoreExpr.eval(input)
    if (id != null && sc != null)
      buf.insert(id.asInstanceOf[Long], sc.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { a.insert(b.ids(i), b.scores(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

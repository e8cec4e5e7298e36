package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-Bloom membership probe — the semi-join reduction primitive.
  *
  * The 100 TB use: one side of an equi-join is tiny relative to the
  * other (a benchmark shingle set vs a corpus), but the big side must
  * still be shuffled to join. Building a Bloom sketch of the small
  * side's keys (distributed partial sketches, OR-merged — a
  * `treeAggregate`, only the final bits reach the driver) and probing
  * it on the big side BEFORE the exchange drops the non-matching rows
  * where they were read, so the shuffle carries candidate rows only.
  * False positives survive the probe but are eliminated by the exact
  * join that follows; false negatives are impossible — so any plan
  * using this prefilter is provably result-identical to the plain
  * join (asserted by CurationQueriesSpec).
  *
  * This mirrors what Spark's runtime bloom-filter join injection
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does for
  * shuffle joins it can see through; expressing it explicitly keeps
  * the reduction when the build side is the output of an arbitrary
  * DataFrame pipeline the optimizer cannot cost.
  */
object BloomExpressions {

  /** `true` iff `c` (BIGINT) might be in the broadcast sketch. */
  def mightContain(c: Column, bf: Broadcast[BloomFilter]): Column =
    column(BloomMightContainExpr(expression(c), bf))
}

/** Codegen'd probe: one `mightContainLong` call per row against the
  * executor-local broadcast value (fetched once per generated class,
  * not per row). */
case class BloomMightContainExpr(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"argument must be BIGINT, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    bf.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bfRef = ctx.addReferenceObj("bloomBroadcast", bf,
      classOf[Broadcast[_]].getName)
    val local = ctx.addMutableState(bloomCls, "bloomFilter",
      v => s"$v = ($bloomCls) $bfRef.value();")
    defineCodeGen(ctx, ev, c => s"$local.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

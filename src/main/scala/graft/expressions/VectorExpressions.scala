package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §4:
  * "custom Catalyst `Expression` with `doGenCode` — fastest").
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are *not*
  * whole-stage-codegen'd — each element evaluation goes through an
  * interpreted lambda dispatch. For one scored row that is irrelevant;
  * for a pairwise similarity join producing millions of rows it
  * dominates the query (bench: 51 s for 2M cosine pairs at sf0.1).
  * These expressions generate a tight primitive loop instead, while
  * computing the *same sequential left-to-right Double folds* as the
  * HOF formulations (graft.functions.VectorFunctions) and the DuckDB
  * oracle — bit-identical results, orders of magnitude less dispatch.
  */
object VectorExpressions {

  /** Cosine similarity of two ARRAY<FLOAT> columns in one pass
    * (dot + both norms in a single loop). Null/zero-norm → null,
    * matching [[graft.functions.VectorFunctions.cosineSimilarity]]. */
  def cosine(a: Column, b: Column): Column = column(ArrayFloatCosine(expression(a), expression(b)))

  /** Neo4j score convention (1+cos)/2 on the codegen'd cosine. */
  def neo4jScoreFast(a: Column, b: Column): Column =
    (org.apache.spark.sql.functions.lit(1.0) + cosine(a, b)) / 2.0

  /** Squared L2 distance of two vector columns (each ARRAY<FLOAT> or
    * ARRAY<DOUBLE>) in one primitive loop — the k-means assignment hot
    * path ([[graft.operators.SemDedup]] evaluates it corpus×k times per
    * iteration). Null on length mismatch, matching the `zip_with`
    * formulation's null-padding collapse. */
  def sqDist(a: Column, b: Column): Column = column(ArraySqDist(expression(a), expression(b)))

  /** Intersection size of two pre-sorted distinct ARRAY<LONG> columns
    * via two-pointer merge — no per-row hash set allocation. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedLongIntersectSize(expression(a), expression(b)))

  /** Jaccard |A∩B|/|A∪B| of two pre-sorted distinct ARRAY<LONG>
    * columns, one two-pointer pass; null when both are empty. */
  def sortedJaccard(a: Column, b: Column): Column =
    column(SortedLongJaccard(expression(a), expression(b)))
}

/** cos(a, b) over float arrays; single sequential loop, Double math. */
case class ArrayFloatCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be ARRAY<FLOAT>, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  // zero-norm inputs yield null even when inputs are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // tail elements of the longer array still contribute to its norm
    var j = n
    while (j < a.numElements()) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getFloat(j).toDouble; nb += y * y; j += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  double $x = (double) $a.getFloat($i); $na += $x * $x;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  double $y = (double) $b.getFloat($i); $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ(aᵢ-bᵢ)² over float/double arrays; single sequential loop, Double
  * math (the same left-to-right fold as the HOF formulation — bit-equal,
  * asserted in ExpressionsSpec). Null when lengths differ: `zip_with`
  * pads the shorter side with null and the fold then collapses to null,
  * so this is the HOF result for that case too. */
case class ArraySqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override val nullIntolerant: Boolean = true
  // length-mismatched inputs yield null even when inputs are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be ARRAY<FLOAT> or ARRAY<DOUBLE>, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType

  private def floatElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = floatElems(left); val bf = floatElems(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (floatElems(left)) "getFloat" else "getDouble"
    val getB = if (floatElems(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.$getA($i) - (double) $b.$getB($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard of two sorted distinct ARRAY<LONG> inputs in one pass;
  * null when the union is empty (division undefined). */
case class SortedLongJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override val nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be ARRAY<BIGINT>, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = HashOps.sortedJaccard(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(v)) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("v")
      s"""
         |double $v = graft.expressions.HashOps.sortedJaccard($a, $b);
         |if (java.lang.Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two sorted distinct ARRAY<LONG> inputs (two-pointer). */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arguments must be ARRAY<BIGINT>, got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    while (i < a.numElements() && j < b.numElements()) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0;
         |${ev.value} = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PortableHash

/** Native codegen'd twins of the PortableHash higher-order-function
  * formulations. Same modular arithmetic, same sequential fold order —
  * bit-identical values (asserted by ExpressionsSpec) — but the per-
  * element work runs as one static JVM call in generated code instead
  * of N interpreted lambda dispatches per row. On the dedup hot paths
  * (minhash/simhash signatures over every token of every document)
  * that is the difference between seconds and minutes at sf0.1.
  */
object HashExpressions {

  /** Codegen'd [[graft.functions.PortableHash.charHash]]. */
  def polyHash(c: Column): Column = column(PolyHashExpr(expression(c)))

  /** Codegen'd per-token hash array: text tokens → ARRAY<LONG>. */
  def minhashSig(hashes: Column): Column = column(MinHashSigExpr(expression(hashes)))

  /** Codegen'd [[graft.operators.Dedup.simhash]]. */
  def simhash48(tokenHashes: Column): Column = column(SimHash48Expr(expression(tokenHashes)))

  /** text → sorted distinct poly-hashes of its n-token shingles, in one
    * pass (no intermediate shingle strings). */
  def shingleHashSet(text: Column, n: Int): Column =
    column(ShingleHashSetExpr(expression(text), n))

  /** text → poly-hashes of its n-token shingles in document order
    * (positional, duplicates kept — winnowing's input). */
  def shingleHashSeq(text: Column, n: Int): Column =
    column(ShingleHashSeqExpr(expression(text), n))

  /** One-pass language ID over the token stream (codegen'd twin of
    * [[graft.functions.TextFunctions.langPredict]]). */
  def langPredict(text: Column): Column = column(LangPredictExpr(expression(text)))
}

/** Loop bodies shared by interpreted eval and generated code. Public
  * static-reachable object so Janino-generated classes can call it. */
object HashOps {
  private val P = PortableHash.P
  private val minA: Array[Long] = PortableHash.MinhashFamily.map(_._1).toArray
  private val minB: Array[Long] = PortableHash.MinhashFamily.map(_._2).toArray
  private val simA: Array[Long] = PortableHash.SimhashFamily.map(_._1).toArray
  private val simB: Array[Long] = PortableHash.SimhashFamily.map(_._2).toArray

  /** (acc*31 + char) % P over UTF-16 units — identical to the
    * `split('')` fold for BMP text (the corpus is ASCII). */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31 + str.charAt(i)) % P
      i += 1
    }
    h
  }

  /** Per-family min of (a*x+b)%P over the hash array; empty → P. */
  def minhashSig(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val out = new Array[Long](minA.length)
    var k = 0
    while (k < minA.length) {
      var m = P
      var i = 0
      while (i < n) {
        val v = (minA(k) * hs.getLong(i) + minB(k)) % P
        if (v < m) m = v
        i += 1
      }
      out(k) = m
      k += 1
    }
    new GenericArrayData(out)
  }

  /** 48-bit SimHash: bit j set iff majority of (a_j*x+b_j)%P are odd. */
  def simhash48(hs: ArrayData): Long = {
    val n = hs.numElements()
    var sig = 0L
    var j = 0
    while (j < simA.length) {
      var vote = 0L
      var i = 0
      while (i < n) {
        val v = (simA(j) * hs.getLong(i) + simB(j)) % P
        vote += (if ((v & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (vote > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Sorted distinct poly-hashes of the n-token shingles of `text`,
    * tokens split on single spaces with empties dropped. Shingle hash
    * == polyHash of the '|'-joined shingle string (same char fold, the
    * separators hashed in place), so values are identical to hashing
    * the materialized shingle strings. */
  /** Poly-hashes of the n-token shingles of `text` in DOCUMENT ORDER
    * (one hash per shingle position, duplicates kept) — the positional
    * core [[shingleHashSet]] sorts and dedupes, and what winnowing
    * (q115) consumes directly: window-min selection needs positions. */
  def shingleHashSeq(text: UTF8String, n: Int): Array[Long] = {
    val s = text.toString
    // token boundaries (split on ' ', drop empties) — matches tokensSql
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return Array.empty[Long]
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      var h = 0L
      var t = 0
      while (t < n) {
        if (t > 0) h = (h * 31 + '|') % P
        val tok = toks.get(k + t)
        var c = 0
        while (c < tok.length) {
          h = (h * 31 + tok.charAt(c)) % P
          c += 1
        }
        t += 1
      }
      out(k) = h
      k += 1
    }
    out
  }

  /** ARRAY<LONG> wrapper of [[shingleHashSeq]] for codegen. */
  def shingleHashSeqData(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashSeq(text, n))

  def shingleHashSet(text: UTF8String, n: Int): ArrayData = {
    val out = shingleHashSeq(text, n)
    val m = out.length
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  /** Jaccard of two sorted distinct long arrays in one pass; null
    * (represented as NaN-free Option in eval) when the union is empty. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    var i = 0; var j = 0; var inter = 0L
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na.toLong + nb.toLong - inter
    if (union == 0L) Double.NaN else inter.toDouble / union.toDouble
  }

  private val langNames: Array[String] =
    graft.functions.TextFunctions.LangProfiles.map(_._1).toArray
  private val langSets: Array[java.util.HashSet[String]] =
    graft.functions.TextFunctions.LangProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  /** Stopword-profile language ID: count profile hits per language in
    * one token pass; argmax in profile order with >= ties; all-zero →
    * "und". Identical to the TextFunctions.langPredict Column tree. */
  def langPredict(text: UTF8String): UTF8String = {
    val s = text.toString
    val counts = new Array[Long](langNames.length)
    var start = 0
    var i = 0
    var total = 0L
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) {
          val tok = s.substring(start, i)
          var l = 0
          while (l < langSets.length) {
            if (langSets(l).contains(tok)) { counts(l) += 1; total += 1 }
            l += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (total == 0) return UTF8String.fromString("und")
    var best = 0
    var l = 1
    while (l < counts.length) {
      if (counts(l) > counts(best)) best = l
      l += 1
    }
    // profile order breaks ties: first index attaining the max
    l = 0
    while (counts(l) < counts(best)) l += 1
    UTF8String.fromString(langNames(l))
  }
}

case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argument must be STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashOps.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"argument must be ARRAY<BIGINT>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashOps.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.minhashSig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashSetExpr(child: Expression, n: Int) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argument must be STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashOps.shingleHashSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.shingleHashSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashSeqExpr(child: Expression, n: Int) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argument must be STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashOps.shingleHashSeqData(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.shingleHashSeqData($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class LangPredictExpr(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"argument must be STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashOps.langPredict(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.langPredict($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash48Expr(child: Expression) extends UnaryExpression {
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"argument must be ARRAY<BIGINT>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    HashOps.simhash48(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashOps.simhash48($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** SparkSessionExtensions hook registering graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")`
  * works next to the Column API (SURVEY.md §4 custom-Catalyst row).
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays"),
      (children: Seq[Expression]) => ArrayFloatCosine(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "graft_poly_hash(s) - portable polynomial string hash"),
      (children: Seq[Expression]) => PolyHashExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(hashes) - 16-slot MinHash signature"),
      (children: Seq[Expression]) => MinHashSigExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(hashes) - 48-bit SimHash signature"),
      (children: Seq[Expression]) => SimHash48Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(text) - sorted distinct poly-hashes of 3-token shingles"),
      (children: Seq[Expression]) => ShingleHashSetExpr(children.head, 3)))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard",
        "graft_jaccard(a, b) - Jaccard similarity of sorted distinct long arrays"),
      (children: Seq[Expression]) => SortedLongJaccard(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_lang_predict"),
      info("graft_lang_predict", "graft_lang_predict(text) - stopword-profile language ID"),
      (children: Seq[Expression]) => LangPredictExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "graft_topk(id, score, k) - aggregate: top-k (id, score) pairs by score desc"),
      (children: Seq[Expression]) => {
        // k is consumed at plan time (it sizes the agg buffer), so it
        // must be a literal: a non-foldable child would otherwise be
        // eval'd against a null row here, yielding garbage or an NPE.
        if (children.size != 3)
          org.apache.spark.sql.GraftBridge.analysisError(
            s"graft_topk expects 3 arguments (id, score, k), got ${children.size}")
        val kExpr = children(2)
        val kVal = if (kExpr.foldable) kExpr.eval() else null
        kVal match {
          case n: Number if n.intValue() > 0 =>
            TopKAgg(children(0), children(1), n.intValue())
          case _ =>
            org.apache.spark.sql.GraftBridge.analysisError(
              "graft_topk: k must be a positive integer literal, got " +
                (if (kExpr.foldable) String.valueOf(kVal) else kExpr.sql))
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      info("graft_intersect_size",
        "graft_intersect_size(a, b) - intersection size of sorted distinct long arrays"),
      (children: Seq[Expression]) => SortedLongIntersectSize(children(0), children(1))))
  }
}

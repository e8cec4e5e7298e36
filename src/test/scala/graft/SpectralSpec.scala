package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Spectral, TfIdf}

class SpectralSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Synthetic corpus: a co-occurrence block (alpha/beta/gamma) plus
    * two outlier docs. Which term tops the component is tf-idf's call
    * (distinctive high-tf terms like zeta score high too) — the spec
    * asserts agreement with an independent dense computation, not a
    * hand-guessed winner. */
  private lazy val toksDf = Seq(
    (1L, Seq("alpha", "beta", "alpha", "gamma")),
    (2L, Seq("alpha", "beta", "delta")),
    (3L, Seq("epsilon", "zeta", "zeta", "zeta")),
    (4L, Seq("alpha", "beta", "beta", "gamma")),
    (5L, Seq("eta", "theta", "eta"))).toDF("doc_id", "toks")

  test("termSignature matches a driver-side dense power iteration") {
    val w = TfIdf.weights(toksDf)
      .select($"doc_id", $"term", $"tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val terms = w.map(_._2).distinct.sorted
    val docs = w.map(_._1).distinct.sorted
    val a = w.map { case (d, t, v) => ((d, t), v) }.toMap
    // x0 = 1; two rounds of y = A x, x' = A^T y, max-scaled + 6dp-rounded
    var x = terms.map(_ => 1.0)
    for (_ <- 1 to 2) {
      val y = docs.map(d =>
        terms.zipWithIndex.map { case (t, i) => a.getOrElse((d, t), 0.0) * x(i) }.sum)
      val xr = terms.map(t =>
        docs.zipWithIndex.map { case (d, j) => a.getOrElse((d, t), 0.0) * y(j) }.sum)
      val mx = xr.map(math.abs).max
      x = xr.map(v => math.rint(v / mx * 1e6) / 1e6)
    }
    val want = terms.zip(x).toMap
    val got = Spectral.termSignature(TfIdf.weights(toksDf), iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (t, s) =>
      // the operator decimal-routes its sums (1e-10 quantization); the
      // naive version sums raw doubles — equal to well under 6 dp
      assert(math.abs(s - want(t)) < 5e-6, s"term $t: got $s want ${want(t)}")
    }
    // max-scaling pins the dominant term's score at exactly 1
    assert(got.values.map(math.abs).max === 1.0)
  }

  test("termSignature is invariant to input partitioning") {
    val base = Spectral.termSignature(TfIdf.weights(toksDf), 2)
      .orderBy($"term").collect().toSeq
    val repart = Spectral.termSignature(
        TfIdf.weights(toksDf.repartition(7)), 2)
      .orderBy($"term").collect().toSeq
    assert(base === repart)
  }

  test("termSignature is invariant to scaling the weight matrix") {
    // power iteration is scale-free; ×4 (a power of two: exact in FP)
    val w = TfIdf.weights(toksDf)
    val base = Spectral.termSignature(w, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scaled = Spectral.termSignature(
        w.withColumn("tfidf", $"tfidf" * 4.0), 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    base.foreach { case (t, s) =>
      assert(math.abs(s - scaled(t)) < 1e-5, s"term $t: $s vs ${scaled(t)}")
    }
  }

  test("topSignature ranks are the score-desc term-asc prefix") {
    val all = Spectral.termSignature(TfIdf.weights(toksDf), 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (t, s) => (-s, t) }
    val top = Spectral.topSignature(TfIdf.weights(toksDf), 2, 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(top.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(top.map(t => (t._2, t._3)).toSeq === all.take(3).toSeq)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier
import graft.operators.QualityClassifier.BiasFeature

class QualityClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def featDf(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("doc_id", "y", "b")

  test("one GD iteration matches the hand-computed update") {
    // doc 0 (y=1): features {bias, 10}; doc 1 (y=0): features {bias, 20}
    // w0 = 0 ⇒ z = 0, σ(0) = 0.5 ⇒ r = ∓0.5; N = 2, lr = 0.5:
    //   w(10)  = 0 − 0.5·(−0.5)/2 = +0.125
    //   w(20)  = 0 − 0.5·(+0.5)/2 = −0.125
    //   w(bias): g = −0.5 + 0.5 = 0 ⇒ stays 0
    val train = featDf(Seq(
      (0L, 1.0, BiasFeature), (0L, 1.0, 10L),
      (1L, 0.0, BiasFeature), (1L, 0.0, 20L)))
    val w = QualityClassifier.fit(train, iters = 1, lr = 0.5).toMap
    assert(w === Map(BiasFeature -> 0.0, 10L -> 0.125, 20L -> -0.125))
  }

  test("fit is bit-identical across partitionings (decimal-routed sums)") {
    val rows = (0 until 80).flatMap { d =>
      val y = if (d % 2 == 0) 1.0 else 0.0
      val fs = Seq(BiasFeature) ++ (0 until 5).map(i => ((d * 7 + i * 13) % 50).toLong)
      fs.distinct.map(b => (d.toLong, y, b))
    }
    val a = QualityClassifier.fit(featDf(rows).repartition(1), iters = 2, lr = 0.5)
    val b = QualityClassifier.fit(featDf(rows).repartition(7), iters = 2, lr = 0.5)
    assert(a === b)
  }

  test("a separable corpus separates: positives above 0.5, negatives below") {
    // positives all carry feature 100, negatives all carry feature 200
    val train = (0 until 20).flatMap { d =>
      val y = if (d < 10) 1.0 else 0.0
      val marker = if (d < 10) 100L else 200L
      Seq((d.toLong, y, BiasFeature), (d.toLong, y, marker))
    }
    val w = QualityClassifier.fit(featDf(train), iters = 2, lr = 0.5)
    val scored = QualityClassifier.score(
        featDf(train).select($"doc_id", $"b"), w, keyCols = Nil)
      .select($"doc_id", $"score", $"pred")
      .as[(Long, Double, Int)].collect().sortBy(_._1)
    scored.foreach { case (d, s, p) =>
      if (d < 10) { assert(s > 0.5, s"doc $d"); assert(p === 1) }
      else { assert(s < 0.5, s"doc $d"); assert(p === 0) }
    }
  }

  test("unseen features score as zero weight; n_feats still counts them") {
    val train = featDf(Seq(
      (0L, 1.0, BiasFeature), (0L, 1.0, 10L),
      (1L, 0.0, BiasFeature), (1L, 0.0, 20L)))
    val w = QualityClassifier.fit(train, iters = 1, lr = 0.5)
    // holdout doc 9 has only never-seen features: z = 0 ⇒ score 0.5
    val holdout = Seq((9L, 777L), (9L, 888L)).toDF("doc_id", "b")
    val r = QualityClassifier.score(holdout, w, keyCols = Nil)
      .select($"n_feats", $"score", $"pred").as[(Long, Double, Int)].head()
    assert(r === ((2L, 0.5, 1)))
  }

  test("sessionFit memoizes: identical weights to fit, one build per key") {
    val rows = Seq(
      (0L, 1.0, BiasFeature), (0L, 1.0, 10L),
      (1L, 0.0, BiasFeature), (1L, 0.0, 20L))
    val direct = QualityClassifier.fit(featDf(rows), iters = 2, lr = 0.5)
    var builds = 0
    def train = { builds += 1; featDf(rows) }
    val key = s"memo-spec-${System.nanoTime()}"
    val w1 = QualityClassifier.sessionFit(spark, key, "t1", train, 2, 0.5)
    val w2 = QualityClassifier.sessionFit(spark, key, "t1", train, 2, 0.5)
    assert(w1 === direct)         // the memo changes cost, not the answer
    assert(w2 eq w1)              // second call returns the memoized table
    assert(builds === 1)          // by-name train: never rebuilt on a hit
    // different hyperparams are a different key — not a stale hit
    val w3 = QualityClassifier.sessionFit(spark, key, "t1", train, 1, 0.5)
    assert(builds === 2)
    assert(w3 !== w1)
    // a different TRAIN-TABLE TAG is a different key too: a caller
    // with another training table must never receive t1's weights
    var builds2 = 0
    def train2 = { builds2 += 1
      featDf(Seq((0L, 1.0, BiasFeature), (1L, 0.0, BiasFeature))) }
    val w4 = QualityClassifier.sessionFit(spark, key, "t2", train2, 2, 0.5)
    assert(builds2 === 1)
    assert(w4 !== w1)
  }

  test("fastSigmoid is monotone, centered at 0.5, and stays inside (0,1)") {
    val zs = Seq(-1e9, -3.0, -0.5, 0.0, 0.5, 3.0, 1e9)
    val ps = zs.toDF("z").select(QualityClassifier.fastSigmoid($"z"))
      .as[Double].collect().toSeq
    assert(ps === ps.sorted)
    assert(ps(3) === 0.5)
    assert(ps.forall(p => p > 0.0 && p < 1.0))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Property-based invariants from SURVEY.md §5.4: self-similarity,
  * symmetry, bounds, top-k monotonicity, partition invariance.
  * Generators (scalacheck, fixed seed → reproducible) drive the real
  * Column API so the properties hold for the codegen'd expressions the
  * queries actually use; cases are batched into one DataFrame per
  * property to keep Spark round-trips sane. */
class VectorPropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val N = 60

  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until N).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-10f, 10f)).map(_.toSeq)
      .suchThat(v => v.exists(_ != 0f))

  test("cosine(v, v) == 1 for non-zero vectors") {
    val vs = samples(vecGen)
    val bad = vs.map(v => (v, v)).toDF("a", "b")
      .select(cosineSimilarity($"a", $"b").as("c"))
      .filter(abs($"c" - 1.0) >= 1e-9)
    assert(bad.count() === 0)
  }

  test("cosine symmetry: cos(a,b) == cos(b,a) bit-exactly") {
    val pairs = samples(Gen.zip(vecGen, vecGen))
    val bad = pairs.toDF("a", "b")
      .select(cosineSimilarity($"a", $"b").as("ab"), cosineSimilarity($"b", $"a").as("ba"))
      .filter($"ab" =!= $"ba")
    assert(bad.count() === 0)
  }

  test("cosine is bounded in [-1, 1] (within float rounding)") {
    val pairs = samples(Gen.zip(vecGen, vecGen))
    val bad = pairs.toDF("a", "b")
      .select(cosineSimilarity($"a", $"b").as("c"))
      .filter($"c" < -1.0 - 1e-9 || $"c" > 1.0 + 1e-9)
    assert(bad.count() === 0)
  }

  test("top-(k+1) contains top-k (monotonicity) on the fixture corpus") {
    val eng = new graft.search.SearchEngine(spark)
    val corpus = eng.corpus(sf0001).cache()
    val q = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0).toArray
    val top5 = eng.topK(corpus, q, 5).collect().map(_.doc_id).toSet
    val top6 = eng.topK(corpus, q, 6).collect().map(_.doc_id).toSet
    assert(top5.subsetOf(top6))
  }

  test("top-k is invariant under corpus repartitioning") {
    val eng = new graft.search.SearchEngine(spark)
    val corpus = eng.corpus(sf0001)
    val q = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter($"vec_id" === 7).select($"embedding").head().getSeq[Float](0).toArray
    val a = eng.topK(corpus, q, 10).collect().map(h => (h.doc_id, h.score)).toSeq
    val b = eng.topK(corpus.repartition(13), q, 10).collect().map(h => (h.doc_id, h.score)).toSeq
    assert(a === b)
  }

  test("each corpus vector is its own nearest neighbor") {
    val eng = new graft.search.SearchEngine(spark)
    val corpus = eng.corpus(sf0001).cache()
    val ids = samples(Gen.chooseNum(0L, 400L)).distinct.take(8)
    for (id <- ids) {
      val q = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .filter($"vec_id" === id).select($"embedding").head().getSeq[Float](0).toArray
      val top = eng.topK(corpus, q, 1).collect().head
      assert(top.doc_id === id, s"vec $id not its own NN")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, vs: (Seq[Float], Seq[Float])*) =
    vs.toSeq.toDF("a", "b").select(c).collect().map(_.get(0))

  test("dot product of known vectors") {
    val r = one(dotProduct($"a", $"b"), (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)))
    assert(r.head == 32.0)
  }

  test("cosine of identical vector is 1, neo4j score is 1") {
    val v = Seq(0.5f, -0.25f, 0.125f)
    assert(math.abs(one(cosineSimilarity($"a", $"b"), (v, v)).head.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(one(neo4jScore($"a", $"b"), (v, v)).head.asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0, opposite is -1 (score 0)") {
    val r = one(cosineSimilarity($"a", $"b"), (Seq(1f, 0f), Seq(0f, 1f)))
    assert(math.abs(r.head.asInstanceOf[Double]) < 1e-12)
    val r2 = one(neo4jScore($"a", $"b"), (Seq(1f, 0f), Seq(-1f, 0f)))
    assert(math.abs(r2.head.asInstanceOf[Double]) < 1e-12)
  }

  test("zero vector gives null cosine (undefined), not NaN") {
    val r = one(cosineSimilarity($"a", $"b"), (Seq(0f, 0f), Seq(1f, 2f)))
    assert(r.head == null)
  }

  test("l2 distance known value") {
    val r = one(l2Distance($"a", $"b"), (Seq(1f, 2f), Seq(4f, 6f)))
    assert(r.head == 5.0)
  }

  test("l2Normalize yields unit norm") {
    val df = Seq(Seq(3f, 4f)).toDF("a")
    val n = df.select(l2Norm(l2Normalize($"a").cast("array<float>"))).head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("hasDim dimension guard (reference server.py:55-58 semantics)") {
    val df = Seq(Seq(1f, 2f, 3f), Seq(1f, 2f)).toDF("a")
    assert(df.filter(hasDim($"a", 3)).count() == 1)
  }

  test("property: cosine symmetry and range on seeded random vectors") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 50).map { _ =>
      val n = 2 + rnd.nextInt(15)
      val a = Seq.fill(n)(rnd.nextFloat() * 20 - 10)
      val b = Seq.fill(n)(rnd.nextFloat() * 20 - 10)
      (a, b)
    }.filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val rows = pairs.toDF("a", "b")
      .select(cosineSimilarity($"a", $"b").as("ab"), cosineSimilarity($"b", $"a").as("ba"))
      .collect()
    rows.foreach { r =>
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
  }

  test("property: top-(k+1) contains top-k (monotone) on fixture corpus") {
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val qv = embs.filter($"vec_id" === 1).select($"embedding")
      .head().getSeq[Float](0)
    def top(k: Int): Seq[Long] = embs
      .withColumn("score", neo4jScore($"embedding", typedLit(qv)))
      .orderBy($"score".desc, $"vec_id".asc).limit(k)
      .select($"vec_id").as[Long].collect().toSeq
    val t5 = top(5); val t6 = top(6)
    assert(t6.take(5) == t5)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash.{JlDim, JlPlanes}
import graft.operators.JlProject

class JlProjectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .filter(size($"embedding") === 64)
    .select($"vec_id", $"embedding")

  test("projection matches a driver-side dot-product recompute") {
    val rows = emb.filter($"vec_id" < 20)
      .select($"vec_id", $"embedding", JlProject.project($"embedding").as("proj"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq, r.getSeq[Double](2).toIndexedSeq))
    assert(rows.nonEmpty)
    rows.foreach { case (id, x, proj) =>
      assert(proj.length === JlDim)
      JlPlanes.zipWithIndex.foreach { case (plane, j) =>
        // same sequential fold the HOF dot performs
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += x(i).toDouble * plane(i); i += 1 }
        val want = math.rint(acc * 0.25 * 1e6) / 1e6
        assert(proj(j) === want, s"vec $id coord $j")
      }
    }
  }

  test("distortion audit: ratios concentrate near 1 as the JL lemma promises") {
    val r = JlProject.distortionAudit(emb, sampleN = 100).collect().head
    val (k, n, mean, lo, hi) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(k === JlDim.toLong)
    assert(n > 1000L) // 100 sampled vectors -> ~4950 nonzero pairs
    // k=16 gives std ~ 1/sqrt(16) per pair; the MEAN over thousands of
    // pairs sits tight around 1, extremes stay within the JL tail
    assert(mean > 0.85 && mean < 1.15, s"mean_ratio $mean")
    assert(lo > 0.2 && hi < 2.5, s"extremes [$lo, $hi]")
    assert(lo <= mean && mean <= hi)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCenter

class KCenterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .filter(size($"embedding") === 64)
    .select($"vec_id", $"embedding")

  test("greedy selection matches a driver-side brute force") {
    val pts = emb.select($"vec_id",
        transform($"embedding", x => round(x.cast("double"), 6)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .sortBy(_._1)
    def d(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
      math.rint(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum * 1e6) / 1e6
    var chosen = Vector(pts.head._2)
    var want = Vector((1L, pts.head._1, 0.0))
    for (r <- 2 to 5) {
      val (id, _, dist) = pts.map { case (id, e) =>
        (id, e, chosen.map(c => d(e, c)).min)
      }.maxBy { case (id, _, dist) => (dist, -id) }
      chosen :+= pts.find(_._1 == id).get._2
      want :+= ((r.toLong, id, dist))
    }
    val got = KCenter.selectReport(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toVector
    assert(got === want)
  }

  test("radii are non-increasing and selection is partition invariant") {
    val base = KCenter.selectReport(emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val radii = base.drop(1).map(_._3)
    assert(radii === radii.sorted.reverse, s"radii must shrink: $radii")
    assert(radii.forall(_ > 0.0))
    val repart = KCenter.selectReport(emb.repartition(13), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(base === repart)
  }
}

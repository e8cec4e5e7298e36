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

  test("selectBatch with B=1 reproduces select exactly (the degeneracy law)") {
    val seq = KCenter.select(emb, 5)
    val batch = KCenter.selectBatch(emb, 5, 1)
    // with B=1 every scan takes one pick, so round == pick == the
    // sequential round; the traces must be identical
    assert(batch.map(t => (t._1, t._3, t._4, t._5)) === seq)
    assert(batch.map(_._1) === batch.map(_._2), "B=1 rounds must equal picks")
  }

  test("selectBatch schedule: seed + full batch + truncated batch, picks numbered globally") {
    val batch = KCenter.selectBatch(emb, 6, 3)
    assert(batch.map(_._2) === (1L to 6L), "picks must be 1..k")
    assert(batch.map(_._1) === Seq(1L, 2L, 2L, 2L, 3L, 3L),
      "k=6 B=3 must scan as seed, 3-pick batch, 2-pick batch")
    // within a batch, picks are ordered by distance-to-pre-round
    // centers desc (ties impossible on this fixture)
    val byRound = batch.groupBy(_._1).values
    byRound.foreach { g =>
      val radii = g.sortBy(_._2).map(_._4)
      assert(radii === radii.sorted.reverse, s"in-batch order broken: $radii")
    }
    // the chosen SET is a valid diversity sample: all ids distinct
    assert(batch.map(_._3).distinct.size === 6)
  }

  test("empty corpus and k > corpus size fail with actionable errors") {
    val empty = emb.filter($"vec_id" < 0)
    val e1 = intercept[IllegalArgumentException](KCenter.select(empty, 3))
    assert(e1.getMessage.contains("empty corpus"))
    val tiny = emb.filter($"vec_id" < 2)
    val e2 = intercept[IllegalArgumentException](KCenter.selectBatch(tiny, 5, 2))
    assert(e2.getMessage.contains("exceeds corpus size"))
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

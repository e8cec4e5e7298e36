package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemDedup

class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def df(vecs: Seq[Seq[Float]]) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("k=1, one iteration: the centroid is the per-dimension mean, rounded once") {
    val corpus = df(Seq(Seq(1f, 0f), Seq(0f, 1f), Seq(0.5f, 0.5f)))
    val Seq(c) = SemDedup.fit(corpus, k = 1, iters = 1)
    assert(c === Seq(0.5, 0.5))
  }

  test("fit is bit-identical across partitionings (decimal-routed sums)") {
    val vecs = (0 until 50).map(i =>
      Seq(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        math.sin(i * 0.3 + 1).toFloat))
    val a = SemDedup.fit(df(vecs).repartition(1), k = 3, iters = 2)
    val b = SemDedup.fit(df(vecs).repartition(7), k = 3, iters = 2)
    assert(a === b)
  }

  test("report marks exactly the closer-to-centroid member of a near-dup pair") {
    // v0 and v1 are a tight pair; v2 sits far on the other axis (same
    // cell, below the pair threshold). SemDeDup keeps the LOWEST
    // centroid similarity: the pair member closer to the centroid is
    // the redundant one.
    val corpus = df(Seq(Seq(1f, 0f), Seq(0.98f, 0.02f), Seq(0f, 1f)))
    val cents = SemDedup.fit(corpus, k = 1, iters = 1)
    val r = SemDedup.report(corpus, cents, minScore = 0.95)
      .orderBy($"vec_id")
      .select($"vec_id", $"centroid_score", $"n_nbrs", $"removed")
      .as[(Long, Double, Long, Int)].collect().toSeq
    assert(r.map(_._3) === Seq(1L, 1L, 0L), "only the tight pair are neighbors")
    val Seq(r0, r1, r2) = r
    assert(r2._4 === 0, "the isolated vector survives")
    assert(Seq(r0, r1).count(_._4 == 1) === 1, "exactly one pair member removed")
    val removedScore = Seq(r0, r1).filter(_._4 == 1).head._2
    val keptScore = Seq(r0, r1).filter(_._4 == 0).head._2
    assert(removedScore > keptScore, "the member CLOSER to the centroid is removed")
  }

  test("pairs are only formed WITHIN a cell — clusters bound candidate volume") {
    // two tight, mutually-orthogonal clusters seeded by vec 0 and 1:
    // cross-cluster cosine is ~0 so no cross pairs exist anyway, but
    // every within-cluster pair must be found
    val corpus = df(Seq(
      Seq(1f, 0f), Seq(0f, 1f),          // seeds
      Seq(0.99f, 0.01f), Seq(0.01f, 0.99f)))
    val cents = SemDedup.fit(corpus, k = 2, iters = 1)
    val r = SemDedup.report(corpus, cents, minScore = 0.95)
      .select($"vec_id", $"cell", $"n_nbrs")
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(r.map(_._2) === Seq(0, 1, 0, 1), "two clean cells")
    assert(r.map(_._3) === Seq(1L, 1L, 1L, 1L), "one within-cell neighbor each")
  }

  test("join-path assignment is bit-identical to the literal fold, ties included") {
    // includes an exact tie: v3 is equidistant from both seeds, so the
    // lowest-cell rule is exercised on both paths
    val vecs = (0 until 60).map(i =>
      Seq(math.sin(i * 1.3).toFloat, math.cos(i * 2.1).toFloat)) :+
      Seq(0.5f, 0.5f)
    val corpus = df(vecs).repartition(5)
    val cents = SemDedup.fit(corpus, k = 4, iters = 1)
    val literal = SemDedup.assignCells(corpus, cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().sortBy(_._1)
    val joined = SemDedup.assignCellsJoin(corpus, cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().sortBy(_._1)
    assert(literal === joined)
  }

  test("fit routes k > LiteralPathMaxK through the join path and matches a driver replay") {
    val dim = 3
    val vecs = (0 until 120).map(i =>
      Seq.tabulate(dim)(d => math.sin(i * 0.7 + d * 1.9).toFloat))
    val k = SemDedup.LiteralPathMaxK + 8
    val spark2 = SemDedup.fit(df(vecs).repartition(7), k, iters = 1)

    // driver-side replay of one Lloyd's iteration under the operator's
    // determinism contract (6dp-rounded distances, lowest-cell ties,
    // 6dp-rounded means)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seeds = vecs.take(k).map(_.map(x => r6(x.toDouble)))
    val asg = vecs.map { v =>
      seeds.zipWithIndex.map { case (c, i) =>
        (r6(v.zip(c).map { case (x, ce) => val d = x.toDouble - ce; d * d }.sum), i)
      }.min._2
    }
    val expect = seeds.indices.map { c =>
      val members = vecs.zip(asg).filter(_._2 == c).map(_._1)
      if (members.isEmpty) seeds(c)
      else Seq.tabulate(dim)(d => r6(members.map(_(d).toDouble).sum / members.size))
    }
    assert(spark2 === expect)
  }

  test("q144 PQ codebook matches an independent driver Lloyd's per subspace") {
    import graft.queries.AnnQueries
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(size($"embedding") === 64)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .sortBy(_._1)
    val (m, dim, k, iters) =
      (AnnQueries.PqM, AnnQueries.PqDim, AnnQueries.PqK, AnnQueries.PqIters)
    // independent Lloyd's: same init (k smallest ids), 6-dp rounded
    // strict-less argmin with lowest-cell ties, decimal-free mean via
    // BigDecimal sums rounded once — written WITHOUT SemDedup.fit
    def sqd(a: Seq[Double], b: Seq[Double]) =
      r6(a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) })
    val want = (0 until m).flatMap { sub =>
      val sl = embs.map { case (id, e) =>
        (id, e.slice(sub * dim, (sub + 1) * dim).map(_.toDouble)) }
      var cents = sl.take(k).map(_._2.map(r6))
      def assign() = sl.map { case (id, v) =>
        (id, v, cents.zipWithIndex.minBy { case (c, i) => (sqd(v, c), i) }._2) }
      (1 to iters).foreach { _ =>
        val asg = assign()
        cents = cents.zipWithIndex.map { case (prev, c) =>
          val mem = asg.filter(_._3 == c).map(_._2)
          if (mem.isEmpty) prev
          else Seq.tabulate(dim)(d =>
            r6((mem.map(v => BigDecimal(v(d))).sum / mem.size).toDouble))
        }
      }
      val asg = assign()
      asg.groupBy(_._3).toSeq.map { case (c, mem) =>
        val md = r6((mem.map(x => BigDecimal(sqd(x._2, cents(c)))).sum /
          mem.size).toDouble)
        (sub.toLong, c.toLong, mem.size.toLong, md)
      }
    }.sortBy(r => (r._1, r._2))
    val got = AnnQueries.queries("q144_pq_codebook")(spark, dir)
      .select($"sub", $"cell", $"n_vecs", $"mean_sqdist")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === want)
    // conservation: every vector is coded in every subspace
    (0 until m).foreach { sub =>
      assert(got.filter(_._1 == sub).map(_._3).sum === embs.length.toLong) }
  }

  test("q145 ADC search matches a driver recompute; recall honestly imperfect") {
    import graft.queries.AnnQueries
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(size($"embedding") === 64)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .sortBy(_._1)
    val (m, dim, k, iters) =
      (AnnQueries.PqM, AnnQueries.PqDim, AnnQueries.PqK, AnnQueries.PqIters)
    def sqd(a: Seq[Double], b: Seq[Double]) =
      r6(a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) })
    val qv = embs.find(_._1 == 0L).get._2.map(_.toDouble)
    // per-subspace Lloyd's (independent impl, as in the q144 spec),
    // then codes + LUT sums for every candidate
    val perSub = (0 until m).map { sub =>
      val sl = embs.map { case (id, e) =>
        (id, e.slice(sub * dim, (sub + 1) * dim).map(_.toDouble)) }
      var cents = sl.take(k).map(_._2.map(r6))
      def assign() = sl.map { case (id, v) =>
        (id, cents.zipWithIndex.minBy { case (c, i) => (sqd(v, c), i) }._2) }
      (1 to iters).foreach { _ =>
        val asg = sl.map(_._2).zip(assign().map(_._2))
        cents = cents.zipWithIndex.map { case (prev, c) =>
          val mem = asg.filter(_._2 == c).map(_._1)
          if (mem.isEmpty) prev
          else Seq.tabulate(dim)(d =>
            r6((mem.map(v => BigDecimal(v(d))).sum / mem.size).toDouble))
        }
      }
      val qSub = qv.slice(sub * dim, (sub + 1) * dim)
      val lut = cents.map(c => sqd(qSub, c))
      assign().filter(_._1 != 0L).map { case (id, c) => id -> lut(c) }.toMap
    }
    val adc = embs.map(_._1).filter(_ != 0L).map { id =>
      id -> r6(perSub.map(_(id)).sum) }.toMap
    val wantTop = adc.toSeq.sortBy { case (id, d) => (d, id) }.take(10)
    val got = AnnQueries.queries("q145_pq_adc")(spark, dir)
      .select($"vec_id", $"adc_d", $"in_exact_topk")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) === wantTop)
    // the in_exact flags match an exact driver top-k
    def cos(a: Seq[Float], b: Seq[Double]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      r6((1.0 + d / (na * nb)) / 2.0)
    }
    val exactTop = embs.filter(_._1 != 0L)
      .map { case (id, e) => (id, cos(e, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    got.foreach { case (id, _, flag) =>
      assert(flag === (if (exactTop(id)) 1L else 0L), s"vec $id") }
    // coarse 64x compression: recall must be partial BUT non-zero —
    // both vacuous extremes (0 and 10) would mean something is off.
    // Measured: 1/10 at sf0.001 (500 vecs), 5/10 at sf0.01 — the
    // deeper corpus gives the 4-cell codebooks more to work with.
    val recall = got.count(_._3 == 1L)
    assert(recall >= 1 && recall <= 9, s"recall $recall/10")
  }

  test("an emptied cell keeps its previous centroid") {
    // seeds 0 and 1 are identical, so EVERY vector ties between them
    // and the lowest-cell tie-break sends all of them (seed 1's own
    // vector included) to cell 0 — cell 1 empties on the first
    // assignment and must keep its seed centroid instead of vanishing
    val corpus = df(Seq(Seq(0f, 0f), Seq(0f, 0f), Seq(3f, 3f), Seq(1f, 1f)))
    val cents = SemDedup.fit(corpus, k = 2, iters = 1)
    assert(cents === Seq(Seq(1.0, 1.0), Seq(0.0, 0.0)))
  }
}

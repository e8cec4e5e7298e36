package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnnQueries

class MarginMiningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mine(
      test: Seq[(Long, Seq[Float])],
      pool: Seq[(Long, Seq[Float])],
      k: Int): Seq[(Long, Long, Double, Double)] =
    AnnQueries.marginMine(
        test.toDF("vec_id", "qe"), pool.toDF("nn_id", "pe"), k)
      .orderBy($"vec_id")
      .as[(Long, Long, Double, Double)].collect().toSeq

  /** Driver-side reference: same formula, 6-dp scores, BigDecimal
    * normalizer sums, double ratio rounded once. */
  private def reference(
      test: Seq[(Long, Seq[Float])],
      pool: Seq[(Long, Seq[Float])],
      k: Int): Seq[(Long, Long, Double, Double)] = {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      r6(d / (na * nb))
    }
    val cx = for ((x, qe) <- test; (y, pe) <- pool) yield (x, y, cos(pe, qe))
    def topSum(scores: Seq[(Double, Long)]): BigDecimal =
      scores.sortBy { case (s, id) => (-s, id) }.take(k)
        .map { case (s, _) => BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP) }
        .sum
    val sx = test.map { case (x, _) =>
      x -> topSum(cx.collect { case (`x`, y, s) => (s, y) }) }.toMap
    val sy = pool.map { case (y, _) =>
      y -> topSum(cx.collect { case (x, `y`, s) => (s, x) }) }.toMap
    test.map { case (x, _) =>
      val cands = cx.collect { case (`x`, y, s) =>
        (x, y, s, r6(s * (2 * k) / (sx(x) + sy(y)).toDouble)) }
      cands.sortBy { case (_, y, _, m) => (-m, y) }.head
    }.sortBy(_._1)
  }

  private val hubTest = Seq(
    1L -> Seq(0.98f, 0.2f), 2L -> Seq(0.95f, -0.3f), 3L -> Seq(0.99f, -0.1f))
  private val hubPool = Seq(
    10L -> Seq(1.0f, 0.0f), 20L -> Seq(0.90f, 0.42f), 30L -> Seq(0.5f, -0.86f))

  test("margin demotes the hub: raw-cos argmax and margin argmax differ") {
    val r = mine(hubTest, hubPool, k = 2)
    // every query's raw-cos favorite is the hub (vector 10)...
    val rawBest = hubTest.map { case (x, qe) =>
      x -> hubPool.maxBy { case (y, pe) =>
        (reference(Seq(x -> qe), Seq(y -> pe), 1).head._3, -y) }._1
    }.toMap
    assert(rawBest(1L) === 10L)
    // ...but query 1's margin winner is its true mate (20): the hub's
    // own crowded neighborhood inflates its normalizer
    assert(r.map(t => t._1 -> t._2) === Seq(1L -> 20L, 2L -> 10L, 3L -> 10L))
  }

  test("matches the driver-side reference formula exactly") {
    val rnd = new scala.util.Random(7)
    def v() = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val test = (0L until 6L).map(i => i -> v())
    val pool = (100L until 130L).map(i => i -> v())
    assert(mine(test, pool, k = 4) === reference(test, pool, k = 4))
  }

  test("result is invariant to pool partitioning") {
    val rnd = new scala.util.Random(11)
    def v() = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val test = (0L until 4L).map(i => i -> v())
    val pool = (100L until 160L).map(i => i -> v())
    val a = mine(test, pool, k = 3)
    val b = AnnQueries.marginMine(
        test.toDF("vec_id", "qe"),
        pool.toDF("nn_id", "pe").repartition(13), 3)
      .orderBy($"vec_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("q163 paraphrase pairs satisfy both gates and live in one sign-LSH bucket") {
    val out = SparkEntry.queries("q163_paraphrase_mining")(spark, sf0001)
      .select($"vec_a", $"vec_b", $"score", $"jac")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.nonEmpty, "fixture should yield paraphrase candidates")
    assert(out.forall(r => r._3 >= AnnQueries.ParaSimTau && r._4 <= AnnQueries.ParaJacMax))
    // the declared candidate rule: both members share a bucket
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id",
        graft.functions.PortableHash.lshBucket($"embedding").as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(out.forall(r => e(r._1) == e(r._2)), "pair spans buckets")
    // completeness against a driver-side recompute of the declared
    // rule: every same-bucket pair passing both gates must be present
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      (1.0 + d / (math.sqrt(na) * math.sqrt(nb))) / 2.0
    }
    val byBucket = e.toSeq.groupBy(_._2)
    val wantPairs = (for {
      (_, ms) <- byBucket.toSeq
      Seq(x, y) <- ms.map(_._1).sorted.combinations(2).toSeq
      if BigDecimal(cos(emb(x), emb(y))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= AnnQueries.ParaSimTau
    } yield (x, y)).toSet
    // the jac gate excludes nothing on this fixture (documented at the
    // constants), so candidate set == output set here
    assert(out.map(r => (r._1, r._2)).toSet === wantPairs)
  }

  test("q140 MMR matches a driver greedy recompute and actually diversifies") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (1.0 + d / (na * nb)) / 2.0
    }
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.size($"embedding") === 64)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val qv = embs.find(_._1 == 0L).get._2
    val cand = embs.filter(_._1 != 0L)
      .map { case (id, e) => (id, e, r6(score(e, qv))) }
    // greedy reference, same 6-dp rounding discipline as the query
    var sel = List.empty[(Long, Seq[Float], Double, Double, Double)]
    (1 to AnnQueries.MmrK).foreach { _ =>
      val selIds = sel.map(_._1).toSet
      val best = cand.filterNot(c => selIds(c._1)).map { case (id, e, rel) =>
        val ms = if (sel.isEmpty) 0.0
          else sel.map(s => r6(score(e, s._2))).max
        (id, e, rel, ms, r6(AnnQueries.MmrLambda * rel -
          AnnQueries.MmrOneMinusLambda * ms))
      }.minBy { case (id, _, _, _, mmr) => (-mmr, id) }
      sel = sel :+ best
    }
    val got = AnnQueries.queries("q140_mmr_select")(spark, dir)
      .select($"step", $"vec_id", $"rel", $"max_sim", $"mmr")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === sel.map(_._1))
    got.zip(sel).foreach { case ((_, _, rel, ms, mmr), (_, _, wr, wm, wmm)) =>
      assert(rel === wr); assert(ms === wm); assert(mmr === wmm)
    }
    // step 1 is the pure-relevance argmax; later steps pay diversity:
    // their max_sim is positive and mmr never exceeds λ·rel
    assert(got.head._4 === 0.0)
    got.tail.foreach { case (_, _, rel, ms, mmr) =>
      assert(ms > 0.0)
      assert(mmr <= AnnQueries.MmrLambda * rel + 1e-9)
    }
    // the MMR set differs from the plain top-K by relevance (it
    // diversified): compare against the top-K rel ids
    val topK = cand.sortBy(c => (-c._3, c._1)).take(AnnQueries.MmrK).map(_._1).toSet
    assert(got.map(_._2).toSet != topK,
      "fixture should make MMR diverge from plain top-k; tune lambda if not")
    // q146 (pooled production form): identical output when every
    // winner sits inside the relevance pool — audit that it does
    val byRel = cand.sortBy(c => (-c._3, c._1)).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    got.foreach { case (_, id, _, _, _) =>
      assert(byRel(id) <= AnnQueries.MmrPoolN,
        s"winner $id at relevance rank ${byRel(id)} outside the pool") }
    val pooled = AnnQueries.queries("q146_mmr_pooled")(spark, dir)
      .select($"step", $"vec_id", $"rel", $"max_sim", $"mmr")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(pooled.toSeq === got.toSeq,
      "pooled MMR must equal full MMR when winners fit the pool")
  }

  test("q164 retrieval metrics match a driver recompute of both arms") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (1.0 + d / (na * nb)) / 2.0
    }
    // discounts recomputed HERE from the published formula (not read
    // off AnnQueries' table) — an independent check of the ladder
    val disc = (1 to AnnQueries.IrK).map { p =>
      BigDecimal(math.log(2.0) / math.log(1.0 + p))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val idcg = disc.scanLeft(BigDecimal(0))(_ + _).tail
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.size($"embedding") === 64)
      .select($"vec_id", $"embedding",
        graft.functions.PortableHash.lshBucket($"embedding").as("bucket"))
      .as[(Long, Seq[Float], Long)].collect()
    val queries = embs.filter(_._1 < AnnQueries.IrQueries).sortBy(_._1)
    val corpus = embs.filter(_._1 >= AnnQueries.IrQueries)
    val want = queries.map { case (qid, qe, qb) =>
      val rel = corpus
        .map { case (id, e, _) => (id, r6(score(e, qe))) }
        .sortBy { case (id, sc) => (-sc, id) }.take(AnnQueries.IrK)
        .map(_._1).toSet
      val cands = corpus.filter { case (_, _, b) =>
        java.lang.Long.bitCount(b ^ qb) <= 1 }
      val ret = cands
        .map { case (id, e, _) => (id, r6(score(e, qe))) }
        .sortBy { case (id, sc) => (-sc, id) }.take(AnnQueries.IrK)
        .map(_._1).zipWithIndex.map { case (id, i) => (id, i + 1) }
      val hitPos = ret.collect { case (id, pos) if rel(id) => pos }
      val nRel = rel.size
      val dcg = hitPos.map(p => disc(p - 1)).foldLeft(BigDecimal(0))(_ + _)
      (qid, nRel.toLong, cands.length.toLong, hitPos.length.toLong,
        r6(hitPos.length.toDouble / nRel),
        if (hitPos.isEmpty) 0.0 else r6(1.0 / hitPos.min),
        r6(dcg.toDouble / idcg(nRel - 1).toDouble))
    }.toSeq
    val got = AnnQueries.queries("q164_retrieval_metrics")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got === want)
    // the report must expose the coverage/recall trade: every arm
    // scored a candidate set, and hits never exceed it
    got.foreach { case (qid, nRel, nCand, nHit, recall, mrr, ndcg) =>
      assert(nHit <= nCand, s"query $qid: more hits than candidates")
      assert(nHit <= nRel && recall <= 1.0 && ndcg <= 1.0 + 1e-9)
      assert((nHit == 0) == (mrr == 0.0), s"query $qid: mrr/hit mismatch")
    }
  }

  test("q149 multi-query MMR: per-query traces match a driver recompute, pools certified") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      (1.0 + d / (na * nb)) / 2.0
    }
    val dir = "/root/testdata/sf0.001"
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.size($"embedding") === 64)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val queries = embs.filter(_._1 < AnnQueries.MmrMultiQueries).sortBy(_._1)
    val cands = embs.filter(_._1 >= AnnQueries.MmrMultiQueries)
    val got = AnnQueries.queries("q149_mmr_multi")(spark, dir)
      .select($"query_id", $"step", $"vec_id", $"rel", $"max_sim", $"mmr")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(_._1).distinct === queries.map(_._1).toSeq)
    queries.foreach { case (qid, qe) =>
      // driver reference: pool = top-N by (rel desc, id) over the
      // disjoint candidate set, then the same rounded greedy the
      // single-query spec uses — proving the mapGroups arithmetic
      // bit-matches the column/oracle discipline per query
      val scored = cands.map { case (id, e) => (id, e, r6(score(e, qe))) }
      val pool = scored.sortBy(c => (-c._3, c._1)).take(AnnQueries.MmrPoolN)
      val want = AnnQueries.mmrGreedyLocal(pool.map(c => (c._1, c._2, c._3)).toSeq)
      val mine = got.filter(_._1 == qid)
      assert(mine.map(r => (r._2, r._3, r._4, r._5, r._6)) === want,
        s"query $qid trace diverged")
      // pool certificate: every winner sits strictly inside the
      // relevance pool, so the pool bound is an audited approximation
      val byRel = scored.sortBy(c => (-c._3, c._1)).map(_._1)
        .zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      mine.foreach { case (_, _, id, _, _, _) =>
        assert(byRel(id) <= AnnQueries.MmrPoolN,
          s"query $qid winner $id outside the pool (rank ${byRel(id)})") }
    }
  }
}

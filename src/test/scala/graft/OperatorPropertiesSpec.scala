package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Packing, TfIdf}

/** Property-based invariants for the pipeline operators, generator-
  * driven (fixed seeds → reproducible) against the real Column API. */
class OperatorPropertiesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("packing: greedy bound, conservation, contiguous bins on random chunk streams") {
    val budget = 50L
    val maxChunk = 30L
    val chunkGen = Gen.chooseNum(1L, maxChunk)
    val chunks = samples(chunkGen, 400, 7L).zipWithIndex
      .map { case (toks, i) => (i.toLong, i.toLong % 5, toks) }
      .toDF("chunk_id", "doc_id", "chunk_toks")
    val assigned = Packing.assignBins(chunks,
      packGroup = pmod($"doc_id", lit(3L)),
      orderBy = Seq($"doc_id", $"chunk_id"),
      tokenCol = $"chunk_toks", budget = budget)
    val bins = Packing.binStats(assigned, "doc_id", $"chunk_toks").cache()
    // greedy bound: a bin never exceeds budget + (max chunk - 1)
    assert(bins.filter($"total_tokens" >= budget + maxChunk).count() === 0)
    // conservation: nothing dropped or duplicated
    val (nIn, tokIn) = chunks.agg(count(lit(1)), sum($"chunk_toks")).as[(Long, Long)].head()
    val (nOut, tokOut) = bins.agg(sum($"n_chunks"), sum($"total_tokens")).as[(Long, Long)].head()
    assert((nIn, tokIn) === (nOut, tokOut))
    // bins contiguous from 0 within each group
    val gaps = bins.groupBy($"pack_group")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 0 || $"hi" =!= $"n" - 1)
    assert(gaps.count() === 0)
    bins.unpersist()
  }

  test("packing is partition-count invariant") {
    val chunks = samples(Gen.chooseNum(1L, 20L), 200, 11L).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks) }
      .toDF("chunk_id", "chunk_toks")
    def run(parts: Int) = Packing.binStats(
      Packing.assignBins(chunks.repartition(parts),
        packGroup = pmod($"chunk_id", lit(4L)),
        orderBy = Seq($"chunk_id"),
        tokenCol = $"chunk_toks", budget = 64L),
      "chunk_id", $"chunk_toks")
      .orderBy($"pack_group", $"bin").collect().toSeq
    assert(run(1) === run(13))
  }

  test("tfidf matches a driver-side naive computation on a random corpus") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val docGen = Gen.listOfN(12, wordGen)
    val docs = samples(docGen, 30, 23L).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks) }
    val df = docs.toDF("doc_id", "toks")
    val got = TfIdf.weights(df).orderBy($"doc_id", $"term")
      .as[(Long, String, Long, Double)].collect().toSeq
    // naive reference
    val n = docs.size.toDouble
    val dfreq = docs.flatMap(_._2.distinct.map(_ -> 1)).groupBy(_._1).view.mapValues(_.size.toDouble)
    val want = docs.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, occ) =>
        (id, t, occ.size.toLong,
          BigDecimal(occ.size * math.log(n / dfreq(t))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("domain-mix allocation: floor-exact, feasible, and monotone on random counts") {
    // the q53 arithmetic as pure integer properties over random strata
    val countGen = Gen.chooseNum(1L, 100000L)
    val wGen = Gen.chooseNum(1, 60)
    for (trial <- 0 until 50) {
      val k = 2 + trial % 5
      val counts = samples(countGen, k, 100L + trial)
      val ws = samples(wGen, k, 200L + trial)
      val wTot = ws.sum
      val t = counts.zip(ws).map { case (c, w) => c * wTot / w }.min
      val takes = ws.map(w => t * w / wTot)
      // feasible: no stratum oversubscribed
      takes.zip(counts).foreach { case (take, c) => assert(take <= c) }
      // exact proportions up to floor: |take_i/w_i - take_j/w_j| bounded
      // by the floor slack 1/w
      for (((ti, wi), (tj, wj)) <- takes.zip(ws).combinations(2).map(s => (s(0), s(1)))) {
        val ri = ti.toDouble / wi
        val rj = tj.toDouble / wj
        assert(math.abs(ri - rj) <= 1.0 / wi + 1.0 / wj + 1e-9,
          s"allocation skew: $ti/$wi vs $tj/$wj (t=$t)")
      }
    }
  }

  test("count-min never underestimates on random token streams") {
    import graft.functions.PortableHash.{CmsDepth, CmsFamily, P, affine, charHash}
    val width = 8L // tiny width forces all-row collisions, the interesting case
    val tokGen = Gen.oneOf((1 to 40).map(i => s"tok$i"))
    val toks = samples(tokGen, 3000, 31L)
    val df = toks.toDF("t")
    val cells = df.select((0 until CmsDepth).map { i =>
      (affine(CmsFamily(i), charHash($"t")) % width).as(s"c$i")
    }: _*)
    val counters: Seq[Map[Long, Long]] = (0 until CmsDepth).map { i =>
      cells.groupBy(col(s"c$i")).count()
        .as[(Long, Long)].collect().toMap
    }
    val trueCounts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probeCols = $"t" +: (0 until CmsDepth).map { i =>
      (affine(CmsFamily(i), charHash($"t")) % width).as(s"c$i")
    }
    val probe = trueCounts.keys.toSeq.toDF("t")
      .select(probeCols: _*).as[(String, Long, Long, Long, Long)].collect()
    var sawOverestimate = false
    probe.foreach { case (t, c0, c1, c2, c3) =>
      val est = Seq(counters(0)(c0), counters(1)(c1), counters(2)(c2), counters(3)(c3)).min
      assert(est >= trueCounts(t), s"CMS underestimated $t")
      if (est > trueCounts(t)) sawOverestimate = true
    }
    // width 64 with 40 tokens must collide somewhere — the bound is
    // exercised, not vacuous
    assert(sawOverestimate)
  }

  test("ranked cumsum: rank/cumsum law, partition invariance, topN prefix on random frames") {
    val nGen = Gen.chooseNum(1L, 9L) // heavy ties: the tiebreak carries the order
    for (trial <- 0 until 3) {
      val rows = samples(nGen, 150, 300L + trial).zipWithIndex
        .map { case (n, i) => (f"t$i%04d", n) }
      val counts = rows.toDF("token", "n")
      val out = graft.operators.RankedCumsum.tokenCoverage(counts, 40)
        .orderBy($"rank")
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      // the law: rank is 1..k dense, cum_n is the prefix sum of n in
      // (n desc, token asc) order, total_n is the grand total
      val sortedRef = rows.sortBy { case (t, n) => (-n, t) }
      assert(out.map(_._1) === (1L to out.size.toLong))
      assert(out.map(r => (r._2, r._3)) === sortedRef.take(40).map(r => (r._1, r._2)))
      assert(out.map(_._4) === sortedRef.take(40).map(_._2).scanLeft(0L)(_ + _).tail)
      assert(out.forall(_._5 === rows.map(_._2).sum))
      // partition-count invariance
      val repart = graft.operators.RankedCumsum
        .tokenCoverage(counts.repartition(17), 40)
        .orderBy($"rank")
        .as[(Long, String, Long, Long, Long)].collect().toSeq
      assert(repart === out)
    }
  }

  test("canonical-band incremental join: emitted-once and set-equal to a distinct-based reference") {
    import graft.operators.Dedup
    // random small shingle universes force band collisions and
    // multi-band agreements (the emitted-once interesting case)
    val hsGen = Gen.listOfN(6, Gen.chooseNum(1L, 12L)).map(_.distinct.sorted)
    for (trial <- 0 until 3) {
      val docs = samples(hsGen, 40, 400L + trial).zipWithIndex
        .map { case (hs, i) => (i.toLong, hs, i % 3 == 0) }
      val sh = docs.toDF("doc_id", "hs", "is_new")
      val got = Dedup.incrementalPairs(sh, "doc_id", "hs", "is_new", 0.3)
        .select($"doc_id", $"partner", $"partner_is_new")
        .as[(Long, Long, Boolean)].collect().toSeq
      assert(got.size === got.distinct.size, "pair emitted more than once")
      // reference: explicit bands, distinct-deduped candidates, same verify
      val sigs = sh.select($"doc_id", $"is_new",
        Dedup.minhashSignature($"hs").as("sig"))
      val bands = sigs.select($"doc_id", $"is_new",
          explode(Dedup.bandKeys($"sig")).as("bk"))
        .select($"doc_id", $"is_new", $"bk.key".as("key"), $"bk.band".as("band"))
      val nb = bands.filter($"is_new")
        .select($"doc_id".as("na"), $"band", $"key")
      val cand = nb.join(bands, Seq("band", "key"))
        .filter($"na" =!= $"doc_id")
        .select($"na", $"doc_id".as("pa"), $"is_new".as("pnew")).distinct()
      val hsMap = docs.map(d => d._1 -> d._2.toSet).toMap
      val want = cand.as[(Long, Long, Boolean)].collect().toSeq.filter { case (a, b, _) =>
        val (x, y) = (hsMap(a), hsMap(b))
        val inter = (x & y).size.toDouble
        val jac = if (x.isEmpty && y.isEmpty) 0.0 else inter / (x.size + y.size - inter)
        BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.3
      }
      assert(got.toSet === want.toSet)
      assert(got.nonEmpty, "fixture should produce pairs — collisions are the point")
    }
  }

  test("synthetic pixel channels stay in [0, 256) and differ across images") {
    import graft.multimodal.Multimodal
    val vals = for (id <- 0L until 20L; k <- 0 until Multimodal.SynthPixelValues)
      yield Multimodal.synthChannel(id, k)
    assert(vals.forall(v => v >= 0 && v < 256))
    // distinct images must not share the whole pixel plane
    val planes = (0L until 20L).map(id =>
      (0 until Multimodal.SynthPixelValues).map(Multimodal.synthChannel(id, _)))
    assert(planes.distinct.size === planes.size)
  }

  test("tfidf topTerms ranks are a prefix of the full weight ordering") {
    val docs = Seq(
      (1L, Seq("a", "a", "b", "c")),
      (2L, Seq("b", "b", "b", "d")),
      (3L, Seq("c", "d", "d", "a"))).toDF("doc_id", "toks")
    val top2 = TfIdf.topTerms(docs, 2).orderBy($"doc_id", $"rank")
      .select($"doc_id", $"term").as[(Long, String)].collect().toSeq
    val full = TfIdf.weights(docs)
      .orderBy($"doc_id", $"tfidf".desc, $"term".asc)
      .select($"doc_id", $"term").as[(Long, String)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rows) => rows.take(2) }.sorted
    assert(top2.sorted === full)
  }

  test("serpentine striping: max-min load <= 2 max item on random length profiles") {
    // the q135 balance LAW, generator-driven (driver arithmetic — the
    // law is about the assignment function, not the Spark plan; the
    // plan's exact agreement with this function is PipelineQueriesSpec):
    // sorted-desc lengths striped boustrophedon over K shards keep
    // max(load) − min(load) ≤ 2·max item for ANY length distribution —
    // per-stripe-pair imbalances telescope against the descending sort,
    // plus at most one partial tail stripe. Adversarial shapes included
    // (heavy head, all-equal, power-law-ish, tiny n < K).
    val lenGen = Gen.oneOf(
      Gen.chooseNum(1L, 1000L),                       // uniform
      Gen.chooseNum(1L, 10L).map(x => x * x * x),     // convex / heavy head
      Gen.const(7L),                                  // degenerate equal
      Gen.frequency(9 -> Gen.chooseNum(1L, 20L), 1 -> Gen.chooseNum(900L, 1000L)))
    for (k <- Seq(2, 3, 8, 16); n <- Seq(1, 5, 16, 257, 1000); seed <- Seq(1L, 99L)) {
      val lens = samples(lenGen, n, seed * 1000 + k * 7 + n)
      val sorted = lens.sortBy(-_)
      val loads = Array.fill(k)(0L)
      sorted.zipWithIndex.foreach { case (len, i) =>
        val stripe = i / k; val pos = i % k
        val shard = if (stripe % 2 == 0) pos else k - 1 - pos
        loads(shard) += len
      }
      val nonEmptyMin = loads.min // empty shards allowed when n < k
      assert(loads.max - nonEmptyMin <= 2 * sorted.head,
        s"k=$k n=$n seed=$seed: loads ${loads.toSeq} max item ${sorted.head}")
      assert(loads.sum === lens.sum)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnnQueries, ExtraQueries}

class SketchAndVectorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q118 good-turing/chao1: hand-built frequency profiles give the textbook values") {
    def report(toks: Seq[String]) =
      ExtraQueries.goodTuringReport(
        toks.map(t => ("xx", t)).toDF("lang", "tok")).collect().head
    // counts {a:2, b:1, c:1}: V=3, N=4, N1=2, N2=1 →
    // p_unseen = 2/4, chao1 = 3 + 2·1/(2·(1+1)) = 3.5
    val r1 = report(Seq("a", "a", "b", "c"))
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) ===
      ((3L, 4L, 2L, 1L)))
    assert(r1.getDouble(5) === 0.5 && r1.getDouble(6) === 3.5)
    // no singletons: unseen mass 0, chao1 collapses to the seen V
    val r2 = report(Seq("a", "a", "b", "b"))
    assert(r2.getLong(3) === 0L && r2.getDouble(5) === 0.0 &&
      r2.getDouble(6) === 2.0)
    // all singletons, no doubletons: the bias-corrected form stays
    // finite — chao1 = 3 + 3·2/(2·1) = 6
    val r3 = report(Seq("a", "b", "c"))
    assert(r3.getDouble(6) === 6.0)
  }

  test("q118 declared query matches a driver recompute and its identities") {
    val rows = ExtraQueries.queries("q118_vocab_richness")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // independent path: token counts recomputed in the driver
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"lang", $"text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val lang = r.getString(0)
      val cs = counts.collect { case ((l, _), c) if l == lang => c }.toSeq
      assert(r.getLong(1) === cs.length.toLong, s"$lang vocab")
      assert(r.getLong(2) === cs.sum, s"$lang n_tokens")
      assert(r.getLong(3) === cs.count(_ == 1L).toLong, s"$lang n1")
      assert(r.getLong(4) === cs.count(_ == 2L).toLong, s"$lang n2")
      val p0 = math.rint(r.getLong(3).toDouble / r.getLong(2) * 1e6) / 1e6
      assert(r.getDouble(5) === p0, s"$lang p_unseen")
      // chao1 never estimates fewer types than observed
      assert(r.getDouble(6) >= r.getLong(1).toDouble, s"$lang chao1 >= V")
    }
  }

  test("q130 anomaly: planted spike trips the alarm, steady and degenerate series do not") {
    def zOf(series: Seq[Long]): Seq[Option[(Double, Int)]] =
      ExtraQueries.trailingZ(
          series.zipWithIndex.map { case (n, t) => ("g", t.toLong, n) }
            .toDF("grp", "t", "n"), ExtraQueries.TrailWindow)
        .orderBy($"t").collect()
        .map(r => if (r.isNullAt(4)) None
          else Some((r.getDouble(4), r.getInt(5))))
    // noisy-but-steady baseline, then a 10x spike: the spike day (and
    // only days with a full trail) can alarm, and the spike must
    val base = Seq(10L, 12L, 10L, 12L, 10L, 12L, 10L, 12L, 100L)
    val got = zOf(base)
    assert(got.take(ExtraQueries.TrailWindow).forall(_.isEmpty),
      "short trails must be NULL")
    assert(got(8).exists(_._2 == 1), s"spike must alarm: ${got(8)}")
    // driver recompute of the spike z from the textbook formula
    val trail = base.slice(1, 8)
    val m = trail.sum.toDouble / trail.length
    val sd = math.sqrt(trail.map(x => (x - m) * (x - m)).sum / (trail.length - 1))
    assert(math.abs(got(8).get._1 - (100 - m) / sd) < 1e-5)
    // constant series: zero variance is NULL, never NaN or an alarm
    assert(zOf(Seq.fill(12)(7L)).forall(_.isEmpty))
    // fixture: row-wise driver recompute of every z (the fixture's
    // tiny daily counts are noisy, so occasional |z| ≥ 3 chance
    // alarms are the honest verdict — the formula, not the verdict,
    // is what must match)
    val counts = graft.sources.Sources
      .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
      .selectExpr("event_type AS g", "unix_micros(ts) div 86400000000 AS t")
      .groupBy($"g", $"t").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = ExtraQueries.queries("q130_daily_anomaly")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(r => !r.isNullAt(4)))
    rows.foreach { r =>
      val (g, t) = (r.getString(0), r.getLong(1))
      val trail = counts.filter(c => c._1 == g && c._2 < t)
        .sortBy(_._2).takeRight(ExtraQueries.TrailWindow).map(_._3)
      if (trail.length >= ExtraQueries.TrailWindow) {
        val m = trail.sum.toDouble / trail.length
        val v = trail.map(x => (x - m) * (x - m)).sum / (trail.length - 1)
        if (v > 0) {
          val want = (r.getLong(2) - m) / math.sqrt(v)
          assert(math.abs(r.getDouble(4) - want) < 1e-5, s"($g, $t)")
          assert(r.getInt(5) === (if (math.abs(want) >= 3.0) 1 else 0))
        } else assert(r.isNullAt(4))
      } else assert(r.isNullAt(4), s"($g, $t) short trail")
    }
  }

  test("q127 skew profile: planted-distribution laws and a fixture driver recompute") {
    def rep(counts: Seq[(Long, Long)]) =
      ExtraQueries.skewReport(counts.toDF("key", "n")).collect().head
    def gini(xs: Seq[Long]): Double = {
      val s = xs.sorted; val k = s.length.toLong; val tot = s.sum
      val isum = s.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      2.0 * isum / (k.toDouble * tot) - (k + 1).toDouble / k
    }
    // uniform distribution: gini exactly 0, max/mean exactly 1
    val u = rep((1L to 8L).map(k => (k, 5L)))
    assert(u.getDouble(6) === 0.0 && u.getDouble(5) === 1.0)
    // one hot key: every diagnostic fires, exact against the formula
    val hot = Seq((1L, 991L)) ++ (2L to 10L).map(k => (k, 1L))
    val e = rep(hot)
    assert(e.getDouble(3) === 0.991)
    assert(math.abs(e.getDouble(6) - gini(hot.map(_._2))) < 1e-6)
    assert(e.getDouble(6) > 0.85, "hot-key gini must approach (k-1)/k")
    // fixture query matches a driver recompute of every column
    val ns = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy($"user_id").count().collect().map(_.getLong(1))
    val row = ExtraQueries.queries("q127_skew_profile")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) === ns.length.toLong)
    assert(row.getLong(1) === ns.sum)
    assert(row.getLong(2) === ns.max)
    assert(math.abs(row.getDouble(6) - gini(ns.toSeq)) < 1e-6)
    assert(row.getDouble(6) >= 0.0 && row.getDouble(6) < 1.0)
  }

  test("q126 kmv set ops match a driver-side sketch recompute; exact in the small regime") {
    import graft.functions.PortableHash.{P, KmvPair}
    val (a, b) = KmvPair
    val K = ExtraQueries.KmvK
    val tu = spark.read.parquet(s"$sf0001/events.parquet")
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val byType = tu.groupBy(_._1).view
      .mapValues(_.map(p => (a * p._2 + b) % P).distinct.sorted).toMap
    def estOf(hs: Seq[Long]): Double = {
      val sk = hs.take(K)
      if (sk.length < K) sk.length.toDouble
      else math.rint((K - 1).toDouble * P / sk.last * 1e6) / 1e6
    }
    val rows = ExtraQueries.queries("q126_kmv_setops")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (ha, hb) = (byType(ta), byType(tb))
      val hu = (ha.take(K) ++ hb.take(K)).distinct.sorted
      val (ea, eb, eu) = (estOf(ha), estOf(hb), estOf(hu))
      assert(r.getDouble(2) === ea, s"$ta est_a")
      assert(r.getDouble(3) === eb, s"$tb est_b")
      assert(r.getDouble(4) === eu, "est_union")
      val ei = math.max(0.0, math.rint((ea + eb - eu) * 1e6) / 1e6)
      assert(r.getDouble(5) === ei, "est_inter")
      // exact audit column is the true set intersection
      val exact = tu.filter(_._1 == ta).map(_._2).toSet
        .intersect(tu.filter(_._1 == tb).map(_._2).toSet).size.toLong
      assert(r.getLong(6) === exact, "exact_inter")
      // in the small-set regime (every sketch under K), KMV is EXACT:
      // inclusion-exclusion must reproduce the true intersection
      if (ha.length < K && hb.length < K && hu.length < K)
        assert(r.getDouble(5) === exact.toDouble, s"($ta,$tb) exact regime")
    }
  }

  test("q116 bootstrap CI: well-formed, covers the point estimate, tracks the analytic SE") {
    val rows = ExtraQueries.queries("q116_bootstrap_ci")(spark, sf001).collect()
    assert(rows.nonEmpty)
    // driver-side analytic SE per source: sd(q)/sqrt(n) over the same
    // 6-dp quality scores — the bootstrap must land in its ballpark
    // (Poisson(1) weights add ~1/sqrt(2(B-1)) relative noise on top)
    val q = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"source", $"text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        val nTok = toks.length.toDouble
        val nDis = toks.distinct.length.toDouble
        val stopRatio =
          toks.count(graft.functions.TextFunctions.Stopwords.contains) / nTok
        val avgTokLen = toks.map(_.length).sum / nTok
        val score = 0.3 * math.min(1.0, nTok / 100.0) + 0.3 * (nDis / nTok) +
          0.2 * (1.0 - stopRatio) + 0.2 * math.min(1.0, avgTokLen / 8.0)
        (r.getString(0), math.rint(score * 1e6) / 1e6)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val (src, n, bEff, mean, se, lo, hi) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))
      assert(bEff === ExtraQueries.BootReps.toLong, s"$src replicates")
      assert(se > 0.0, s"$src se")
      assert(lo < mean && mean < hi, s"$src CI covers the mean")
      assert(math.abs((hi - lo) - 2 * 1.96 * se) < 2e-6, s"$src width")
      val xs = q(src)
      assert(xs.length.toLong === n)
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      val analytic = sd / math.sqrt(xs.length.toDouble)
      assert(se > analytic * 0.5 && se < analytic * 2.0,
        s"$src bootstrap se $se vs analytic $analytic")
    }
  }

  test("q57 count-min estimates never underestimate and probe the exact top-k") {
    val rows = ExtraQueries.queries("q57_countmin")(spark, sf001)
      .select($"bigram", $"true_n", $"est_n", $"overcount")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length === ExtraQueries.CmsProbeK)
    // the CMS guarantee: min over rows of hashed counters >= true count
    rows.foreach { case (bg, t, e, o) =>
      assert(e >= t, s"CMS underestimated $bg")
      assert(o === e - t)
    }
    // ordered by true count desc
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    // the sketch table is bounded: depth x width cells regardless of corpus
    import graft.functions.PortableHash.CmsDepth
    assert(CmsDepth * ExtraQueries.CmsWidth < 1000000)
  }

  test("q92 histogram quantiles bracket the exact order statistics") {
    val w = ExtraQueries.HistBinWidth
    val prices = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_extendedprice").as[Double].collect().sorted
    val rows = ExtraQueries.queries("q92_hist_quantiles")(spark, sf0001)
      .select($"q", $"bin_lo", $"cum_n", $"total_n")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === ExtraQueries.HistQuantiles.length)
    rows.foreach { case (q, lo, _, total) =>
      assert(total === prices.length.toLong)
      // the ceil(q*n/100)-th smallest value must land inside the
      // reported bin — the sketch is exact to one bin width
      val kth = prices(((q * prices.length + 99) / 100).toInt - 1)
      assert(kth >= lo && kth < lo + w, s"q=$q: $kth outside [$lo, ${lo + w})")
    }
  }

  test("q92 histograms merge: per-month partial histograms sum to the direct one") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val w = ExtraQueries.HistBinWidth
    val direct = li
      .select(floor($"l_extendedprice" / w).cast("long").as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("n"))
    val merged = li
      .select(floor($"l_extendedprice" / w).cast("long").as("bin"),
        date_trunc("month", $"l_shipdate").as("m"))
      .groupBy($"bin", $"m").agg(count(lit(1)).as("pn"))
      .groupBy($"bin").agg(sum($"pn").as("n"))
    assert(direct.orderBy($"bin").as[(Long, Long)].collect().toSeq ===
      merged.orderBy($"bin").as[(Long, Long)].collect().toSeq)
  }

  test("q60 decayed counts are positive and bounded by the raw counts") {
    val rows = ExtraQueries.queries("q60_decayed_counts")(spark, sf001)
      .select($"event_type", $"n_events", $"decayed_count")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, d) =>
      assert(d > 0.0 && d <= n.toDouble, s"decayed count out of range for $et")
    }
    // decay actually bites: the fixture spans months, so the weighted
    // count is strictly below the raw count for every type
    assert(rows.forall { case (_, n, d) => d < n.toDouble })
  }

  test("q58 centroid outliers match a driver-side decimal recompute") {
    def dec12(v: Double) = BigDecimal.decimal(v)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(v: Double) = BigDecimal.decimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"label".cast("long"), $"embedding")
      .as[(Long, Long, Seq[Float])].collect()
      .filter(_._3.length == 64)
    val cent: Map[(Long, Int), Double] = vecs
      .flatMap { case (_, l, e) => e.zipWithIndex.map { case (v, p) => ((l, p), v.toDouble) } }
      .groupBy(_._1).view.mapValues { vs =>
        r6(vs.map(x => dec12(x._2)).sum.toDouble / vs.length)
      }.toMap
    val expected = vecs.map { case (id, l, e) =>
      val d2 = e.zipWithIndex.map { case (v, p) =>
        val d = v.toDouble - cent((l, p)); dec12(d * d)
      }.sum
      (id, l, r6(math.sqrt(d2.toDouble)))
    }.sortBy { case (id, _, d) => (-d, id) }.take(AnnQueries.CentroidOutlierK)
    val got = AnnQueries.queries("q58_centroid_outliers")(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expected.toSeq)
  }

  test("q96 HLL: daily-merged registers agree with direct, estimates near exact") {
    // `agree` IS the mergeability assertion (max is associative), held
    // without the oracle in the loop, at both fixture SFs; the error
    // check certifies the estimator itself — m=256 gives ~6.5% std
    // error in the raw regime and better under linear counting, so 25%
    // is a loose but meaningful ceiling for every event type
    Seq(sf0001, sf001).foreach { dir =>
      val rows = ExtraQueries.queries("q96_hll_distinct")(spark, dir)
        .select($"agree", $"err_pct", $"exact_distinct")
        .as[(Long, Double, Long)].collect()
      assert(rows.nonEmpty, s"no rows at $dir")
      assert(rows.forall(_._1 == 1L), s"merge disagreement at $dir")
      rows.foreach { case (_, err, exact) =>
        assert(err < 25.0, s"$dir: err_pct $err too high for exact=$exact")
      }
    }
  }

  // shared by the q104/q105 recomputes: the engine's decimal-routed
  // deterministic sum (each term rounded to 12 dp, summed exactly)
  private def dsum(terms: Seq[Double]): Double =
    terms.map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def olsSlope(xs: Seq[Double], ys: Seq[Double]): (Double, Double) = {
    val n = xs.length.toDouble
    val (sx, sy) = (dsum(xs), dsum(ys))
    val sxy = dsum(xs.zip(ys).map { case (x, y) => x * y })
    val sxx = dsum(xs.map(x => x * x))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (r6(slope), r6((sy - slope * sx) / n))
  }

  test("q104 zipf fit matches a driver-side recompute, head genuinely bounded") {
    val toks = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val head = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(ExtraQueries.ZipfHeadN)
    val xs = head.indices.map(i => math.log((i + 1).toDouble))
    val ys = head.map { case (_, c) => math.log(c.toDouble) }
    val (slope, intercept) = olsSlope(xs, ys)
    val row = ExtraQueries.queries("q104_zipf_fit")(spark, sf001)
      .select($"vocab_size", $"n_total", $"n_head", $"slope", $"intercept",
        $"r2", $"head_mass")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(row._1 === counts.size.toLong)
    assert(row._2 === toks.length.toLong)
    assert(row._3 === ExtraQueries.ZipfHeadN.toLong)
    assert(row._3 < row._1, "head must genuinely bound the vocabulary")
    assert(row._4 === slope)
    assert(row._5 === intercept)
    assert(row._6 > 0 && row._6 <= 1.0)
    assert(row._7 === r6(head.map(_._2).sum.toDouble / toks.length))
  }

  test("q105 heaps growth matches a driver-side recompute, types strictly grow") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val mx = docs.map(_._1).max
    val nB = ExtraQueries.HeapsBuckets
    def bucket(id: Long) = id * nB / (mx + 1) + 1
    val inst = Array.fill(nB + 1)(0L)
    val firstB = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      val b = bucket(id)
      inst(b.toInt) += math.max(t.length - 2, 0).toLong
      t.sliding(3).filter(_.length == 3).map(_.mkString("|")).foreach { g =>
        firstB.updateWith(g) {
          case Some(old) => Some(math.min(old, b)); case None => Some(b) }
      }
    }
    val cumI = (1 to nB).map(b => (1 to b).map(inst(_)).sum)
    val cumT = (1 to nB).map(b => firstB.valuesIterator.count(_ <= b).toLong)
    val (beta, lnK) = olsSlope(
      cumI.map(v => math.log(v.toDouble)), cumT.map(v => math.log(v.toDouble)))
    val rows = ExtraQueries.queries("q105_heaps_growth")(spark, sf001)
      .select($"bucket", $"cum_inst", $"cum_types", $"beta", $"ln_k")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq ===
      (1 to nB).map(b => (b.toLong, cumI(b - 1), cumT(b - 1))))
    assert(rows.forall(_._4 === beta))
    assert(rows.forall(_._5 === lnK))
    // the fixture's 3-gram vocabulary genuinely grows at EVERY
    // checkpoint (no saturated tail faking the fit), sublinearly
    assert(cumT.sliding(2).forall { case Seq(a, b) => b > a; case _ => true })
    assert(beta > 0 && beta < 1, s"heaps beta $beta outside (0,1)")
  }

  test("q110 ks drift: honest negative on the hash split, positive on a planted shift") {
    val row = ExtraQueries.queries("q110_ks_drift")(spark, sf001)
      .select($"n_train", $"n_test", $"d_stat", $"crit", $"drift")
      .as[(Long, Long, Double, Double, Long)].head()
    assert(row._1 > 0 && row._2 > 0)
    assert(row._3 >= 0 && row._3 <= 1)
    // the split is a hash of doc_id — train and test quality are the
    // same distribution by construction, so the audit MUST come back
    // negative here (a positive would mean the statistic is broken)
    assert(row._5 === 0L, s"hash split showed drift: D=${row._3} crit=${row._4}")
    assert(row._3 < row._4)
    // planted shift through the same seam the query uses: disjoint
    // supports drive D to exactly 1 and must trip the alarm
    val a = (1 to 500).map(i => (i.toLong % 50, 1L, 0L))
    val b = (1 to 500).map(i => (i.toLong % 50 + 100L, 0L, 1L))
    val shifted = ExtraQueries.binnedKs((a ++ b).toDF("bin", "a", "b"))
      .select($"d_stat", $"drift").as[(Double, Long)].head()
    assert(shifted._1 === 1.0 && shifted._2 === 1L)
    // identical samples: D = 0, no drift, at any n
    val same = (1 to 500).map(i => (i.toLong % 50, 1L, 1L)).toDF("bin", "a", "b")
    val eq = ExtraQueries.binnedKs(same)
      .select($"d_stat", $"drift").as[(Double, Long)].head()
    assert(eq._1 === 0.0 && eq._2 === 0L)
  }
}

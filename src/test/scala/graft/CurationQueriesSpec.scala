package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash.{P, MixPair, SplitPair}
import graft.queries.CurationQueries

class CurationQueriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(name: String, dir: String = sf001) =
    CurationQueries.queries(name)(spark, dir)

  test("q112 ccnet buckets: per-lang terciles balance within 1 and order by score") {
    val rows = run("q112_ccnet_buckets", sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val langs = rows.map(_._1).distinct
    assert(langs.length >= 3)
    langs.foreach { l =>
      val bk = rows.filter(_._1 == l).map(r => r._2 -> r).toMap
      assert(bk.keySet === Set("head", "middle", "tail"), l)
      // tercile carve: bucket doc counts differ by at most 1
      val ns = bk.values.map(_._3)
      assert(ns.max - ns.min <= 1, s"$l sizes $ns")
      // head holds the HIGHEST likelihood scores, tail the lowest:
      // min of head >= max of middle >= ... via the mean ordering
      assert(bk("head")._6 >= bk("middle")._6 && bk("middle")._6 >= bk("tail")._6,
        s"$l mean order")
      // bucket score ranges must not overlap out of order
      assert(bk("head")._4 >= bk("middle")._5, s"$l head.min >= middle.max")
      assert(bk("middle")._4 >= bk("tail")._5, s"$l middle.min >= tail.max")
    }
  }

  test("q117 auc matches the brute-force pairwise definition on q86's scores") {
    // independent path: q86's declared output carries every labeled
    // doc's score and split; AUC by the P·N pairwise definition
    // (ties count 1/2) must equal the rank-algebra result
    val scored = run("q86_quality_classifier", sf0001).collect()
      .filter(r => r.getString(2) != "holdout")
      .map(r => (r.getString(2) == "target", r.getDouble(4)))
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = wins / (pos.length.toDouble * neg.length)
    val row = run("q117_classifier_auc", sf0001).collect().head
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(math.abs(row.getDouble(3) - expected) < 1e-6,
      s"auc ${row.getDouble(3)} vs brute-force $expected")
    // u2 is the exact-integer doubled U: auc == u2 / (2·P·N) exactly
    assert(row.getLong(2) === math.round(2.0 * wins))
    // gini = 2·auc − 1 from the same exact numerator
    assert(math.abs(row.getDouble(4) - (2 * expected - 1)) < 1e-6)
  }

  test("auc laws: separation, reversal, ties, empty class, partitioning invariance") {
    import graft.operators.RankedCumsum
    def mk(rows: Seq[(Long, Long, Double)], parts: Int) =
      RankedCumsum.auc(spark.createDataFrame(rows).toDF("doc_id", "pos", "score")
        .repartition(parts))
    val sep = (1L to 20L).map(i => (i, if (i > 10) 1L else 0L, i * 0.1))
    val r1 = mk(sep, 1).collect().head
    assert(r1.getDouble(3) === 1.0 && r1.getLong(2) === 2 * 10 * 10)
    // reversed labels: every positive below every negative
    val rev = sep.map { case (i, y, s) => (i, 1L - y, s) }
    assert(mk(rev, 3).collect().head.getDouble(3) === 0.0)
    // all scores identical: one big tie group, auc exactly 1/2
    val tie = (1L to 9L).map(i => (i, i % 2, 5.0))
    assert(mk(tie, 2).collect().head.getDouble(3) === 0.5)
    // an empty class yields NULL auc/gini, not NaN
    val onecls = (1L to 5L).map(i => (i, 1L, i * 1.0))
    val oc = mk(onecls, 2).collect().head
    assert(oc.isNullAt(3) && oc.isNullAt(4))
    // partitioning must not move the statistic
    val mixed = (1L to 40L).map(i =>
      (i, if ((i * 7) % 3 == 0) 1L else 0L, ((i * 13) % 11) * 0.5))
    assert(mk(mixed, 1).collect().head === mk(mixed, 7).collect().head)
  }

  test("q121 per-class eval matches a driver recompute from q56's predictions") {
    val preds = run("q56_knn_vote", sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val rows = run("q121_knn_confusion", sf0001).collect()
    // classes are the UNION of true and predicted labels (full outer):
    // a class predicted but never true-labeled still gets a row —
    // the fixture exercises this (label 1 at sf0.001)
    assert(rows.map(_.getLong(0)).toSet ===
      (preds.map(_._1) ++ preds.map(_._2)).toSet)
    assert(rows.map(_.getLong(0)).toSet != preds.map(_._1).toSet,
      "fixture should contain a predicted-only class; pick another SF if not")
    // conservation: supports partition the test set, and so do the
    // predicted counts (nothing lost to either join side); tp sums to
    // the correct count
    assert(rows.map(_.getLong(1)).sum === preds.length.toLong)
    assert(rows.map(_.getLong(2)).sum === preds.length.toLong)
    assert(rows.map(_.getLong(3)).sum === preds.count(p => p._1 == p._2).toLong)
    rows.foreach { r =>
      val c = r.getLong(0)
      val support = preds.count(_._1 == c).toLong
      val nPred = preds.count(_._2 == c).toLong
      val tp = preds.count(p => p._1 == c && p._2 == c).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((support, nPred, tp)))
      if (nPred > 0)
        assert(math.abs(r.getDouble(4) - tp.toDouble / nPred) < 1e-6)
      else assert(r.isNullAt(4))
      if (support > 0)
        assert(math.abs(r.getDouble(5) - tp.toDouble / support) < 1e-6)
      else assert(r.isNullAt(5))
      val f1 = 2.0 * tp / (support + nPred)
      assert(math.abs(r.getDouble(6) - f1) < 1e-6)
      // harmonic-mean identity where precision is defined and tp > 0
      if (nPred > 0 && tp > 0) {
        val pr = tp.toDouble / nPred; val rc = tp.toDouble / support
        assert(math.abs(f1 - 2 * pr * rc / (pr + rc)) < 1e-9)
      }
    }
  }

  test("q123 signal correlations match a driver-side pearson recompute") {
    // independent path: collect the three signal tables and compute
    // each pearson r by the definitional centered form in the driver
    val (q, ll, dv) = CurationQueries.qualitySignals(spark, sf0001)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (mq, mll, mdv) = (m(q), m(ll), m(dv))
    val ids = (mq.keySet & mll.keySet & mdv.keySet).toSeq.sorted
    def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      val vy = ys.map(y => (y - my) * (y - my)).sum
      cov / math.sqrt(vx * vy)
    }
    val row = run("q123_signal_corr", sf0001).collect().head
    assert(row.getLong(0) === ids.length.toLong)
    val expect = Seq(
      pearson(ids.map(mq), ids.map(mll)),
      pearson(ids.map(mq), ids.map(mdv)),
      pearson(ids.map(mll), ids.map(mdv)))
    expect.zipWithIndex.foreach { case (e, i) =>
      val got = row.getDouble(i + 1)
      assert(math.abs(got - e) < 1e-5, s"r[$i] $got vs $e")
      assert(got >= -1.0 - 1e-9 && got <= 1.0 + 1e-9)
    }
  }

  test("q52 decontamination matches a driver-side recomputation") {
    // independent path: recompute per-doc overlap from raw shingle hash
    // sets (same codegen'd expression, but set logic done in Scala)
    val (a, b) = SplitPair
    val sets = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"lang",
        graft.expressions.HashExpressions.shingleHashSet($"text", 3).as("hs"))
      .as[(Long, String, Seq[Long])].collect()
    def bucket(id: Long) = ((a * id + b) % P) % 100
    val train = sets.filter(r => bucket(r._1) < 80).flatMap(_._3).toSet
    val perLang = sets.filter(r => bucket(r._1) >= 90)
      .map { case (_, lang, hs) =>
        val overlap = BigDecimal(hs.count(train.contains).toDouble / hs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (lang, overlap)
      }
      .groupBy(_._1).view.mapValues { rows =>
        val n = rows.length.toLong
        val nc = rows.count(_._2 >= CurationQueries.ContaminationMax).toLong
        (n, nc)
      }.toMap
    val got = run("q52_decontamination", sf0001)
      .select($"lang", $"n_test_docs", $"n_contaminated")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === perLang)
    // the fixture makes the screen non-degenerate: some contamination
    // exists, but not everything is contaminated
    assert(perLang.values.map(_._2).sum > 0)
    assert(perLang.values.map(_._2).sum < perLang.values.map(_._1).sum)
  }

  test("q65 bloom-prefiltered decontamination equals the sketch-free exact plan") {
    // the Bloom probe is a pure physical reduction: false positives die
    // in the exact hash join, false negatives cannot occur — so the
    // doc-level output must be bit-identical to a plan with no sketch
    val (a, b) = SplitPair
    def bucket(id: org.apache.spark.sql.Column) = ((lit(a) * id + lit(b)) % lit(P)) % 100
    val ws = graft.queries.DedupQueries.hashedShingles(spark, sf001)
      .withColumn("bucket", bucket($"doc_id"))
    val test = ws.filter($"bucket" >= 90)
      .select($"doc_id", $"lang", explode($"hs").as("h"))
    val train = ws.filter($"bucket" < 80)
      .select(explode($"hs").as("h")).distinct().withColumn("hit", lit(1L))
    val exact = test.join(train, Seq("h"), "left")
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_sh"), sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .withColumn("overlap", round($"n_hit".cast("double") / $"n_sh", 6))
      .filter($"overlap" >= CurationQueries.ContaminationMax)
      .select($"doc_id", $"lang", $"n_sh", $"n_hit", $"overlap")
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val got = run("q65_bloom_decontam", sf001).collect().map(_.toSeq).toSeq
    assert(got === exact)
    assert(got.nonEmpty, "fixture must plant at least one contaminated doc")
  }

  test("q53 domain mix allocates floor-exact target proportions within every stratum") {
    val rows = run("q53_domain_mix")
      .select($"lang", $"target_pct", $"n_total", $"n_take")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq === CurationQueries.MixTargets.map(_._1))
    val wTot = CurationQueries.MixTotal
    val t = rows.map { case (_, w, c, _) => c * wTot / w }.min
    rows.foreach { case (lang, w, c, take) =>
      assert(take === t * w / wTot, s"allocation for $lang")
      assert(take <= c, s"stratum $lang oversubscribed")
    }
    // the mix pushes against a constraint: the binding stratum (the min
    // achiever of floor(c*W/w)) is taken to within one "T step" (W/w
    // docs) of its full capacity
    assert(rows.exists { case (_, w, c, take) =>
      c * wTot / w == t && c - take <= wTot / w })
  }

  test("q53 selection is hash-ranked: selected ids are the n_take smallest by (h, id)") {
    val (a, b) = MixPair
    val takes = run("q53_domain_mix")
      .select($"lang", $"n_take", $"n_chars_sel")
      .as[(String, Long, Long)].collect().toMap2
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect()
    CurationQueries.MixTargets.foreach { case (lang, _) =>
      val (nTake, gotChars) = takes(lang)
      val sel = docs.filter(_._2 == lang)
        .sortBy(d => ((a * d._1 + b) % P, d._1))
        .take(nTake.toInt)
      assert(sel.map(_._3).sum === gotChars, s"selected char mass for $lang")
    }
  }

  test("q54 trim keeps exactly floor(95n/100) - floor(5n/100) docs per stratum") {
    val rows = run("q54_length_trim")
      .select($"lang", $"n_total", $"n_kept", $"min_kept_tokens", $"max_kept_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, kept, lo, hi) =>
      assert(kept === n * 95 / 100 - n * 5 / 100, s"kept count for $lang")
      assert(lo <= hi, s"bounds for $lang")
    }
    // the trim actually trims: the kept band excludes the global extremes
    val toks = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"lang", size(split($"text", " ")).cast("long").as("nt"))
      .groupBy($"lang").agg(min($"nt").as("mn"), max($"nt").as("mx"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.exists { case (lang, _, _, lo, hi) =>
      lo > toks(lang)._1 || hi < toks(lang)._2 })
  }

  test("q143 hedge reweighting matches a driver recompute; hedge laws hold") {
    val rows = run("q143_hedge_mix", sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        (4 until 4 + CurationQueries.HedgeRounds).map(r.getDouble)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // driver recompute of every multiplicative round from the query's
    // own (nll, excess) columns — certifies the update arithmetic
    val k = rows.length
    var w = rows.map(_ => r6(1.0 / k))
    (0 until CurationQueries.HedgeRounds).foreach { t =>
      val f = rows.zip(w).map { case (r, wi) =>
        r9(wi * math.exp(CurationQueries.HedgeEta * r._4)) }
      val tot = f.map(BigDecimal(_)).sum.toDouble
      w = f.map(fi => r6(fi / tot))
      rows.zip(w).foreach { case (r, wi) =>
        assert(r._5(t) === wi, s"${r._1} round ${t + 1}") }
    }
    // hedge laws: weights ~sum to 1 per round (6-dp rounding slack);
    // the zero-excess anchor shrinks monotonically; the max-excess
    // domain grows monotonically; final ordering follows excess
    (0 until CurationQueries.HedgeRounds).foreach { t =>
      val s = rows.map(_._5(t)).sum
      assert(math.abs(s - 1.0) < 1e-5, s"round ${t + 1} sum $s")
    }
    val anchor = rows.minBy(_._4)
    assert(anchor._4 === 0.0)
    val anchorW = 1.0 / k +: anchor._5
    assert(anchorW.zip(anchorW.tail).forall { case (a, b) => b < a })
    val hardest = rows.maxBy(_._4)
    val hardW = 1.0 / k +: hardest._5
    assert(hardW.zip(hardW.tail).forall { case (a, b) => b > a })
    val byExcess = rows.sortBy(_._4).map(_._5(CurationQueries.HedgeRounds - 1))
    assert(byExcess === byExcess.sorted,
      "final weights must be monotone in excess loss")
  }

  test("q133 sketch trim: superset of q54's kept set, off only within cut bins") {
    val w = CurationQueries.TrimBinW
    val p = CurationQueries.TrimPct
    Seq(sf0001, sf001).foreach { dir =>
      val docs = graft.queries.KeywordQueries.tokenizedDocs(spark, dir)
        .select($"doc_id", $"lang", $"dl".cast("long"))
        .as[(Long, String, Long)].collect()
      val byLang = docs.groupBy(_._2)
      // exact q54 kept set: strict integer rank band
      val exactKept = byLang.values.flatMap { ds =>
        val sorted = ds.sortBy(d => (d._3, d._1))
        val n = sorted.length.toLong
        sorted.zipWithIndex.collect { case ((id, _, _), i)
          if (i + 1) * 100 > n * p && (i + 1) * 100 <= n * (100 - p) => id }
      }.toSet
      // sketch cutpoints recomputed independently from the histogram
      val cuts = byLang.map { case (lang, ds) =>
        val hist = ds.groupBy(_._3 / w).view.mapValues(_.size.toLong)
          .toSeq.sortBy(_._1)
        val n = ds.length.toLong
        var cum = 0L
        var lo = Option.empty[Long]; var hi = Option.empty[Long]
        hist.foreach { case (bin, cnt) =>
          cum += cnt
          if (lo.isEmpty && cum >= n * p / 100 + 1) lo = Some(bin)
          if (hi.isEmpty && cum >= n * (100 - p) / 100) hi = Some(bin)
        }
        lang -> ((lo.get, hi.get))
      }
      val sketchKept = docs.filter { case (_, lang, dl) =>
        val (lo, hi) = cuts(lang); val b = dl / w; b >= lo && b <= hi
      }.map(_._1).toSet
      // law 1: conservative-inclusive — never drops an exactly-kept doc
      assert(exactKept.subsetOf(sketchKept), dir)
      // law 2: every overshoot doc sits IN a cut bin (one-bin-width bound)
      (sketchKept -- exactKept).foreach { id =>
        val d = docs.find(_._1 == id).get
        val (lo, hi) = cuts(d._2); val b = d._3 / w
        assert(b == lo || b == hi, s"$dir doc $id outside cut bins")
      }
      assert((sketchKept -- exactKept).nonEmpty,
        s"$dir: fixture should exercise the straddle bins")
      // law 3: the declared query reports exactly this recompute, and
      // its kept band is within one bin width of the exact trim's
      val got = run("q133_trim_sketch", dir)
        .select($"lang", $"n_total", $"n_kept",
          $"min_kept_tokens", $"max_kept_tokens")
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      byLang.foreach { case (lang, ds) =>
        val keptD = ds.filter(d => sketchKept(d._1)).map(_._3)
        val exactD = ds.filter(d => exactKept(d._1)).map(_._3)
        val g = got(lang)
        assert(g._2 === ds.length.toLong, s"$dir $lang n_total")
        assert(g._3 === keptD.length.toLong, s"$dir $lang n_kept")
        assert(g._4 === keptD.min && g._5 === keptD.max, s"$dir $lang band")
        if (exactD.nonEmpty) {
          assert(exactD.min - g._4 < w, s"$dir $lang lo bound")
          assert(g._5 - exactD.max < w, s"$dir $lang hi bound")
        }
      }
    }
  }

  test("q134 sketch terciles: exact q112 bucket for every doc outside the cut bins") {
    val inv = CurationQueries.CcnetBinInv
    val t = CurationQueries.CcnetTerciles
    def bin(x: Double) = math.floor(x * inv).toLong
    Seq(sf0001, sf001).foreach { dir =>
      val scored = CurationQueries.lmScored(spark, dir)
        .select($"doc_id", $"lang", $"avg_ll")
        .as[(Long, String, Double)].collect()
      val byLang = scored.groupBy(_._2)
      // exact q112 bucket per doc: rank arithmetic on (score desc, id)
      val exact = byLang.values.flatMap { ds =>
        val sorted = ds.sortBy(d => (-d._3, d._1))
        val n = sorted.length.toLong
        sorted.zipWithIndex.map { case ((id, _, _), i) =>
          val r = i + 1L
          id -> (if (r * t <= n) "head"
            else if (r * t <= n * 2) "middle" else "tail")
        }
      }.toMap
      // sketch cutpoints recomputed independently (desc-cumulative)
      val cuts = byLang.map { case (lang, ds) =>
        val hist = ds.groupBy(d => bin(d._3)).view.mapValues(_.size.toLong)
          .toSeq.sortBy(-_._1)
        val n = ds.length.toLong
        var cum = 0L
        var b1 = Option.empty[Long]; var b2 = Option.empty[Long]
        hist.foreach { case (b, c) =>
          cum += c
          if (b1.isEmpty && cum * t >= n) b1 = Some(b)
          if (b2.isEmpty && cum * t >= n * 2) b2 = Some(b)
        }
        lang -> ((b1.get, b2.get))
      }
      def sketch(lang: String, x: Double): String = {
        val (b1, b2) = cuts(lang); val b = bin(x)
        if (b >= b1) "head" else if (b >= b2) "middle" else "tail"
      }
      // law 1: outside the two cut bins the carve IS the exact carve
      var offCut = 0
      scored.foreach { case (id, lang, x) =>
        val (b1, b2) = cuts(lang); val b = bin(x)
        if (b != b1 && b != b2) {
          assert(sketch(lang, x) === exact(id), s"$dir doc $id")
          offCut += 1
        }
      }
      assert(offCut > 0, s"$dir: every doc in a cut bin — degenerate binning")
      // law 2: boundary conventions bracket the exact carve —
      // sketch head ⊇ exact head, sketch tail ⊆ exact tail
      scored.foreach { case (id, lang, x) =>
        if (exact(id) == "head") assert(sketch(lang, x) === "head", s"$dir $id")
        if (sketch(lang, x) == "tail") assert(exact(id) === "tail", s"$dir $id")
      }
      // law 3: the declared query reports exactly this recompute
      val got = run("q134_ccnet_sketch", dir)
        .select($"lang", $"bucket", $"n_docs")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = scored.groupBy(d => (d._2, sketch(d._2, d._3)))
        .view.mapValues(_.size.toLong).toMap
      assert(got === want)
    }
  }

  test("q62 oov rate matches a driver-side recomputation") {
    val (a, b) = SplitPair
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    def bucket(id: Long) = ((a * id + b) % P) % 100
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val vocab = docs.filter(d => bucket(d._1) < 80).flatMap(d => toks(d._3)).toSet
    val want = docs.filter(d => bucket(d._1) >= 90)
      .flatMap(d => toks(d._3).map(t => (d._2, t)))
      .groupBy(_._1).view.mapValues { ts =>
        (ts.length.toLong, ts.count(t => !vocab.contains(t._2)).toLong)
      }.toMap
    val got = CurationQueries.queries("q62_oov_rate")(spark, sf0001)
      .select($"lang", $"n_test_tokens", $"n_oov")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
  }

  test("q63 daily-merged KMV sketches agree with the direct sketch") {
    // the agree column IS the assertion; check it holds without the
    // oracle in the loop, at both fixture SFs
    Seq(sf0001, sf001).foreach { dir =>
      val rows = graft.queries.ExtraQueries.queries("q63_kmv_merge")(spark, dir)
        .select($"agree").as[Long].collect()
      assert(rows.nonEmpty && rows.forall(_ == 1L), s"merge disagreement at $dir")
    }
  }

  test("q55 unigram log-likelihoods are negative and ascending") {
    val rows = run("q55_unigram_loglik")
      .select($"avg_ll").as[Double].collect()
    assert(rows.length === CurationQueries.UnigramBottomK)
    assert(rows.forall(_ < 0.0))
    assert(rows.sliding(2).forall { case Array(x, y) => x <= y; case _ => true })
  }

  test("q90 bigram stupid-backoff scores match a driver-side recomputation") {
    val (a, b) = SplitPair
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    def bucket(id: Long) = ((a * id + b) % P) % 100
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val train = docs.filter(d => bucket(d._1) < 80)
    val c1 = train.flatMap(d => toks(d._3)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = train.flatMap(d => toks(d._3).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nv = c1.values.sum + c1.size
    val alpha = CurationQueries.StupidBackoffAlpha.toDouble
    def score(w1: String, w2: String): Double = c2.get((w1, w2)) match {
      case Some(c) => math.log(c.toDouble / c1(w1))
      case None => math.log(alpha * ((c1.getOrElse(w2, 0L) + 1).toDouble / nv))
    }
    val want = docs.filter(d => bucket(d._1) >= 90)
      .map { d =>
        val bgs = toks(d._3).sliding(2).filter(_.size == 2).toSeq
        val sum = bgs.map(p => BigDecimal(score(p(0), p(1)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        val avg = BigDecimal(sum.toDouble / bgs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (d._1, d._2, bgs.size.toLong, avg)
      }
      .filter(_._3 > 0)
      .sortBy(t => (t._4, t._1))
      .take(CurationQueries.BigramBottomK)
    val got = run("q90_bigram_lm", sf0001)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.forall(_._4 < 0.0))
  }

  test("q56 knn vote: winners beat every losing label's vote count") {
    // recompute the vote table via an aggregation-only plan (no window)
    // and check the query's window-ranked winner agrees
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (a, b) = SplitPair
    val withB = e.withColumn("bucket", ((lit(a) * $"vec_id" + lit(b)) % lit(P)) % 100)
    val test = withB.filter($"bucket" >= 90)
      .select($"vec_id", $"embedding".as("qe"))
    val train = withB.filter($"bucket" < 80)
      .select($"vec_id".as("tid"), $"label".cast("long").as("tl"), $"embedding".as("te"))
    val ranked = train.join(broadcast(test))
      .withColumn("score",
        round(graft.functions.VectorFunctions.neo4jScore($"te", $"qe"), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy($"score".desc, $"tid".asc)))
      .filter($"rk" <= CurationQueries.KnnVoteK)
    val votes = ranked.groupBy($"vec_id", $"tl").agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toMap).toMap
    val got = run("q56_knn_vote", sf0001)
      .select($"vec_id", $"pred_label", $"n_votes", $"correct")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (vid, pred, n, _) =>
      val tbl = votes(vid)
      assert(tbl(pred) === n, s"winner count for $vid")
      // every other label has fewer votes, or equal votes and larger label
      tbl.foreach { case (l, c) =>
        assert(c < n || (c == n && l >= pred), s"vote table for $vid: $tbl")
      }
    }
    // vote counts bounded by k
    assert(got.forall(r => r._3 >= 1 && r._3 <= CurationQueries.KnnVoteK))
  }

  private implicit class ToMap2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("q82 DSIR weights rank target-like docs above off-target docs, to the formula") {
    // hand corpus in hashed-bigram form: pool doc 1 shares both its
    // features with the target, doc 2 shares none — the importance
    // weight must separate them, and doc 1's value must equal the
    // add-1-smoothed log-ratio sum computed by hand
    val target = Seq((100L, "en", 1L), (100L, "en", 1L), (100L, "en", 2L))
      .toDF("doc_id", "lang", "b")
    val pool = Seq((1L, "en", 1L), (1L, "en", 2L), (2L, "en", 7L), (2L, "en", 8L))
      .toDF("doc_id", "lang", "b")
    val got = CurationQueries.dsirWeightReport(target, pool)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_grams", $"weight")
      .as[(Long, Long, Double)].collect().toSeq
    val B = CurationQueries.DsirBuckets.toDouble
    val (nt, nr) = (3.0, 4.0)
    def lr(ct: Double, cr: Double) =
      math.log(ct + 1) - math.log(nt + B) - math.log(cr + 1) + math.log(nr + B)
    val w1 = lr(2, 1) + lr(1, 1) // features 1 and 2: in-target
    val w2 = lr(0, 1) + lr(0, 1) // features 7 and 8: off-target
    assert(got.map(_._1) === Seq(1L, 2L))
    assert(got.forall(_._2 === 2L))
    assert(math.abs(got(0)._3 - w1) < 1e-6, s"${got(0)._3} vs $w1")
    assert(math.abs(got(1)._3 - w2) < 1e-6, s"${got(1)._3} vs $w2")
    assert(got(0)._3 > got(1)._3, "target-like doc must outrank off-target doc")
  }

  test("q82 declared query reports pool docs only, weights non-increasing") {
    val (a, b) = SplitPair
    val p = graft.functions.PortableHash.P
    val got = run("q82_dsir_weights")
      .select($"doc_id", $"weight").as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.size <= CurationQueries.DsirTopK)
    // every reported doc is in the pool split (bucket < 80)
    assert(got.forall { case (id, _) => ((a * id + b) % p) % 100 < 80 })
    // the report is the top of a descending ranking
    assert(got.map(_._2) === got.map(_._2).sorted.reverse)
  }

  test("q98 rank ensemble: ranks are permutations, final order follows borda") {
    val rows = CurationQueries.queries("q98_rank_ensemble")(spark, sf0001)
      .select($"doc_id", $"r_quality", $"r_loglik", $"r_diversity",
        $"borda", $"final_rank", $"bucket")
      .as[(Long, Long, Long, Long, Double, Long, Long)].collect()
    val n = rows.length
    assert(n > 0)
    // every rank column is a permutation of 1..n
    for (f <- Seq[((Long, Long, Long, Long, Double, Long, Long)) => Long](
        _._2, _._3, _._4, _._6))
      assert(rows.map(f).sorted.toSeq === (1L to n).toSeq)
    // borda is the mean of the three signal ranks
    rows.foreach { r =>
      assert(r._5 === math.rint((r._2 + r._3 + r._4) / 3.0 * 1e6) / 1e6)
    }
    // final_rank sorts by (borda asc, doc_id asc)
    val byFinal = rows.sortBy(_._6)
    assert(byFinal.map(r => (r._5, r._1)).toSeq ===
      rows.map(r => (r._5, r._1)).sorted.toSeq)
    // terciles partition 1..n in order and are near-equal sized
    assert(byFinal.map(_._7).toSeq === byFinal.map(_._7).sorted.toSeq)
    val sizes = rows.groupBy(_._7).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set(1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("q94 temperature mix: shares sum to 1, sqrt compresses toward uniform") {
    val rows = CurationQueries.queries("q94_temperature_mix")(spark, sf001)
      .select($"lang", $"n_docs", $"raw_share", $"temp_share", $"boost")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length > 1)
    // both share columns are distributions (6-dp rounding slack)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // α = 1/2 < 1 compresses: smaller domains get boost >= larger ones,
    // every boost sits on the correct side of 1 relative to mean size
    val sorted = rows.sortBy(_._2)
    assert(sorted.sliding(2).forall {
      case Array(small, large) => small._5 >= large._5; case _ => true })
    // sqrt keeps the ordering of shares
    assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
  }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q103 moore-lewis selection matches a driver-side recompute") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val all = docs.flatMap(d => toks(d._3))
    val gc = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nGen = all.length.toLong
    val v = gc.size.toLong
    val inToks = docs.filter(_._2 == CurationQueries.MlInDomainSource)
      .flatMap(d => toks(d._3))
    val ic = inToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nIn = inToks.length.toLong
    val expected = docs.filter(_._2 != CurationQueries.MlInDomainSource)
      .map { case (id, _, text) =>
        val ts = toks(text)
        val terms = ts.map { t =>
          math.log((ic.getOrElse(t, 0L) + 1).toDouble) -
            math.log((nIn + v).toDouble) -
            math.log(gc(t).toDouble) + math.log(nGen.toDouble)
        }
        val sum = terms
          .map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble
        (id, r6(sum / ts.length))
      }
      .sortBy { case (id, celd) => (-celd, id) }
      .take(CurationQueries.MlTopK).toSeq
    val got = CurationQueries.queries("q103_moore_lewis")(spark, sf0001)
      .select($"doc_id", $"celd").as[(Long, Double)].collect().toSeq
    assert(got === expected)
    // the in-domain corpus itself is never selected, and the screen is
    // non-degenerate (scores on both sides of zero at this SF)
    val inIds = docs.filter(_._2 == CurationQueries.MlInDomainSource).map(_._1).toSet
    assert(got.forall(r => !inIds.contains(r._1)))
  }

  test("q106 epoch allocation matches a driver-side recompute of all rounds") {
    // independent re-run of the fixed-round water-filling on collected
    // per-lang token counts, BigDecimal end-to-end — every alloc,
    // saturation flag and the leftover must agree exactly. At sf0.001
    // the geometry exercises the round-2 cascade (a domain whose
    // round-1 ask fit under its cap saturates only after
    // re-distribution); both SFs must end non-degenerate.
    Seq(sf0001, sf001).foreach { dir =>
      val counts = spark.read.parquet(s"$dir/documents.parquet")
        .select($"lang", $"text").as[(String, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(_._2.split(" ").count(_.nonEmpty).toLong).sum)
        .toMap.toSeq.sortBy(_._1)
      val t = counts.map(_._2).sum
      val budget = BigDecimal(t * CurationQueries.AllocBudgetNum /
        CurationQueries.AllocBudgetDen)
      val sqrtN = counts.map { case (_, n) =>
        BigDecimal(r6(math.sqrt(n.toDouble))) }
      val cap = counts.map { case (_, n) =>
        BigDecimal(n * CurationQueries.AllocEpochCap) }
      val sTot = sqrtN.sum
      var alloc = sqrtN.zip(cap).map { case (s, c) =>
        BigDecimal(r6((s.toDouble / sTot.toDouble) * budget.toDouble)).min(c) }
      val satAfterR1 = alloc.indices.filter(i => alloc(i) == cap(i)).toSet
      (2 to CurationQueries.AllocRounds).foreach { _ =>
        val rem = budget - alloc.sum
        val sAct = sqrtN.indices
          .filter(i => alloc(i) < cap(i)).map(sqrtN(_)).sum
        alloc = sqrtN.indices.map { i =>
          if (alloc(i) < cap(i) && sAct > 0)
            (alloc(i) + BigDecimal(
              r6((sqrtN(i).toDouble / sAct.toDouble) * rem.toDouble)))
              .min(cap(i))
          else alloc(i)
        }
      }
      val leftover = budget - alloc.sum
      // output alloc/leftover are DOUBLE (the decimal internals cast
      // once in the final projection — see the query's scaladoc); the
      // exact-decimal recompute maps onto them via BigDecimal.toDouble
      val got = CurationQueries.queries("q106_epoch_alloc")(spark, dir)
        .select($"lang", $"n_tok", $"cap_tok", $"alloc", $"epochs",
          $"saturated", $"leftover")
        .as[(String, Long, Long, Double, Double, Long, Double)]
        .collect().sortBy(_._1)
      assert(got.map(_._1).toSeq === counts.map(_._1))
      assert(got.map(_._2).toSeq === counts.map(_._2))
      got.indices.foreach { i =>
        assert(got(i)._3 === cap(i).toLong, s"$dir cap ${counts(i)._1}")
        assert(got(i)._4 === alloc(i).toDouble, s"$dir alloc ${counts(i)._1}")
        assert(got(i)._5 === r6(alloc(i).toDouble / counts(i)._2.toDouble))
        assert(got(i)._6 === (if (alloc(i) == cap(i)) 1L else 0L))
        assert(got(i)._7 === leftover.toDouble)
      }
      // feasibility laws + non-degeneracy
      assert(alloc.sum <= budget)
      assert(got.forall(_._5 <= CurationQueries.AllocEpochCap.toDouble + 1e-9))
      assert(got.exists(_._6 == 1L) && got.exists(_._6 == 0L),
        s"$dir: allocation degenerate (no saturated/unsaturated split)")
      // at sf0.001 the geometry exercises the re-distribution cascade:
      // fr's round-1 ask fits under its cap, but the stranded budget of
      // the three round-1 saturations pushes it to its cap in round 2
      if (dir == sf0001) {
        val satFinal = alloc.indices.filter(i => alloc(i) == cap(i)).toSet
        assert((satFinal -- satAfterR1).nonEmpty,
          "expected a domain that saturates only after round 1")
      }
    }
  }

  test("q107 weighted sample matches a driver-side recompute, keys well-formed") {
    import graft.functions.PortableHash.WeightedSamplePair
    val (a, b) = WeightedSamplePair
    val stop = graft.functions.TextFunctions.Stopwords.toSet
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val t = text.split(" ").filter(_.nonEmpty)
        (id, t.length.toLong, t.distinct.length.toLong,
          t.count(stop.contains).toLong, t.map(_.length.toLong).sum)
      }
    val expected = rows.map { case (id, nt, nd, ns, cs) =>
      val stopRatio = ns.toDouble / nt
      val avgTokLen = cs.toDouble / nt
      val w = r6(0.3 * math.min(1.0, nt / 100.0) +
        0.3 * (nd.toDouble / nt) + 0.2 * (1.0 - stopRatio) +
        0.2 * math.min(1.0, avgTokLen / 8.0))
      val u = (((a * id + b) % P) + 1).toDouble / (P + 1).toDouble
      (id, w, r6(math.log(u) / w))
    }.sortBy { case (id, _, k) => (-k, id) }
      .take(CurationQueries.WsTopK).toSeq
    val got = CurationQueries.queries("q107_weighted_sample")(spark, sf0001)
      .select($"doc_id", $"weight", $"key").as[(Long, Double, Double)]
      .collect().toSeq
    assert(got === expected)
    // ES keys are ln(u)/w with u in (0,1): strictly negative; weights
    // strictly positive by the quality formula's diversity floor
    assert(got.forall(_._2 > 0))
    assert(got.forall(_._3 < 0))
  }

  test("q108 dsir resample matches a driver recompute and is not the greedy top-k") {
    import graft.functions.PortableHash.DsirSamplePair
    val (a, b) = DsirSamplePair
    // the weight table is the same machinery q82's oracle certifies;
    // here the spec checks the race on top of it
    def bucket(id: org.apache.spark.sql.Column) =
      ((lit(SplitPair._1) * id + lit(SplitPair._2)) % lit(P)) % 100
    val bg = graft.queries.KeywordQueries.tokenizedDocs(spark, sf0001)
      .withColumn("bucket", bucket($"doc_id"))
      .select($"doc_id", $"lang", $"bucket",
        explode(graft.queries.TextQueries.shingleCol($"toks", 2)).as("s"))
      .withColumn("b", graft.functions.PortableHash.charHash($"s") %
        lit(CurationQueries.DsirBuckets.toLong))
      .drop("s")
    val weights = CurationQueries.dsirWeightReport(
        bg.filter($"bucket" >= 90), bg.filter($"bucket" < 80))
      .select($"doc_id", $"weight").as[(Long, Double)].collect()
    def r6d(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = weights.map { case (id, w) =>
      val u = (((a * id + b) % P) + 1).toDouble / (P + 1).toDouble
      (id, r6d(math.log(-math.log(u)) - w))
    }.sortBy { case (id, k) => (k, id) }
      .take(CurationQueries.DsirSampleK).toSeq
    val got = CurationQueries.queries("q108_dsir_resample")(spark, sf0001)
      .select($"doc_id", $"race_key").as[(Long, Double)].collect().toSeq
    assert(got === expected)
    // importance RESAMPLING must differ from greedy top-k-by-weight —
    // the diversity property that justifies sampling at all (and a
    // degenerate-u tripwire: identical draws would collapse the race
    // to the greedy ranking)
    val greedy = weights.sortBy { case (id, w) => (-w, id) }
      .take(CurationQueries.DsirSampleK).map(_._1).toSet
    assert(got.map(_._1).toSet != greedy,
      "resample selected exactly the greedy top-k")
  }
}

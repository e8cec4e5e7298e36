package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash._
import graft.functions.TextFunctions._
import graft.queries.TextQueries

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).head().get(0).asInstanceOf[T]

  test("charHash matches a reference fold") {
    def ref(s: String): Long = s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % P)
    for (s <- Seq("a", "abc", "hello world", "the quick brown fox")) {
      val got = Seq(s).toDF("t").select(charHash($"t")).head().getLong(0)
      assert(got === ref(s), s"for '$s'")
    }
  }

  test("charHash of empty string is 0") {
    assert(Seq("").toDF("t").select(charHash($"t")).head().getLong(0) === 0L)
  }

  test("tokens drops empties") {
    val got = Seq("a  b c ").toDF("t").select(tokens($"t")).head().getSeq[String](0)
    assert(got === Seq("a", "b", "c"))
  }

  test("bpe tokens split letter runs, digit runs, marks") {
    val got = Seq("ab12,cd!").toDF("t").select(bpeTokens($"t")).head().getSeq[String](0)
    assert(got === Seq("ab", "12", ",", "cd", "!"))
  }

  test("stopword count") {
    val got = Seq("the cat is on a mat").toDF("t")
      .select(stopwordCount(tokens($"t"))).head().getLong(0)
    assert(got === 3L) // the, is, a
  }

  test("langPredict picks en for english function words, und for none") {
    val en = Seq("the cat and the dog of war").toDF("t")
      .select(langPredict(tokens($"t"))).head().getString(0)
    assert(en === "en")
    val und = Seq("zzz qqq www").toDF("t")
      .select(langPredict(tokens($"t"))).head().getString(0)
    assert(und === "und")
  }

  test("shingles: n-1 fewer than tokens, empty when too short") {
    val got = Seq("a b c d").toDF("t")
      .select(TextQueries.shingleCol(tokens($"t"))).head().getSeq[String](0)
    assert(got === Seq("a|b|c", "b|c|d"))
    val short = Seq("a b").toDF("t")
      .select(TextQueries.shingleCol(tokens($"t"))).head().getSeq[String](0)
    assert(short === Seq.empty)
  }

  test("affine hash stays in [0, P)") {
    for (c <- MinhashFamily ++ SimhashFamily) {
      val h = Seq(123456789L).toDF("x").select(affine(c, $"x")).head().getLong(0)
      assert(h >= 0 && h < P)
    }
  }

  test("lsh bucket is deterministic and in [0, 256)") {
    val v = Array.tabulate(64)(i => (math.sin(i) * 0.5).toFloat)
    val b1 = Seq(v.toSeq).toDF("v").select(lshBucket($"v")).head().getLong(0)
    val b2 = Seq(v.toSeq).toDF("v").select(lshBucket($"v")).head().getLong(0)
    assert(b1 === b2)
    assert(b1 >= 0 && b1 < 256)
  }

  test("quality score bounded in [0,1]") {
    val q = TextQueries.queries("q14_quality")(spark, "/root/testdata/sf0.001")
    val stats = q.agg(min($"quality"), max($"quality")).head()
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("q109 anova decomposition matches a driver recompute; SSB+SSW=SST") {
    // independent path: quality per doc recomputed from raw text, the
    // variance decomposition done naively (definitional sums of
    // squared deviations) rather than via the computational form the
    // query uses — agreement certifies the algebra, not just the code
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stop = Stopwords.toSet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
      .map { case (src, text) =>
        val t = text.split(" ").filter(_.nonEmpty)
        val q = r6(0.3 * math.min(1.0, t.length / 100.0) +
          0.3 * (t.distinct.length.toDouble / t.length) +
          0.2 * (1.0 - t.count(stop.contains).toDouble / t.length) +
          0.2 * math.min(1.0, (t.map(_.length).sum.toDouble / t.length) / 8.0))
        (src, q)
      }
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val grand = docs.map(_._2).sum / docs.length
    val ssb = bySrc.values.map { qs =>
      val m = qs.sum / qs.length; qs.length * (m - grand) * (m - grand) }.sum
    val ssw = bySrc.values.map { qs =>
      val m = qs.sum / qs.length; qs.map(q => (q - m) * (q - m)).sum }.sum
    val k = bySrc.size
    val f = (ssb / (k - 1)) / (ssw / (docs.length - k))
    val rows = TextQueries.queries("q109_source_anova")(spark, "/root/testdata/sf0.001")
      .select($"source", $"n_docs", $"mean_q", $"dev", $"f_stat", $"eta2")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(rows.length === k)
    rows.foreach { case (src, n, mean, dev, fs, eta2) =>
      assert(n === bySrc(src).length.toLong)
      assert(math.abs(mean - bySrc(src).sum / n) < 2e-6, s"mean $src")
      assert(math.abs(dev - (bySrc(src).sum / n - grand)) < 2e-6, s"dev $src")
      // computational vs definitional form agree to rounding noise
      assert(math.abs(fs - f) / f < 1e-3, s"F: query $fs vs naive $f")
      assert(math.abs(eta2 - ssb / (ssb + ssw)) < 1e-4)
      assert(eta2 >= 0 && eta2 <= 1)
    }
  }

  test("q139 distinct-n diversity matches a driver recompute; ratios in (0, 1]") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"lang", $"text").as[(String, String)].collect()
    val byLang = docs.groupBy(_._1).view.mapValues(
      _.map(_._2.split(" ").filter(_.nonEmpty).toSeq)).toMap
    val rows = TextQueries.queries("q139_distinct_ngrams")(spark, "/root/testdata/sf0.001")
      .select($"lang", $"n_unigrams", $"d1", $"n_bigrams", $"d2",
        $"distinct1", $"distinct2")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSet === byLang.keySet)
    rows.foreach { case (lang, nu, d1, nb, d2, r1, r2) =>
      val toks = byLang(lang)
      val unis = toks.flatten
      val bis = toks.flatMap(t => t.zip(t.tail).map { case (a, b) => s"$a|$b" })
      assert(nu === unis.length.toLong, s"$lang unigram instances")
      assert(d1 === unis.distinct.length.toLong, s"$lang unigram types")
      assert(nb === bis.length.toLong, s"$lang bigram instances")
      assert(d2 === bis.distinct.length.toLong, s"$lang bigram types")
      assert(r1 > 0.0 && r1 <= 1.0 && r2 > 0.0 && r2 <= 1.0)
      // bigram diversity exceeds unigram diversity on natural-ish text
      assert(r2 > r1, s"$lang: distinct2 $r2 should exceed distinct1 $r1")
    }
  }

  test("q141 profile matches driver recompute column for column") {
    val t = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val names = t.schema.fieldNames.sorted.toSeq
    val rows = t.collect()
    val got = graft.queries.ExtraQueries.queries("q141_table_profile")(
        spark, "/root/testdata/sf0.001")
      .select($"col_name", $"n_rows", $"n_null", $"n_distinct", $"max_value_freq")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === names)
    got.foreach { case (c, nr, nn, nd, mf) =>
      val i = t.schema.fieldIndex(c)
      val vals = rows.map(r => if (r.isNullAt(i)) null else r.get(i).toString)
      assert(nr === rows.length.toLong, c)
      assert(nn === vals.count(_ == null).toLong, c)
      val grouped = vals.filter(_ != null).groupBy(identity)
      assert(nd === grouped.size.toLong, c)
      assert(mf === grouped.values.map(_.length).max.toLong, c)
    }
    // the profile is informative: a key-like column and a low-card flag
    val m = got.map(r => r._1 -> r._4).toMap
    assert(m("l_returnflag") <= 5 && m("l_orderkey") > m("l_returnflag"))
  }

  test("q142 KMV profile: exact below k, bounded error above, k-mins verified") {
    import graft.functions.PortableHash
    val kk = graft.queries.ExtraQueries.KmvK
    val got = graft.queries.ExtraQueries.queries("q142_profile_sketch")(
        spark, "/root/testdata/sf0.001")
      .select($"col_name", $"n_h", $"n_hash_distinct", $"kmv_est", $"est_ratio")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (c, nh, nd, est, ratio) =>
      if (nd < kk) {
        // below the sketch size the estimate IS the exact count
        assert(nh === nd && est === nd.toDouble, c)
        assert(ratio === 1.0, c)
      } else {
        assert(nh === kk.toLong, c)
        // KMV with k=64 has ~12% standard error; 2x is a loose,
        // non-vacuous bound that a broken kth/hash would blow through
        assert(ratio > 0.5 && ratio < 2.0, s"$c ratio $ratio")
      }
    }
    // both regimes must actually occur on lineitem (flags vs keys)
    assert(got.exists(_._3 < kk) && got.exists(_._3 >= kk))
    // driver recompute of one high-cardinality column's k-min sketch
    val vals = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey".cast("string")).as[String].collect()
    def polyHash(s: String): Long = {
      // the portable char fold (PortableHash.charHashSql twin)
      val p = PortableHash.P
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % p)
    }
    val (ka, kb) = graft.functions.PortableHash.KmvPair
    def h(s: String): Long = (ka * polyHash(s) + kb) % PortableHash.P
    val hs = vals.map(h).distinct.sorted.take(kk)
    val row = got.find(_._1 == "l_orderkey").get
    val wantEst =
      if (hs.length < kk) hs.length.toDouble
      else BigDecimal((kk - 1).toDouble * PortableHash.P / hs.last)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row._4 === wantEst, "l_orderkey kmv_est")
  }

  test("q138 per-source KL matches the definitional sum and is non-negative") {
    // independent path: the textbook Σ p_s(w)·ln(p_s/p_c) computed
    // naively per source — agreement certifies the rearranged identity
    // (S_s/N_s + ln N − ln N_s) the query uses, not just the code
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
    val bySrc = docs.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    val corpus = bySrc.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = corpus.values.sum.toDouble
    val rows = TextQueries.queries("q138_source_kl")(spark, "/root/testdata/sf0.001")
      .select($"source", $"n_toks", $"n_vocab", $"kl")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet === bySrc.keySet)
    rows.foreach { case (src, nToks, nVocab, kl) =>
      val cw = bySrc(src)
      assert(nToks === cw.values.sum)
      assert(nVocab === cw.size.toLong)
      val ns = cw.values.sum.toDouble
      val want = cw.map { case (w, c) =>
        (c / ns) * math.log((c / ns) / (corpus(w) / n)) }.sum
      assert(math.abs(kl - want) < 2e-6, s"$src: query $kl vs naive $want")
      // Gibbs' inequality: KL >= 0, and the fixture's sources are not
      // identical to the corpus mix, so strictly positive somewhere
      assert(kl >= 0.0, src)
    }
    assert(rows.exists(_._4 > 0.0))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnnQueries, ExtraQueries}

class SketchAndVectorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

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
}

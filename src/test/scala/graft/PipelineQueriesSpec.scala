package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{PipelineQueries, TextQueries}

class PipelineQueriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(name: String, dir: String = sf001) =
    PipelineQueries.queries(name)(spark, dir)

  test("q67 cluster stats conserve the corpus: docs sum to corpus size, removed = docs - clusters") {
    val stats = SparkEntry.queries("q67_cluster_stats")(spark, sf001).collect()
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(stats.map(_.getAs[Long]("n_docs")).sum === nDocs)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("n_clusters") * r.getAs[Long]("cluster_size"))
      assert(r.getAs[Long]("n_removed") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
    // survivors per q31 == one per cluster
    val survivors = SparkEntry.queries("q31_dedup_survivors")(spark, sf001)
      .filter(col("is_survivor") === 1).count()
    assert(stats.map(_.getAs[Long]("n_clusters")).sum === survivors)
  }

  test("q135 serpentine shards: exact driver recompute, balance within 2 max docs") {
    Seq(sf0001, sf001).foreach { dir =>
      val k = graft.queries.ExtraQueries.TokenShardK
      val lens = graft.queries.KeywordQueries.tokenizedDocs(spark, dir)
        .select($"doc_id", $"dl".cast("long"))
        .as[(Long, Long)].collect()
      // independent serpentine recompute
      val ranked = lens.sortBy { case (id, nt) => (-nt, id) }
      val loads = Array.fill(k)(0L); val counts = Array.fill(k)(0L)
      val maxT = Array.fill(k)(Long.MinValue); val minT = Array.fill(k)(Long.MaxValue)
      ranked.zipWithIndex.foreach { case ((_, nt), i) =>
        val stripe = i / k; val pos = i % k
        val shard = if (stripe % 2 == 0) pos else k - 1 - pos
        loads(shard) += nt; counts(shard) += 1
        maxT(shard) = math.max(maxT(shard), nt); minT(shard) = math.min(minT(shard), nt)
      }
      val got = SparkEntry.queries("q135_token_shards")(spark, dir)
        .select($"shard", $"n_docs", $"n_tokens", $"max_doc_tokens", $"min_doc_tokens")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got.length === k, dir)
      got.foreach { case (sh, nd, ntk, mx, mn) =>
        val i = sh.toInt
        assert((nd, ntk, mx, mn) === ((counts(i), loads(i), maxT(i), minT(i))),
          s"$dir shard $sh")
      }
      // the balance law the serpentine order buys: max load − min load
      // bounded by the biggest doc (×2 for the partial tail stripe),
      // INDEPENDENT of corpus size — q68's hash sharding has no such bound
      val maxDoc = lens.map(_._2).max
      assert(loads.max - loads.min <= 2 * maxDoc,
        s"$dir imbalance ${loads.max - loads.min} vs maxDoc $maxDoc")
      assert(loads.sum === lens.map(_._2).sum, dir)
    }
  }

  test("q68 shard manifest conserves docs/tokens/bytes and is partition-count invariant") {
    val m = SparkEntry.queries("q68_shard_manifest")(spark, sf001).collect()
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    assert(m.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val totToks = docs.select(
      sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")))
      .head.getLong(0)
    assert(m.map(_.getAs[Long]("n_tokens")).sum === totToks)
    assert(m.map(_.getAs[Long]("n_bytes")).sum ===
      docs.select(sum(col("n_chars"))).head.getLong(0))
    // the manifest is a pure function of doc_id — repartitioning the
    // input cannot move a doc between shards
    val again = SparkEntry.queries("q68_shard_manifest")(spark, sf001)
    assert(again.collect().toSeq === m.toSeq)
  }

  test("q71 keeps exactly one survivor per cluster, and it is the best-quality member") {
    val rows = SparkEntry.queries("q71_quality_survivors")(spark, sf001).collect()
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    byComp.foreach { case (comp, members) =>
      val surv = members.filter(_.getAs[Int]("is_survivor") == 1)
      assert(surv.length == 1, s"component $comp must have exactly one survivor")
      val best = members.map(_.getAs[Double]("quality")).max
      assert(surv.head.getAs[Double]("quality") == best,
        s"component $comp survivor must have the max quality")
    }
    // same clustering as q31 — only the policy differs
    val q31 = SparkEntry.queries("q31_dedup_survivors")(spark, sf001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    rows.foreach { r =>
      assert(q31(r.getAs[Long]("doc_id")) == r.getAs[Long]("component")) }
    assert(byComp.exists(_._2.length > 1), "fixture should plant multi-doc clusters")
  }

  test("q70 vocab coverage is monotone, ends at 1.0 when vocab fits, conserves counts") {
    val rows = SparkEntry.queries("q70_vocab_coverage")(spark, sf001)
      .collect()
    val cov = rows.map(_.getAs[Double]("cum_coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    if (rows.length < graft.queries.PipelineQueries.VocabTopN)
      assert(math.abs(cov.last - 1.0) < 1e-9,
        "full vocab must cover the whole token mass")
  }

  test("distributed rank/cumsum equals the single-partition window formulation") {
    import org.apache.spark.sql.expressions.Window
    // adversarial frame: heavy count ties (the order falls back to the
    // token tiebreak), a run longer than one range partition, topN both
    // inside and beyond the frame
    val counts = spark.range(200).toDF("i")
      .select(concat(lit("tok"), format_string("%03d", col("i"))).as("token"),
        (lit(7L) - pmod(col("i"), lit(3L))).as("n"))
    for (topN <- Seq(5, 50, 1000)) {
      val got = graft.operators.RankedCumsum.tokenCoverage(counts, topN)
        .orderBy(col("rank"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val w = Window.orderBy(col("n").desc, col("token").asc)
      val want = counts
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum_n",
          sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rank") <= topN)
        .join(counts.agg(sum(col("n")).as("total_n")))
        .orderBy(col("rank"))
        .collect().map(r => (r.getAs[Long]("rank"), r.getAs[String]("token"),
          r.getAs[Long]("n"), r.getAs[Long]("cum_n"), r.getAs[Long]("total_n")))
      assert(got.toSeq === want.toSeq, s"mismatch at topN=$topN")
    }
    // empty frame: no rows, no failure
    assert(graft.operators.RankedCumsum
      .tokenCoverage(counts.filter(lit(false)), 5).collect().isEmpty)
  }

  test("epochSlices equals the single-partition window formulation") {
    import org.apache.spark.sql.expressions.Window
    // ragged token counts, ranks crossing range-partition boundaries,
    // a doc bigger than the whole budget
    val docs = spark.range(300).toDF("doc_id")
      .select(pmod(col("doc_id") * 37 + 11, lit(101L)).as("h"),
        col("doc_id"), (pmod(col("doc_id"), lit(9L)) * 40 + 1).as("n"))
    val budget = 100L
    val got = graft.operators.RankedCumsum.epochSlices(docs, budget)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val w = Window.orderBy(col("h").asc, col("doc_id").asc)
    val want = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("slice", expr(s"cum_before div $budget"))
      .orderBy(col("rank"))
      .select(col("doc_id"), col("h"), col("n"), col("rank"), col("cum_before"), col("slice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want.toSeq)
  }

  test("q91 slices conserve the corpus and respect the budget geometry") {
    val rows = run("q91_epoch_slices").collect()
    val slices = rows.map(_.getAs[Long]("slice")).toSeq
    assert(slices === (0L until rows.length.toLong), "slices must be contiguous from 0")
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nToks = rows.map(_.getAs[Long]("n_tokens")).sum
    val docToks = spark.read.parquet(s"$sf001/documents.parquet")
      .select(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
    val base = docToks.agg(count(lit(1)), sum(col("n"))).as[(Long, Long)].head()
    assert((nDocs, nToks) === base, "slice totals must conserve the corpus")
    // every slice boundary is exact: a doc starts a new slice iff the
    // running total before it crossed the budget line, so each
    // non-final slice holds at least the budget minus one doc's tokens
    val maxDoc = docToks.agg(max(col("n"))).as[Long].head()
    rows.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("n_tokens") > PipelineQueries.SliceBudget - maxDoc,
        s"slice ${r.getAs[Long]("slice")} underfilled")
    }
  }

  test("q69 export manifest = q43's train row minus the decontaminated mass") {
    // composing decontamination into the funnel can only SHRINK the
    // train split, and per-language doc counts must be bounded by
    // q43's train rows exactly
    val q43 = SparkEntry.queries("q43_curation_pipeline")(spark, sf001)
      .filter(col("split") === "train")
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs")).toMap
    val q69 = SparkEntry.queries("q69_export_manifest")(spark, sf001)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs")).toMap
    assert(q69.keySet.subsetOf(q43.keySet))
    q69.foreach { case (lang, n) => assert(n <= q43(lang),
      s"$lang: export $n exceeds funnel train ${q43(lang)}") }
    assert(q69.values.sum > 0, "export should retain most of the train split")
  }

  test("q68 manifest matches an actual sharded write (same hash drives both)") {
    // the write the manifest describes: repartition on the shard key,
    // one directory per shard; per-directory doc counts must equal the
    // manifest rows exactly or the manifest has drifted from the data
    import graft.functions.PortableHash.{P, ShardPair}
    val (a, b) = ShardPair
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("shard",
        ((lit(a) * col("doc_id") + lit(b)) % lit(P)) % graft.queries.ExtraQueries.NShards)
    docs.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val written = spark.read.parquet(dir)
      .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number]("shard").longValue -> r.getAs[Long]("n")).toMap
    val manifest = SparkEntry.queries("q68_shard_manifest")(spark, sf001)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(written === manifest)
  }

  test("q42 packing: bins respect the token budget up to one chunk of overshoot") {
    val bins = run("q42_packing").cache()
    val over = bins.filter(
      $"total_tokens" >= lit(PipelineQueries.PackBudget + TextQueries.ChunkSize))
    assert(over.count() === 0)
    // every bin is non-empty, every group's bins are contiguous from 0
    assert(bins.filter($"n_chunks" < 1).count() === 0)
    val gaps = bins.groupBy($"pack_group")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"), count(lit(1)).as("n"))
      .filter($"lo" =!= 0 || $"hi" =!= $"n" - 1)
    assert(gaps.count() === 0)
    bins.unpersist()
  }

  test("q42 packing conserves q39's chunk count and token mass") {
    val bins = run("q42_packing")
      .agg(sum($"n_chunks"), sum($"total_tokens")).as[(Long, Long)].head()
    val st = TextQueries.ChunkStride
    val cs = TextQueries.ChunkSize
    val chunks = graft.queries.TextQueries.queries("q39_chunking")(spark, sf001)
      .withColumn("i", explode(sequence(lit(0L), $"n_chunks" - 1)))
      .withColumn("chunk_toks", least(lit(cs.toLong), $"n_toks" - $"i" * st))
      .agg(count(lit(1)), sum($"chunk_toks")).as[(Long, Long)].head()
    assert(bins === chunks)
  }

  test("q41 tfidf: per-doc ranks are 1..k with non-increasing scores") {
    val t = run("q41_tfidf_topterms").cache()
    assert(t.filter($"rank" < 1 || $"rank" > PipelineQueries.TfidfTopK).count() === 0)
    val bad = t.as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).values.filter { rows =>
        val sorted = rows.sortBy(_._2)
        sorted.map(_._2).toSeq != (1L to rows.length).toSeq ||
          sorted.sliding(2).exists { case Array(a, b) => b._4 > a._4; case _ => false }
      }
    assert(bad.isEmpty)
    t.unpersist()
  }

  test("q44 stratified sample matches a direct filter-then-count formulation") {
    import graft.functions.PortableHash.{P, SamplePair}
    val (a, b) = SamplePair
    val agg = run("q44_stratified_sample")
      .select($"lang", $"n_sampled").as[(String, Long)].collect().toMap
    val rates = PipelineQueries.SampleRates.toMap
    val direct = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("bucket", ((lit(a) * $"doc_id" + lit(b)) % lit(P)) % 100)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket")))
      .filter { case (l, bk) => bk < rates.getOrElse(l, 0) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(agg === direct)
    // at least one stratum actually sampled, none exceeds its total
    assert(agg.values.sum > 0)
  }

  test("q43 curation keeps only above-threshold docs and survivors") {
    val rows = run("q43_curation_pipeline")
      .select($"n_docs", $"avg_quality").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, q) =>
      n > 0 && q >= PipelineQueries.QualityThreshold })
  }
}

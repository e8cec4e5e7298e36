package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.search.AnnIndex

class AnnIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private lazy val queryVec: Array[Float] = corpus
    .filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray

  private lazy val exactTop10: Seq[Long] = corpus
    .withColumn("score", neo4jScore($"embedding", typedLit(queryVec.toSeq)))
    .orderBy($"score".desc, $"vec_id".asc).limit(10)
    .select($"vec_id").collect().map(_.getLong(0)).toSeq

  test("BRP-LSH top-10 recall >= 0.6 vs exact") {
    val idx = AnnIndex.buildBrp(corpus)
    val got = idx.topK(queryVec, 10).select($"vec_id").collect().map(_.getLong(0)).toSet
    val recall = exactTop10.count(got.contains).toDouble / exactTop10.size
    assert(recall >= 0.6, s"recall $recall, got $got vs exact $exactTop10")
  }

  test("BRP-LSH is deterministic under a fixed seed") {
    val a = AnnIndex.buildBrp(corpus).topK(queryVec, 10).collect().map(_.getLong(0)).toSeq
    val b = AnnIndex.buildBrp(corpus).topK(queryVec, 10).collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("IVF top-10 recall >= 0.6 vs exact with 4/16 cells probed") {
    val idx = AnnIndex.buildIvf(corpus)
    val got = idx.topK(queryVec, 10).select($"vec_id").collect().map(_.getLong(0)).toSet
    val recall = exactTop10.count(got.contains).toDouble / exactTop10.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF probing all cells equals exact") {
    val idx = AnnIndex.buildIvf(corpus, cells = 8)
    val got = idx.topK(queryVec, 10, nProbe = 8)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    assert(got === exactTop10)
  }

  test("BRP index round-trips through save/load with identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val built = AnnIndex.buildBrp(corpus)
    AnnIndex.saveBrp(built, dir)
    val loaded = AnnIndex.loadBrp(spark, dir)
    val a = built.topK(queryVec, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = loaded.topK(queryVec, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
  }

  test("persisted IVF probe partition-prunes on cell and matches the in-memory probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val idx = AnnIndex.buildIvf(corpus, cells = 8)
    AnnIndex.saveIvf(idx, dir)
    val probe = AnnIndex.probeIvf(spark, dir, queryVec, k = 10, nProbe = 3)
    // the probe's cell predicate must reach the scan as a PARTITION
    // filter (directory pruning) — the property that bounds probe I/O
    // on a cell-partitioned 100 TB corpus
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected a partition filter on cell in:\n$plan")
    val fromDisk = probe.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val inMemory = idx.topK(queryVec, 10, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(fromDisk === inMemory && fromDisk.nonEmpty)
  }

  test("multi-query artifact probe equals per-query probes and prunes partitions dynamically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-multi").toString
    val idx = AnnIndex.buildIvf(corpus, cells = 8)
    AnnIndex.saveIvf(idx, dir)
    val queries = corpus.filter($"vec_id" < 3).select($"vec_id", $"embedding")
    val multi = AnnIndex.probeIvfMulti(spark, dir, queries, k = 10, nProbe = 3)
    // the artifact scan must carry the probed cells as a PARTITION
    // filter via dynamic pruning from the broadcast query side — the
    // q73/q75 bounded-I/O property, now per micro-batch
    val scan = multi.queryExecution.executedPlan.toString.linesIterator
      .find(l => l.contains("Scan parquet") && l.contains("graft-ivf-multi"))
      .getOrElse("")
    assert(scan.contains("PartitionFilters: [") && scan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on cell in:\n$scan")
    val got = multi.orderBy($"query_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val want = (0L until 3L).flatMap { qid =>
      val qv = corpus.filter($"vec_id" === qid)
        .select($"embedding").head().getSeq[Float](0).toArray
      AnnIndex.probeIvf(spark, dir, qv, k = 10, nProbe = 3).collect()
        .zipWithIndex.map { case (r, i) => (qid, r.getLong(0), r.getDouble(2), (i + 1).toLong) }
    }
    assert(got === want && got.nonEmpty)
  }

  test("BRP similarity join finds self-pairs' neighbors symmetrically") {
    val idx = AnnIndex.buildBrp(corpus)
    val pairs = idx.nearDupPairs(minCos = 0.5).select($"vec_a", $"vec_b").collect()
    // each returned pair ordered, no self-pairs
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("q72's LSH route equals q21's exact all-pairs top-20 at sf0.001 too") {
    // the driver's oracle certifies this at sf0.01; this pins the
    // recall gate at the spec SF as well (the top-20 margin is
    // thinnest here: min table-collisions 3 of 12 — see the NearDupMinCos
    // scaladoc before touching index parameters)
    val got = SparkEntry.queries("q72_brp_neardup")(spark, sf0001)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq
    val want = SparkEntry.queries("q21_embedding_neardup")(spark, sf0001)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq
    assert(got === want && got.size === 20)
  }

  test("canonical-table near-dup join emits exactly the MLlib similarity-join pair set") {
    // same fitted model, two routes: MLlib's OR-amplified join+distinct
    // vs the canonical-table equi-join (q72's shape). Candidates are by
    // construction the same set (pairs sharing >= 1 bucket), so the
    // verified outputs must be identical — each pair exactly once.
    val idx = AnnIndex.buildBrp(corpus, numTables = 7)
    for (minCos <- Seq(0.3, 0.45)) {
      val mllib = idx.nearDupPairs(minCos)
        .select($"vec_a", $"vec_b").as[(Long, Long)].collect().sorted.toSeq
      val canonical = idx.nearDupPairsCanonical(minCos)
        .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq
      assert(canonical.size === canonical.distinct.size,
        "canonical join must emit each pair exactly once")
      assert(canonical.sorted === mllib, s"pair sets differ at minCos=$minCos")
    }
  }

  test("tombstoneRowCap memoizes per segment listing: an unchanged store runs zero jobs") {
    val delta = java.nio.file.Files
      .createTempDirectory("graft_tomb_memo").toString
    AnnIndex.appendTombstones(spark, delta,
      Seq(1L, 2L, 3L).toDF("vec_id"), 0L, compactEvery = 0)
    assert(AnnIndex.tombstoneRowCap(spark, delta) === 3L)
    // a maintenance check against the UNCHANGED store must run zero
    // Spark jobs — the count is a pure function of the immutable
    // segment listing (the media markerRowCapCached rule, ported)
    org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(AnnIndex.tombstoneRowCap(spark, delta) === 3L)
      assert(AnnIndex.tombstoneRowCap(spark, delta) === 3L)
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      assert(jobs.get === 0,
        s"memoized checks must run zero jobs, ran ${jobs.get}")
      // an append CHANGES the listing — the cache misses and recounts
      AnnIndex.appendTombstones(spark, delta,
        Seq(4L, 4L, 5L).toDF("vec_id"), 1L, compactEvery = 0)
      assert(AnnIndex.tombstoneRowCap(spark, delta) === 6L,
        "the raw cap counts replay rows too (upper bound — folds early, never late)")
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      assert(jobs.get > 0, "a changed listing must recount")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

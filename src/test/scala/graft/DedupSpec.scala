package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash._
import graft.operators.Dedup._
import graft.queries.DedupQueries

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("jaccard of identical arrays is 1, disjoint is 0") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), Seq(7L, 8L)))
      .toDF("a", "b", "c")
    val r = df.select(jaccard($"a", $"b"), jaccard($"a", $"c")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("minhash signature: identical inputs give identical signatures") {
    val df = Seq(Seq(10L, 20L, 30L), Seq(10L, 20L, 30L)).toDF("hs")
    val sigs = df.select(minhashSignature($"hs")).collect().map(_.getSeq[Long](0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0).length === MinhashFamily.size)
  }

  test("minhash signature of empty set is the all-P sentinel") {
    val sig = Seq(Seq.empty[Long]).toDF("hs")
      .select(minhashSignature($"hs")).head().getSeq[Long](0)
    assert(sig.forall(_ === P))
  }

  test("minhash of a subset only raises slot minima") {
    // adding elements can only lower each slot's min
    val small = Seq(Seq(10L, 20L)).toDF("hs").select(minhashSignature($"hs")).head().getSeq[Long](0)
    val big = Seq(Seq(10L, 20L, 30L, 40L)).toDF("hs").select(minhashSignature($"hs")).head().getSeq[Long](0)
    assert(big.zip(small).forall { case (b, s) => b <= s })
  }

  test("simhash: identical token multisets match, hamming 0") {
    val df = Seq(Seq(10L, 20L, 30L), Seq(10L, 20L, 30L)).toDF("th")
    val sigs = df.select(simhash($"th")).collect().map(_.getLong(0))
    assert(sigs(0) === sigs(1))
    val h = Seq((sigs(0), sigs(1))).toDF("a", "b").select(hamming($"a", $"b")).head().getLong(0)
    assert(h === 0L)
  }

  test("simhash stays within 48 bits") {
    val sig = Seq(Seq(11L, 22L, 33L, 44L)).toDF("th").select(simhash($"th")).head().getLong(0)
    assert(sig >= 0L && sig < (1L << SimhashBits))
  }

  test("exact survivors keep min id and count copies") {
    val df = Seq((1L, "x"), (5L, "x"), (3L, "y")).toDF("id", "content")
    val out = exactSurvivors(df, "id", "content").orderBy($"content").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("x", 1L, 2L), ("y", 3L, 1L)))
  }

  test("connected components: chain, clique, and singletons") {
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L)
    // driver-local union-find path (default for small edge sets)
    val local = connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local === want)
    // distributed min-label fixpoint path (forced): identical output
    val dist = connectedComponents(pairs, localMaxEdges = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist === want)
  }

  test("q122 dup flows match a driver recompute from q19's pairs and doc sources") {
    import graft.queries.DedupQueries
    val pairs = DedupQueries.queries("q19_minhash_lsh")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = pairs.map { case (a, b, j) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa), j)
    }
    val rows = DedupQueries.queries("q122_dup_flows")(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum === pairs.length.toLong)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val cell = (r.getString(0), r.getString(1))
      val js = cells.filter(_._1 == cell).map(_._2)
      assert(r.getLong(2) === js.length.toLong, s"$cell n_pairs")
      assert(math.abs(r.getDouble(4) - js.sum / js.length) < 1e-6, s"$cell mean")
      // verified pairs all passed the 0.5 threshold
      assert(r.getDouble(4) >= 0.5 && r.getDouble(4) <= 1.0)
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ===
      cells.map(_._1).toSet)
  }

  test("q124 component split: comp-keyed leakage structurally zero, doc baseline recomputed") {
    import graft.functions.PortableHash.{P, SplitPair}
    import graft.queries.DedupQueries
    val labels = DedupQueries.queries("q31_dedup_survivors")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (a, b) = SplitPair
    def split(id: Long) = {
      val bk = ((a * id + b) % P) % 100
      if (bk < 80) "train" else if (bk >= 90) "test" else "val"
    }
    val byComp = labels.groupBy(_._2)
    val straddleDoc = byComp.values
      .count(_.map(p => split(p._1)).distinct.length > 1).toLong
    val leakyDoc = byComp.values.count { ds =>
      val ss = ds.map(p => split(p._1)).toSet
      ss.contains("train") && ss.contains("test")
    }.toLong
    val row = DedupQueries.queries("q124_component_split")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) === labels.length.toLong)
    assert(row.getLong(1) === byComp.size.toLong)
    // component-keyed split sizes: every doc inherits its component's
    // split, so the realized sizes are the component-hash partition
    val want = labels.groupBy(p => split(p._2)).view.mapValues(_.length.toLong)
    assert(row.getLong(2) === want.getOrElse("train", 0L))
    assert(row.getLong(3) === want.getOrElse("val", 0L))
    assert(row.getLong(4) === want.getOrElse("test", 0L))
    assert(row.getLong(2) + row.getLong(3) + row.getLong(4) === row.getLong(0))
    assert(row.getLong(5) === straddleDoc)
    assert(row.getLong(6) === leakyDoc)
    // the point of the operator: component-keyed assignment cannot
    // straddle — structurally, not statistically
    assert(row.getLong(7) === 0L && row.getLong(8) === 0L)
  }

  test("local and distributed components agree on fixture LSH pairs") {
    val pairs = graft.queries.DedupQueries.queries("q19_minhash_lsh")(spark, sf0001)
      .select($"doc_a", $"doc_b")
    val local = connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = connectedComponents(pairs, localMaxEdges = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local.nonEmpty && local === dist)
  }

  test("incremental dedup against a persisted corpus index matches the monolithic path") {
    import graft.operators.Dedup._
    // the daily-ingest loop closed end-to-end: write the corpus band-key
    // + shingle artifacts, read them back, and join only the new batch
    // against them — output must equal incrementalPairs over the full
    // corpus with the batch flagged new
    val sh = graft.queries.DedupQueries.hashedShingles(spark, sf0001)
      .select($"doc_id", $"hs")
    // half the corpus plays the new batch, so the fixture's LSH pairs
    // (present at sf0.001 — see the components test above) are near-
    // certain to touch it and the equality check is non-vacuous
    val isNew = pmod($"doc_id", lit(2L)) === 1
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_idx").toString
    saveCorpusIndex(sh.filter(!isNew), "doc_id", "hs", dir)
    val viaIndexRows = incrementalPairsVsIndex(spark, dir,
        sh.filter(isNew), "doc_id", "hs", graft.queries.DedupQueries.JaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3))).toSeq
    val monolithicRows = incrementalPairs(sh.withColumn("is_new", isNew),
        "doc_id", "hs", "is_new", graft.queries.DedupQueries.JaccardThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3))).toSeq
    // the canonical-band join must emit each pair exactly once — a
    // duplicate here means the distinct()-free claim is broken
    assert(viaIndexRows.size === viaIndexRows.distinct.size)
    assert(monolithicRows.size === monolithicRows.distinct.size)
    val viaIndex = viaIndexRows.toSet
    val monolithic = monolithicRows.toSet
    assert(viaIndex === monolithic && monolithic.nonEmpty)
    // the artifact really is band-partitioned on disk (probe pruning)
    assert(new java.io.File(s"$dir/bands").listFiles().exists(_.getName.startsWith("band=")))
  }

  test("probing a stale-format corpus index fails with an actionable rebuild message") {
    import graft.operators.Dedup._
    val sh = graft.queries.DedupQueries.hashedShingles(spark, sf0001)
      .select($"doc_id", $"hs").limit(10)
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_idx").toString
    saveCorpusIndex(sh, "doc_id", "hs", dir)
    // simulate an index written by the pre-`sig` release: drop the
    // column the canonical-band probe needs and swap the rewritten
    // bands table into place (write-to-sibling + rename — Spark refuses
    // to overwrite a path it is reading from)
    spark.read.parquet(s"$dir/bands").drop("sig")
      .write.parquet(s"$dir/bands_stale")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$dir/bands"))
    assert(new java.io.File(s"$dir/bands_stale")
      .renameTo(new java.io.File(s"$dir/bands")))
    val e = intercept[IllegalArgumentException] {
      incrementalPairsVsIndex(spark, dir, sh, "doc_id", "hs", 0.5)
    }
    assert(e.getMessage.contains("sig") &&
      e.getMessage.contains("saveCorpusIndex"), e.getMessage)
  }

  test("star contraction solves a 10k-node chain in O(log n) rounds") {
    // a chain is the worst case for min-label propagation (O(diameter)
    // = O(n) rounds); large-star/small-star must close it in ~log n.
    val n = 10000L
    val pairs = spark.range(1, n)
      .selectExpr("id AS a", "id + 1 AS b")
    val (labels, rounds) = graft.operators.Dedup.starContract(pairs)
    assert(rounds <= 30, s"expected O(log n) rounds for a chain, took $rounds")
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === n)
    assert(out.forall(_._2 === 1L), "every chain node must label to the min id")
  }

  test("survivors keep min-id per component and all unpaired docs") {
    val docs = Seq(1L, 2L, 3L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = survivors(docs, "doc_id", pairs)
      .select($"doc_id", $"component", $"is_survivor")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (99L, 99L, true)))
  }

  test("q19 LSH candidates recover all q18-style exact pairs (global)") {
    // exact global near-dup pairs at sf0.001 via brute force on hashed shingles
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id",
        transform(array_distinct(
          graft.queries.TextQueries.shingleCol(graft.functions.TextFunctions.tokens($"text"))),
          x => charHash(x)).as("hs"))
    val a = sh.select($"doc_id".as("doc_a"), $"hs".as("hs_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"hs".as("hs_b"))
    val exact = a.join(b, $"doc_a" < $"doc_b")
      .withColumn("jac", jaccard($"hs_a", $"hs_b"))
      .filter($"jac" >= DedupQueries.JaccardThreshold)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.queries("q19_minhash_lsh")(spark, sf0001)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with 4 bands x 4 rows, P(catch | jac >= 0.9) ≈ 1 - (1-0.9^4)^4 ≈ 0.9985;
    // the fixture's planted pairs are all >= 0.9
    assert(exact.subsetOf(lsh) || (exact -- lsh).isEmpty,
      s"LSH missed pairs: ${exact -- lsh}")
    // and every LSH-verified pair really is above threshold (verified step)
    assert(lsh.subsetOf(exact))
  }

  test("incremental pairs equal the full LSH pair set restricted to the new batch") {
    // the daily-ingest path (new-batch bands x corpus bands) must find
    // exactly the pairs the full build finds that touch a new doc
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .repartition(4)
      .select($"doc_id",
        graft.expressions.HashExpressions.shingleHashSet($"text", 3).as("hs"))
      .withColumn("is_new", pmod($"doc_id", lit(10L)) === 7)
    val inc = graft.operators.Dedup.incrementalPairs(
        sh, "doc_id", "hs", "is_new", DedupQueries.JaccardThreshold)
      .select($"doc_id", $"partner").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = DedupQueries.queries("q19_minhash_lsh")(spark, sf0001)
      .select($"doc_a", $"doc_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .filter(_._1 % 10 == 7).toSet
    assert(inc === full)
  }

  test("q20 chunk blocking is lossless for hamming <= HammingMax") {
    // brute-force simhash pairs at sf0.001 must equal the blocked result
    val sigs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", simhash(transform(
        graft.functions.TextFunctions.tokens($"text"), x => charHash(x))).as("sig"))
    val a = sigs.select($"doc_id".as("doc_a"), $"sig".as("sig_a"))
    val b = sigs.select($"doc_id".as("doc_b"), $"sig".as("sig_b"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .withColumn("ham", hamming($"sig_a", $"sig_b"))
      .filter($"ham" <= DedupQueries.HammingMax)
      .select($"doc_a", $"doc_b", $"ham").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val blocked = DedupQueries.queries("q20_simhash")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute === blocked)
  }

  test("q66 span dedup: kept chunks == distinct chunk hashes, dups non-degenerate") {
    // set-level invariant, independent of the window/first-wins logic:
    // across the corpus, (total chunks - duplicate chunks) must equal
    // the number of DISTINCT chunk hashes — every hash keeps exactly
    // one representative
    val res = DedupQueries.queries("q66_span_dedup")(spark, sf001).cache()
    val tot = res.agg(sum($"n_chunks"), sum($"n_dup_chunks")).head()
    val (nChunks, nDups) = (tot.getLong(0), tot.getLong(1))
    val st = graft.queries.TextQueries.ChunkStride
    val cs = graft.queries.TextQueries.ChunkSize
    val distinctHashes = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("toks", graft.functions.TextFunctions.tokens($"text"))
      .withColumn("n_toks", size($"toks").cast("long"))
      .withColumn("n_chunks", expr(s"(n_toks + ${st - 1}) div $st"))
      .filter($"n_chunks" > 0)
      .select(explode(org.apache.spark.sql.functions.transform(
        sequence(lit(0L), $"n_chunks" - 1), i =>
          charHash(concat_ws(" ", slice($"toks", (i * st + 1).cast("int"), lit(cs))))))
        .as("h"))
      .distinct().count()
    assert(nChunks - nDups === distinctHashes)
    assert(nDups > 0, "fixture near-dups must share at least one exact 32-token span")
    res.unpersist()
  }

  test("q100 split leakage: counts consistent, leak flag exact, non-degenerate") {
    val rows = graft.queries.DedupQueries.queries("q100_split_leakage")(spark, sf001)
      .select($"component", $"cluster_size", $"n_train", $"n_val", $"n_test", $"leaks")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, size, tr, va, te, lk) =>
      assert(size > 1, s"component $c: only multi-doc clusters are reported")
      assert(tr + va + te === size, s"component $c: split counts must partition the cluster")
      assert(lk === (if (tr > 0 && te > 0) 1L else 0L), s"component $c: leak flag")
    }
    // the fixture's planted near-dups straddle the split boundary — the
    // audit must be non-degenerate in BOTH directions
    assert(rows.exists(_._6 == 1L), "expected at least one leaking cluster")
    assert(rows.exists(_._6 == 0L), "expected at least one clean cluster")
    // cluster-size histogram must agree with q67 over the same labels
    val q67 = graft.queries.DedupQueries.queries("q67_cluster_stats")(spark, sf001)
      .select($"cluster_size", $"n_clusters").as[(Long, Long)].collect()
      .filter(_._1 > 1).toMap
    val mine = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(mine === q67)
  }
}

package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Decade-up scale probe: synthesizes a corpus `--copies`× the largest
  * fixture (each sf0.1 document replicated into perturbed near-dup
  * clones with distinct ids — deliberately dedup-HEAVY, the worst case
  * for the pair-generating queries) and times a corpus-query subset
  * against it. This answers "does the sf0.01→sf0.1 scaling trend hold
  * more decades up, under adversarial dup density?" with a measurement
  * instead of an extrapolation; results are recorded in SCALING.md.
  *
  * Probes are driven with the noop sink (full evaluation of every
  * output row — Bench's round-7 action), so probe work equals
  * delivered work.
  *
  * Usage: `sbt "runMain graft.ScaleProbe /root/testdata/sf0.1 /tmp/sfbig
  *   [--copies N] [--queries q65_bloom_decontam,q69_export_manifest]"`
  * (writes the synthetic corpus on first run, reuses it after; the out
  * dir encodes the copy count, so different scales don't collide).
  */
object ScaleProbe {
  val DefaultCopies = 10

  val DefaultQueries: Seq[String] = Seq(
    "q10_knn_exact", "q19_minhash_lsh", "q20_simhash", "q17_dedup_exact",
    "q45_bigram_top", "q41_tfidf_topterms", "q52_decontamination",
    "q55_unigram_loglik", "q57_countmin", "q59_incremental_dedup",
    "q62_oov_rate", "q64_containment_audit", "q65_bloom_decontam",
    "q66_span_dedup", "q69_export_manifest", "q70_vocab_coverage")

  def main(args: Array[String]): Unit = {
    val (flags, positionals) = Search.splitArgs(args.toSeq)
    val srcDir = positionals.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = flags.get("copies").map(_.toInt).getOrElse(DefaultCopies)
    val outDir = positionals.lift(1).getOrElse("/tmp/sfbig") + s"_x$copies"
    val probeQueries = flags.get("queries")
      .map(_.split(",").toSeq).getOrElse(DefaultQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsPath = s"$outDir/documents.parquet"
    if (!new java.io.File(docsPath).exists()) {
      val copyDf = spark.range(copies).select(col("id").as("copy"))
      spark.read.parquet(s"$srcDir/documents.parquet")
        .crossJoin(copyDf)
        // clone ids live in disjoint ranges; each clone's text gets a
        // copy-specific suffix token, so clones are NEAR-dups (high but
        // non-1.0 jaccard), exercising the verification path for real
        .select(
          (col("doc_id") + col("copy") * 10000000L).as("doc_id"),
          concat(col("text"), lit(" copytag"), col("copy")).as("text"),
          col("lang"), col("source"),
          (col("n_chars") + lit(9L)).as("n_chars"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(docsPath)
      spark.read.parquet(s"$srcDir/embeddings.parquet")
        .crossJoin(copyDf)
        .select(
          (col("vec_id") + col("copy") * 10000000L).as("vec_id"),
          // perturb one dimension per copy so clones are near- but not
          // exact-duplicate vectors
          zip_with(col("embedding"),
            transform(col("embedding"), (_, i) =>
              when(i === 0, col("copy").cast("float") * lit(0.001f))
                .otherwise(lit(0.0f))),
            (v, d) => v + d).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
    }
    // BRP tuning probe mode (--brp-tables N [--brp-bucket L]): times
    // q72's near-dup plan on the REAL srcDir fixture with an
    // alternative (numTables, bucketLength) and reports recall against
    // the exact all-pairs top-20 computed in the same run (2k vectors
    // at sf0.1 ⇒ the exact baseline is cheap here; at corpus scale it
    // is not, which is why q72 exists). Feeds the minCos-vs-geometry
    // tuning note in SCALING.md.
    flags.get("brp-tables").foreach { tStr =>
      val tables = tStr.toInt
      val bucket = flags.get("brp-bucket").map(_.toDouble).getOrElse(2.0)
      val minCos = flags.get("brp-mincos").map(_.toDouble)
        .getOrElse(queries.AnnQueries.NearDupMinCos)
      val topK = queries.AnnQueries.NearDupTopK
      val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
        .filter(size(col("embedding")) === 64)
        .select(col("vec_id"), col("embedding"))
      def lshPass(): (Double, Seq[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val idx = search.AnnIndex.buildBrp(emb, numTables = tables,
          bucketLength = bucket, cache = true)
        val top = idx.nearDupPairsCanonical(minCos)
          .orderBy(col("score").desc, col("vec_a").asc, col("vec_b").asc)
          .limit(topK)
        top.write.format("noop").mode("overwrite").save()
        val pairs = top.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        idx.hashed.unpersist()
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      val (coldT, lshPairs) = lshPass()
      val (warmT, _) = lshPass()
      // exact all-pairs top-20 under the same score convention
      val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      val exact = a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          graft.functions.VectorFunctions.neo4jScore(col("ea"), col("eb")).as("score"))
        .orderBy(col("score").desc, col("vec_a").asc, col("vec_b").asc)
        .limit(topK)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recalled = lshPairs.count(exact.contains)
      println(s"""{"probe":"brp-tuning","src":"$srcDir","n_vecs":${emb.count()},"num_tables":$tables,"bucket_length":$bucket,"min_cos":$minCos,"cold_sec":$coldT,"warm_sec":$warmT,"recall_at_$topK":${recalled.toDouble / topK}}""")
      spark.stop()
      return
    }
    // SemDeDup probe mode (--semdedup-k N [--semdedup-score S]): the
    // declared q85 geometry (k=8) exists for the oracle's unrolled CTE;
    // at probe scale the paper's shape is k growing with the corpus so
    // cells stay small — this runs fit+report end to end on the cloned
    // embeddings through the broadcast-join assignment path.
    flags.get("semdedup-k").foreach { kStr =>
      val k = kStr.toInt
      val minScore = flags.get("semdedup-score").map(_.toDouble).getOrElse(0.9)
      val emb = spark.read.parquet(s"$outDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nVecs = emb.count()
      def semPass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val cents = operators.SemDedup.fit(emb, k, iters = 2)
        val df = operators.SemDedup.report(emb, cents, minScore)
        df.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, df.filter(col("removed") === 1).count())
      }
      val (coldT, coldRemoved) = semPass()
      val (warmT, _) = semPass()
      println(s"""{"probe":"semdedup","n_vecs":$nVecs,"copies":$copies,"k":$k,"min_score":$minScore,"iters":2,"cold_sec":$coldT,"warm_sec":$warmT,"removed":$coldRemoved}""")
      spark.stop()
      return
    }
    val nDocs = spark.read.parquet(docsPath).count()
    // pass 1 = COLD (includes shared cache builds — the honest "index
    // build" cost); pass 2 = warm steady state, Bench's methodology.
    // The TIMED span covers query CONSTRUCTION + the noop sink: several
    // queries run driver-eager work while building the frame (q70's
    // two-pass offsets, q65's bloom fit, q47/q72's index probe), so
    // timing only the sink would exclude exactly the cost a cold pass
    // exists to measure. The diagnostic row count runs after, untimed.
    def pass(): Seq[(String, (Double, Long))] = probeQueries.map { q =>
      try {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, outDir)
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        q -> ((t, df.count()))
      } catch { case e: Throwable =>
        println(s"FAIL $q: ${e.getMessage}"); q -> ((-1.0, -1L))
      }
    }
    val cold = pass().toMap
    val warm = pass()
    val qs = warm.map { case (q, (t, n)) =>
      s"""\"$q\":{\"cold_sec\":${cold(q)._1},\"warm_sec\":$t,\"rows\":$n}"""
    }.mkString("{", ",", "}")
    println(s"""{"probe":"decade-up","n_docs":$nDocs,"copies":$copies,"action":"noop-sink","queries":$qs}""")
    spark.stop()
  }
}

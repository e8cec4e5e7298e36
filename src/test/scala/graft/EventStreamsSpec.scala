package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, Session}

class EventStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** sf0.001 events as a typed dataset (ts normalized whatever the
    * fixture's physical encoding — see Sources.normalizeEventTs). */
  private lazy val fixtureEvents: Seq[Ev] = graft.sources.Sources
    .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
    .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
    .as[Ev].collect().toSeq

  test("q119 session concurrency matches a driver-side sweep recompute") {
    // independent path: sessionize in plain Scala (same 30-min gap
    // rule), sweep minute deltas, take the top-5 (n_active desc,
    // minute asc) — must equal the declared query row-for-row
    val gapUs = 30L * 60L * 1000000L
    val sessions = fixtureEvents
      .groupBy(_.user_id).values.flatMap { evs =>
        val ts = evs.map(e => (e.ts.getTime * 1000L, e.event_id))
          .sortBy(identity).map(_._1)
        ts.foldLeft(List.empty[(Long, Long)]) { (acc, t) =>
          acc match {
            case (s, e) :: rest if t - e <= gapUs => (s, t) :: rest
            case _ => (t, t) :: acc
          }
        }
      }.toSeq
    val deltas = sessions.flatMap { case (s, e) =>
      Seq((s / 60000000L, 1L), (e / 60000000L + 1L, -1L)) }
    val want = deltas.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (m, d)) => (m, acc + d) }
      .drop(1)
      .sortBy { case (m, a) => (-a, m) }.take(5)
    val got = graft.queries.StreamingQueries
      .queries("q119_session_concurrency")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    // peak concurrency is at least 1 (sessions exist) and never
    // exceeds the session count
    assert(got.head._2 >= 1 && got.head._2 <= sessions.length)
  }

  test("q131 transitions match a per-user driver walk; rows normalize to 1") {
    val walks = fixtureEvents.groupBy(_.user_id).values.flatMap { evs =>
      val ts = evs.sortBy(e => (e.ts.getTime, e.event_id)).map(_.event_type)
      ts.zip(ts.tail)
    }.toSeq
    val rows = graft.queries.StreamingQueries
      .queries("q131_event_transitions")(spark, sf0001).collect()
    // conservation: every non-final event contributes one transition
    val users = fixtureEvents.map(_.user_id).distinct.length
    assert(rows.map(_.getLong(2)).sum === (fixtureEvents.length - users).toLong)
    // cell-wise recompute
    val want = walks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet === want.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) === want((r.getString(0), r.getString(1))))
    }
    // each from-row's probabilities sum to 1 within rounding
    rows.groupBy(_.getString(0)).values.foreach { cells =>
      assert(math.abs(cells.map(_.getDouble(4)).sum - 1.0) < 1e-4)
      assert(cells.map(_.getLong(2)).sum === cells.head.getLong(3))
    }
  }

  test("q132 latency quantiles match the driver quantile rule on the same walks") {
    val byUser = fixtureEvents.groupBy(_.user_id)
    def firstAfter(evs: Seq[(Long, String)], tpe: String, after: Long): Option[Long] =
      evs.collectFirst { case (t, tp) if tp == tpe && t > after => t }
    val lats = byUser.values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
        .map(e => (e.ts.getTime * 1000L, e.event_type))
      for {
        t1 <- firstAfter(sorted, "view", Long.MinValue)
        t2 <- firstAfter(sorted, "click", t1)
        t3 <- firstAfter(sorted, "purchase", t2)
      } yield (t3 - t1) / 60000000L
    }.toSeq.sorted
    val rows = graft.queries.StreamingQueries
      .queries("q132_conversion_latency")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(50L, 90L, 99L))
    rows.foreach { case (q, m, cum, total) =>
      assert(total === lats.length.toLong)
      // the q92 rule: smallest minute whose cumulative count covers q%
      val want = lats.find(v => lats.count(_ <= v) * 100 >= q * lats.length).get
      assert(m === want, s"p$q")
      assert(cum === lats.count(_ <= m).toLong)
    }
    // quantiles are monotone
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted)
  }

  test("q128 funnel matches a per-user driver walk of the strict ordering") {
    val byUser = fixtureEvents.groupBy(_.user_id)
    def firstAfter(evs: Seq[(Long, String)], tpe: String, after: Long): Option[Long] =
      evs.collectFirst { case (t, tp) if tp == tpe && t > after => t }
    val walks = byUser.values.map { evs =>
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
        .map(e => (e.ts.getTime * 1000L, e.event_type))
      val t1 = firstAfter(sorted, "view", Long.MinValue)
      val t2 = t1.flatMap(firstAfter(sorted, "click", _))
      val t3 = t2.flatMap(firstAfter(sorted, "purchase", _))
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }.toSeq
    val want = Seq(walks.count(_._1).toLong, walks.count(_._2).toLong,
      walks.count(_._3).toLong)
    val rows = graft.queries.StreamingQueries
      .queries("q128_funnel")(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).toSeq === want)
    // the funnel can only narrow
    assert(want(0) >= want(1) && want(1) >= want(2))
    assert(rows(0).isNullAt(3))
    if (want(0) > 0)
      assert(math.abs(rows(1).getDouble(4) - want(1).toDouble / want(0)) < 1e-6)
  }

  test("q129 retention: offset-0 is exactly 1.0, cohorts partition the users") {
    val rows = graft.queries.StreamingQueries
      .queries("q129_retention")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // every user is active on their first day: offset 0 == cohort size
    rows.filter(_._3 == 0L).foreach { r =>
      assert(r._4 === r._2 && r._5 === 1.0, s"cohort ${r._1}")
    }
    // cohort sizes partition the distinct-user population
    val users = fixtureEvents.map(_.user_id).distinct.length.toLong
    val sizes = rows.groupBy(_._1).view.mapValues(_.head._2)
    assert(sizes.values.sum === users)
    // retention is a fraction and a driver recompute agrees cell-wise
    val byUser = fixtureEvents.groupBy(_.user_id).view.mapValues(
      _.map(e => e.ts.getTime * 1000L / 86400000000L)).toMap
    val firstDay = byUser.map { case (u, ds) => u -> ds.min }
    rows.foreach { case (c, sz, off, act, ret) =>
      val expect = byUser.count { case (u, ds) =>
        firstDay(u) == c && ds.contains(c + off) }.toLong
      assert(act === expect, s"cell ($c, $off)")
      assert(ret > 0.0 && ret <= 1.0)
    }
  }

  test("streaming hourly counts replay-match the batch twin") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hc").outputMode("complete").start()
    try {
      mem.addData(fixtureEvents)
      q.processAllAvailable()
      val got = spark.table("hc")
        .select($"hour", $"event_type", $"n", $"sum_value")
        .orderBy($"hour", $"event_type").collect().toSeq
      val want = graft.sources.Sources
        .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
        .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(28,6)")).cast("double").as("sum_value"))
        .select(date_format($"bucket", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"event_type", $"n", $"sum_value")
        .orderBy($"hour", $"event_type").collect().toSeq
      assert(got === want)
    } finally q.stop()
  }

  test("streaming CDC apply replay-matches the batch q114 snapshot") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.latestState(mem.toDS())
      .writeStream.format("memory").queryName("cdc").outputMode("update").start()
    try {
      // replay in two micro-batches split at the q114 instant — the
      // same base/delta carve the batch query audits
      val splitUs = graft.queries.ExtraQueries.CdcSplitUs
      val (base, delta) = fixtureEvents.partition(e =>
        EventStreams.micros(e.ts) < splitUs)
      assert(base.nonEmpty && delta.nonEmpty)
      mem.addData(base); q.processAllAvailable()
      mem.addData(delta); q.processAllAvailable()
      // update-mode memory sink accumulates every emitted revision;
      // the final state is the newest row per user
      val got = spark.table("cdc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getBoolean(5)))
        .groupBy(_._1).view.mapValues(_.maxBy(s => (s._2, s._3))).toMap
      val want = graft.queries.ExtraQueries
        .queries("q114_cdc_apply")(spark, sf0001).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
          r.getInt(4) == 1))).toMap
      assert(got.keySet === want.keySet)
      want.foreach { case (u, (t, typ, del)) =>
        val g = got(u)
        assert((g._2, g._4, g._5) === ((t, typ, del)), s"user $u")
      }
    } finally q.stop()
  }

  test("streaming funnel state replay-matches the batch q128 engine per user") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.funnelState(mem.toDS())
      .writeStream.format("memory").queryName("fun").outputMode("update").start()
    try {
      // watermark-ordered replay in three micro-batches (the
      // documented across-batch ordering assumption)
      val sorted = fixtureEvents.sortBy(e =>
        (EventStreams.micros(e.ts), e.event_id))
      val (b1, rest) = sorted.splitAt(sorted.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        assert(b.nonEmpty); mem.addData(b); q.processAllAvailable()
      }
      // update-mode sink accumulates revisions; steps only ever go
      // -1 → fixed time, so the newest snapshot is the lexicographic max
      val got = spark.table("fun").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val want = graft.queries.StreamingQueries.funnelTimes(spark, sf0001)
        .collect().map { r =>
          def t(i: Int) = if (r.isNullAt(i)) -1L else r.getLong(i)
          r.getLong(0) -> ((t(1), t(2), t(3)))
        }.toMap
      assert(got === want)
      // and the q128 report is exactly the snapshot's step counts
      val rep = graft.queries.StreamingQueries
        .queries("q128_funnel")(spark, sf0001)
        .select($"step_id", $"n_users").as[(Long, Long)].collect().toMap
      assert(rep(1L) === got.values.count(_._1 >= 0).toLong)
      assert(rep(2L) === got.values.count(_._2 >= 0).toLong)
      assert(rep(3L) === got.values.count(_._3 >= 0).toLong)
    } finally q.stop()
  }

  test("streaming transition walk replay-matches the batch q131 matrix") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.transitionPairs(mem.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    try {
      val sorted = fixtureEvents.sortBy(e =>
        (EventStreams.micros(e.ts), e.event_id))
      val (b1, rest) = sorted.splitAt(sorted.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        assert(b.nonEmpty); mem.addData(b); q.processAllAvailable()
      }
      val pairs = spark.table("trans").collect()
        .map(r => (r.getString(1), r.getString(2)))
      // conservation: exactly one pair per consecutive same-user pair
      val nUsers = fixtureEvents.map(_.user_id).distinct.length
      assert(pairs.length === fixtureEvents.length - nUsers)
      // the pair counts ARE the batch matrix, cell for cell
      val got = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = graft.queries.StreamingQueries
        .queries("q131_event_transitions")(spark, sf0001)
        .select($"from_type", $"to_type", $"n_trans")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming retention credits replay-match the batch q129 matrix") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.retentionIncrements(mem.toDS())
      .writeStream.format("memory").queryName("ret").outputMode("append").start()
    try {
      val sorted = fixtureEvents.sortBy(e =>
        (EventStreams.micros(e.ts), e.event_id))
      val (b1, rest) = sorted.splitAt(sorted.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        assert(b.nonEmpty); mem.addData(b); q.processAllAvailable()
      }
      val creds = spark.table("ret").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // exactly one credit per (user, active day)
      assert(creds.length === fixtureEvents
        .map(e => (e.user_id, EventStreams.micros(e.ts) / 86400000000L))
        .distinct.length)
      assert(creds.distinct.length === creds.length)
      // the credit counts ARE the batch matrix, cell for cell, and the
      // offset-0 row carries each cohort's size
      val got = creds.groupBy(c => (c._2, c._3)).view.mapValues(_.size.toLong).toMap
      val want = graft.queries.StreamingQueries
        .queries("q129_retention")(spark, sf0001)
        .select($"cohort_day", $"day_offset", $"n_active", $"cohort_size")
        .as[(Long, Long, Long, Long)].collect()
      assert(want.map(r => (r._1, r._2) -> r._3).toMap === got)
      want.filter(_._2 == 0L).foreach { r => assert(r._3 === r._4) }
    } finally q.stop()
  }

  test("streaming semantic screen replay-matches the declared q162 verdicts") {
    implicit val sq = spark.sqlContext
    import graft.queries.AnnQueries
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val bench = e.filter($"vec_id" < AnnQueries.SemDecontamBenchN)
      .select($"embedding").as[Seq[Float]].collect().toSeq
    val corpus = e.filter($"vec_id" >= AnnQueries.SemDecontamBenchN)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = EventStreams.semanticScreen(
      mem.toDF().toDF("vec_id", "embedding"), bench, AnnQueries.SemDecontamTau)
    val q = stream
      .writeStream.format("memory").queryName("semscreen").outputMode("append").start()
    try {
      mem.addData(corpus.take(corpus.size / 2))
      q.processAllAvailable()
      mem.addData(corpus.drop(corpus.size / 2))
      q.processAllAvailable()
      val got = spark.table("semscreen")
        .select($"vec_id", $"max_eval_sim", $"contaminated")
        .as[(Long, Double, Int)].collect().toSeq.sortBy(_._1)
      val want = SparkEntry.queries("q162_semantic_decontam")(spark, sf0001)
        .select($"vec_id", $"max_eval_sim", $"contaminated")
        .as[(Long, Double, Int)].collect().toSeq.sortBy(_._1)
      assert(got === want, "streamed verdicts diverge from the batch q162")
      assert(want.exists(_._3 == 1) && want.exists(_._3 == 0),
        "fixture should exercise both verdicts")
    } finally q.stop()
  }

  test("stream-static phash probe replay-matches the declared q158 old-partner counts") {
    implicit val sq = spark.sqlContext
    import graft.queries.MultimodalQueries
    val dir = MultimodalQueries.phashIndexDir(spark, sf0001)
    val newIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashProbeNewMod)) >=
        MultimodalQueries.PhashProbeNewMin)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    val mem = MemoryStream[Long]
    val stream = EventStreams.phashProbeVsIndex(spark, dir,
      mem.toDF().toDF("doc_id"), MultimodalQueries.PhashMaxHamming)
    val q = stream
      .writeStream.format("memory").queryName("phashidx").outputMode("append").start()
    try {
      // two micro-batches: per-batch probes must compose statelessly
      mem.addData(newIds.take(newIds.size / 2))
      q.processAllAvailable()
      mem.addData(newIds.drop(newIds.size / 2))
      q.processAllAvailable()
      val gotRows = spark.table("phashidx")
        .select($"doc_id", $"partner", $"hamming")
        .as[(Long, Long, Long)].collect().toSeq
      // stateless exactly-once: no pair may arrive twice across batches
      assert(gotRows.size === gotRows.distinct.size)
      // the law ties the twin to the DECLARED query: per-doc pair
      // counts from the stream == q158's n_dup_old column (the stream
      // probes the persisted index only, i.e. old-corpus partners)
      val gotCounts = gotRows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val want = SparkEntry.queries("q158_phash_index_probe")(spark, sf0001)
        .select($"doc_id", $"n_dup_old")
        .as[(Long, Long)].collect().toMap
      assert(newIds.forall(id => gotCounts.getOrElse(id, 0L) === want(id)),
        "streamed old-partner counts diverge from the batch q158")
      assert(gotRows.nonEmpty, "fixture should plant cross-batch image near-dups")
    } finally q.stop()
  }

  test("streaming media graduation builds exactly the one-shot store, manifest-published") {
    implicit val sq = spark.sqlContext
    import graft.queries.MultimodalQueries
    import graft.multimodal.Multimodal
    // the graduating batch of q169's carve: EVEN new doc_ids
    val b1 = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashProbeNewMod)) >=
        MultimodalQueries.PhashProbeNewMin &&
        pmod($"doc_id", lit(MultimodalQueries.PhashLsmBatchMod)) === 0)
      .select($"doc_id")
    val ids = b1.as[Long].collect().sorted
    assert(ids.length >= 3, "fixture batch must carve into micro-batches")
    val storeDir =
      java.nio.file.Files.createTempDirectory("graft_media_lsm_stream").toString
    val mem = MemoryStream[Long]
    // three micro-batches, compactEvery = 2: batches 0+1 fold into
    // generation 0, batch 2 stays in the live tail
    val q = EventStreams.mediaIngestGraduate(
      mem.toDF().toDF("doc_id"), storeDir, compactEvery = 2)()
    try {
      val third = (ids.length + 2) / 3
      ids.grouped(third).foreach { g => mem.addData(g.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.SegmentStore.latestManifest(fs, storeDir).isDefined,
      "the fold must have published a manifest")
    // replay==batch for the WRITE path: the streamed store holds
    // exactly the rows a one-shot graduation of the same docs writes —
    // content is a function of the docs ingested, not the batch carve
    val streamed = graft.sources.SegmentStore.read(spark, storeDir)
      .select($"doc_id", $"j", $"v", $"m", $"band0", $"band1", $"band2", $"band3", $"qt0", $"qt1", $"qt2", $"qt3")
      .collect().map(_.toSeq).toSet
    val oneShot = MultimodalQueries.explodeBandKeys(
        Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(b1))
          .select($"doc_id", $"band0", $"band1", $"band2", $"band3", $"qt0", $"qt1", $"qt2", $"qt3"))
      .select($"doc_id", $"j", $"v", $"m", $"band0", $"band1", $"band2", $"band3", $"qt0", $"qt1", $"qt2", $"qt3")
      .collect().map(_.toSeq).toSet
    assert(streamed === oneShot,
      "streamed graduation diverges from the one-shot store content")
  }

  test("streaming audio/video graduation twins build exactly their one-shot stores") {
    implicit val sq = spark.sqlContext
    import graft.queries.MultimodalQueries
    import graft.multimodal.Multimodal
    val b1 = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashProbeNewMod)) >=
        MultimodalQueries.PhashProbeNewMin &&
        pmod($"doc_id", lit(MultimodalQueries.PhashLsmBatchMod)) === 0)
      .select($"doc_id")
    val ids = b1.as[Long].collect().sorted
    def rows(df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val bandCols = Seq("doc_id", "j", "v", "m", "band0", "band1", "band2",
      "band3", "qt0", "qt1", "qt2", "qt3")
    // AUDIO: two micro-batches through the shared single-table shape
    val afpDir =
      java.nio.file.Files.createTempDirectory("graft_afp_lsm_stream").toString
    val memA = MemoryStream[Long]
    val qa = EventStreams.afpIngestGraduate(
      memA.toDF().toDF("doc_id"), afpDir, compactEvery = 2)()
    try {
      ids.grouped((ids.length + 1) / 2).foreach { g =>
        memA.addData(g.toSeq); qa.processAllAvailable()
      }
    } finally qa.stop()
    val afpOneShot = MultimodalQueries.explodeBandKeys(
      Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(b1))
        .select($"doc_id", $"band0", $"band1", $"band2", $"band3", $"qt0", $"qt1", $"qt2", $"qt3"))
    assert(rows(graft.sources.SegmentStore.read(spark, afpDir), bandCols) ===
      rows(afpOneShot, bandCols),
      "streamed afp graduation diverges from the one-shot store")
    // VIDEO: one decode per batch must fill BOTH stores
    val vDir =
      java.nio.file.Files.createTempDirectory("graft_vph_lsm_stream").toString
    val memV = MemoryStream[Long]
    val qv = EventStreams.vphashIngestGraduate(
      memV.toDF().toDF("doc_id"), vDir, compactEvery = 2)()
    try {
      ids.grouped((ids.length + 1) / 2).foreach { g =>
        memV.addData(g.toSeq); qv.processAllAvailable()
      }
    } finally qv.stop()
    val fh = Multimodal
      .videoFrameDHashBands(Multimodal.ingestSynthVariantVideo(b1))
      .select($"doc_id", $"frame_idx", $"n_frames",
        $"band0", $"band1", $"band2", $"band3",
        $"qt0", $"qt1", $"qt2", $"qt3")
    val frameCols = Seq("doc_id", "frame_idx", "n_frames",
      "band0", "band1", "band2", "band3", "qt0", "qt1", "qt2", "qt3")
    assert(rows(graft.sources.SegmentStore.read(spark, s"$vDir/frames"), frameCols) ===
      rows(fh, frameCols),
      "streamed video frames store diverges from the one-shot decode")
    val f0OneShot = MultimodalQueries.explodeVideoAnchorKeys(
      fh.filter($"frame_idx" === 0))
    val f0Cols = Seq("doc_id", "j", "v", "k0", "k1", "k2", "k3", "n_frames")
    assert(rows(graft.sources.SegmentStore.read(spark, s"$vDir/f0bands"), f0Cols) ===
      rows(f0OneShot, f0Cols),
      "streamed video anchor-key store diverges from the one-shot build")
  }

  test("stream-static afp probe replay-matches the declared q167 old-partner counts") {
    implicit val sq = spark.sqlContext
    import graft.queries.MultimodalQueries
    val dir = MultimodalQueries.afpIndexDir(spark, sf0001)
    val newIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashProbeNewMod)) >=
        MultimodalQueries.PhashProbeNewMin)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    val mem = MemoryStream[Long]
    val stream = EventStreams.afpProbeVsIndex(spark, dir,
      mem.toDF().toDF("doc_id"), MultimodalQueries.AfpMaxHamming)
    val q = stream
      .writeStream.format("memory").queryName("afpidx").outputMode("append").start()
    try {
      mem.addData(newIds.take(newIds.size / 2))
      q.processAllAvailable()
      mem.addData(newIds.drop(newIds.size / 2))
      q.processAllAvailable()
      val gotRows = spark.table("afpidx")
        .select($"doc_id", $"partner", $"hamming")
        .as[(Long, Long, Long)].collect().toSeq
      assert(gotRows.size === gotRows.distinct.size)
      val gotCounts = gotRows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val want = SparkEntry.queries("q167_afp_index_probe")(spark, sf0001)
        .select($"doc_id", $"n_dup_old")
        .as[(Long, Long)].collect().toMap
      assert(newIds.forall(id => gotCounts.getOrElse(id, 0L) === want(id)),
        "streamed old-partner counts diverge from the batch q167")
      assert(gotRows.nonEmpty, "fixture should plant cross-batch audio near-dups")
    } finally q.stop()
  }

  test("stream-static vphash probe replay-matches the declared q168 old-partner counts") {
    implicit val sq = spark.sqlContext
    import graft.queries.MultimodalQueries
    val dir = MultimodalQueries.vphashIndexDir(spark, sf0001)
    val newIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashProbeNewMod)) >=
        MultimodalQueries.PhashProbeNewMin)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    val mem = MemoryStream[Long]
    val stream = EventStreams.vphashProbeVsIndex(spark, dir,
      mem.toDF().toDF("doc_id"), MultimodalQueries.VphashMaxHamming)
    val q = stream
      .writeStream.format("memory").queryName("vphidx").outputMode("append").start()
    try {
      mem.addData(newIds.take(newIds.size / 2))
      q.processAllAvailable()
      mem.addData(newIds.drop(newIds.size / 2))
      q.processAllAvailable()
      val gotRows = spark.table("vphidx")
        .select($"doc_id", $"partner", $"hamming")
        .as[(Long, Long, Long)].collect().toSeq
      assert(gotRows.size === gotRows.distinct.size)
      val gotCounts = gotRows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val want = SparkEntry.queries("q168_vphash_index_probe")(spark, sf0001)
        .select($"doc_id", $"n_dup_old")
        .as[(Long, Long)].collect().toMap
      assert(newIds.forall(id => gotCounts.getOrElse(id, 0L) === want(id)),
        "streamed old-partner counts diverge from the batch q168")
      assert(gotRows.nonEmpty, "fixture should plant cross-batch video near-dups")
    } finally q.stop()
  }

  test("stream-static incremental dedup replay-matches the batch incremental pairs") {
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = docs.filter(pmod($"doc_id", lit(10L)) =!= 7)
      .select($"doc_id", $"text")
    val newDocs = docs.filter(pmod($"doc_id", lit(10L)) === 7)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.incrementalDedup(
        mem.toDF().toDF("doc_id", "text"), corpus,
        graft.queries.DedupQueries.JaccardThreshold)
      .writeStream.format("memory").queryName("incdedup").outputMode("append").start()
    try {
      mem.addData(newDocs)
      q.processAllAvailable()
      val got = spark.table("incdedup")
        .select($"doc_id", $"partner", $"jac")
        .as[(Long, Long, Double)].collect().toSet
      val sh = docs.repartition(4)
        .select($"doc_id",
          graft.expressions.HashExpressions.shingleHashSet($"text", 3).as("hs"))
        .withColumn("is_new", pmod($"doc_id", lit(10L)) === 7)
      val want = graft.operators.Dedup.incrementalPairs(
          sh, "doc_id", "hs", "is_new", graft.queries.DedupQueries.JaccardThreshold)
        .filter(!$"partner_is_new")
        .select($"doc_id", $"partner", $"jac")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty, "fixture should plant at least one cross-batch near-dup")
    } finally q.stop()
  }

  test("streaming dedup against the persisted band index matches the batch probe") {
    implicit val sq = spark.sqlContext
    // ONE artifact (saveCorpusIndex — the q73 layout) consumed by both
    // the batch probe and the stream: stream-vs-artifact must equal
    // batch-vs-artifact, and the streaming query must stay stateless
    // (the canonical-band join emits each pair exactly once)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val sh = docs.repartition(4)
      .select($"doc_id",
        graft.expressions.HashExpressions.shingleHashSet($"text", 3).as("hs"))
    val isNew = pmod($"doc_id", lit(10L)) === 7
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    graft.operators.Dedup.saveCorpusIndex(sh.filter(!isNew), "doc_id", "hs", dir)
    val newDocs = docs.filter(isNew)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val stream = EventStreams.incrementalDedupVsIndex(spark, dir,
      mem.toDF().toDF("doc_id", "text"),
      graft.queries.DedupQueries.JaccardThreshold)
    val q = stream
      .writeStream.format("memory").queryName("incidx").outputMode("append").start()
    try {
      // feed in two micro-batches: per-batch probes must compose
      mem.addData(newDocs.take(newDocs.size / 2))
      q.processAllAvailable()
      mem.addData(newDocs.drop(newDocs.size / 2))
      q.processAllAvailable()
      val gotRows = spark.table("incidx")
        .select($"doc_id", $"partner", $"jac")
        .as[(Long, Long, Double)].collect().toSeq
      // stateless exactly-once: no pair may arrive twice across batches
      assert(gotRows.size === gotRows.distinct.size)
      val want = graft.operators.Dedup.incrementalPairsVsIndex(spark, dir,
          sh.filter(isNew).select($"doc_id", $"hs"), "doc_id", "hs",
          graft.queries.DedupQueries.JaccardThreshold)
        .filter(!$"partner_is_new") // the stream probes the corpus only
        .select($"doc_id", $"partner", $"jac")
        .as[(Long, Long, Double)].collect().toSet
      assert(gotRows.toSet === want)
      assert(want.nonEmpty, "fixture should plant at least one cross-batch near-dup")
    } finally q.stop()
  }

  test("pii scrub is ingest-safe: streaming redaction equals the batch scrub") {
    implicit val sq = spark.sqlContext
    // the scrub family is row-local, so it must compose with a stream
    // unchanged — the ingest-time hygiene pass of the daily pipeline
    import graft.operators.Scrub
    val docs = Seq(
      (1L, "write u1@ex-mail.org or call +1-555-0001"),
      (2L, "host 10.0.2.14 plain row"),
      (3L, "no pii at all"))
    val mem = MemoryStream[(Long, String)]
    val (ne, np, ni) = Scrub.piiCounts(col("text"))
    def scrubbed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), Scrub.redact(col("text")).as("clean"),
        ne.as("n_email"), np.as("n_phone"), ni.as("n_ip"))
    val q = scrubbed(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("piistream").outputMode("append").start()
    try {
      mem.addData(docs.take(2)); q.processAllAvailable()
      mem.addData(docs.drop(2)); q.processAllAvailable()
      val got = spark.table("piistream")
        .as[(Long, String, Long, Long, Long)].collect().toSet
      val want = scrubbed(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long, Long)].collect().toSet
      assert(got === want)
      assert(want.exists(_._3 > 0) && want.exists(_._5 > 0)) // non-degenerate
    } finally q.stop()
  }

  test("streaming probe of a stale band index fails fast with the rebuild message") {
    implicit val sq = spark.sqlContext
    // same actionable-error contract as the batch probe (DedupSpec):
    // an artifact written by the pre-`sig` release must not surface as
    // an opaque missing-column error from inside the stream plan
    val sh = graft.queries.DedupQueries.hashedShingles(spark, sf0001)
      .select($"doc_id", $"hs").limit(10)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_stale").toString
    graft.operators.Dedup.saveCorpusIndex(sh, "doc_id", "hs", dir)
    spark.read.parquet(s"$dir/bands").drop("sig")
      .write.parquet(s"$dir/bands_stale")
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(s"$dir/bands"))
    assert(new java.io.File(s"$dir/bands_stale")
      .renameTo(new java.io.File(s"$dir/bands")))
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      EventStreams.incrementalDedupVsIndex(spark, dir,
        mem.toDF().toDF("doc_id", "text"), 0.5)
    }
    assert(e.getMessage.contains("sig") &&
      e.getMessage.contains("saveCorpusIndex"), e.getMessage)
  }

  test("streaming bloom screen replay-matches the batch probe, flags conservatively") {
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    // benchmark = docs 0..49; the stream = the rest arriving as ingest
    val bench = docs.filter($"doc_id" < 50)
      .select(explode(graft.expressions.HashExpressions
        .shingleHashSet($"text", 3)).as("h"))
      .distinct()
    val bf = bench.stat.bloomFilter("h", math.max(bench.count(), 1000L), 0.01)
    val bloom = spark.sparkContext.broadcast(bf)
    val arriving = docs.filter($"doc_id" >= 50)
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.bloomScreen(
        mem.toDF().toDF("doc_id", "text"), bloom, threshold = 0.5)
      .writeStream.format("memory").queryName("bscreen").outputMode("append").start()
    try {
      mem.addData(arriving)
      q.processAllAvailable()
      val got = spark.table("bscreen")
        .select($"doc_id", $"n_hit", $"flagged")
        .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      // batch twin: same probe expressed as a static plan
      val want = EventStreams.bloomScreen(
          docs.filter($"doc_id" >= 50), bloom, threshold = 0.5)
        .select($"doc_id", $"n_hit", $"flagged")
        .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === want)
      // conservative: every doc with a truly-overlapping shingle is flagged
      // at threshold 0 (bloom cannot miss), here spot-checked via n_hit >=
      // the EXACT hit count computed by a join
      val exact = docs.filter($"doc_id" >= 50)
        .select($"doc_id", explode(graft.expressions.HashExpressions
          .shingleHashSet($"text", 3)).as("h"))
        .join(bench, "h")
        .groupBy($"doc_id").agg(count(lit(1)).as("true_hits"))
        .as[(Long, Long)].collect().toMap
      exact.foreach { case (id, trueHits) =>
        assert(got(id)._1 >= trueHits,
          s"doc $id: bloom hits ${got(id)._1} < true hits $trueHits")
      }
      assert(exact.nonEmpty, "fixture should plant shingle overlap")
    } finally q.stop()
  }

  test("file-source streaming read processes a parquet drop-directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    graft.sources.Sources
      .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
      .write.mode("overwrite").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    assert(stream.isStreaming)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("fs").outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("fs").agg(sum($"n")).head().getLong(0) === 1000L)
    } finally q.stop()
  }

  test("streaming dropDuplicates removes within-watermark duplicate event_ids") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.dedupedEvents(mem.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      val evs = fixtureEvents.take(100)
      mem.addData(evs ++ evs) // every event twice
      q.processAllAvailable()
      assert(spark.table("dd").count() === 100)
    } finally q.stop()
  }

  test("stream-stream interval join replay-matches the batch range join") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.purchaseAttribution(mem.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      mem.addData(fixtureEvents)
      q.processAllAvailable()
      // push watermark far enough that every in-window pair is emitted
      val maxUs = fixtureEvents.map(e => EventStreams.micros(e.ts)).max
      val flushTs = new Timestamp((maxUs + 365L * 24 * 3600 * 1000000L) / 1000L)
      mem.addData(Seq(Ev(-1L, -1L, flushTs, "flush", 0.0)))
      q.processAllAvailable()
      val got = spark.table("attr")
        .filter($"event_id" >= 0)
        .select($"event_id", $"win_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val ev = graft.sources.Sources
        .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
      val win = 30L * 60 * 1000000L
      val want = ev.filter($"event_type" =!= "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts").as("t"))
        .join(ev.filter($"event_type" === "purchase")
            .select($"event_id".as("win_id"), $"user_id".as("wu"),
              unix_micros($"ts").as("wt")),
          $"user_id" === $"wu" && $"t" >= $"wt" && $"t" < $"wt" + lit(win))
        .select($"event_id", $"win_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(want.nonEmpty && got === want)
    } finally q.stop()
  }

  test("streaming sessionization replay-matches the batch twin per user") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val sessions = EventStreams.sessionize(mem.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(fixtureEvents)
      q.processAllAvailable()
      // far-future flush event per user pushes the watermark past every
      // timeout so all open sessions close
      val maxUs = fixtureEvents.map(e => EventStreams.micros(e.ts)).max
      val flushTs = new Timestamp((maxUs + 365L * 24 * 3600 * 1000000L) / 1000L)
      val users = fixtureEvents.map(_.user_id).distinct
      mem.addData(users.map(u => Ev(-1L, u, flushTs, "flush", 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(Ev(-2L, -1L, new Timestamp(flushTs.getTime + 3600L * 1000L), "flush2", 0.0)))
      q.processAllAvailable()

      val got = spark.table("sess").as[Session].collect()
        .filter(_.n_events > 0).filterNot(_.start_us > maxUs) // drop flush sessions
        .groupBy(_.user_id)
        .map { case (u, ss) => (u, ss.length.toLong, ss.map(_.n_events).sum,
          ss.map(_.n_events).max, ss.map(s => s.end_us - s.start_us).max) }
        .toSeq.sortBy(_._1)

      val want = graft.queries.StreamingQueries.queries("q23_sessions")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sortBy(_._1)

      assert(got === want)
    } finally q.stop()
  }

  test("media ops stream: put/del/re-put with latest-op-wins and physical drops") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_media_ops_stream").toString
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.mediaOpsGraduate(
      mem.toDF().toDF("doc_id", "op"), dir, compactEvery = 1)()
    def store() = graft.sources.SegmentStore.read(spark, dir)
    try {
      mem.addData(Seq((3L, "put"), (4L, "put"), (5L, "put")))
      q.processAllAvailable()
      mem.addData(Seq((4L, "del")))
      q.processAllAvailable()
      // the del batch's fold physically dropped 4's data rows; the
      // marker survives to shadow any static artifact
      assert(store().filter($"doc_id" === 4L && !$"_del").count() === 0L)
      assert(store().filter($"doc_id" === 4L && $"_del").count() > 0L)
      // re-put: latest-op-wins serves again, and THIS fold drops the
      // now-outranked marker — the store converges back to data-only
      mem.addData(Seq((4L, "put")))
      q.processAllAvailable()
      assert(store().filter($"doc_id" === 4L && !$"_del").count() === 4L)
      assert(store().filter($"doc_id" === 4L && $"_del").count() === 0L)
      // same-batch del+put of one doc: put wins by contract
      mem.addData(Seq((5L, "del"), (5L, "put")))
      q.processAllAvailable()
      assert(store().filter($"doc_id" === 5L && !$"_del").count() === 4L)
      assert(store().filter($"doc_id" === 5L && $"_del").count() === 0L)
    } finally q.stop()
    // unknown (or null) op fails the batch loudly, never silent row loss
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_media_ops_bad").toString
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.mediaOpsGraduate(
      mem2.toDF().toDF("doc_id", "op"), dir2, compactEvery = 1)()
    try {
      mem2.addData(Seq((9L, "nope")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q2.processAllAvailable())
      assert(e.toString.contains("unknown op") ||
        Option(e.getCause).exists(_.toString.contains("unknown op")))
    } finally q2.stop()
  }

  test("audio/video ops streams: del drops physically in every table, re-put serves again") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    // AUDIO: the shared single-table recipe
    val aDir = java.nio.file.Files
      .createTempDirectory("graft_afp_ops_stream").toString
    val memA = MemoryStream[(Long, String)]
    val qa = EventStreams.afpOpsGraduate(
      memA.toDF().toDF("doc_id", "op"), aDir, compactEvery = 1)()
    try {
      memA.addData(Seq((3L, "put"), (4L, "put")))
      qa.processAllAvailable()
      memA.addData(Seq((4L, "del")))
      qa.processAllAvailable()
      val s1 = graft.sources.SegmentStore.read(spark, aDir)
      assert(s1.filter($"doc_id" === 4L && !$"_del").count() === 0L)
      assert(s1.filter($"doc_id" === 4L && $"_del").count() > 0L)
      memA.addData(Seq((4L, "put")))
      qa.processAllAvailable()
      val s2 = graft.sources.SegmentStore.read(spark, aDir)
      assert(s2.filter($"doc_id" === 4L && !$"_del").count() === 4L)
      assert(s2.filter($"doc_id" === 4L && $"_del").count() === 0L)
    } finally qa.stop()
    // VIDEO: the two-table face — the marker batch must shadow BOTH
    val vDir = java.nio.file.Files
      .createTempDirectory("graft_vph_ops_stream").toString
    val memV = MemoryStream[(Long, String)]
    val qv = EventStreams.vphashOpsGraduate(
      memV.toDF().toDF("doc_id", "op"), vDir, compactEvery = 1)()
    def tbl(t: String) = graft.sources.SegmentStore.read(spark, s"$vDir/$t")
    try {
      memV.addData(Seq((3L, "put"), (4L, "put")))
      qv.processAllAvailable()
      memV.addData(Seq((4L, "del")))
      qv.processAllAvailable()
      for (t <- Seq("frames", "f0bands")) {
        assert(tbl(t).filter($"doc_id" === 4L && !$"_del").count() === 0L,
          s"$t kept taken-down data rows")
        assert(tbl(t).filter($"doc_id" === 4L && $"_del").count() > 0L,
          s"$t lost its markers")
      }
      memV.addData(Seq((4L, "put")))
      qv.processAllAvailable()
      for (t <- Seq("frames", "f0bands")) {
        assert(tbl(t).filter($"doc_id" === 4L && !$"_del").count() > 0L,
          s"$t does not serve the re-put")
      }
      // anchor markers are fully outranked (all four band rows re-put)
      assert(tbl("f0bands").filter($"doc_id" === 4L && $"_del").count() === 0L,
        "f0bands kept outranked markers past the fold")
      // frame markers past the clip's REAL frame count have no newer
      // data row to outrank them — they survive by design and shadow
      // nothing; markers inside the clip's range must be gone
      val nf = tbl("frames").filter($"doc_id" === 4L && !$"_del")
        .select($"n_frames").head().getLong(0)
      assert(tbl("frames")
        .filter($"doc_id" === 4L && $"_del" && $"frame_idx" < nf)
        .count() === 0L,
        "frames kept a marker that shadows a served frame")
    } finally qv.stop()
  }

  test("mediaOpsMaintain: takedowns past the trigger actuate the rebuild mid-stream, probes stay green across the swap") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.MultimodalQueries
    import graft.multimodal.Multimodal
    import graft.search.AnnIndex.ServingRoot
    val root = java.nio.file.Files
      .createTempDirectory("graft_media_maint_stream").toString + "/r"
    MultimodalQueries.mediaRootInit(spark,
      s"${MultimodalQueries.phashIndexDir(spark, sf0001)}/bands", root,
      MultimodalQueries.ImageBandFamily)
    def bands(ids: Seq[Long]) =
      Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(
          ids.toDF("doc_id")))
        .select($"doc_id", $"band0", $"band1", $"band2", $"band3",
          $"qt0", $"qt1", $"qt2", $"qt3")
    // 900000–900002 are one planted variant family (VariantGroupSize=3,
    // far outside the fixture id range); 900010 is family-less here
    val probeB2 = bands(Seq(900002L))
    def probe() = MultimodalQueries.graduatedBandProbeRoot(spark, root,
      probeB2, MultimodalQueries.PhashMaxHamming,
      MultimodalQueries.ImageBandFamily)
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.mediaOpsMaintain(
      mem.toDF().toDF("doc_id", "op"), root, compactEvery = 1,
      maxMarkerRows = 0L)()
    try {
      // batch 0: puts only — zero markers, the trigger must NOT fire
      mem.addData(Seq((900000L, "put"), (900001L, "put"), (900010L, "put")))
      q.processAllAvailable()
      assert(ServingRoot.resolve(spark, root)._1.endsWith("epoch_0"))
      val p1 = probe().as[(Long, Long, Long, Long)].collect().toSeq
      assert(p1 === Seq((900002L, 0L, 2L, 0L)),
        s"pre-rebuild: both family members must serve from the store, got $p1")
      // batch 1: a takedown past the trigger — the rebuild actuates
      // INSIDE the stream (the round-16 gap: nothing called the
      // actuator): the generation publishes, the store comes back empty
      mem.addData(Seq((900001L, "del")))
      q.processAllAvailable()
      val (idx1, store1) = ServingRoot.resolve(spark, root)
      assert(idx1.endsWith("epoch_1"),
        "the marker-mass trigger must publish the next generation")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      assert(graft.sources.SegmentStore.segments(fs, store1).isEmpty,
        "the fresh generation starts with an empty store (marker cap 0)")
      val static1 = spark.read.parquet(s"$idx1/bands")
      assert(static1.filter($"doc_id" === 900001L).count() === 0L,
        "the taken-down doc must be physically absent from the rebuilt static")
      assert(static1.filter($"doc_id" === 900000L).count() > 0L &&
        static1.filter($"doc_id" === 900010L).count() > 0L,
        "surviving graduated docs must be static now")
      // the probe stays green across the swap: the survivor answers
      // (from the static — store-less probe), the victim does not
      val p2 = probe().as[(Long, Long, Long)].collect().toSeq
      assert(p2 === Seq((900002L, 1L, 0L)),
        s"post-rebuild: exactly the surviving family member answers, got $p2")
      // batch 2: a re-put lands in the NEW generation's store (the
      // pointer is resolved per batch) and serves again; no markers,
      // no rebuild
      mem.addData(Seq((900001L, "put")))
      q.processAllAvailable()
      assert(ServingRoot.resolve(spark, root)._1.endsWith("epoch_1"))
      val p3 = probe().as[(Long, Long, Long, Long)].collect().toSeq
      assert(p3 === Seq((900002L, 1L, 1L, 0L)),
        s"the re-put must serve from the fresh store, got $p3")
    } finally q.stop()
  }

  test("vphashOpsMaintain: the two-table rebuild actuates mid-stream under one pointer") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.MultimodalQueries
    import graft.search.AnnIndex.ServingRoot
    val root = java.nio.file.Files
      .createTempDirectory("graft_vph_maint_stream").toString + "/r"
    MultimodalQueries.vphashRootInit(spark,
      MultimodalQueries.vphashIndexDir(spark, sf0001), root)
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.vphashOpsMaintain(
      mem.toDF().toDF("doc_id", "op"), root, compactEvery = 1,
      maxMarkerRows = 0L)()
    try {
      mem.addData(Seq((900000L, "put"), (900001L, "put")))
      q.processAllAvailable()
      assert(ServingRoot.resolve(spark, root)._1.endsWith("epoch_0"))
      mem.addData(Seq((900001L, "del")))
      q.processAllAvailable()
      val (idx1, delta1) = ServingRoot.resolve(spark, root)
      assert(idx1.endsWith("epoch_1"),
        "the anchor-mass trigger must publish the next generation")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      for (t <- Seq("f0bands", "frames")) {
        assert(graft.sources.SegmentStore.segments(fs, s"$delta1/$t").isEmpty,
          s"$t: the fresh generation's store must be empty")
        val st = spark.read.parquet(s"$idx1/$t")
        assert(st.filter($"doc_id" === 900001L).count() === 0L,
          s"$t kept the taken-down doc")
        assert(st.filter($"doc_id" === 900000L).count() > 0L,
          s"$t lost the surviving graduated doc")
      }
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` stream (extension surface —
  * the reference is strictly request/response, reference server.py:71-102;
  * SURVEY.md §2.2 streaming row): watermarked windowed aggregation,
  * within-watermark dedup, and stateful sessionization.
  *
  * Every operator here is the *streaming twin* of a batch query in
  * SparkEntry (q9 hourly counts, q23 sessions), so correctness is
  * checkable: replay a finite fixture through the stream and the result
  * must match the batch plan on the same data. That replay-equivalence
  * is exactly what Structured Streaming's incremental execution model
  * guarantees, and what the specs assert.
  *
  * Scale posture: all state is keyed (window/event_type or user_id) and
  * watermark-bounded, so state size is O(active keys), never O(stream);
  * shuffles are the same keyed exchanges the batch twins perform per
  * micro-batch.
  */
case class Ev(event_id: Long, user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** One closed user session: maximal run of events with no gap longer
  * than the session gap. */
case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Open-session state carried between micro-batches (epoch micros). */
case class SessState(startUs: Long, lastUs: Long, n: Long)

/** Latest-wins per-user changelog state ([[EventStreams.latestState]]):
  * the newest event on the total order (t, event_id). */
case class UserState(t: Long, eventId: Long, eventType: String, value: Double)

/** One user's current snapshot row as maintained by the streaming CDC
  * apply — `deleted` marks a tombstone (the batch twin q114's flag). */
case class UserSnap(user_id: Long, last_us: Long, last_event_id: Long,
                    last_type: String, last_value: Double, deleted: Boolean)

/** Per-user funnel progress carried between micro-batches — first
  * qualified step times in epoch micros, -1 = step not reached
  * (a case class of Options does not round-trip keyed state cleanly;
  * the sentinel is private to the state, the emitted snapshot maps it
  * back to NULL-like semantics via the batch twin's convention). */
case class FunnelState(t1: Long, t2: Long, t3: Long)

/** One user's current funnel snapshot (the streaming face of q128's
  * per-user funnelTimes row): -1 where the step is not reached. */
case class FunnelSnap(user_id: Long, t1: Long, t2: Long, t3: Long)

/** Last-event state for the streaming transition walk. */
case class TransState(t: Long, eventId: Long, eventType: String)

/** Per-user retention state: the user's cohort day (first active day —
  * stable under ordered replay) and the day offsets already credited.
  * `seen` is bounded by the observation window's day count, the same
  * time-range bound q129's directory argument rests on. */
case class RetState(cohortDay: Long, seen: Seq[Long])

/** One retention credit (the streaming face of one q129 cell
  * increment): emitted exactly once per (user, active day). */
case class RetInc(user_id: Long, cohort_day: Long, day_offset: Long)

/** One observed order-1 transition (the streaming face of one q131
  * pair): emitted exactly once per consecutive same-user event pair. */
case class Trans(user_id: Long, from_type: String, to_type: String, t_us: Long)

object EventStreams {

  type Ev = graft.streaming.Ev
  val Ev = graft.streaming.Ev
  type Session = graft.streaming.Session
  val Session = graft.streaming.Session

  def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** File-based streaming read of a parquet drop-directory: new files
    * appearing under `dir` become micro-batches. Schema is pinned from
    * the existing files (streaming sources require an explicit schema —
    * inference on a moving directory would race). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Tumbling 1-hour counts/sums per event_type with a 10-minute
    * watermark — the streaming twin of q9_hourly_events. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Exactly-once-per-event_id dedup within the watermark horizon —
    * streaming `dropDuplicates` keeps state only until the watermark
    * passes, bounding memory on an infinite stream. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  /** Stream-stream interval join — the streaming twin of q36's batch
    * range join: every non-purchase event matched to the same user's
    * purchase windows ([purchase ts, +`windowMinutes`)). Both sides
    * carry watermarks and the join condition bounds event time on both
    * ends, so Spark can expire join state: each purchase is held only
    * `windowMinutes` past the watermark, each point not at all —
    * state is O(in-flight windows), never O(stream). */
  def purchaseAttribution(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val pts = events.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withWatermark("ts", "10 minutes")
    val wins = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("win_id"), col("user_id").as("win_user"),
        col("ts").as("win_ts"))
      .withWatermark("win_ts", "10 minutes")
    pts.join(wins,
      col("user_id") === col("win_user") &&
        col("ts") >= col("win_ts") &&
        col("ts") < col("win_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("win_id"))
  }

  /** Stateful sessionization: sessions close after `gapMinutes` of
    * silence per user. Uses flatMapGroupsWithState with event-time
    * timeout — the canonical custom-state streaming operator
    * (SURVEY.md §2.2 streaming row). Batch twin: q23_sessions.
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessState]): Iterator[Session] = {
      val out = Seq.newBuilder[Session]
      if (state.hasTimedOut) {
        // silence exceeded the gap: close the open session
        state.getOption.foreach(s => out += Session(userId, s.startUs, s.lastUs, s.n))
        state.remove()
      } else {
        val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        var cur = state.getOption
        for (e <- sorted) {
          val t = micros(e.ts)
          cur match {
            case Some(s) if t - s.lastUs > gapUs =>
              out += Session(userId, s.startUs, s.lastUs, s.n)
              cur = Some(SessState(t, t, 1))
            case Some(s) =>
              cur = Some(SessState(s.startUs, math.max(s.lastUs, t), s.n + 1))
            case None =>
              cur = Some(SessState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close when event time passes last-seen + gap
          state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
        }
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming CDC apply — the streaming twin of q114_cdc_apply: the
    * event stream is a changelog keyed by user_id, and keyed state
    * holds each user's LATEST event on the total order (t, event_id);
    * every micro-batch emits the updated snapshot rows (Update mode —
    * exactly a MERGE INTO materialized continuously). Tombstones stay
    * IN state rather than deleting it: a late pre-tombstone event must
    * still lose to the tombstone, which requires remembering it — the
    * same reason real CDC compaction retains tombstones until a
    * retention horizon passes. State is O(users), the bound a 100 TB
    * keyed snapshot needs; replay equivalence vs the batch window plan
    * is what the spec asserts. */
  def latestState(events: Dataset[Ev],
                  tombstoneType: String = "error"): Dataset[UserSnap] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[UserState]): UserSnap = {
      val incoming = evs.map(e =>
        UserState(micros(e.ts), e.event_id, e.event_type, e.value))
      val best = (state.getOption.iterator ++ incoming)
        .maxBy(s => (s.t, s.eventId))
      state.update(best)
      UserSnap(userId, best.t, best.eventId, best.eventType, best.value,
        best.eventType == tombstoneType)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming funnel progress — the streaming twin of q128's
    * funnelTimes engine: keyed state holds each user's first QUALIFIED
    * step times (view, click-strictly-after-first-view,
    * purchase-strictly-after-first-qualified-click) and every
    * micro-batch emits the user's updated snapshot (Update mode); the
    * 3-row funnel report is then one directory-sized aggregation over
    * the snapshot at any instant — the report stays continuously
    * queryable instead of being recomputed per batch. Within a
    * micro-batch events are processed in (ts, event_id) order; across
    * batches the operator assumes watermark-ordered replay (the same
    * assumption [[sessionize]]/[[latestState]] replay under and the
    * spec replays with). State is O(users) × 3 longs — the keyed-state
    * bound a 100 TB stream needs. Replay equivalence vs the batch
    * engine is asserted per user in EventStreamsSpec. */
  def funnelState(events: Dataset[Ev]): Dataset[FunnelSnap] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[FunnelState]): FunnelSnap = {
      var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
      for (e <- evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
        val t = micros(e.ts)
        e.event_type match {
          case "view" if s.t1 < 0 => s = s.copy(t1 = t)
          case "click" if s.t2 < 0 && s.t1 >= 0 && s.t1 < t =>
            s = s.copy(t2 = t)
          case "purchase" if s.t3 < 0 && s.t2 >= 0 && s.t2 < t =>
            s = s.copy(t3 = t)
          case _ =>
        }
      }
      state.update(s)
      FunnelSnap(userId, s.t1, s.t2, s.t3)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming order-1 transition walk — the streaming twin of q131:
    * keyed state remembers each user's latest event on the total order
    * (t, event_id); each incoming event emits exactly one (from, to)
    * pair against the remembered predecessor and becomes the new
    * state, so a full replay emits precisely the per-user consecutive
    * pairs the batch lead() window produces (conservation law:
    * pairs = events − users, the same law q131's spec proves). The
    * transition MATRIX is a downstream directory-sized aggregation
    * (≤ types² cells) over the emitted pairs — streaming complete-mode
    * or batch, either reads the same append-only pair stream. State is
    * O(users) × one event. */
  def transitionPairs(events: Dataset[Ev]): Dataset[Trans] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[TransState]): Iterator[Trans] = {
      val out = Seq.newBuilder[Trans]
      var cur = state.getOption
      for (e <- evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
        val t = micros(e.ts)
        cur.foreach(p => out += Trans(userId, p.eventType, e.event_type, t))
        cur = Some(TransState(t, e.event_id, e.event_type))
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming retention credits — the streaming twin of q129's cohort
    * matrix: keyed state holds each user's cohort day (their first
    * active day — stable under the watermark-ordered replay the other
    * event-state operators assume) plus the day offsets already
    * credited, and each micro-batch emits ONE (user, cohort_day,
    * day_offset) credit per newly active day. The retention matrix is
    * then a downstream directory-sized count over the append-only
    * credit stream (≤ days²/2 cells — q129's bound), with cohort
    * sizes read off the offset-0 row. Day arithmetic is the identical
    * `epoch_us div 86400000000` truncation as the batch twin. State is
    * O(users × active days in the window) — bounded by the observation
    * window, not the stream. */
  def retentionIncrements(events: Dataset[Ev]): Dataset[RetInc] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[RetState]): Iterator[RetInc] = {
      val out = Seq.newBuilder[RetInc]
      var cur = state.getOption
      for (e <- evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
        val day = micros(e.ts) / 86400000000L
        cur match {
          case None =>
            cur = Some(RetState(day, Seq(day)))
            out += RetInc(userId, day, 0L)
          case Some(s) if !s.seen.contains(day) =>
            cur = Some(s.copy(seen = s.seen :+ day))
            out += RetInc(userId, s.cohortDay, day - s.cohortDay)
          case _ =>
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stream-static incremental dedup — the streaming twin of
    * [[graft.operators.Dedup.incrementalPairs]]'s daily-ingest shape:
    * a STREAM of new documents is checked against a STATIC corpus. Per
    * micro-batch, the new docs' MinHash band keys equi-join the corpus
    * band table (a stream-static inner join — stateless in Spark), and
    * the Jaccard verification sits INSIDE the join condition so
    * rejected candidates never materialize. The only stateful operator
    * is the pair-level dropDuplicates (a doc pair colliding in several
    * bands must emit once); on an unbounded stream its state should be
    * bounded by adding a watermark on an arrival-time column.
    *
    * The corpus band table is computed from `corpus` here; a production
    * caller persists it once (it is the full build's artifact) and the
    * per-batch cost is then O(new batch).
    *
    * @param newDocs streaming (doc_id, text)
    * @param corpus  static (doc_id, text)
    * @return streaming (doc_id, partner, jac) — verified near-dup pairs
    *         of each streamed doc against the static corpus. */
  /** Streaming contamination screen — the ingest-time face of q65's
    * bloom semi-join reduction: each arriving document's shingle hashes
    * are probed row-locally (codegen'd `BloomMightContainExpr` inside an
    * array HOF) against the STATIC benchmark sketch, the
    * decontamination job's persisted artifact. No shuffle, no state —
    * the flag is computed in the micro-batch that delivers the doc, so
    * contaminated data is quarantined before it ever reaches the corpus
    * store. The sketch over-approximates (false positives possible,
    * false negatives impossible), so `flagged` is conservative: a
    * flagged doc goes to the exact verifier (q65's join path), an
    * unflagged doc is provably clean.
    *
    * @param newDocs streaming (doc_id, text)
    * @param bloom   broadcast sketch of the benchmark shingle hashes
    * @return streaming (doc_id, n_sh, n_hit, overlap, flagged) */
  def bloomScreen(newDocs: DataFrame,
                  bloom: org.apache.spark.broadcast.Broadcast[
                    org.apache.spark.util.sketch.BloomFilter],
                  threshold: Double): DataFrame =
    newDocs
      .select(col("doc_id"),
        graft.expressions.HashExpressions.shingleHashSet(col("text"), 3).as("hs"))
      .withColumn("n_sh", size(col("hs")).cast("long"))
      .filter(col("n_sh") > 0)
      .withColumn("n_hit", size(filter(col("hs"),
        h => graft.expressions.BloomExpressions.mightContain(h, bloom))).cast("long"))
      .withColumn("overlap", round(col("n_hit").cast("double") / col("n_sh"), 6))
      .select(col("doc_id"), col("n_sh"), col("n_hit"), col("overlap"),
        (col("overlap") >= threshold).cast("int").as("flagged"))

  /** Stateless ingest-time SEMANTIC decontamination screen — q162's
    * verdicts per micro-batch, shaped for a stream: the fixed-size
    * benchmark inlines as an array LITERAL and the per-vector max
    * folds inside ONE projection — no join, no aggregation, no
    * shuffle, so the screen runs in append mode with zero state and
    * composes with any ingest topology. A vector's verdict depends
    * only on itself and the static benchmark, so replay must equal
    * the declared batch query — EventStreamsSpec asserts it.
    *
    * @param newVecs   streaming (vec_id, embedding)
    * @param benchmark the benchmark embeddings (small and fixed by
    *                  q162's contract — that is what makes the
    *                  literal inlining legitimate)
    * @return streaming (vec_id, max_eval_sim, contaminated) */
  def semanticScreen(newVecs: DataFrame, benchmark: Seq[Seq[Float]],
                     tau: Double): DataFrame = {
    require(benchmark.nonEmpty, "empty benchmark set")
    val scores = transform(typedLit(benchmark), b =>
      graft.functions.VectorFunctions.neo4jScore(col("embedding"), b))
    newVecs
      .select(col("vec_id"), round(array_max(scores), 6).as("max_eval_sim"))
      .withColumn("contaminated", (col("max_eval_sim") >= tau).cast("int"))
  }

  /** Stateless stream-static probe of newly-ingested IMAGES against
    * the persisted q158 phash band index — the multimodal face of
    * [[incrementalDedupVsIndex]]: each micro-batch decodes + dHashes
    * only its own images (row-local mapPartitions — decode composes
    * with a stream unchanged), explodes its band keys, equi-joins the
    * static index, claims each (new, indexed) pair once via the
    * first-agreeing-band rule, and emits pairs verified by exact
    * 64-bit Hamming. No state store, so replay must equal the batch
    * probe restricted to old-corpus partners — EventStreamsSpec
    * asserts exactly that. Same stream-static caveat as the text
    * twin: no dynamic partition pruning per micro-batch; batching
    * amortizes the index scan.
    *
    * @param newDocs  streaming (doc_id) of newly-arrived image docs
    * @param indexDir artifact directory written by
    *                 [[graft.queries.MultimodalQueries.phashIndexDir]]
    * @return streaming (doc_id, partner, hamming) verified pairs. */
  def phashProbeVsIndex(spark: SparkSession, indexDir: String,
                        newDocs: DataFrame, maxHamming: Long): DataFrame = {
    import graft.multimodal.Multimodal
    bandProbeStream(spark, indexDir,
      Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(newDocs)),
      maxHamming)
  }

  /** [[phashProbeVsIndex]]'s AUDIO twin: micro-batches of newly
    * ingested clips decode + delta-sign-fingerprint only themselves
    * and probe the persisted q167 band artifact
    * ([[graft.queries.MultimodalQueries.afpIndexDir]]). Stateless; no
    * state store, so replay must equal the batch probe restricted to
    * old-corpus partners — EventStreamsSpec asserts it against q167's
    * n_dup_old column. */
  def afpProbeVsIndex(spark: SparkSession, indexDir: String,
                      newDocs: DataFrame, maxHamming: Long): DataFrame = {
    import graft.multimodal.Multimodal
    bandProbeStream(spark, indexDir,
      Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(newDocs)),
      maxHamming)
  }

  /** The shared stream-static band probe of the image/audio twins:
    * streaming fingerprints (doc_id, band0..band3, qt0..qt3) explode
    * to COMPOSED (band_idx, band_val, quarter_mass) keys, equi-join
    * the static artifact's exploded keys, claim each (new, indexed)
    * pair once via the first band where bits AND mass agree, verify
    * by exact 64-bit Hamming. Append-mode, zero state. */
  private def bandProbeStream(spark: SparkSession, indexDir: String,
                              newBands: DataFrame, maxHamming: Long): DataFrame = {
    val idx = spark.read.parquet(s"$indexDir/bands")
    graft.operators.Dedup.requireIndexCols(idx, indexDir, "bands",
      Seq("doc_id", "j", "v", "m", "band0", "band1", "band2", "band3",
        "qt0", "qt1", "qt2", "qt3"))
    val pb = idx.select(col("doc_id").as("partner"), col("j"), col("v"), col("m"),
      col("band0").as("b0"), col("band1").as("b1"),
      col("band2").as("b2"), col("band3").as("b3"),
      col("qt0").as("bm0"), col("qt1").as("bm1"),
      col("qt2").as("bm2"), col("qt3").as("bm3"))
    val nx = graft.queries.MultimodalQueries.explodeBandKeys(
        newBands.select(Seq(col("doc_id")) ++
          (0 until 4).map(j => col(s"band$j")) ++
          (0 until 4).map(j => col(s"qt$j")): _*))
      .toDF("doc_id", "j", "v", "m",
        "a0", "a1", "a2", "a3", "am0", "am1", "am2", "am3")
    nx.join(pb, Seq("j", "v", "m"))
      .filter(col("doc_id") =!= col("partner") &&
        graft.queries.MultimodalQueries.noEarlierAgreeM)
      .withColumn("hamming", graft.queries.MultimodalQueries.bandHamming)
      .filter(col("hamming") <= lit(maxHamming))
      .select(col("doc_id"), col("partner"), col("hamming"))
  }

  /** Streaming GRADUATION of image-ingest batches into a
    * [[graft.sources.SegmentStore]] band index — [[phashProbeVsIndex]]'s
    * WRITE-path twin and the media face of
    * [[graft.search.SearchEngine.streamingIvfPqMaintain]], closing the
    * q158/q169 lifecycle: each micro-batch decodes + dHashes only
    * ITSELF (row-local mapPartitions), explodes its band keys, and
    * appends an immutable per-batch segment; every `compactEvery`
    * batches the live tail folds into a manifest-published compacted
    * generation. Probes against the growing index read static ∪
    * store (q169's shape). Replay==batch: per-batch overwrite + the
    * fold's (doc_id, j) dedup make the store's final content a pure
    * function of the docs ingested, not of the batch carve —
    * EventStreamsSpec asserts the streamed store holds exactly the
    * one-shot graduation's rows. */
  def mediaIngestGraduate(newDocs: DataFrame, storeDir: String,
                          compactEvery: Int,
                          checkpointDir: Option[String] = None)
                         (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    bandIngestGraduate(newDocs, storeDir, compactEvery, docs => {
      import graft.multimodal.Multimodal
      Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }, graft.queries.MultimodalQueries.ImageBandFamily,
      checkpointDir)(afterBatch)

  /** [[mediaIngestGraduate]]'s AUDIO face: micro-batches of newly
    * ingested clips decode + delta-sign-fingerprint only themselves
    * and graduate into the q170 store. */
  def afpIngestGraduate(newDocs: DataFrame, storeDir: String,
                        compactEvery: Int,
                        checkpointDir: Option[String] = None)
                       (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    bandIngestGraduate(newDocs, storeDir, compactEvery, docs => {
      import graft.multimodal.Multimodal
      Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }, graft.queries.MultimodalQueries.AudioBandFamily,
      checkpointDir)(afterBatch)

  /** The shared single-table graduation sink: fingerprint the batch
    * (row-local decode — O(batch) work), explode band keys, append as
    * an immutable per-batch segment, fold on the compaction cadence.
    * RESTART CONTRACT as [[graft.search.SearchEngine.streamingDocIngest]]:
    * the store's committed-segment idempotence keys on stable batch
    * ids — pass `checkpointDir` for any ingest that can outlive its
    * process. */
  private def bandIngestGraduate(newDocs: DataFrame, storeDir: String,
                                 compactEvery: Int,
                                 fingerprint: DataFrame => DataFrame,
                                 familyTag: String,
                                 checkpointDir: Option[String] = None)
                                (afterBatch: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointDir.foldLeft(newDocs.writeStream.outputMode("append"))(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // bit-family discipline: stamp at creation, verify on every
          // resume — a checkpoint restored across a family migration
          // fails HERE instead of silently mixing families in one store
          graft.sources.SegmentStore.ensureFormat(
            org.apache.hadoop.fs.FileSystem.get(
              s.sparkContext.hadoopConfiguration), storeDir, familyTag)
          graft.sources.SegmentStore.appendBatch(s, storeDir,
            graft.queries.MultimodalQueries.bandStoreRows(
              fingerprint(batch.toDF())), id,
            compactEvery, partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
        }
        afterBatch(id)
      }
      .start()

  /** OPS stream for a media band index — [[mediaIngestGraduate]]'s
    * lifecycle face and the media twin of
    * [[graft.search.SearchEngine.streamingDocApply]]: micro-batches of
    * (doc_id, op) where op ∈ {put, del}. Puts decode + fingerprint
    * only themselves and append as data rows; dels append takedown
    * markers ([[graft.queries.MultimodalQueries.bandTakedownMarkers]])
    * that physically drop the doc's rows at the next fold and shadow
    * any static artifact at probe time. Latest-op-wins across batches
    * rides the store's (doc_id, j) last-writer-wins rule; within ONE
    * batch a put wins a del tie by contract (the del is dropped before
    * the append — deterministic, no fold change). An unknown or null
    * op fails the batch loudly, mirroring streamingDocApply. */
  def mediaOpsGraduate(ops: DataFrame, storeDir: String,
                       compactEvery: Int,
                       checkpointDir: Option[String] = None)
                      (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    bandOpsGraduate(ops, storeDir, compactEvery, "mediaOpsGraduate", docs => {
      import graft.multimodal.Multimodal
      Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }, graft.queries.MultimodalQueries.ImageBandFamily,
      checkpointDir)(afterBatch)

  /** [[mediaOpsGraduate]]'s AUDIO face — the q180 store's ops stream. */
  def afpOpsGraduate(ops: DataFrame, storeDir: String,
                     compactEvery: Int,
                     checkpointDir: Option[String] = None)
                    (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    bandOpsGraduate(ops, storeDir, compactEvery, "afpOpsGraduate", docs => {
      import graft.multimodal.Multimodal
      Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }, graft.queries.MultimodalQueries.AudioBandFamily,
      checkpointDir)(afterBatch)

  /** Validate one ops micro-batch and split it latest-op-wins: an
    * unknown or null op fails the batch loudly; a same-batch del of a
    * doc also put in the batch is dropped (put wins the tie by
    * contract — deterministic, no fold change). */
  private def splitOps(df: DataFrame, who: String,
                       id: Long): (DataFrame, DataFrame) = {
    val bad = df.filter(col("op").isNull ||
      !col("op").isin("put", "del")).limit(1).collect()
    require(bad.isEmpty,
      s"$who batch $id: unknown op '${bad.headOption.map(_.getAs[Any]("op")).orNull}'")
    val puts = df.filter(col("op") === "put").select(col("doc_id"))
    (puts, df.filter(col("op") === "del").select(col("doc_id"))
      .join(puts, Seq("doc_id"), "left_anti"))
  }

  /** One ops micro-batch applied to a single-table band store — the
    * body [[bandOpsGraduate]] and [[bandOpsMaintain]] share. */
  private def bandOpsApply(storeDir: String, df: DataFrame, id: Long,
                           compactEvery: Int, who: String,
                           fingerprint: DataFrame => DataFrame,
                           familyTag: String): Unit = {
    import graft.queries.MultimodalQueries
    val (puts, dels) = splitOps(df, who, id)
    val rows = MultimodalQueries.bandStoreRows(fingerprint(puts))
      .unionByName(MultimodalQueries.bandTakedownMarkers(dels))
    graft.sources.SegmentStore.ensureFormat(
      org.apache.hadoop.fs.FileSystem.get(
        df.sparkSession.sparkContext.hadoopConfiguration),
      storeDir, familyTag)
    graft.sources.SegmentStore.appendBatch(df.sparkSession, storeDir,
      rows, id, compactEvery,
      partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
  }

  private def bandOpsGraduate(ops: DataFrame, storeDir: String,
                              compactEvery: Int, who: String,
                              fingerprint: DataFrame => DataFrame,
                              familyTag: String,
                              checkpointDir: Option[String] = None)
                             (afterBatch: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointDir.foldLeft(ops.writeStream.outputMode("append"))(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          bandOpsApply(storeDir, batch.toDF(), id, compactEvery, who,
            fingerprint, familyTag)
        afterBatch(id)
      }
      .start()

  /** [[mediaOpsGraduate]] under a MEDIA SERVING ROOT with the rebuild
    * trigger ACTUATED — the media face of the vector serve loop's
    * `--maintain-every` (round-16 verdict "What's missing #1": the
    * rebuild actuators existed but nothing production-shaped called
    * them, so a long-running takedown-heavy ingest accumulated markers
    * past [[graft.queries.MultimodalQueries.MediaRebuildMarkerRows]]
    * forever). Each micro-batch:
    *
    *  1. resolves the root's pointer and applies the batch's ops to
    *     the CURRENT epoch's store (so a batch that follows a rebuild
    *     lands in the fresh generation's empty store, exactly like the
    *     vector ingest against a freshly folded epoch);
    *  2. runs [[graft.queries.MultimodalQueries.bandRebuildIfMarkersDue]]
    *     — the marker-mass check is memoized per segment listing, so a
    *     batch that didn't change the store pays NO count job — and,
    *     when due, rebuilds + publishes the next generation (static ∖
    *     taken-down ∪ live store rows, markers physically dropped).
    *
    * The stream IS the root's single writer, so the rebuild is
    * sequenced against its own appends by construction; concurrent
    * PROBES race freely under the pointer (grace GC keeps a resolved
    * snapshot on disk). Replay across a rebuild boundary (a crash
    * after the publish but before the checkpoint commit) re-applies
    * the batch's ops to the fresh store — answer-idempotent: re-put
    * rows duplicate content the rebuild already made static (LWW
    * serves the store twin, same bands), re-deleted docs are already
    * physically absent (the re-appended marker shadows nothing).
    * A rebuild failure degrades (logged), never kills the ingest. */
  def mediaOpsMaintain(ops: DataFrame, rootDir: String, compactEvery: Int,
                       maxMarkerRows: Long =
                         graft.queries.MultimodalQueries.MediaRebuildMarkerRows,
                       checkpointDir: Option[String] = None)
                      (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    bandOpsMaintain(ops, rootDir, compactEvery, "mediaOpsMaintain", docs => {
      import graft.multimodal.Multimodal
      Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }, graft.queries.MultimodalQueries.ImageBandFamily,
      maxMarkerRows, checkpointDir)(afterBatch)

  /** [[mediaOpsMaintain]]'s AUDIO face. */
  def afpOpsMaintain(ops: DataFrame, rootDir: String, compactEvery: Int,
                     maxMarkerRows: Long =
                       graft.queries.MultimodalQueries.MediaRebuildMarkerRows,
                     checkpointDir: Option[String] = None)
                    (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    bandOpsMaintain(ops, rootDir, compactEvery, "afpOpsMaintain", docs => {
      import graft.multimodal.Multimodal
      Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }, graft.queries.MultimodalQueries.AudioBandFamily,
      maxMarkerRows, checkpointDir)(afterBatch)

  private def bandOpsMaintain(ops: DataFrame, rootDir: String,
                              compactEvery: Int, who: String,
                              fingerprint: DataFrame => DataFrame,
                              familyTag: String,
                              maxMarkerRows: Long,
                              checkpointDir: Option[String])
                             (afterBatch: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    opsMaintainLoop(ops, rootDir, who, familyTag,
      applyOps = (storeDir, df, id) =>
        bandOpsApply(storeDir, df, id, compactEvery, who, fingerprint,
          familyTag),
      rebuildCheck = s => graft.queries.MultimodalQueries
        .bandRebuildIfMarkersDue(s, rootDir, maxMarkerRows),
      checkpointDir)(afterBatch)

  /** The ONE maintain-loop skeleton every media face shares (the
    * single-table band stores AND the video two-table pair): resolve
    * the root's pointer, apply the batch's ops to the CURRENT
    * generation's store, then run the face's marker-mass rebuild
    * check — failures degrade (logged), never kill the ingest. What
    * varies per face is exactly two seams: how a batch's ops land in
    * the store(s) and which rebuild trigger fires, so a
    * maintenance-skew bug can no longer hide in a copied foreachBatch
    * body. */
  private def opsMaintainLoop(ops: DataFrame, rootDir: String, who: String,
                              rootFamily: String,
                              applyOps: (String, DataFrame, Long) => Unit,
                              rebuildCheck: SparkSession => Option[Long],
                              checkpointDir: Option[String])
                             (afterBatch: Long => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointDir.foldLeft(ops.writeStream.outputMode("append"))(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val s = batch.sparkSession
        if (!batch.isEmpty) {
          // a maintain stream RESUMED from a checkpoint across a
          // bit-family migration must fail here, before one row of
          // the wrong family lands in the root's current store
          graft.sources.SegmentStore.requireFormat(
            org.apache.hadoop.fs.FileSystem.get(
              s.sparkContext.hadoopConfiguration), rootDir, rootFamily)
          val (_, storeDir) =
            graft.search.AnnIndex.ServingRoot.resolve(s, rootDir)
          applyOps(storeDir, batch.toDF(), id)
        }
        try rebuildCheck(s)
          .foreach(e => System.err.println(
            s"graft: $who rebuilt $rootDir to generation $e"))
        catch {
          case scala.util.control.NonFatal(e) => System.err.println(
            s"graft: $who rebuild failed (${e.getClass.getSimpleName}: ${e.getMessage})")
        }
        afterBatch(id)
      }
      .start()

  /** [[mediaOpsMaintain]]'s VIDEO face — the ops stream against a
    * TWO-TABLE root ([[graft.queries.MultimodalQueries.vphashRootInit]]):
    * each batch applies puts/dels to BOTH of the current generation's
    * stores, then runs the anchor-mass rebuild check
    * ([[graft.queries.MultimodalQueries.vphashRebuildIfMarkersDue]] —
    * memoized; both tables fold under the ONE pointer when due). Same
    * sequencing, replay, and degradation contract as
    * [[mediaOpsMaintain]]. */
  def vphashOpsMaintain(ops: DataFrame, rootDir: String, compactEvery: Int,
                        maxMarkerRows: Long =
                          graft.queries.MultimodalQueries.MediaRebuildMarkerRows,
                        checkpointDir: Option[String] = None)
                       (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    opsMaintainLoop(ops, rootDir, "vphashOpsMaintain",
      graft.queries.MultimodalQueries.VideoBandFamily,
      applyOps = (storeDir, df, id) =>
        vphashOpsApply(storeDir, df, id, compactEvery),
      rebuildCheck = s => graft.queries.MultimodalQueries
        .vphashRebuildIfMarkersDue(s, rootDir, maxMarkerRows),
      checkpointDir)(afterBatch)

  /** [[mediaOpsGraduate]]'s VIDEO face — the q181 store pair's ops
    * stream: puts decode once and fill BOTH tables; dels append
    * markers to both (anchor markers per band index, frame markers up
    * to the format's max frame count). */
  def vphashOpsGraduate(ops: DataFrame, storeDir: String,
                        compactEvery: Int,
                        checkpointDir: Option[String] = None)
                       (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointDir.foldLeft(ops.writeStream.outputMode("append"))(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty)
          vphashOpsApply(storeDir, batch.toDF(), id, compactEvery)
        afterBatch(id)
      }
      .start()

  /** One ops micro-batch applied to a two-table video store pair — the
    * body [[vphashOpsGraduate]] and [[vphashOpsMaintain]] share. */
  private def vphashOpsApply(storeDir: String, df: DataFrame, id: Long,
                             compactEvery: Int): Unit = {
    import graft.multimodal.Multimodal
    val s = df.sparkSession
    val (puts, dels) = splitOps(df, "vphashOpsGraduate", id)
    val nl = lit(null).cast("long")
    val fh = Multimodal
      .videoFrameDHashBands(Multimodal.ingestSynthVariantVideo(puts))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("band0"), col("band1"), col("band2"), col("band3"),
        col("qt0"), col("qt1"), col("qt2"), col("qt3"))
      .cache()
    try {
      // both tables of the pair carry the ONE video family stamp —
      // verified on every resumed checkpoint batch
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      graft.sources.SegmentStore.ensureFormat(fs, s"$storeDir/frames",
        graft.queries.MultimodalQueries.VideoBandFamily)
      graft.sources.SegmentStore.ensureFormat(fs, s"$storeDir/f0bands",
        graft.queries.MultimodalQueries.VideoBandFamily)
      graft.sources.SegmentStore.appendBatch(s, s"$storeDir/frames",
        fh.withColumn("_del", lit(false))
          .unionByName(dels.select(col("doc_id"),
              explode(array((0 until Multimodal.VideoMaxFrames)
                .map(f => lit(f.toLong)): _*)).as("frame_idx"))
            .select(Seq(col("doc_id"), col("frame_idx"),
              nl.as("n_frames")) ++
              (0 until 4).map(j => nl.as(s"band$j")) ++
              (0 until 4).map(j => nl.as(s"qt$j")) :+
              lit(true).as("_del"): _*)),
        id, compactEvery,
        partitionCol = "frame_idx", dedupKeys = Seq("doc_id", "frame_idx"))
      graft.sources.SegmentStore.appendBatch(s, s"$storeDir/f0bands",
        graft.queries.MultimodalQueries.explodeVideoAnchorKeys(
            fh.filter(col("frame_idx") === 0))
          .withColumn("_del", lit(false))
          .unionByName(dels.select(col("doc_id"),
              explode(array((0 until 4).map(j => lit(j)): _*)).as("j"))
            .select(col("doc_id"), col("j"), nl.as("v"),
              nl.as("n_frames"), nl.as("k0"), nl.as("k1"),
              nl.as("k2"), nl.as("k3"), lit(true).as("_del"))),
        id, compactEvery,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
    } finally fh.unpersist(blocking = false)
  }

  /** [[mediaIngestGraduate]]'s VIDEO face — TWO stores per batch
    * because the q168/q171 artifact is two tables: ONE decode of the
    * micro-batch (cached for the two appends, released after) feeds
    * the frame-0 anchor-key store and the per-frame hash store; each
    * store folds on its own manifest cadence. */
  def vphashIngestGraduate(newDocs: DataFrame, storeDir: String,
                           compactEvery: Int,
                           checkpointDir: Option[String] = None)
                          (afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    checkpointDir.foldLeft(newDocs.writeStream.outputMode("append"))(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          import graft.multimodal.Multimodal
          val s = batch.sparkSession
          val fh = Multimodal
            .videoFrameDHashBands(Multimodal.ingestSynthVariantVideo(batch.toDF()))
            .select(col("doc_id"), col("frame_idx"), col("n_frames"),
              col("band0"), col("band1"), col("band2"), col("band3"),
              col("qt0"), col("qt1"), col("qt2"), col("qt3"))
            .cache()
          try {
            val fs = org.apache.hadoop.fs.FileSystem.get(
              s.sparkContext.hadoopConfiguration)
            graft.sources.SegmentStore.ensureFormat(fs, s"$storeDir/frames",
              graft.queries.MultimodalQueries.VideoBandFamily)
            graft.sources.SegmentStore.ensureFormat(fs, s"$storeDir/f0bands",
              graft.queries.MultimodalQueries.VideoBandFamily)
            graft.sources.SegmentStore.appendBatch(s, s"$storeDir/frames", fh,
              id, compactEvery,
              partitionCol = "frame_idx", dedupKeys = Seq("doc_id", "frame_idx"))
            graft.sources.SegmentStore.appendBatch(s, s"$storeDir/f0bands",
              graft.queries.MultimodalQueries.explodeVideoAnchorKeys(
                fh.filter(col("frame_idx") === 0)),
              id, compactEvery,
              partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
          } finally fh.unpersist(blocking = false)
        }
        afterBatch(id)
      }
      .start()

  /** [[phashProbeVsIndex]]'s VIDEO twin against the q168 two-table
    * artifact ([[graft.queries.MultimodalQueries.vphashIndexDir]]):
    * each micro-batch decodes its own clips into ONE ROW PER CLIP
    * ([[graft.multimodal.Multimodal.videoFrameHashArray]] — the whole
    * clip's per-frame hashes ride the row), candidates come from the
    * static frame-0 anchor band keys (+ equal frame counts, q157's
    * rule) claimed once per pair, and the aligned-Hamming verify is
    * ROW-LOCAL higher-order-function math between the streamed frames
    * array and the partner's pre-folded static array — no streaming
    * aggregation anywhere, so the query is append-mode and stateless;
    * replay must equal q168's old-partner counts (EventStreamsSpec). */
  def vphashProbeVsIndex(spark: SparkSession, indexDir: String,
                         newDocs: DataFrame, maxHamming: Long): DataFrame = {
    import graft.multimodal.Multimodal
    val f0 = spark.read.parquet(s"$indexDir/f0bands")
    graft.operators.Dedup.requireIndexCols(f0, indexDir, "f0bands",
      Seq("doc_id", "j", "v", "k0", "k1", "k2", "k3", "n_frames"))
    val pb = f0.select(col("doc_id").as("partner"), col("j"), col("v"),
      col("k0").as("b0"), col("k1").as("b1"),
      col("k2").as("b2"), col("k3").as("b3"),
      col("n_frames").as("nfb"))
    // static per-partner frame arrays, folded ONCE at setup (batch
    // aggregation of a static table — position = frame index)
    val pfr = spark.read.parquet(s"$indexDir/frames")
      .groupBy(col("doc_id").as("partner"))
      .agg(array_sort(collect_list(struct(col("frame_idx"),
        col("band0"), col("band1"), col("band2"), col("band3")))).as("pframes"))
      .select(col("partner"),
        transform(col("pframes"), f => struct(
          f.getField("band0").as("band0"), f.getField("band1").as("band1"),
          f.getField("band2").as("band2"), f.getField("band3").as("band3")))
          .as("pframes"))
    val nh = Multimodal
      .videoFrameHashArray(Multimodal.ingestSynthVariantVideo(newDocs))
      .select(col("doc_id"), col("n_frames"), col("frames"))
    // composed anchor keys (band_j + qt_j·2^16) from the streamed
    // clip's first frame — the same second blocking signal the batch
    // probe's candidate rule uses
    val nx = nh.select(col("doc_id"), col("n_frames").as("nfa"), col("frames"),
        element_at(col("frames"), 1).as("f0"))
      .select(Seq(col("doc_id"), col("nfa"), col("frames")) ++
        (0 until 4).map(j => (col("f0").getField(s"band$j") +
          col("f0").getField(s"qt$j") * lit(1L << 16)).as(s"a$j")): _*)
      .select(col("doc_id"), col("nfa"), col("frames"),
        col("a0"), col("a1"), col("a2"), col("a3"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"), col(s"a$j").as("v"))): _*)).as("bk"))
      .select(col("doc_id"), col("nfa"), col("frames"),
        col("bk.j").as("j"), col("bk.v").as("v"),
        col("a0"), col("a1"), col("a2"), col("a3"))
    // aligned total Hamming: zip the streamed clip's frame array with
    // the partner's static one — candidates already guarantee equal
    // lengths — and fold the per-frame band XOR popcounts
    val alignedHam = aggregate(
      zip_with(col("frames"), col("pframes"), (fa, fb) =>
        (0 until 4).map(i =>
          bit_count(fa.getField(s"band$i").bitwiseXOR(fb.getField(s"band$i")))
            .cast("long")).reduce(_ + _)),
      lit(0L), (acc, x) => acc + x)
    nx.join(pb, Seq("j", "v"))
      .filter(col("doc_id") =!= col("partner") && col("nfa") === col("nfb") &&
        graft.queries.MultimodalQueries.noEarlierAgree)
      .join(pfr, Seq("partner"))
      .withColumn("hamming", alignedHam)
      .filter(col("hamming") <= lit(maxHamming))
      .select(col("doc_id"), col("partner"), col("hamming"))
  }

  /** Stream-vs-ARTIFACT incremental dedup — [[incrementalDedup]] wired
    * to the persisted corpus band index
    * ([[graft.operators.Dedup.saveCorpusIndex]], the q73 artifact): the
    * corpus side's band keys and shingle sets are READ BACK from
    * parquet, so one artifact written by the full batch build serves
    * both the daily batch probe (q73) and this ingest-time stream —
    * nothing about the existing corpus is recomputed per micro-batch.
    *
    * Two properties make this the 100 TB ingest shape:
    *  - the canonical-band predicate sits inside the stream-static join
    *    (both sides carry full signatures), so each verified pair emits
    *    exactly once and the query is fully STATELESS — no
    *    dropDuplicates state to bound, unlike [[incrementalDedup]];
    *  - Jaccard verification joins the artifact's shingle table and
    *    filters before any result materializes. The bands table is
    *    PARTITIONED BY band on disk; note that unlike the batch probe
    *    (q73, whose plan carries a dynamicpruning PartitionFilter),
    *    stream-static joins get NO dynamic partition pruning, so each
    *    micro-batch scans the full bands table — per-batch read I/O is
    *    O(corpus bands), and only the join compute is O(collisions).
    *    At ingest scale the mitigation is batching (fewer, larger
    *    micro-batches amortize the corpus scan), not pruning.
    *
    * @param newDocs  streaming (doc_id, text)
    * @param indexDir artifact directory written by saveCorpusIndex
    * @return streaming (doc_id, partner, jac) — verified near-dup pairs
    *         of each streamed doc against the indexed corpus. */
  def incrementalDedupVsIndex(spark: SparkSession, indexDir: String,
                              newDocs: DataFrame, threshold: Double): DataFrame = {
    import graft.operators.Dedup
    val rawBands = spark.read.parquet(s"$indexDir/bands")
    val rawSh = spark.read.parquet(s"$indexDir/shingles")
    Dedup.requireIndexCols(rawBands, indexDir, "bands",
      Seq("doc_id", "sig", "band", "key"))
    Dedup.requireIndexCols(rawSh, indexDir, "shingles", Seq("doc_id", "hs"))
    val corpusBands = rawBands
      .select(col("doc_id").as("partner"), col("sig").as("psig"),
        col("band").as("pband"), col("key").as("pkey"))
    val corpusSh = rawSh
      .select(col("doc_id").as("partner"), col("hs").as("phs"))
    val nb = newDocs
      .select(col("doc_id"),
        graft.expressions.HashExpressions.shingleHashSet(col("text"), 3).as("hs"))
      .withColumn("sig", Dedup.minhashSignature(col("hs")))
      .select(col("doc_id"), col("hs"), col("sig"),
        explode(Dedup.bandKeys(col("sig"))).as("bk"))
      .select(col("doc_id"), col("hs"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    nb.join(corpusBands,
        col("band") === col("pband") && col("key") === col("pkey") &&
          col("doc_id") =!= col("partner") &&
          Dedup.canonicalBand(col("sig"), col("psig"), col("band")))
      .join(corpusSh, "partner")
      .withColumn("jac", round(Dedup.jaccard(col("hs"), col("phs")), 6))
      .filter(col("jac") >= threshold)
      .select(col("doc_id"), col("partner"), col("jac"))
  }

  def incrementalDedup(newDocs: DataFrame, corpus: DataFrame,
                       threshold: Double): DataFrame = {
    import graft.operators.Dedup
    def bandsOf(df: DataFrame, idAs: String, hsAs: String): DataFrame = df
      .select(col("doc_id").as(idAs),
        graft.expressions.HashExpressions.shingleHashSet(col("text"), 3).as(hsAs))
      .withColumn("sig", Dedup.minhashSignature(col(hsAs)))
      .select(col(idAs), col(hsAs), explode(Dedup.bandKeys(col("sig"))).as("bk"))
      .select(col(idAs), col(hsAs),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val nb = bandsOf(newDocs, "doc_id", "hs")
    val cb = bandsOf(corpus, "partner", "chs")
      .withColumnRenamed("band", "cband").withColumnRenamed("key", "ckey")
    nb.join(cb,
        col("band") === col("cband") && col("key") === col("ckey") &&
          col("doc_id") =!= col("partner") &&
          round(Dedup.jaccard(col("hs"), col("chs")), 6) >= threshold)
      .select(col("doc_id"), col("partner"),
        round(Dedup.jaccard(col("hs"), col("chs")), 6).as("jac"))
      .dropDuplicates("doc_id", "partner")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.P
import graft.multimodal.Multimodal
import graft.SparkEntry.IngestOps

/** Oracle-checked slice of the multimodal plumbing: q24 runs the real
  * binary path (encode → blob + metadata struct → batched mapPartitions
  * feature extraction) and the oracle recomputes the same byte
  * statistics in SQL (the corpus is ASCII, so UTF-8 bytes == code
  * points and the byte fold is expressible portably).
  *
  * q61 drives the frame sampler end-to-end: every k-th fixed-size chunk
  * of each blob becomes a frame row (the video/audio sampling shape),
  * and the per-doc manifest (frame count, sampled byte mass, content
  * checksum of frame 0) is checked against an arithmetic oracle — the
  * frame GEOMETRY is pure integer math on sizes, and the frame CONTENT
  * check folds the same bytes the binary path sliced.
  *
  * q74 is the REAL decode path: deterministic PNGs generated at ingest
  * (ImageIO encode), decoded back pixel-by-pixel (ImageIO decode,
  * batched mapPartitions) into geometry + channel sums; pixel values
  * derive from the portable pixel hash, so the oracle reproduces the
  * decoded sums with integer arithmetic and hash-green certifies a
  * genuine codec round-trip.
  *
  * q76 is the same construction for SOUND: deterministic 16-bit PCM
  * WAV clips (javax.sound.sampled encode), decoded back frame-by-frame
  * into sample count / signed sum / energy; sample values derive from
  * the portable audio hash, so hash-green certifies a real audio codec
  * round-trip.
  *
  * q81 closes the family with VIDEO: deterministic multi-frame animated
  * GIFs (palette-indexed grayscale — lossless by construction), decoded
  * frame-by-frame with temporal sampling (every 2nd frame) into per-doc
  * frame counts and sampled gray mass; hash-green certifies real
  * multi-frame decode + frame sampling. Only formats with no JDK codec
  * (JPEG variants, MP3, MP4) remain on
  * [[graft.multimodal.Multimodal.StubDecoder]].
  */
object MultimodalQueries {

  /** q61: keep every k-th chunk as a frame. */
  val FrameEvery = 4

  /** q81: decode every k-th frame of each clip. 2 against the 2–4-frame
    * synthetic clips means some clips sample 1 frame and some 2 — the
    * sampler's modular arithmetic is exercised, not just pass-through. */
  val VideoSampleEvery = 2

  /** q137 decimation factor: 64 samples → 16 pooled (8 kHz → 2 kHz). */
  val DownFactor = 4

  /** q155: keep candidate pairs whose full 64-bit image-hash Hamming
    * distance is at most this. The bit family is the round-17 ADOPTED
    * difference hash ([[graft.multimodal.Multimodal.imageDHashBands]]
    * — neighbor-comparison bits, threshold-free): a perturbed pixel
    * touches exactly its two adjacent comparisons, so planted
    * same-group pairs (≤ 2 perturbed pixels) sit at Hamming ≤ 4
    * DETERMINISTICALLY — no global-mean coupling, the mechanism that
    * cost the superseded aHash family ~2% of planted pairs at 500 k
    * (`bench/lost_pairs_r16.json` measured the loss;
    * `bench/dhash_probe_r17.json` measured this family at 100%
    * retention with candidate volume still flat per-n). 6 keeps the
    * prior declared cut (margin over the deterministic 4) while
    * random cross-group pairs sit at ~32. The BAND rule (agree on
    * ≥ 1 of 4 16-bit bands) GUARANTEES candidacy only for Hamming ≤ 3
    * (pigeonhole); beyond that it is the standard banding heuristic —
    * and the oracle applies the identical rule, so hash-green
    * certifies the declared semantics, not an all-pairs ideal. */
  val PhashMaxHamming = 6L

  /** q156: keep candidate clip pairs whose full 64-bit delta-sign
    * fingerprint Hamming distance is at most this. Unlike q155's
    * aHash (where a one-pixel perturbation shifts the global mean and
    * can flip borderline bits anywhere), the delta-sign bit is LOCAL:
    * a one-sample perturbation touches exactly its two adjacent
    * deltas, so planted same-group pairs sit at Hamming ≤ 4
    * DETERMINISTICALLY (spec-proven) and the cut is exactly 4 — no
    * slack needed. Independent clips sit near 32, but unrelated
    * GROUPS whose base-hash offsets land close mod P have genuinely
    * similar waveforms and legitimately fingerprint close (the
    * real-world property too: two near-silent clips collide under any
    * robust fingerprint); those pairs are the declared distance
    * semantics, and the oracle applies the identical rule. Band-rule
    * caveat as [[PhashMaxHamming]]: candidacy GUARANTEED for Hamming
    * ≤ 3 (pigeonhole over 4 bands), heuristic at 4 — in practice the
    * ≤ 4 flips cluster on the two perturbed positions' bands, so
    * measured planted recall is 100% through 5 000 ids. */
  val AfpMaxHamming = 4L

  /** q157: keep candidate clip pairs whose TOTAL aligned per-frame
    * Hamming distance is at most this — since round 18 over the
    * PRODUCTION dHash bits
    * ([[graft.multimodal.Multimodal.videoFrameDHashBands]]). Each
    * member perturbs one pixel of one frame, which flips ONLY the
    * ≤ 2 neighbor-comparison bits that pixel's pairs overlap, so a
    * planted pair's total is ≤ 4 DETERMINISTICALLY — 6 covers it with
    * margin (under the superseded aHash rule the frame-total shift
    * could flip borderline bits anywhere: 5 981/6 000 recovered at
    * 6 000 clips — 15 anchor misses + 4 over-the-cut;
    * `bench/vdhash_probe_r17.json` measured dHash at 99.99% anchor
    * retention, the round-18 adoption) while unrelated aligned clips
    * sit near 32·n_frames. Candidacy is anchored on
    * FRAME-0 COMPOSED keys (≥ 1 agreeing `band_j + qt_j·2^16` key of
    * the first frame + equal frame counts — the quarter-total
    * composition keeps candidate volume LINEAR in corpus size where
    * 16-bit bands alone grew ~n²/2^16, measured through 20 k clips);
    * pairs whose frame-0 keys diverge across all four quarters are
    * missed by the declared rule — and the oracle applies the
    * identical rule, so hash-green certifies the declared
    * semantics. */
  val VphashMaxHamming = 6L

  /** First-agreeing-band claim over carried band vectors (a0..a3 vs
    * b0..b3): a pair is claimed only at its LOWEST agreeing band
    * index — q72's no-distinct trick, THE one definition every banded
    * candidate join in the engine (pairs, probes, graduations, the
    * streaming twins) filters with; a band-count change edits exactly
    * this site. */
  private[graft] def noEarlierAgree: org.apache.spark.sql.Column = !(
    (col("j") > 0 && col("a0") === col("b0")) ||
    (col("j") > 1 && col("a1") === col("b1")) ||
    (col("j") > 2 && col("a2") === col("b2")))

  /** [[noEarlierAgree]] for the COMPOSED image/audio candidate key
    * (band bits AND exact quarter mass, carried as a0..a3/am0..am3 vs
    * b0..b3/bm0..bm3): a pair is claimed only at its lowest band where
    * BOTH components agree — the two-part twin of the video family's
    * single composed long (there `band + qt·2¹⁶` stays injective
    * because the canonical grid bounds both parts; the raw image gray
    * and signed audio sample masses carry no such bound, so the key
    * is two columns and the join is on (j, v, m)). */
  private[graft] def noEarlierAgreeM: org.apache.spark.sql.Column = !(
    (col("j") > 0 && col("a0") === col("b0") && col("am0") === col("bm0")) ||
    (col("j") > 1 && col("a1") === col("b1") && col("am1") === col("bm1")) ||
    (col("j") > 2 && col("a2") === col("b2") && col("am2") === col("bm2")))

  /** Exact 64-bit Hamming over the carried 4×16-bit band vectors —
    * [[noEarlierAgree]]'s verify twin, same single-definition rule. */
  private[graft] def bandHamming: org.apache.spark.sql.Column = (0 until 4)
    .map(i => bit_count(col(s"a$i").bitwiseXOR(col(s"b$i"))).cast("long"))
    .reduce(_ + _)

  /** The per-new-item report tail every ingest probe shares: left-join
    * the duplicate counts (keyed `nid`) onto the batch's doc frame,
    * zero-fill, and derive the accepted flag (no duplicates in any
    * class). */
  private def acceptFrame(newDocs: DataFrame, dups: DataFrame,
                          countCols: Seq[String]): DataFrame =
    newDocs.join(dups, col("doc_id") === col("nid"), "left")
      .na.fill(0L, countCols)
      .withColumn("accepted",
        countCols.map(c => col(c) === 0).reduce(_ && _).cast("long"))
      .select((col("doc_id") +: countCols.map(col)) :+ col("accepted"): _*)
      .orderBy(col("doc_id"))

  /** The shared banded near-dup candidate→verify shape of q155/q156:
    * ONE equi-join on the exploded COMPOSED (band_idx, band_val,
    * quarter_mass) key — not a join per band, which would evaluate the
    * decode lineage 2×bands times, and never bits alone, which at
    * 100× scale admits ~n²/2¹⁶ random candidate coincidences (the
    * video family's measured fix, applied to both single-table
    * modalities). The full band+mass vectors ride along each exploded
    * row, so the canonical rule (claim a pair only in its FIRST
    * band where bits AND mass agree — q72's no-distinct trick) is a
    * post-join filter over carried columns, and the exact 64-bit
    * Hamming verify closes the candidates. Input:
    * (doc_id, band0..band3, qt0..qt3); every shuffle moves only those
    * 9 columns — blobs never leave their partitions. */
  private def bandNearDupPairs(h: DataFrame, maxHamming: Long): DataFrame = {
    val ex = explodeBandKeys(h)
    val a = ex.toDF("doc_a", "j", "v", "m",
      "a0", "a1", "a2", "a3", "am0", "am1", "am2", "am3")
    val b = ex.toDF("doc_b", "j", "v", "m",
      "b0", "b1", "b2", "b3", "bm0", "bm1", "bm2", "bm3")
    a.join(b, Seq("j", "v", "m"))
      .filter(col("doc_a") < col("doc_b") && noEarlierAgreeM)
      .withColumn("hamming", bandHamming)
      .filter(col("hamming") <= lit(maxHamming))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    // no ordering here: the pair-listing queries sort at their own
    // call sites; the component/manifest consumers (q159/q160) must
    // not pay a full sort of the pair set they immediately re-shuffle
  }

  /** The composed-candidate band rule in SQL — any band where bits
    * AND exact quarter mass both agree; the plain OR form is
    * equivalent to the engine's first-agreeing-band claim because
    * both emit each qualifying pair exactly once. */
  private val composedBandRuleSql: String =
    (0 until 4).map(j =>
      s"(a.band$j = b.band$j AND a.qt$j = b.qt$j)").mkString(" OR ")

  /** DuckDB twin of [[bandNearDupPairs]]: given CTE text whose last
    * CTE is `bands(doc_id, band0..band3, qt0..qt3)`, append the
    * composed-key candidate join + exact Hamming verify. */
  private def bandPairsSql(withCtes: String, maxHamming: Long): String =
    s"""$withCtes,
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
       |       + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.doc_id < b.doc_id
       |   AND ($composedBandRuleSql))
       |SELECT doc_a, doc_b, hamming FROM cand
       |WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin

  private def byteFoldSum(strCol: org.apache.spark.sql.Column) =
    aggregate(
      filter(split(strCol, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc + ascii(ch).cast("long")) % lit(P))

  /** The shared O(new) ingest-probe shape of q158/q167 (q73's daily
    * dedup, media face): NEW fingerprints probe the persisted band
    * index of the old corpus PLUS earlier new arrivals (pid < nid —
    * the within-batch order a streaming ingest sees); candidates come
    * from ONE band equi-join claimed once by the first-agreeing-band
    * rule, verified by exact 64-bit Hamming; per new item the probe
    * reports duplicate counts against each partner class and an
    * accepted flag. The indexed corpus is never re-decoded — O(new)
    * decode work, band-key joins bound everything else. */
  private def bandIndexProbe(nh: DataFrame, indexBands: DataFrame,
                             newDocs: DataFrame, maxHamming: Long): DataFrame = {
    val nx = explodeBandKeys(nh)
      .toDF("nid", "j", "v", "m",
        "a0", "a1", "a2", "a3", "am0", "am1", "am2", "am3")
    val partnerCols = Seq(
      col("band0").as("b0"), col("band1").as("b1"),
      col("band2").as("b2"), col("band3").as("b3"),
      col("qt0").as("bm0"), col("qt1").as("bm1"),
      col("qt2").as("bm2"), col("qt3").as("bm3"))
    val pbOld = indexBands
      .select(Seq(col("doc_id").as("pid"), lit(false).as("pnew"),
        col("j"), col("v"), col("m")) ++ partnerCols: _*)
    val pbNew = explodeBandKeys(nh)
      .select(Seq(col("doc_id").as("pid"), lit(true).as("pnew"),
        col("j"), col("v"), col("m")) ++ partnerCols: _*)
    val dups = nx.join(pbOld.unionByName(pbNew), Seq("j", "v", "m"))
      .filter(col("nid") =!= col("pid") &&
        (!col("pnew") || col("pid") < col("nid")) && noEarlierAgreeM)
      .filter(bandHamming <= lit(maxHamming))
      .groupBy(col("nid"))
      .agg(
        sum(when(!col("pnew"), 1L).otherwise(0L)).cast("long").as("n_dup_old"),
        sum(when(col("pnew"), 1L).otherwise(0L)).cast("long").as("n_dup_new_prior"))
    acceptFrame(newDocs, dups, Seq("n_dup_old", "n_dup_new_prior"))
  }

  /** The GRADUATION probe shared by q169/q170 — the banded-index face
    * of the LSM read: the LATER ingest batch probes static artifact ∪
    * [[graft.sources.SegmentStore]] in ONE band equi-join
    * (first-agreeing-band claim, exact 64-bit Hamming verify), with
    * partner PROVENANCE riding the index rows so the output CERTIFIES
    * the graduated segments actually answered — a silently empty
    * store zeroes n_dup_graduated and the oracle turns red.
    * Within-batch pairs are by declared rule not counted: that is the
    * plain index probe's already-covered job (q158/q167). */
  private[graft] def graduatedBandProbe(s: SparkSession, staticBands: DataFrame,
                                 storeDir: String, b2: DataFrame,
                                 maxHamming: Long,
                                 familyTag: String): DataFrame = {
    // bit-family discipline: this probe interprets the store's band
    // bits under `familyTag` — a cross-family store fails loudly here
    // instead of silently missing every near-dup in the equi-join
    graft.sources.SegmentStore.requireFormat(
      org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration), storeDir, familyTag)
    val keyed = Seq("doc_id", "j", "v", "m",
      "band0", "band1", "band2", "band3", "qt0", "qt1", "qt2", "qt3")
    // lifecycle resolution over the store: last-writer-wins per
    // (doc_id, j) across the resolved segments (live tail vs folded
    // generation can carry the same key), then serve the data rows and
    // let surviving DELETE markers shadow the immutable static
    // artifact — a taken-down corpus image stops answering without a
    // static rebuild, and a re-ingested one answers again because its
    // newer data row already beat the marker here. Store rows are 4
    // small longs per doc, so the window shuffle is noise next to the
    // candidate join.
    val raw = graft.sources.SegmentStore.read(s, storeDir)
    val lifecycled =
      if (!raw.columns.contains("_del")) raw.withColumn("_del", lit(false))
      else raw
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col("j"))
      .orderBy(col(graft.sources.SegmentStore.BatchCol).desc)
    val lww = lifecycled
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val takenDown = lww
      .filter(col("_del") && col("j") === 0).select(col("doc_id"))
    // size-gated shadow hint (the vector tombstoneHint discipline):
    // broadcast only while the marker mass is provably under the
    // measured crossover, shuffle anti-join past it
    val shadowHint = takedownHint(markerRowCapCached(s, storeDir, "j"))
    val indexSide = staticBands
      .join(shadowHint(takenDown), Seq("doc_id"), "left_anti")
      .select(keyed.map(col): _*)
      .withColumn("graduated", lit(false))
      .unionByName(lww.filter(!col("_del"))
        .select(keyed.map(col): _*)
        .withColumn("graduated", lit(true)))
    val nx = explodeBandKeys(b2)
      .toDF("nid", "j", "v", "m",
        "a0", "a1", "a2", "a3", "am0", "am1", "am2", "am3")
    val pb = indexSide.select(col("doc_id").as("pid"), col("graduated"),
      col("j"), col("v"), col("m"),
      col("band0").as("b0"), col("band1").as("b1"),
      col("band2").as("b2"), col("band3").as("b3"),
      col("qt0").as("bm0"), col("qt1").as("bm1"),
      col("qt2").as("bm2"), col("qt3").as("bm3"))
    val dups = nx.join(pb, Seq("j", "v", "m"))
      .filter(noEarlierAgreeM)
      .filter(bandHamming <= lit(maxHamming))
      .groupBy(col("nid"))
      .agg(
        sum(when(!col("graduated"), 1L).otherwise(0L)).cast("long").as("n_dup_old"),
        sum(when(col("graduated"), 1L).otherwise(0L)).cast("long").as("n_dup_graduated"))
    acceptFrame(b2.select(col("doc_id")), dups, Seq("n_dup_old", "n_dup_graduated"))
  }

  /** DuckDB twin of [[graduatedBandProbe]] over any bands CTE: batch2
    * (odd new ids) probes old ∪ batch1 (even new ids), partner classes
    * split by which side serves — the oracle recomputes BOTH sides
    * from the sample formulas, so the static artifact round-trip AND
    * the SegmentStore fold + manifest resolution must be invisible. */
  private def graduationProbeSql(withCtes: String, maxHamming: Long,
                                 partnerFilter: String = ""): String =
    s"""$withCtes,
       |cand AS (
       |  SELECT a.doc_id AS nid,
       |    (b.doc_id % 5 >= 3) AS graduated,
       |    CAST(bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
       |       + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.doc_id % 5 >= 3 AND a.doc_id % $PhashLsmBatchMod = 1
       |   AND (b.doc_id % 5 < 3 OR b.doc_id % $PhashLsmBatchMod = 0)
       |   $partnerFilter
       |   AND ($composedBandRuleSql)),
       |agg AS (
       |  SELECT nid,
       |    CAST(SUM(CASE WHEN NOT graduated AND hamming <= $maxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_old,
       |    CAST(SUM(CASE WHEN graduated AND hamming <= $maxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_graduated
       |  FROM cand GROUP BY nid)
       |SELECT d.doc_id,
       |  COALESCE(a.n_dup_old, 0) AS n_dup_old,
       |  COALESCE(a.n_dup_graduated, 0) AS n_dup_graduated,
       |  CASE WHEN COALESCE(a.n_dup_old, 0) = 0
       |        AND COALESCE(a.n_dup_graduated, 0) = 0
       |    THEN 1::BIGINT ELSE 0::BIGINT END AS accepted
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.nid
       |WHERE d.doc_id % 5 >= 3 AND d.doc_id % $PhashLsmBatchMod = 1
       |ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin of [[rebuiltBandProbe]]: batch2 probes ONE merged
    * partner class — (old ∪ graduated batch1) with the takedown carve
    * excluded — recomputed from the media sample formulas, so the
    * engine's rebuild (fold + physical drop + fresh generation) must
    * be invisible in the result. */
  private def rebuildProbeSql(withCtes: String, maxHamming: Long): String =
    s"""$withCtes,
       |cand AS (
       |  SELECT a.doc_id AS nid,
       |    CAST(bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
       |       + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.doc_id % 5 >= 3 AND a.doc_id % $PhashLsmBatchMod = 1
       |   AND (b.doc_id % 5 < 3 OR b.doc_id % $PhashLsmBatchMod = 0)
       |   AND b.doc_id % $TakedownMod <> $TakedownRem
       |   AND ($composedBandRuleSql)),
       |agg AS (
       |  SELECT nid,
       |    CAST(SUM(CASE WHEN hamming <= $maxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |  FROM cand GROUP BY nid)
       |SELECT d.doc_id, COALESCE(a.n_dup, 0) AS n_dup,
       |  CASE WHEN COALESCE(a.n_dup, 0) = 0
       |    THEN 1::BIGINT ELSE 0::BIGINT END AS accepted
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.nid
       |WHERE d.doc_id % 5 >= 3 AND d.doc_id % $PhashLsmBatchMod = 1
       |ORDER BY d.doc_id""".stripMargin

  /** [[rebuildProbeSql]]'s VIDEO face — q184's oracle: the q181
    * candidate + aligned-Hamming semantics with ONE merged partner
    * class, carve excluded. */
  private def vphashRebuildSql(): String =
    s"""$variantVideoBandsCtes,
       |cand AS (
       |  SELECT a.doc_id AS nid, b.doc_id AS pid
       |  FROM f0 a JOIN f0 b
       |    ON a.doc_id % 5 >= 3 AND a.doc_id % $PhashLsmBatchMod = 1
       |   AND (b.doc_id % 5 < 3 OR b.doc_id % $PhashLsmBatchMod = 0)
       |   AND b.doc_id % $TakedownMod <> $TakedownRem
       |   AND a.nf = b.nf
       |   AND (a.k0 = b.k0 OR a.k1 = b.k1 OR
       |        a.k2 = b.k2 OR a.k3 = b.k3)),
       |ham AS (
       |  SELECT c.nid, c.pid,
       |    CAST(SUM(bit_count(xor(fa.band0, fb.band0)) + bit_count(xor(fa.band1, fb.band1))
       |       + bit_count(xor(fa.band2, fb.band2)) + bit_count(xor(fa.band3, fb.band3))) AS BIGINT) AS hamming
       |  FROM cand c
       |  JOIN bandsf fa ON fa.doc_id = c.nid
       |  JOIN bandsf fb ON fb.doc_id = c.pid AND fb.fr = fa.fr
       |  GROUP BY 1, 2),
       |agg AS (
       |  SELECT nid,
       |    CAST(SUM(CASE WHEN hamming <= $VphashMaxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |  FROM ham GROUP BY nid)
       |SELECT d.doc_id, COALESCE(a.n_dup, 0) AS n_dup,
       |  CASE WHEN COALESCE(a.n_dup, 0) = 0
       |    THEN 1::BIGINT ELSE 0::BIGINT END AS accepted
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.nid
       |WHERE d.doc_id % 5 >= 3 AND d.doc_id % $PhashLsmBatchMod = 1
       |ORDER BY d.doc_id""".stripMargin

  /** Frame-0 anchor key for band `j`: the 16-bit dHash band composed
    * with the quarter's EXACT virtual-gray total (`band_j + qt_j·2^16`
    * — both under 2^28, one Long). Candidacy through a composed key
    * needs a quarter whose bit pattern AND gray mass both match, which
    * suppresses the two collision families bands alone admit (random
    * 2^-16 coincidence; near-affine brightness drifts that preserve
    * threshold-relative bits) while a one-pixel edit still leaves 3 of
    * 4 quarters fully agreeing — see
    * [[graft.multimodal.Multimodal.videoFrameDHashBands]]. */
  private def videoAnchorKey(j: Int): org.apache.spark.sql.Column =
    col(s"band$j") + col(s"qt$j") * lit(1L << 16)

  /** Exploded (band_idx, composed_key) anchor rows with the full
    * composed-key vector carried — the VIDEO candidate layout
    * ([[explodeBandKeys]]'s face for the two-table clip index): the
    * equi-join key and the first-agreeing-band claim both act on
    * composed keys; the PURE bands for the aligned-Hamming verify ride
    * the `frames` table, not these rows. Input: frame-0 rows
    * (doc_id, n_frames, band0..band3, qt0..qt3); output:
    * (doc_id, n_frames, j, v, k0..k3). */
  private[graft] def explodeVideoAnchorKeys(f0: DataFrame): DataFrame =
    f0.select(Seq(col("doc_id"), col("n_frames")) ++
        (0 until 4).map(j => videoAnchorKey(j).as(s"k$j")): _*)
      .select(col("doc_id"), col("n_frames"),
        col("k0"), col("k1"), col("k2"), col("k3"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"), col(s"k$j").as("v"))): _*)).as("bk"))
      .select(col("doc_id"), col("n_frames"), col("bk.j").as("j"),
        col("bk.v").as("v"), col("k0"), col("k1"), col("k2"), col("k3"))

  /** Exploded COMPOSED (band_idx, band_val, quarter_mass) key rows
    * with the full band+mass vectors carried — the layout
    * [[bandNearDupPairs]] joins on and the q158/q167 artifacts and
    * q169/q170 stores persist. Output:
    * (doc_id, j, v, m, band0..band3, qt0..qt3). */
  private[graft] def explodeBandKeys(h: DataFrame): DataFrame =
    h.select(Seq(col("doc_id")) ++
        (0 until 4).map(j => col(s"band$j")) ++
        (0 until 4).map(j => col(s"qt$j")) :+
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("j"), col(s"band$j").as("v"),
            col(s"qt$j").as("m"))): _*)).as("bk"): _*)
      .select(Seq(col("doc_id"), col("bk.j").as("j"), col("bk.v").as("v"),
        col("bk.m").as("m")) ++
        (0 until 4).map(j => col(s"band$j")) ++
        (0 until 4).map(j => col(s"qt$j")): _*)

  /** q158's corpus split: doc_id % 5 >= 3 is the NEW ingest batch,
    * the rest the already-indexed corpus. Chosen (rather than q73's
    * % 10 == 7) so BOTH partner classes are real on the planted
    * fixture: consecutive-id group members land new+old AND new+new
    * (e.g. ids 3,4 of group 1), so n_dup_new_prior is exercised, not
    * a dead column. */
  val PhashProbeNewMod = 5L
  val PhashProbeNewMin = 3L

  /** The full corpus's variant-image dHash bands (+ per-image gray
    * mass), session-cached: the EXPENSIVE pass — decode + hash of
    * every image — runs once per session, and three consumers derive
    * from the tiny cached table (q155 pairs, q159 components, q160
    * export manifest). */
  private[queries] def variantImageBands(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s,
      "graft_cache_phash_bands_" + graft.SparkEntry.pathSlug(dir)) {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal
        .imageDHashBands(Multimodal.ingestSynthVariantImages(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"),
          col("gray_total"))
    }

  /** q155's verified near-dup image pairs over the cached bands — the
    * banded join recomputes per consumer (cheap: 9-long rows), the
    * decode does not. */
  private[queries] def imagePhashPairs(s: SparkSession, dir: String): DataFrame =
    bandNearDupPairs(
      variantImageBands(s, dir).drop("gray_total"),
      PhashMaxHamming)

  /** The corpus's audio fingerprints, session-cached — same offline-
    * index methodology as [[variantImageBands]]: decode runs once per
    * session; every invocation (both arms of the banded self-join,
    * every bench rep) reads the n_docs × 5-long table. A plain
    * in-query .cache() cannot give cross-invocation reuse here: each
    * call builds a fresh mapPartitions closure, the logical plans
    * never compare equal, and the cache manager misses — measured in
    * the 500 k probe before this was a named view. */
  private[queries] def variantAudioBands(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s,
      "graft_cache_afp_bands_" + graft.SparkEntry.pathSlug(dir)) {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal
        .audioFingerprintBands(Multimodal.ingestSynthVariantAudio(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }

  /** The corpus's per-frame video hash bands, session-cached (same
    * argument as [[variantAudioBands]] — the q157 decode must not run
    * once per join arm or once per rep). */
  private[queries] def variantVideoFrameBands(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s,
      "graft_cache_vph_bands_" + graft.SparkEntry.pathSlug(dir)) {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal
        .videoFrameDHashBands(Multimodal.ingestSynthVariantVideo(docs))
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          col("band0"), col("band1"), col("band2"), col("band3"),
          col("qt0"), col("qt1"), col("qt2"), col("qt3"))
    }

  private val sessionPhashIndex = new graft.SessionMemo[String, String]

  /** Session-once persisted phash band index of the OLD image corpus
    * (the q73 daily-dedup shape, multimodal face): decode + dHash the
    * indexed images ONCE, write the exploded band-key rows PARTITIONED
    * BY band index. Every subsequent ingest batch probes this artifact
    * off parquet — nothing about the existing corpus is re-decoded,
    * the property that makes daily image ingest O(new) at 100 TB. */
  private[graft] def phashIndexDir(s: SparkSession, dir: String): String =
    sessionPhashIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_phash_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val old = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) < PhashProbeNewMin)
        .select(col("doc_id"))
      val h = Multimodal
        .imageDHashBands(Multimodal.ingestSynthVariantImages(old))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
      explodeBandKeys(h)
        .write.mode("overwrite").partitionBy("j").parquet(s"$out/bands")
      out
    }

  private val sessionPhashLsm = new graft.SessionMemo[String, String]

  /** q169's batch split of the NEW corpus (doc_id % 5 >= 3): EVEN new
    * ids are the EARLIER ingest batch that GRADUATES into the index,
    * ODD new ids the later batch that probes it. Parity is the right
    * carve on this fixture: planted new+new variant pairs are
    * consecutive ids (the two % 5 ∈ {3,4} members of a variant
    * group), so every one of them spans the two batches — the
    * graduated arm is exercised by construction, and a silently
    * failed graduation turns every n_dup_graduated to 0 and flips the
    * oracle red. */
  val PhashLsmBatchMod = 2L

  /** q178's takedown carve: SERVING docs (old corpus or the graduated
    * batch) with `doc_id % TakedownMod == TakedownRem` are deleted
    * from the image index after graduation. The carve hits both
    * partner classes (1-in-7 of each side), so the query is sensitive
    * to a takedown that silently fails on either the store's own rows
    * or the static artifact's shadowing. */
  val TakedownMod = 7L
  val TakedownRem = 3L

  /** Ceiling on the resolved takedown set's ROW COUNT up to which the
    * static-shadow anti-joins broadcast it; past it the hint is
    * withheld and the planner runs a shuffle anti-join — the media
    * face of [[graft.search.AnnIndex.TombstoneBroadcastMaxBytes]]
    * (same failure mode: an unconditional broadcast of a monotonically
    * growing delete set is a driver OOM waiting for a takedown-heavy
    * corpus). The vector side measured the broadcast/sort-merge
    * crossover at ~2.5 M scattered long ids
    * (`bench/tombstone_probe_r15.json`); the media set is the same
    * shape (one long doc_id per taken-down item), so the ceiling sits
    * just under that crossover, re-validated by the media takedown
    * probe receipt (`bench/takedown_probe_r16.json`: answers
    * bit-identical per tier 100 k→10 M, broadcast flat through 1 M). */
  val TakedownBroadcastMaxRows: Long = 2000000L

  /** The static-shadow anti-join's build-side hint for a takedown set
    * whose size is bounded by `markerRowCap`: `broadcast` under
    * [[TakedownBroadcastMaxRows]], identity past it. The cap is the
    * store's RAW marker-row count (pre-last-writer-wins, so an upper
    * bound on the resolved set) — one partition-pruned count of the
    * `j = 0` segment slice with the `_del` predicate pushed down,
    * paid once per probe; a store with no lifecycle column caps at 0
    * without running a job. */
  private def takedownHint(markerRowCap: Long): DataFrame => DataFrame =
    if (markerRowCap <= TakedownBroadcastMaxRows) broadcast(_) else identity

  /** RAW marker-row upper bound for [[takedownHint]]: the un-resolved
    * `_del` rows in the store's anchor slice (`key2 = 0`). */
  private[graft] def markerRowCap(raw: DataFrame, key2: String): Long =
    if (!raw.columns.contains("_del")) 0L
    else raw.filter(col("_del") && col(key2) === 0).count()

  private val sessionMarkerCaps = new graft.ListingMemo[Long]

  /** [[markerRowCap]] memoized per RESOLVED SEGMENT SET: segment dirs
    * are immutable and the manifest names the set, so the count is a
    * pure function of the listing — a store that hasn't changed since
    * the last probe pays NO count job (the per-probe overhead the
    * round-16 bench measured at ~0.3 s), and any append or fold
    * changes the listing and REPLACES the store's one entry
    * ([[graft.ListingMemo]] — O(stores) driver memory on an
    * indefinitely-running maintenance loop, never O(mutations)). The
    * listing itself is filesystem metadata (no job). */
  private def markerRowCapCached(s: SparkSession, storeDir: String,
                                 key2: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val segs = graft.sources.SegmentStore.segments(fs, storeDir)
    if (segs.isEmpty) 0L
    else sessionMarkerCaps.getOrCompute(s, s"$key2|$storeDir",
        segs.mkString(";")) {
      markerRowCap(
        segs.map(s.read.parquet(_)).reduce(_.unionByName(_)), key2)
    }
  }

  /** MAJOR REBUILD of a band index's STATIC table — the media twin of
    * [[graft.search.AnnIndex.majorCompact]] (round-15 verdict "What's
    * missing #2": markers shadowing the immutable static artifact
    * survived every routine fold by design, so the shadow set grew
    * without bound on a takedown-heavy corpus). The fold writes
    * EXACTLY what the lifecycle probe serves — static ∖ taken-down ∪
    * the store's LIVE data rows under (doc_id, key2)
    * last-writer-wins — into a FRESH static generation `outDir`:
    * taken-down rows are PHYSICALLY absent (no marker needed to
    * shadow them), graduated rows are static now, and the store that
    * fed the fold is spent — the caller starts a fresh one, exactly
    * like the vector fold's empty next-epoch delta. Write-only with
    * mode=overwrite (crash-rerun idempotent); the serving swap is the
    * caller's pointer discipline (the declared queries write one
    * generation per fixture, a production root swaps a pointer the
    * way [[graft.search.AnnIndex.ServingRoot]] does). Post-rebuild
    * probes equal pre-rebuild lifecycle probes BY CONSTRUCTION —
    * q182/q183/q184 pin it against the pixel/sample-formula oracles. */
  private[graft] def bandStaticRebuild(s: SparkSession, staticDir: String,
                                       storeDir: String, outDir: String,
                                       key2: String): Unit = {
    val static = s.read.parquet(staticDir)
    val raw = graft.sources.SegmentStore.read(s, storeDir)
    val withDel =
      if (raw.columns.contains("_del")) raw
      else raw.withColumn("_del", lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"), col(key2))
      .orderBy(col(graft.sources.SegmentStore.BatchCol).desc)
    val lww = withDel
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    val takenDown = lww.filter(col("_del") && col(key2) === 0)
      .select(col("doc_id"))
    val cols = static.columns.toSeq
    static
      .join(takedownHint(markerRowCapCached(s, storeDir, key2))(takenDown),
        Seq("doc_id"), "left_anti")
      .unionByName(lww.filter(!col("_del")).select(cols.map(col): _*))
      .repartition(col(key2))
      .write.mode("overwrite").partitionBy(key2).parquet(outDir)
  }

  /** Band-store DATA rows: exploded composed keys + the lifecycle
    * column (`_del = false`). Every single-table band store writes
    * this layout so takedown markers can ride the SAME store under
    * the same (doc_id, j) last-writer-wins rule. */
  private[graft] def bandStoreRows(h: DataFrame): DataFrame =
    explodeBandKeys(h).withColumn("_del", lit(false))

  /** Takedown MARKERS — the media face of the vector index's id-only
    * tombstones ([[graft.search.AnnIndex.appendTombstones]]), here as
    * in-store delete rows (the classic LSM delete marker): per deleted
    * doc one row PER BAND INDEX (all four — a marker must shadow every
    * exploded key row of the doc) with null key/payload columns and
    * `_del = true`. Under the store's (doc_id, j) last-writer-wins
    * fold a marker newer than a data row physically DROPS that row at
    * the next routine compaction (no separate major fold needed),
    * while the marker itself survives to shadow the immutable static
    * artifact's rows; a later re-ingest outranks the marker and serves
    * again — and the fold then drops the marker too. Null `v` keeps
    * markers out of every candidate equi-join by construction. */
  private[graft] def bandTakedownMarkers(ids: DataFrame): DataFrame = {
    val nl = lit(null).cast("long")
    ids.select(col("doc_id"),
        explode(array((0 until 4).map(j => lit(j)): _*)).as("j"))
      .select(Seq(col("doc_id"), col("j"), nl.as("v"), nl.as("m")) ++
        (0 until 4).map(j => nl.as(s"band$j")) ++
        (0 until 4).map(j => nl.as(s"qt$j")) :+ lit(true).as("_del"): _*)
  }

  /** Session-once GRADUATION of the earlier ingest batch (even new
    * ids) into a [[graft.sources.SegmentStore]] next to a static band
    * artifact — the media face of the IVF-PQ delta's LSM maintenance,
    * shared by every single-table modality: the batch's band-key rows
    * (decoded once, off the modality's session cache) are appended as
    * an immutable live segment and compacted into a manifest-published
    * generation (compactEvery = 1, so the one-shot query exercises
    * the full fold + publish + GC path). Later batches probe static ∪
    * store without re-decoding anything already indexed — O(new)
    * decode forever, not just until the next full rebuild. ONE recipe:
    * a carve constant or store-layout change edits exactly one site
    * for every modality. */
  private def bandLsmDir(s: SparkSession, memo: graft.SessionMemo[String, String],
                         prefix: String, dir: String,
                         newBatchBands: (SparkSession, String) => DataFrame,
                         familyTag: String): String =
    memo.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/$prefix" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val b1 = newBatchBands(s, dir)
        .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 0)
      graft.sources.SegmentStore.ensureFormat(
        org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration), out, familyTag)
      graft.sources.SegmentStore.appendBatch(s, out, bandStoreRows(b1),
        batchId = 0L, compactEvery = 1,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
      out
    }

  private val sessionPhashTakedown = new graft.SessionMemo[String, String]
  private val sessionAfpTakedown = new graft.SessionMemo[String, String]

  /** The q178/q180 store recipe, ONE definition for every single-table
    * modality: [[bandLsmDir]]'s graduation (batch 0) FOLLOWED by a
    * takedown batch (batch 1) of delete markers for the carve's
    * serving docs — old-corpus AND graduated ids alike — with
    * compactEvery = 1 so the marker batch's fold runs: the taken-down
    * graduated rows are PHYSICALLY absent from the published
    * generation (last-writer-wins dropped them), while the markers
    * survive to shadow the static artifact at probe time. */
  private def bandTakedownLsmDir(s: SparkSession,
                                 memo: graft.SessionMemo[String, String],
                                 prefix: String, dir: String,
                                 newBatchBands: (SparkSession, String) => DataFrame,
                                 familyTag: String): String =
    memo.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/$prefix" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val b1 = newBatchBands(s, dir)
        .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 0)
      graft.sources.SegmentStore.ensureFormat(
        org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration), out, familyTag)
      graft.sources.SegmentStore.appendBatch(s, out, bandStoreRows(b1),
        batchId = 0L, compactEvery = 1,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
      val serving = graft.SparkEntry.tbl(s, dir, "documents")
        .select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) < PhashProbeNewMin ||
          pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 0)
      graft.sources.SegmentStore.appendBatch(s, out,
        bandTakedownMarkers(serving.filter(
          pmod(col("doc_id"), lit(TakedownMod)) === TakedownRem)),
        batchId = 1L, compactEvery = 1,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
      out
    }

  private[graft] def phashTakedownLsmDir(s: SparkSession, dir: String): String =
    bandTakedownLsmDir(s, sessionPhashTakedown, "graft_phash_takedown_",
      dir, phashNewBatchBands, ImageBandFamily)

  /** [[phashTakedownLsmDir]]'s AUDIO face — the q180 store. */
  private[graft] def afpTakedownLsmDir(s: SparkSession, dir: String): String =
    bandTakedownLsmDir(s, sessionAfpTakedown, "graft_afp_takedown_",
      dir, afpNewBatchBands, AudioBandFamily)

  /** The NEW ingest batch (doc_id % 5 >= 3), fingerprinted and
    * session-cached — each modality's expensive decode runs once per
    * session, feeding both its probe (q158/q167/q168) and its
    * graduation (q169/q170/q171). */
  private def newBatchBandsView(s: SparkSession, dir: String, cacheKey: String,
                                fingerprint: DataFrame => DataFrame): DataFrame =
    graft.SparkEntry.cachedView(s, cacheKey + graft.SparkEntry.pathSlug(dir)) {
      fingerprint(graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) >= PhashProbeNewMin)
        .select(col("doc_id")))
    }

  private[graft] def phashLsmDir(s: SparkSession, dir: String): String =
    bandLsmDir(s, sessionPhashLsm, "graft_phash_lsm_", dir,
      phashNewBatchBands, ImageBandFamily)

  private[graft] def phashNewBatchBands(s: SparkSession, dir: String): DataFrame =
    newBatchBandsView(s, dir, "graft_cache_phash_newbatch_", docs =>
      Multimodal.imageDHashBands(Multimodal.ingestSynthVariantImages(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3")))

  private val sessionAfpLsm = new graft.SessionMemo[String, String]

  /** [[phashLsmDir]]'s AUDIO face — [[bandLsmDir]] over the delta-sign
    * fingerprint, next to the static q167 artifact. */
  private[graft] def afpLsmDir(s: SparkSession, dir: String): String =
    bandLsmDir(s, sessionAfpLsm, "graft_afp_lsm_", dir,
      afpNewBatchBands, AudioBandFamily)

  private def afpNewBatchBands(s: SparkSession, dir: String): DataFrame =
    newBatchBandsView(s, dir, "graft_cache_afp_newbatch_", docs =>
      Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(docs))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3")))

  private val sessionAfpIndex = new graft.SessionMemo[String, String]

  /** Session-once persisted delta-sign fingerprint band index of the
    * OLD audio corpus — [[phashIndexDir]]'s audio twin: decode +
    * fingerprint the indexed clips ONCE, write the exploded band-key
    * rows PARTITIONED BY band index; every ingest batch probes the
    * artifact off parquet (q167). */
  private[graft] def afpIndexDir(s: SparkSession, dir: String): String =
    sessionAfpIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_afp_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val old = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) < PhashProbeNewMin)
        .select(col("doc_id"))
      val h = Multimodal
        .audioFingerprintBands(Multimodal.ingestSynthVariantAudio(old))
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"), col("qt0"), col("qt1"), col("qt2"), col("qt3"))
      explodeBandKeys(h)
        .write.mode("overwrite").partitionBy("j").parquet(s"$out/bands")
      out
    }

  private val sessionVphashLsm = new graft.SessionMemo[String, String]

  /** [[phashLsmDir]]'s VIDEO face — TWO [[graft.sources.SegmentStore]]s
    * because the q168 artifact is two tables: the earlier clip batch's
    * frame-0 anchor band keys (+ frame count) graduate into
    * `f0bands` (partitioned by band index — the candidate side) and
    * its full per-frame hash rows into `frames` (partitioned by frame
    * index — the aligned-Hamming verify side). One decode feeds both
    * appends (the shared session cache); the fold + manifest publish
    * is the same discipline per table. */
  private[graft] def vphashLsmDir(s: SparkSession, dir: String): String =
    sessionVphashLsm.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_vphash_lsm_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val b1 = vphNewBatchBands(s, dir)
        .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 0)
      val f0 = b1.filter(col("frame_idx") === 0)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      graft.sources.SegmentStore.ensureFormat(fs, s"$out/f0bands", VideoBandFamily)
      graft.sources.SegmentStore.ensureFormat(fs, s"$out/frames", VideoBandFamily)
      graft.sources.SegmentStore.appendBatch(s, s"$out/f0bands",
        explodeVideoAnchorKeys(f0.drop("frame_idx")),
        batchId = 0L, compactEvery = 1,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
      graft.sources.SegmentStore.appendBatch(s, s"$out/frames", b1,
        batchId = 0L, compactEvery = 1,
        partitionCol = "frame_idx", dedupKeys = Seq("doc_id", "frame_idx"))
      out
    }

  /** The NEW clip batch's per-frame hash bands — [[newBatchBandsView]]
    * with the video fingerprint (per-frame rows, so q171's anchor and
    * verify sides both derive from the one cached decode). */
  private def vphNewBatchBands(s: SparkSession, dir: String): DataFrame =
    newBatchBandsView(s, dir, "graft_cache_vph_newbatch_", docs =>
      Multimodal.videoFrameDHashBands(Multimodal.ingestSynthVariantVideo(docs))
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          col("band0"), col("band1"), col("band2"), col("band3"),
          col("qt0"), col("qt1"), col("qt2"), col("qt3")))

  private val sessionVphashIndex = new graft.SessionMemo[String, String]

  /** Session-once persisted video hash index of the OLD clip corpus —
    * [[phashIndexDir]]'s video twin, TWO tables because temporal
    * alignment needs more than the anchor keys: `f0bands` (frame-0
    * band keys + n_frames, exploded, PARTITIONED BY band index — the
    * candidate side) and `frames` (every frame's 4 bands — the
    * aligned-Hamming verify side). Decode runs once at build; every
    * ingest batch probes both tables off parquet (q168). */
  private[graft] def vphashIndexDir(s: SparkSession, dir: String): String =
    sessionVphashIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_vphash_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val old = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) < PhashProbeNewMin)
        .select(col("doc_id"))
      val fh = Multimodal
        .videoFrameDHashBands(Multimodal.ingestSynthVariantVideo(old))
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          col("band0"), col("band1"), col("band2"), col("band3"),
          col("qt0"), col("qt1"), col("qt2"), col("qt3"))
      fh.write.mode("overwrite").parquet(s"$out/frames")
      // f0bands derives from the frames table JUST WRITTEN, not from
      // fh's lineage: re-evaluating fh here would re-decode the whole
      // old GIF corpus once per reference — the build must pay exactly
      // one decode pass
      val f0 = s.read.parquet(s"$out/frames").filter(col("frame_idx") === 0)
      explodeVideoAnchorKeys(f0.drop("frame_idx"))
        .write.mode("overwrite").partitionBy("j").parquet(s"$out/f0bands")
      out
    }

  /** q171/q181's shared probe: the later clip batch against static ∪
    * store on frame-0 anchor keys (equal frame counts +
    * first-agreeing-band claim) with q157's exact aligned-Hamming
    * verify — LIFECYCLE-AWARE on both store tables: rows resolve
    * last-writer-wins per their key, surviving DELETE markers name
    * the taken-down docs, live data rows serve, and the static
    * artifact's two tables are shadowed by one broadcast anti-join.
    * A store without the lifecycle column (or without markers) makes
    * all of that a no-op — q171 and q181 are the same plan family. */
  private[graft] def vphashGraduationProbe(s: SparkSession, dir: String,
                                    lsm: String): DataFrame = {
    val idx = vphashIndexDir(s, dir)
    val b2 = vphNewBatchBands(s, dir)
      .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1)
    // both tables' band bits are interpreted under the video family
    locally {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      graft.sources.SegmentStore.requireFormat(fs, s"$lsm/f0bands", VideoBandFamily)
      graft.sources.SegmentStore.requireFormat(fs, s"$lsm/frames", VideoBandFamily)
    }
    def lifecycled(storeDir: String,
                   key2: String): (DataFrame, DataFrame, DataFrame => DataFrame) = {
      val raw = graft.sources.SegmentStore.read(s, storeDir)
      val withDel =
        if (raw.columns.contains("_del")) raw
        else raw.withColumn("_del", lit(false))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"), col(key2))
        .orderBy(col(graft.sources.SegmentStore.BatchCol).desc)
      val lww = withDel
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
      (lww.filter(!col("_del")),
        lww.filter(col("_del") && col(key2) === 0).select(col("doc_id")),
        takedownHint(markerRowCapCached(s, storeDir, key2)))
    }
    val (f0Live, takenDown, shadowHint) = lifecycled(s"$lsm/f0bands", "j")
    val (frLive, _, _) = lifecycled(s"$lsm/frames", "frame_idx")
    val nx = explodeVideoAnchorKeys(b2.filter(col("frame_idx") === 0))
      .select(col("doc_id").as("nid"), col("j"), col("v"),
        col("k0").as("a0"), col("k1").as("a1"),
        col("k2").as("a2"), col("k3").as("a3"),
        col("n_frames").as("nfa"))
    def pbSide(df: DataFrame, grad: Boolean) = df.select(
      col("doc_id").as("pid"), lit(grad).as("graduated"),
      col("j"), col("v"),
      col("k0").as("b0"), col("k1").as("b1"),
      col("k2").as("b2"), col("k3").as("b3"),
      col("n_frames").as("nfb"))
    val pb = pbSide(s.read.parquet(s"$idx/f0bands")
        .join(shadowHint(takenDown), Seq("doc_id"), "left_anti"), grad = false)
      .unionByName(pbSide(f0Live, grad = true))
    val cand = nx.join(pb, Seq("j", "v"))
      .filter(col("nfa") === col("nfb") && noEarlierAgree)
      .select(col("nid"), col("pid"), col("graduated"))
    val na = b2.select(col("doc_id").as("nid"), col("frame_idx"),
      col("band0").as("a0"), col("band1").as("a1"),
      col("band2").as("a2"), col("band3").as("a3"))
    def pfSide(df: DataFrame) = df.select(
      col("doc_id").as("pid"), col("frame_idx"),
      col("band0").as("b0"), col("band1").as("b1"),
      col("band2").as("b2"), col("band3").as("b3"))
    val pf = pfSide(s.read.parquet(s"$idx/frames")
        .join(shadowHint(takenDown), Seq("doc_id"), "left_anti"))
      .unionByName(pfSide(frLive))
    val dups = cand.join(na, Seq("nid")).join(pf, Seq("pid", "frame_idx"))
      .groupBy(col("nid"), col("pid"), col("graduated"))
      .agg(sum(bandHamming).as("hamming"))
      .filter(col("hamming") <= lit(VphashMaxHamming))
      .groupBy(col("nid"))
      .agg(
        sum(when(!col("graduated"), 1L).otherwise(0L)).cast("long").as("n_dup_old"),
        sum(when(col("graduated"), 1L).otherwise(0L)).cast("long").as("n_dup_graduated"))
    acceptFrame(b2.select(col("doc_id")).distinct(), dups,
      Seq("n_dup_old", "n_dup_graduated"))
  }

  private val sessionVphashTakedown = new graft.SessionMemo[String, String]

  /** q181's store pair — [[vphashLsmDir]]'s graduation followed by a
    * takedown batch of delete markers in BOTH tables (anchor markers
    * per (doc_id, band index) with null keys; frame markers per
    * (doc_id, frame index 0..[[Multimodal.VideoMaxFrames]]) with null
    * hashes — markers past a clip's real frame count shadow nothing
    * and cost nothing), compactEvery = 1 so the marker folds run:
    * the taken-down clip's rows are PHYSICALLY absent from both
    * published generations, the anchor markers survive to shadow the
    * static artifact. */
  private[graft] def vphashTakedownLsmDir(s: SparkSession, dir: String): String =
    sessionVphashTakedown.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_vphash_takedown_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val b1 = vphNewBatchBands(s, dir)
        .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 0)
      val f0 = b1.filter(col("frame_idx") === 0)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      graft.sources.SegmentStore.ensureFormat(fs, s"$out/f0bands", VideoBandFamily)
      graft.sources.SegmentStore.ensureFormat(fs, s"$out/frames", VideoBandFamily)
      graft.sources.SegmentStore.appendBatch(s, s"$out/f0bands",
        explodeVideoAnchorKeys(f0.drop("frame_idx"))
          .withColumn("_del", lit(false)),
        batchId = 0L, compactEvery = 1,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
      graft.sources.SegmentStore.appendBatch(s, s"$out/frames",
        b1.withColumn("_del", lit(false)),
        batchId = 0L, compactEvery = 1,
        partitionCol = "frame_idx", dedupKeys = Seq("doc_id", "frame_idx"))
      val nl = lit(null).cast("long")
      val dels = graft.SparkEntry.tbl(s, dir, "documents")
        .select(col("doc_id"))
        .filter((pmod(col("doc_id"), lit(PhashProbeNewMod)) < PhashProbeNewMin ||
          pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 0) &&
          pmod(col("doc_id"), lit(TakedownMod)) === TakedownRem)
      graft.sources.SegmentStore.appendBatch(s, s"$out/f0bands",
        dels.select(col("doc_id"),
            explode(array((0 until 4).map(j => lit(j)): _*)).as("j"))
          .select(col("doc_id"), col("j"), nl.as("v"), nl.as("n_frames"),
            nl.as("k0"), nl.as("k1"), nl.as("k2"), nl.as("k3"),
            lit(true).as("_del")),
        batchId = 1L, compactEvery = 1,
        partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
      graft.sources.SegmentStore.appendBatch(s, s"$out/frames",
        dels.select(col("doc_id"),
            explode(array((0 until Multimodal.VideoMaxFrames)
              .map(f => lit(f.toLong)): _*)).as("frame_idx"))
          .select(Seq(col("doc_id"), col("frame_idx"), nl.as("n_frames")) ++
            (0 until 4).map(j => nl.as(s"band$j")) ++
            (0 until 4).map(j => nl.as(s"qt$j")) :+
            lit(true).as("_del"): _*),
        batchId = 1L, compactEvery = 1,
        partitionCol = "frame_idx", dedupKeys = Seq("doc_id", "frame_idx"))
      out
    }

  /** When a band index's STATIC REBUILD becomes due on marker mass
    * alone: live delete markers cost every probe's shadow anti-join
    * and the store's disk until a rebuild drops the shadowed rows
    * physically ([[bandStaticRebuild]]) — the media twin of
    * [[graft.queries.AnnQueries.TombstoneFoldRows]], sitting at the
    * same point of the measured-flat broadcast region (the media
    * shadow join is flat through ~1 M marker rows and gracefully
    * degraded — not broken — at 10 M, `bench/takedown_probe_r16.json`),
    * two× under [[TakedownBroadcastMaxRows]]. ACTUATED by
    * [[bandRebuildIfMarkersDue]]. */
  val MediaRebuildMarkerRows = 1000000L

  /** Bit-family format tags ([[graft.sources.SegmentStore.FormatFile]])
    * stamped into every media segment store and serving root at
    * creation and verified by every writer and probe: band bits are
    * schema-invisible (aHash and dHash bands are both four longs), so
    * without the stamp a checkpoint-resumed ingest that survived a
    * family migration would silently mix families in one store and
    * band equi-joins between old and new rows would quietly miss
    * near-dups. Bump the suffix on any bit-rule change — the mismatch
    * then fails loudly at resume/probe time instead. */
  val ImageBandFamily = "image-bands/dhash-v1"
  /** [[ImageBandFamily]]'s audio face (delta-sign fingerprint bits). */
  val AudioBandFamily = "audio-bands/afp-v1"
  /** [[ImageBandFamily]]'s video face — dHash frame bits since the
    * round-18 adoption (`bench/vdhash_probe_r17.json`); stamped on
    * BOTH of the two-table store's tables. */
  val VideoBandFamily = "video-bands/dhash-v1"

  /** A band index under the SERVING-ROOT pointer discipline — the
    * vector index's [[graft.search.AnnIndex.ServingRoot]] layout
    * REUSED verbatim for media statics (the pointer machinery is not
    * vector-specific; only the fold is):
    *
    *  - `epoch_<e>/bands`  — one immutable static band generation;
    *  - `epoch_<e>_delta/` — the [[graft.sources.SegmentStore]]
    *    accumulating graduations and takedown markers AGAINST it;
    *  - `current_e<e>`     — the atomic checked-rename pointer.
    *
    * [[mediaRootInit]] seeds generation 0 from an existing static
    * artifact; [[bandRebuildPublish]] is the media
    * `majorFoldPublish`: [[bandStaticRebuild]] into epoch e+1 →
    * pointer publish → grace-GC epoch e−1 — a prober that resolved
    * pre-publish keeps its full snapshot (store and markers
    * included), post-publish probers read the clean generation with
    * an EMPTY store. */
  private[graft] def mediaRootInit(s: SparkSession, staticBandsDir: String,
                                   rootDir: String,
                                   familyTag: String): Unit = {
    import graft.search.AnnIndex.ServingRoot
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    require(ServingRoot.currentEpoch(fs, rootDir).isEmpty,
      s"media root $rootDir already has a published epoch")
    // the root-level family stamp every generation under this pointer
    // inherits: probers and resumed maintainers verify against it, so
    // a bit-family migration can never silently mix generations
    graft.sources.SegmentStore.ensureFormat(fs, rootDir, familyTag)
    s.read.parquet(staticBandsDir)
      .repartition(col("j"))
      .write.mode("overwrite").partitionBy("j")
      .parquet(s"${ServingRoot.indexDir(rootDir, 0L)}/bands")
    ServingRoot.publish(fs, rootDir, 0L)
  }

  /** The media `majorFoldPublish`: rebuild the current generation's
    * static ∖ taken-down ∪ store live rows into epoch e+1, publish
    * the pointer, grace-GC epoch e−1. Returns the new epoch. Same
    * single-writer contract as the vector fold: the caller sequences
    * rebuilds against the store's writers. */
  private[graft] def bandRebuildPublish(s: SparkSession,
                                        rootDir: String): Long = {
    import graft.search.AnnIndex.ServingRoot
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val e = ServingRoot.currentEpoch(fs, rootDir).getOrElse(
      throw new IllegalStateException(s"media root $rootDir has no published epoch"))
    bandStaticRebuild(s, s"${ServingRoot.indexDir(rootDir, e)}/bands",
      ServingRoot.deltaDir(rootDir, e),
      s"${ServingRoot.indexDir(rootDir, e + 1)}/bands", "j")
    ServingRoot.publish(fs, rootDir, e + 1)
    if (e > 0) {
      fs.delete(new org.apache.hadoop.fs.Path(
        ServingRoot.indexDir(rootDir, e - 1)), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        ServingRoot.deltaDir(rootDir, e - 1)), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$rootDir/current_e${e - 1}"), false)
    }
    e + 1
  }

  /** The [[MediaRebuildMarkerRows]] trigger, ACTUATED — the media
    * twin of [[graft.search.AnnIndex.foldIfTombstonesDue]]: rebuild
    * and publish when the current generation's store carries more raw
    * marker rows than `maxRows` (the raw count upper-bounds the
    * resolved set, so replay inflation rebuilds early, never late).
    * @return Some(newEpoch) when the rebuild ran. */
  private[graft] def bandRebuildIfMarkersDue(s: SparkSession, rootDir: String,
      maxRows: Long = MediaRebuildMarkerRows): Option[Long] = {
    import graft.search.AnnIndex.ServingRoot
    val (_, storeDir) = ServingRoot.resolve(s, rootDir)
    // memoized per segment listing — an actuation check against an
    // unchanged store runs zero jobs (a streaming ingest checks every
    // batch; only batches that changed the store pay the count)
    if (markerRowCapCached(s, storeDir, "j") <= maxRows) None
    else Some(bandRebuildPublish(s, rootDir))
  }

  /** Probe a band index THROUGH its root: resolve the pointer (one
    * atomic read), then the lifecycle probe against the resolved
    * (static, store) pair — or the store-less [[rebuiltBandProbe]]
    * when the generation is fresh (an empty store has nothing to
    * resolve and nothing to shadow). A rebuild racing this probe is
    * invisible: pre-publish resolvers keep their full snapshot
    * (grace GC), post-publish resolvers read the clean generation. */
  private[graft] def graduatedBandProbeRoot(s: SparkSession, rootDir: String,
      b2: DataFrame, maxHamming: Long, familyTag: String): DataFrame = {
    import graft.search.AnnIndex.ServingRoot
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    // the ROOT's family stamp (written by mediaRootInit) must agree
    // with what this prober expects before any table is interpreted
    graft.sources.SegmentStore.requireFormat(fs, rootDir, familyTag)
    val (idxDir, storeDir) = ServingRoot.resolve(s, rootDir)
    val staticBands = s.read.parquet(s"$idxDir/bands")
    if (graft.sources.SegmentStore.segments(fs, storeDir).isEmpty)
      rebuiltBandProbe(s, staticBands, b2, maxHamming)
    else graduatedBandProbe(s, staticBands, storeDir, b2, maxHamming, familyTag)
  }

  /** The TWO-TABLE (video) face of the media root: one pointer
    * governs BOTH clip-index tables — `epoch_<e>/{f0bands,frames}`
    * static generations, `epoch_<e>_delta/{f0bands,frames}` stores —
    * so anchor and frame tables can never serve from different
    * generations (the split-epoch hazard a per-table pointer would
    * invite). Rebuild folds both tables under the shared rule and
    * publishes ONE pointer; the actuator reads the anchor store's
    * marker mass (markers ride both tables for the same docs — the
    * anchor slice is the cheaper count). */
  private[graft] def vphashRootInit(s: SparkSession, idxDir: String,
                                    rootDir: String): Unit = {
    import graft.search.AnnIndex.ServingRoot
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    require(ServingRoot.currentEpoch(fs, rootDir).isEmpty,
      s"media root $rootDir already has a published epoch")
    // one family stamp governs BOTH tables under the one pointer
    graft.sources.SegmentStore.ensureFormat(fs, rootDir, VideoBandFamily)
    val e0 = ServingRoot.indexDir(rootDir, 0L)
    s.read.parquet(s"$idxDir/f0bands").repartition(col("j"))
      .write.mode("overwrite").partitionBy("j").parquet(s"$e0/f0bands")
    s.read.parquet(s"$idxDir/frames").repartition(col("frame_idx"))
      .write.mode("overwrite").partitionBy("frame_idx")
      .parquet(s"$e0/frames")
    ServingRoot.publish(fs, rootDir, 0L)
  }

  /** [[bandRebuildPublish]]'s video face: BOTH tables fold into epoch
    * e+1 before the one pointer publish — an anchor hit can never
    * verify against a different generation's frames. */
  private[graft] def vphashRebuildPublish(s: SparkSession,
                                          rootDir: String): Long = {
    import graft.search.AnnIndex.ServingRoot
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    val e = ServingRoot.currentEpoch(fs, rootDir).getOrElse(
      throw new IllegalStateException(s"media root $rootDir has no published epoch"))
    val cur = ServingRoot.indexDir(rootDir, e)
    val delta = ServingRoot.deltaDir(rootDir, e)
    val next = ServingRoot.indexDir(rootDir, e + 1)
    bandStaticRebuild(s, s"$cur/f0bands", s"$delta/f0bands",
      s"$next/f0bands", "j")
    bandStaticRebuild(s, s"$cur/frames", s"$delta/frames",
      s"$next/frames", "frame_idx")
    ServingRoot.publish(fs, rootDir, e + 1)
    if (e > 0) {
      fs.delete(new org.apache.hadoop.fs.Path(
        ServingRoot.indexDir(rootDir, e - 1)), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        ServingRoot.deltaDir(rootDir, e - 1)), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$rootDir/current_e${e - 1}"), false)
    }
    e + 1
  }

  /** [[bandRebuildIfMarkersDue]]'s video face — the trigger reads the
    * ANCHOR store's marker mass (one marker row per (doc, band);
    * frame markers track the same doc set at higher multiplicity). */
  private[graft] def vphashRebuildIfMarkersDue(s: SparkSession,
      rootDir: String,
      maxRows: Long = MediaRebuildMarkerRows): Option[Long] = {
    import graft.search.AnnIndex.ServingRoot
    val (_, delta) = ServingRoot.resolve(s, rootDir)
    // memoized per segment listing, as bandRebuildIfMarkersDue
    if (markerRowCapCached(s, s"$delta/f0bands", "j") <= maxRows) None
    else Some(vphashRebuildPublish(s, rootDir))
  }

  private val sessionPhashRebuild = new graft.SessionMemo[String, String]
  private val sessionAfpRebuild = new graft.SessionMemo[String, String]
  private val sessionVphashRebuild = new graft.SessionMemo[String, String]

  /** Session-once REBUILD of the image static band artifact from the
    * q178 takedown store ([[bandStaticRebuild]]): the rebuilt
    * generation physically lacks the taken-down docs, carries the
    * surviving graduated rows as static, and leaves ZERO live
    * markers — the q182 probe runs against it ALONE. */
  private[graft] def phashRebuildDir(s: SparkSession, dir: String): String =
    sessionPhashRebuild.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_phash_rebuild_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      bandStaticRebuild(s, s"${phashIndexDir(s, dir)}/bands",
        phashTakedownLsmDir(s, dir), s"$out/bands", "j")
      out
    }

  /** [[phashRebuildDir]]'s AUDIO face — the q183 artifact. */
  private[graft] def afpRebuildDir(s: SparkSession, dir: String): String =
    sessionAfpRebuild.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_afp_rebuild_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      bandStaticRebuild(s, s"${afpIndexDir(s, dir)}/bands",
        afpTakedownLsmDir(s, dir), s"$out/bands", "j")
      out
    }

  /** [[phashRebuildDir]]'s VIDEO face — BOTH clip-index tables fold
    * under the same rule (anchor keys per (doc_id, band index),
    * frame hashes per (doc_id, frame index)) — the q184 artifact. */
  private[graft] def vphashRebuildDir(s: SparkSession, dir: String): String =
    sessionVphashRebuild.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_vphash_rebuild_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val idx = vphashIndexDir(s, dir)
      val lsm = vphashTakedownLsmDir(s, dir)
      bandStaticRebuild(s, s"$idx/f0bands", s"$lsm/f0bands",
        s"$out/f0bands", "j")
      bandStaticRebuild(s, s"$idx/frames", s"$lsm/frames",
        s"$out/frames", "frame_idx")
      out
    }

  /** The POST-REBUILD probe shared by q182/q183: the later batch
    * against the rebuilt static ALONE — no store read, no marker
    * shadow, ONE partner class (old and graduated merged into the
    * fresh generation). Must equal the pre-rebuild lifecycle answer
    * with its two counts summed — the oracle recomputes the partner
    * set (old ∪ graduated, carve excluded) from the media formulas,
    * so a rebuild that resurrects a taken-down doc, drops a graduated
    * row, or leaves a marker shadowing turns it red. */
  private[graft] def rebuiltBandProbePub(s: SparkSession,
      rebuiltBands: DataFrame, b2: DataFrame, maxHamming: Long): DataFrame =
    rebuiltBandProbe(s, rebuiltBands, b2, maxHamming)

  private def rebuiltBandProbe(s: SparkSession, rebuiltBands: DataFrame,
                               b2: DataFrame, maxHamming: Long): DataFrame = {
    val nx = explodeBandKeys(b2)
      .toDF("nid", "j", "v", "m",
        "a0", "a1", "a2", "a3", "am0", "am1", "am2", "am3")
    val pb = rebuiltBands.select(col("doc_id").as("pid"),
      col("j"), col("v"), col("m"),
      col("band0").as("b0"), col("band1").as("b1"),
      col("band2").as("b2"), col("band3").as("b3"),
      col("qt0").as("bm0"), col("qt1").as("bm1"),
      col("qt2").as("bm2"), col("qt3").as("bm3"))
    val dups = nx.join(pb, Seq("j", "v", "m"))
      .filter(noEarlierAgreeM)
      .filter(bandHamming <= lit(maxHamming))
      .groupBy(col("nid"))
      .agg(count(lit(1)).cast("long").as("n_dup"))
    acceptFrame(b2.select(col("doc_id")), dups, Seq("n_dup"))
  }

  /** q184's probe: [[rebuiltBandProbe]]'s VIDEO face — frame-0 anchor
    * candidacy (composed keys + equal frame counts) against the
    * rebuilt `f0bands`, exact aligned Hamming against the rebuilt
    * `frames`, one partner class. */
  private[graft] def rebuiltVphashProbe(s: SparkSession, dir: String,
                                 rebuilt: String): DataFrame = {
    val b2 = vphNewBatchBands(s, dir)
      .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1)
    val nx = explodeVideoAnchorKeys(b2.filter(col("frame_idx") === 0))
      .select(col("doc_id").as("nid"), col("j"), col("v"),
        col("k0").as("a0"), col("k1").as("a1"),
        col("k2").as("a2"), col("k3").as("a3"),
        col("n_frames").as("nfa"))
    val pb = s.read.parquet(s"$rebuilt/f0bands")
      .select(col("doc_id").as("pid"), col("j"), col("v"),
        col("k0").as("b0"), col("k1").as("b1"),
        col("k2").as("b2"), col("k3").as("b3"),
        col("n_frames").as("nfb"))
    val cand = nx.join(pb, Seq("j", "v"))
      .filter(col("nfa") === col("nfb") && noEarlierAgree)
      .select(col("nid"), col("pid"))
    val na = b2.select(col("doc_id").as("nid"), col("frame_idx"),
      col("band0").as("a0"), col("band1").as("a1"),
      col("band2").as("a2"), col("band3").as("a3"))
    val pf = s.read.parquet(s"$rebuilt/frames")
      .select(col("doc_id").as("pid"), col("frame_idx"),
        col("band0").as("b0"), col("band1").as("b1"),
        col("band2").as("b2"), col("band3").as("b3"))
    val dups = cand.join(na, Seq("nid")).join(pf, Seq("pid", "frame_idx"))
      .groupBy(col("nid"), col("pid"))
      .agg(sum(bandHamming).as("hamming"))
      .filter(col("hamming") <= lit(VphashMaxHamming))
      .groupBy(col("nid"))
      .agg(count(lit(1)).cast("long").as("n_dup"))
    acceptFrame(b2.select(col("doc_id")).distinct(), dups, Seq("n_dup"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q24_blob_features" -> ((s, dir) => {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
      val blobs = Multimodal.ingestAsBlobs(docs)
      Multimodal.extractFeatures(blobs)
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("n_chunks"), col("byte_sum"))
        .orderBy(col("doc_id"))
    }),

    "q155_image_phash" -> ((s, dir) => {
      // perceptual-hash near-dup detection over REAL decoded images —
      // the multimodal face of the dedup family (production pipelines
      // run pHash/PDQ for near-dup image filtering; aHash/dHash are
      // the public ancestors): planted variant PNGs (groups of 3 share
      // a base image, each member perturbs one pixel) are ingested,
      // DECODED back (ImageIO, row-local), difference-hashed into
      // 4×16-bit bands (the round-17 adopted threshold-free family —
      // see PhashMaxHamming), and near-dup pairs come from the
      // SimHash-banding shape
      // — a CANONICAL band equi-join per band (a pair is claimed only
      // in its first agreeing band, so no distinct is ever needed),
      // then an exact 64-bit Hamming verify ≤ PhashMaxHamming. Every
      // shuffle is a band-key equi-join over (doc_id, 4 longs) rows;
      // blobs never move. The oracle reproduces the pixels, the bits,
      // the bands, the band rule, and the Hamming arithmetic in pure
      // integer SQL — hash-green certifies the decode round-trip AND
      // the banding semantics end to end.
      imagePhashPairs(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q159_image_survivors" -> ((s, dir) => {
      // the full image-dedup pipeline, closing the q31 shape for the
      // multimodal face: q155's verified phash pairs → connected
      // components (driver union-find below the edge cutover,
      // large-star/small-star contraction above — the same
      // Dedup.connectedComponents every text pipeline uses) → min-id
      // survivor per near-dup cluster, over ALL images. The pair set
      // is the session-cached q155 view, so decode+hash runs once for
      // both consumers; everything after it moves only (id, id) rows.
      graft.operators.Dedup.survivors(
          graft.SparkEntry.tbl(s, dir, "documents").select(col("doc_id")),
          "doc_id",
          imagePhashPairs(s, dir).select(col("doc_a"), col("doc_b")))
        .select(col("doc_id"), col("component"),
          col("is_survivor").cast("int").as("is_survivor"))
        .orderBy(col("doc_id"))
    }),

    "q161_media_health" -> ((s, dir) => {
      // the ingest health report every media pipeline runs before
      // trusting a batch: per source, how many blobs arrived, how many
      // actually DECODE, how many were quarantined, and the decoded
      // content mass. Corruption is planted deterministically (blobs
      // of doc_id % 37 == 0 truncated to 10 bytes at ingest), so the
      // oracle knows exactly which decodes must fail — hash-green
      // certifies that the quarantine policy nulls precisely the
      // corrupt blobs and decodes everything else. Row-local decode,
      // map-side-combined 20-group rollup; blobs never shuffle.
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"), col("source"))
      val blobs = Multimodal.ingestSynthVariantImages(docs)
        .withColumn("blob",
          when(pmod(col("doc_id"), lit(37L)) === 0,
            expr("substring(blob, 1, 10)")).otherwise(col("blob")))
      Multimodal.imageDHashBands(blobs)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_blobs"),
          count(col("gray_total")).as("n_ok"),
          (count(lit(1)) - count(col("gray_total"))).as("n_quarantined"),
          coalesce(sum(col("gray_total")), lit(0L)).cast("long").as("gray_mass"))
        .orderBy(col("source"))
    }),

    "q160_image_export" -> ((s, dir) => {
      // the dedup-aware export manifest for the image corpus — q68's
      // webdataset-manifest shape composed with q159's survivor
      // policy: only the canonical member of each near-dup cluster is
      // exported, shards are assigned by the dedicated portable shard
      // hash (uncorrelated with split/sample/mix membership — the q68
      // independence argument), and each shard's row carries the doc
      // count plus the decoded-pixel gray mass as the content
      // checksum a loader can verify against. Everything derives from
      // the session-cached bands view: ONE decode pass feeds q155,
      // q159, and this manifest; the survivor join and the 16-group
      // rollup move (id, long) rows only. At 100 TB the same shard
      // hash drives the actual sharded write (repartition on shard),
      // so manifest and data can never drift.
      val (a, b) = graft.functions.PortableHash.ShardPair
      val nShards = ExtraQueries.NShards
      val surv = graft.operators.Dedup.survivors(
          graft.SparkEntry.tbl(s, dir, "documents").select(col("doc_id")),
          "doc_id",
          imagePhashPairs(s, dir).select(col("doc_a"), col("doc_b")))
        .filter(col("is_survivor"))
        .select(col("doc_id"))
      surv
        .join(variantImageBands(s, dir).select(col("doc_id"), col("gray_total")),
          "doc_id")
        .withColumn("shard",
          ((lit(a) * pmod(col("doc_id"), lit(P)) + lit(b)) % lit(P)) % nShards)
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_images"),
          sum(col("gray_total")).cast("long").as("gray_mass"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))
    }),

    "q156_audio_fingerprint" -> ((s, dir) => {
      // delta-sign fingerprint near-dup detection over REAL decoded
      // audio — the audio face of the dedup family (production
      // pipelines run Haitsma–Kalker-style fingerprints for near-dup
      // audio filtering; the delta-sign bit is its public core):
      // planted variant WAV clips (groups of 3 share a base clip, each
      // member perturbs one PCM sample) are ingested, DECODED back
      // (javax.sound.sampled, row-local), fingerprinted into 4×16-bit
      // bands, and near-dup pairs come from the shared banded
      // candidate→verify shape ([[bandNearDupPairs]]). The oracle
      // reproduces the samples, the delta bits, the bands, the band
      // rule, and the Hamming arithmetic in pure integer SQL —
      // hash-green certifies the audio decode round-trip AND the
      // banding semantics end to end.
      bandNearDupPairs(variantAudioBands(s, dir), AfpMaxHamming)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q158_phash_index_probe" -> ((s, dir) => {
      // q73's daily-ingest dedup, multimodal face: the indexed
      // corpus's phash band keys are WRITTEN once per session
      // ([[phashIndexDir]] — partitioned by band index) and the new
      // ingest batch (doc_id % 5 >= 3) decodes + hashes only ITSELF,
      // then probes the artifact back off parquet: candidates are a
      // band equi-join of new keys against (index ∪ prior-new) keys,
      // claimed once via the first-agreeing-band rule, verified by
      // exact 64-bit Hamming ≤ PhashMaxHamming. Per new image the
      // probe reports duplicate counts against the old corpus and
      // against earlier new arrivals (pid < nid — the within-batch
      // order a streaming ingest would see), and an accepted flag.
      // O(new) decode work + band-key joins; the old corpus is never
      // re-decoded, blobs never shuffle. The oracle recomputes
      // everything from the pixel formulas — the artifact round-trip
      // must be invisible in the result.
      val idx = phashIndexDir(s, dir)
      val newDocs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) >= PhashProbeNewMin)
        .select(col("doc_id"))
      // session-cached like the other band views (NOT an in-query
      // .cache(): a fresh InMemoryRelation per invocation would pin
      // executor storage for the session's life, once per bench rep).
      // Keyed by dir — this engine's "new batch" is a deterministic
      // function of the fixture, so cross-invocation reuse is exact;
      // a production daily ingest would key the view by batch id.
      // Three consumers draw on it (this probe's two join arms +
      // q169's graduation): the batch must decode once per session.
      bandIndexProbe(phashNewBatchBands(s, dir),
        s.read.parquet(s"$idx/bands"), newDocs, PhashMaxHamming)
    }),

    "q169_phash_ingest_lsm" -> ((s, dir) => {
      // the GRADUATION step q158 stops short of — the media face of
      // the IVF-PQ LSM lifecycle (q150-q153): an earlier ingest batch
      // (even new doc_ids) has been folded into a SegmentStore next
      // to the static band artifact ([[phashLsmDir]] — immutable
      // per-batch segment, manifest-published compacted generation),
      // and the LATER batch (odd new ids) probes static ∪ store in
      // ONE band equi-join, so tomorrow's ingest dedups against
      // today's without anyone re-decoding or rebuilding the index.
      // Partner provenance rides the index rows (`graduated` =
      // which side served the hit), so the output CERTIFIES the
      // graduated rows actually answered: a silently empty store
      // zeroes n_dup_graduated and the oracle — which recomputes both
      // classes from the pixel formulas — turns red. Scale shape:
      // probe decode is O(batch2) (off the shared session cache),
      // candidates one equi-join on exploded (j, v) keys claimed once
      // by the first-agreeing-band rule, exact 64-bit Hamming verify;
      // within-batch2 pairs are q158's already-covered job and are by
      // declared rule NOT counted here.
      graduatedBandProbe(s,
        s.read.parquet(s"${phashIndexDir(s, dir)}/bands"),
        phashLsmDir(s, dir),
        phashNewBatchBands(s, dir)
          .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1),
        PhashMaxHamming, ImageBandFamily)
    }),

    "q170_afp_ingest_lsm" -> ((s, dir) => {
      // q169's AUDIO face — the graduation step over the delta-sign
      // fingerprint index: the earlier clip batch (even new ids) is
      // folded into a SegmentStore next to the static q167 artifact
      // ([[afpLsmDir]]), the later batch (odd new ids) probes
      // static ∪ store with partner provenance certifying the
      // graduated rows answered. Same O(new) decode + band-join
      // shape; the two modalities now share one incremental-index
      // discipline end to end (build → probe → graduate → compact).
      graduatedBandProbe(s,
        s.read.parquet(s"${afpIndexDir(s, dir)}/bands"),
        afpLsmDir(s, dir),
        afpNewBatchBands(s, dir)
          .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1),
        AfpMaxHamming, AudioBandFamily)
    }),

    "q178_phash_takedown" -> ((s, dir) => {
      // q169's probe AFTER a takedown batch — the delete lifecycle for
      // a media band index (the round-14 verdict's missing piece: the
      // vector index could unserve, a taken-down image could not).
      // Delete markers for 1-in-7 of the SERVING docs ride the q178
      // store as batch 1 ([[bandTakedownMarkers]]): the fold they
      // trigger physically drops the shadowed graduated rows
      // (last-writer-wins — no separate major fold), and the
      // surviving markers shadow the static artifact through a
      // broadcast anti-join in the probe. Same output contract as
      // q169; the oracle — which recomputes everything from the pixel
      // formulas WITH the carve excluded — turns red if a taken-down
      // partner still answers from either side, or if the takedown
      // over-deletes a serving one.
      graduatedBandProbe(s,
        s.read.parquet(s"${phashIndexDir(s, dir)}/bands"),
        phashTakedownLsmDir(s, dir),
        phashNewBatchBands(s, dir)
          .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1),
        PhashMaxHamming, ImageBandFamily)
    }),

    "q180_afp_takedown" -> ((s, dir) => {
      // q178's AUDIO face — the takedown recipe is ONE definition
      // ([[bandTakedownLsmDir]] + the lifecycle-aware probe), so
      // closing the second modality is a carve of the same machinery
      // over the delta-sign fingerprint index; the oracle recomputes
      // the WAV sample formulas with the carve excluded.
      graduatedBandProbe(s,
        s.read.parquet(s"${afpIndexDir(s, dir)}/bands"),
        afpTakedownLsmDir(s, dir),
        afpNewBatchBands(s, dir)
          .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1),
        AfpMaxHamming, AudioBandFamily)
    }),

    "q167_afp_index_probe" -> ((s, dir) => {
      // q158's O(new) ingest probe, AUDIO face (round-12 verdict
      // "What's missing #3": a daily media ingest must not
      // re-fingerprint the audio corpus per batch): the indexed
      // corpus's delta-sign fingerprint band keys are WRITTEN once per
      // session ([[afpIndexDir]], partitioned by band index), the new
      // batch (doc_id % 5 >= 3) decodes + fingerprints only ITSELF,
      // and the probe is the shared band equi-join → first-agreeing-
      // band claim → exact Hamming verify → per-clip duplicate counts
      // + accepted flag. The oracle recomputes everything from the WAV
      // sample formulas — the artifact round-trip must be invisible.
      val idx = afpIndexDir(s, dir)
      val newDocs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) >= PhashProbeNewMin)
        .select(col("doc_id"))
      bandIndexProbe(afpNewBatchBands(s, dir),
        s.read.parquet(s"$idx/bands"), newDocs, AfpMaxHamming)
    }),

    "q168_vphash_index_probe" -> ((s, dir) => {
      // q158's O(new) ingest probe, VIDEO face: candidates come from
      // the persisted FRAME-0 band keys (anchor-frame banding + equal
      // frame counts — q157's candidate rule — against index ∪
      // prior-new, claimed once by the first-agreeing-band rule), and
      // the verify is q157's exact ALIGNED Hamming over ALL frames,
      // with the partner frames read from the artifact's `frames`
      // table (old) or the batch's own decode (prior-new). The new
      // batch decodes only itself; the indexed clips are never
      // re-decoded. Per new clip: duplicate counts by partner class +
      // accepted flag; oracle recomputes everything from the GIF
      // frame formulas.
      val idx = vphashIndexDir(s, dir)
      val newDocs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .filter(pmod(col("doc_id"), lit(PhashProbeNewMod)) >= PhashProbeNewMin)
        .select(col("doc_id"))
      val nfh = vphNewBatchBands(s, dir)
      val nkeys = explodeVideoAnchorKeys(nfh.filter(col("frame_idx") === 0))
      val nx = nkeys
        .select(col("doc_id").as("nid"), col("j"), col("v"),
          col("k0").as("a0"), col("k1").as("a1"),
          col("k2").as("a2"), col("k3").as("a3"),
          col("n_frames").as("nfa"))
      val pbOld = s.read.parquet(s"$idx/f0bands")
        .select(col("doc_id").as("pid"), lit(false).as("pnew"),
          col("j"), col("v"),
          col("k0").as("b0"), col("k1").as("b1"),
          col("k2").as("b2"), col("k3").as("b3"),
          col("n_frames").as("nfb"))
      val pbNew = nkeys
        .select(col("doc_id").as("pid"), lit(true).as("pnew"),
          col("j"), col("v"),
          col("k0").as("b0"), col("k1").as("b1"),
          col("k2").as("b2"), col("k3").as("b3"),
          col("n_frames").as("nfb"))
      val cand = nx.join(pbOld.unionByName(pbNew), Seq("j", "v"))
        .filter(col("nid") =!= col("pid") &&
          (!col("pnew") || col("pid") < col("nid")) &&
          col("nfa") === col("nfb") && noEarlierAgree)
        .select(col("nid"), col("pid"), col("pnew"))
      val na = nfh.select(col("doc_id").as("nid"), col("frame_idx"),
        col("band0").as("a0"), col("band1").as("a1"),
        col("band2").as("a2"), col("band3").as("a3"))
      val pf = s.read.parquet(s"$idx/frames")
        .select(col("doc_id").as("pid"), col("frame_idx"),
          col("band0").as("b0"), col("band1").as("b1"),
          col("band2").as("b2"), col("band3").as("b3"))
        .unionByName(nfh.select(col("doc_id").as("pid"), col("frame_idx"),
          col("band0").as("b0"), col("band1").as("b1"),
          col("band2").as("b2"), col("band3").as("b3")))
      val dups = cand.join(na, Seq("nid")).join(pf, Seq("pid", "frame_idx"))
        .groupBy(col("nid"), col("pid"), col("pnew"))
        .agg(sum(bandHamming).as("hamming"))
        .filter(col("hamming") <= lit(VphashMaxHamming))
        .groupBy(col("nid"))
        .agg(
          sum(when(!col("pnew"), 1L).otherwise(0L)).cast("long").as("n_dup_old"),
          sum(when(col("pnew"), 1L).otherwise(0L)).cast("long").as("n_dup_new_prior"))
      acceptFrame(newDocs, dups, Seq("n_dup_old", "n_dup_new_prior"))
    }),

    "q171_vphash_ingest_lsm" -> ((s, dir) => {
      // q169/q170's VIDEO face — graduation over the TWO-table q168
      // artifact: the earlier clip batch's anchor keys and per-frame
      // hashes are folded into two SegmentStores next to the static
      // index ([[vphashLsmDir]]); the later batch probes static ∪
      // store on the frame-0 anchor keys (equal frame counts +
      // first-agreeing-band claim) and verifies with q157's exact
      // ALIGNED Hamming, partner frames read from static ∪ graduated
      // frames tables — no indexed clip is ever re-decoded, and
      // partner provenance certifies the graduated segments answered.
      // Within-batch pairs are q168's covered job, not counted here.
      vphashGraduationProbe(s, dir, vphashLsmDir(s, dir))
    }),

    "q181_vphash_takedown" -> ((s, dir) => {
      // q178/q180's VIDEO face — the takedown lifecycle over the
      // TWO-table clip index: delete markers ride BOTH stores (anchor
      // keys per (doc_id, band), frame hashes per (doc_id, frame)),
      // the fold physically drops the shadowed rows in each, the
      // surviving anchor markers shadow the static artifact's two
      // tables through one broadcast anti-join, and the probe is
      // q171's shape unchanged — the oracle recomputes the GIF frame
      // formulas with the carve excluded.
      vphashGraduationProbe(s, dir, vphashTakedownLsmDir(s, dir))
    }),

    "q182_phash_rebuild" -> ((s, dir) => {
      // the STATIC REBUILD q178 stops short of (round-15 verdict
      // "What's missing #2"): fold static ∖ taken-down ∪ the q178
      // store's live rows into a FRESH static generation
      // ([[bandStaticRebuild]] — the media majorCompact), then probe
      // the rebuilt artifact ALONE: no store read, no marker shadow
      // anti-join, one merged partner class. The oracle recomputes
      // the partner set (old ∪ graduated, carve excluded) from the
      // pixel formulas — a rebuild that resurrects a taken-down
      // image, drops a graduated row, or double-serves one turns it
      // red; marker count zero and physical absence are spec-pinned.
      rebuiltBandProbe(s,
        s.read.parquet(s"${phashRebuildDir(s, dir)}/bands"),
        phashNewBatchBands(s, dir)
          .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1),
        PhashMaxHamming)
    }),

    "q183_afp_rebuild" -> ((s, dir) => {
      // q182's AUDIO face — the rebuild recipe is ONE definition
      // ([[bandStaticRebuild]] + the static-only probe) over the
      // delta-sign fingerprint index and the q180 takedown store.
      rebuiltBandProbe(s,
        s.read.parquet(s"${afpRebuildDir(s, dir)}/bands"),
        afpNewBatchBands(s, dir)
          .filter(pmod(col("doc_id"), lit(PhashLsmBatchMod)) === 1),
        AfpMaxHamming)
    }),

    "q184_vphash_rebuild" -> ((s, dir) => {
      // q182's VIDEO face — BOTH clip-index tables rebuilt under the
      // shared fold rule from the q181 takedown stores, probed with
      // the frame-0 anchor candidacy + exact aligned Hamming against
      // the fresh generation alone.
      rebuiltVphashProbe(s, dir, vphashRebuildDir(s, dir))
    }),

    "q157_video_neardup" -> ((s, dir) => {
      // temporal near-dup detection over REAL decoded video — the
      // video face of the dedup family (production pipelines hash
      // sampled frames and align clips temporally): planted variant
      // GIF clips (groups of 3 share base frames AND frame count, each
      // member perturbs one (frame, pixel)) are ingested, decoded
      // frame by frame (row-local), per-frame dHashed into 4×16-bit
      // bands + exact quarter gray totals, and clip pairs come from
      // FRAME-0 anchor keys (candidacy = share ≥ 1 first-frame
      // COMPOSED key — band bits AND quarter total, the second
      // blocking signal that keeps candidate volume linear in corpus
      // size — AND equal frame counts; alignment is by frame index,
      // so unequal-length clips can never verify) followed by the
      // exact verify: total band Hamming over ALL aligned frames ≤
      // VphashMaxHamming. Candidate generation is an equi-join on
      // (band_idx, composed_key) of frame 0 — never pair enumeration
      // — and the per-frame hash table joins candidates by doc id, so
      // blobs never shuffle and every shuffled row is a handful of
      // longs. The oracle reproduces frames, bits, bands, totals, the
      // anchor rule, and the aligned-Hamming arithmetic in pure
      // integer SQL.
      val fh = variantVideoFrameBands(s, dir)
      val ex = explodeVideoAnchorKeys(fh.filter(col("frame_idx") === 0))
      val a = ex.toDF("doc_a", "nfa", "j", "v", "a0", "a1", "a2", "a3")
      val b = ex.toDF("doc_b", "nfb", "j", "v", "b0", "b1", "b2", "b3")
      val cand = a.join(b, Seq("j", "v"))
        .filter(col("doc_a") < col("doc_b") && col("nfa") === col("nfb") && noEarlierAgree)
        .select(col("doc_a"), col("doc_b"))
      val ha = fh.select(col("doc_id").as("doc_a"), col("frame_idx"),
        col("band0").as("a0"), col("band1").as("a1"),
        col("band2").as("a2"), col("band3").as("a3"))
      val hb = fh.select(col("doc_id").as("doc_b"), col("frame_idx"),
        col("band0").as("b0"), col("band1").as("b1"),
        col("band2").as("b2"), col("band3").as("b3"))
      cand.join(ha, Seq("doc_a")).join(hb, Seq("doc_b", "frame_idx"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(bandHamming).as("hamming"))
        .filter(col("hamming") <= lit(VphashMaxHamming))
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q74_image_decode" -> ((s, dir) => {
      // the REAL multimodal decode path, end to end: deterministic PNG
      // blobs are generated per document (ImageIO encode — the ingest
      // stand-in for pre-encoded media), then DECODED back pixel by
      // pixel (ImageIO decode, batched mapPartitions, one decoder per
      // partition) into geometry + per-channel pixel sums. PNG is
      // lossless and the pixel values derive from the dedicated
      // portable pixel hash, so the oracle reproduces the decoded
      // sums by pure integer arithmetic — hash-green means the
      // features came from actually-decoded pixels, not byte stats.
      // All row-local: blobs never shuffle; only (doc_id, 5 longs)
      // rows move into the final sort.
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal.imageFeatures(Multimodal.ingestSynthImages(docs))
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy(col("doc_id"))
    }),

    "q136_image_pool" -> ((s, dir) => {
      // 2x2 average pooling over ACTUALLY-DECODED pixels (q74's decode
      // path + [[Multimodal.imagePooledFeatures]]): the thumbnailing /
      // patch-embedding front-end of a vision training pipeline, kept
      // integer-exact so the oracle reproduces every pooled cell from
      // the pixel formula. The position-weighted checksum p_fp pins
      // each pooled value to its CELL — right totals in the wrong
      // cells still fail the hash. Row-local; blobs never shuffle.
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal.imagePooledFeatures(
          Multimodal.ingestSynthImages(docs), pool = 2)
        .select(col("doc_id"), col("p_sum_r"), col("p_sum_g"),
          col("p_sum_b"), col("p_fp"))
        .orderBy(col("doc_id"))
    }),

    "q137_audio_downsample" -> ((s, dir) => {
      // integer-factor decimation with mean pooling over
      // ACTUALLY-DECODED PCM (q76's decode path +
      // [[Multimodal.WavDecoder.decimated]]): the
      // resample-before-featurize step of an audio pipeline. Pooled
      // sums go NEGATIVE, so the division convention is part of the
      // contract: both engines TRUNCATE toward zero (Java `/`, DuckDB
      // integer `//` — measured, see WavDecoder.decimated). ds_fp pins
      // each pooled value to its position. Row-local; blobs never
      // shuffle.
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal.audioDownsampled(
          Multimodal.ingestSynthAudio(docs), factor = DownFactor)
        .select(col("doc_id"), col("n_out"), col("ds_sum"),
          col("ds_sum_sq"), col("ds_fp"))
        .orderBy(col("doc_id"))
    }),

    "q76_audio_decode" -> ((s, dir) => {
      // the REAL audio decode path, end to end (the sound twin of q74):
      // deterministic 16-bit PCM WAV blobs are generated per document
      // (javax.sound.sampled encode — the ingest stand-in for
      // pre-encoded media), then DECODED back frame by frame (the same
      // JDK codec, batched mapPartitions, one decoder per partition)
      // into sample count, signed sample sum, and energy (the RMS
      // numerator). PCM WAV is lossless and the sample values derive
      // from the dedicated portable audio hash, so the oracle
      // reproduces the decoded statistics by pure integer arithmetic —
      // hash-green means the features came from actually-decoded
      // frames. All row-local: blobs never shuffle; only (doc_id,
      // 3 longs) rows move into the final sort.
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal.audioFeatures(Multimodal.ingestSynthAudio(docs))
        .select(col("doc_id"), col("n_samples"), col("sum_s"), col("sum_sq"))
        .orderBy(col("doc_id"))
    }),

    "q61_frame_manifest" -> ((s, dir) => {
      // all row-local: posexplode-style frame emission, then one
      // map-side-combined groupBy on doc_id — blobs never shuffle,
      // only the (doc_id, stats) rows do
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
      val frames = Multimodal.sampleFrames(
        Multimodal.ingestAsBlobs(docs), FrameEvery)
      frames
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame")).cast("long").as("fb"),
          when(col("frame_idx") === 0,
            byteFoldSum(decode(col("frame"), "UTF-8"))).otherwise(lit(0L)).as("f0"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(col("fb")).cast("long").as("frame_bytes"),
          sum(col("f0")).cast("long").as("first_frame_sum"))
        .orderBy(col("doc_id"))
    }),

    "q81_video_decode" -> ((s, dir) => {
      // the REAL video decode path, end to end (the temporal twin of
      // q74/q76): deterministic multi-frame animated GIFs generated per
      // document (palette-indexed grayscale, ImageIO encode), then
      // DECODED frame by frame with temporal sampling (every 2nd frame)
      // into per-clip frame counts and sampled gray mass. GIF's stored
      // palette makes the 8-bit round-trip lossless and the gray values
      // derive from the portable video hash, so the oracle reproduces
      // the decoded sums by pure integer arithmetic — hash-green means
      // real multi-frame decode AND correct frame selection. All
      // row-local: blobs never shuffle; only (doc_id, frame stats)
      // rows reach the rollup.
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("doc_id"))
      Multimodal.videoFrameFeatures(
          Multimodal.ingestSynthVideo(docs), VideoSampleEvery)
        .groupBy(col("doc_id"))
        .agg(
          max(col("n_frames")).as("n_frames"),
          count(lit(1)).as("n_sampled"),
          sum(col("gray_sum")).cast("long").as("gray_mass"))
        .orderBy(col("doc_id"))
    }),
  )

  /** DuckDB CTE chain ending in `bands(doc_id, band0..band3)` — the
    * full variant-image pixel → gray → dHash-bit → 16-bit-band
    * arithmetic the engine's PNG decode round-trip must reproduce
    * bit-for-bit. Shared by the q155 pair oracle and the q158 probe
    * oracle (one derivation, two query semantics on top). The base
    * pixel is the QUADRATIC mix (affine y first — it wraps mod P —
    * then y² mod P + y; y < P keeps y² under 2^62 in both engines).
    * The bit rule is the round-17 ADOPTED difference hash — bit fp is
    * `gray(fp) > gray((fp+1) mod 64)`, the image twin of the audio
    * CTE's delta-sign rule below (`bench/dhash_probe_r17.json`:
    * 100% planted retention vs aHash's 98.0% at 500 k). */
  private lazy val variantImageBandsCtes: String = {
    val (ba, bb) = graft.functions.PortableHash.VariantBasePair
    val (pa, pb) = graft.functions.PortableHash.VariantPixelPair
    val (qa, qb) = graft.functions.PortableHash.VariantValuePair
    val p = graft.functions.PortableHash.P
    val n = Multimodal.SynthPixelValues
    val g = Multimodal.VariantGroupSize
    s"""WITH xk AS (
       |  SELECT d.doc_id, k.k,
       |    (($ba * ((((d.doc_id // $g) % $p) * $n + k.k) % $p) + $bb) % $p) AS y
       |  FROM documents d CROSS JOIN (SELECT unnest(range($n)) AS k) k),
       |pc AS (
       |  SELECT doc_id, k,
       |    CASE WHEN k // 3 = (($pa * (doc_id % $p) + $pb) % $p) % 64
       |      THEN (($qa * (((doc_id % $p) * 3 + (k % 3)) % $p) + $qb) % $p) % 256
       |      ELSE ((y * y) % $p + y) % $p % 256
       |    END AS v
       |  FROM xk),
       |px AS (SELECT doc_id, k // 3 AS fp, CAST(SUM(v) AS BIGINT) AS gray
       |       FROM pc GROUP BY 1, 2),
       |tot AS (SELECT doc_id, CAST(SUM(gray) AS BIGINT) AS total
       |        FROM px GROUP BY 1),
       |bits AS (
       |  SELECT a.doc_id, a.fp, a.gray,
       |    CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
       |  FROM px a JOIN px b
       |    ON a.doc_id = b.doc_id AND b.fp = (a.fp + 1) % 64),
       |bands AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN fp < 16 THEN bit * (1::BIGINT << fp) ELSE 0 END) AS BIGINT) AS band0,
       |    CAST(SUM(CASE WHEN fp >= 16 AND fp < 32 THEN bit * (1::BIGINT << (fp - 16)) ELSE 0 END) AS BIGINT) AS band1,
       |    CAST(SUM(CASE WHEN fp >= 32 AND fp < 48 THEN bit * (1::BIGINT << (fp - 32)) ELSE 0 END) AS BIGINT) AS band2,
       |    CAST(SUM(CASE WHEN fp >= 48 THEN bit * (1::BIGINT << (fp - 48)) ELSE 0 END) AS BIGINT) AS band3,
       |    CAST(SUM(CASE WHEN fp < 16 THEN gray ELSE 0 END) AS BIGINT) AS qt0,
       |    CAST(SUM(CASE WHEN fp >= 16 AND fp < 32 THEN gray ELSE 0 END) AS BIGINT) AS qt1,
       |    CAST(SUM(CASE WHEN fp >= 32 AND fp < 48 THEN gray ELSE 0 END) AS BIGINT) AS qt2,
       |    CAST(SUM(CASE WHEN fp >= 48 THEN gray ELSE 0 END) AS BIGINT) AS qt3
       |  FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB CTE chain ending in `bands(doc_id, band0..band3)` — the
    * variant-audio sample → delta-sign bit → 16-bit-band arithmetic
    * the engine's WAV decode round-trip must reproduce bit-for-bit
    * (the base sample is the QUADRATIC mix — affine y first, it wraps
    * mod P, then y² mod P + y; y < P keeps y² under 2^62 in both
    * engines — the perturbed sample its own affine). Shared by the
    * q156 pair oracle and the q167 probe oracle. */
  private lazy val variantAudioBandsCtes: String = {
    val (ba, bb) = graft.functions.PortableHash.AudioVariantBasePair
    val (pa, pb) = graft.functions.PortableHash.AudioVariantPosPair
    val (qa, qb) = graft.functions.PortableHash.AudioVariantValuePair
    val p = graft.functions.PortableHash.P
    val n = Multimodal.SynthSamples
    val g = Multimodal.VariantGroupSize
    s"""WITH xk AS (
       |  SELECT d.doc_id, k.k,
       |    (($ba * ((((d.doc_id // $g) % $p) * $n + k.k) % $p) + $bb) % $p) AS y
       |  FROM documents d CROSS JOIN (SELECT unnest(range($n)) AS k) k),
       |sm AS (
       |  SELECT doc_id, k,
       |    CASE WHEN k = (($pa * (doc_id % $p) + $pb) % $p) % $n
       |      THEN ((($qa * (doc_id % $p) + $qb) % $p) % 65536) - 32768
       |      ELSE (((y * y) % $p + y) % $p % 65536) - 32768
       |    END AS v
       |  FROM xk),
       |bits AS (
       |  SELECT a.doc_id, a.k AS fp, a.v AS samp,
       |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
       |  FROM sm a JOIN sm b
       |    ON a.doc_id = b.doc_id AND b.k = (a.k + 1) % $n),
       |bands AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN fp < 16 THEN bit * (1::BIGINT << fp) ELSE 0 END) AS BIGINT) AS band0,
       |    CAST(SUM(CASE WHEN fp >= 16 AND fp < 32 THEN bit * (1::BIGINT << (fp - 16)) ELSE 0 END) AS BIGINT) AS band1,
       |    CAST(SUM(CASE WHEN fp >= 32 AND fp < 48 THEN bit * (1::BIGINT << (fp - 32)) ELSE 0 END) AS BIGINT) AS band2,
       |    CAST(SUM(CASE WHEN fp >= 48 THEN bit * (1::BIGINT << (fp - 48)) ELSE 0 END) AS BIGINT) AS band3,
       |    CAST(SUM(CASE WHEN fp < 16 THEN samp ELSE 0 END) AS BIGINT) AS qt0,
       |    CAST(SUM(CASE WHEN fp >= 16 AND fp < 32 THEN samp ELSE 0 END) AS BIGINT) AS qt1,
       |    CAST(SUM(CASE WHEN fp >= 32 AND fp < 48 THEN samp ELSE 0 END) AS BIGINT) AS qt2,
       |    CAST(SUM(CASE WHEN fp >= 48 THEN samp ELSE 0 END) AS BIGINT) AS qt3
       |  FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB CTE chain ending in `bandsf(doc_id, fr, band0..band3)`
    * (every frame's dHash bands — neighbor-comparison bits, the
    * round-18 production family — the verify payload) and
    * `f0(doc_id, nf, k0..k3)` (the anchor frame's COMPOSED candidate
    * keys `band_j + qt_j·2^16` + frame count) — the variant-video
    * frame → gray → dHash-bit/quarter-total → key arithmetic the
    * engine's GIF round-trip must reproduce bit-for-bit (the fixture's
    * 8×8 frames ARE the canonical grid, so the box-resample is
    * identity and the virtual pixel value is the formula gray).
    * Shared by the q157 pair oracle and the q168/q171 probe
    * oracles. */
  private lazy val variantVideoBandsCtes: String = {
    val (ba, bb) = graft.functions.PortableHash.VideoVariantBasePair
    val (pa, pb) = graft.functions.PortableHash.VideoVariantPosPair
    val (qa, qb) = graft.functions.PortableHash.VideoVariantValuePair
    val p = graft.functions.PortableHash.P
    val px = Multimodal.VideoPixels
    val span = Multimodal.VideoMaxFrames * Multimodal.VideoPixels
    val g = Multimodal.VariantGroupSize
    s"""WITH d AS (SELECT doc_id, (2 + (doc_id // $g) % 3)::BIGINT AS nf FROM documents),
       |f AS (SELECT doc_id, nf, unnest(range(nf)) AS fr FROM d),
       |xk AS (
       |  SELECT doc_id, nf, fr, j.j,
       |    (($ba * ((((doc_id // $g) % $p) * $span + fr * $px + j.j) % $p) + $bb) % $p) AS y
       |  FROM f CROSS JOIN (SELECT unnest(range($px)) AS j) j),
       |pv AS (
       |  SELECT doc_id, nf, fr, j,
       |    CASE WHEN fr * $px + j = (($pa * (doc_id % $p) + $pb) % $p) % (nf * $px)
       |      THEN (($qa * (doc_id % $p) + $qb) % $p) % 256
       |      ELSE ((y * y) % $p + y) % $p % 256
       |    END AS v
       |  FROM xk),
       |vb AS (
       |  SELECT a.doc_id, a.fr, a.j, a.v,
       |    CASE WHEN a.v > b.v THEN 1 ELSE 0 END AS bit
       |  FROM pv a JOIN pv b
       |    ON a.doc_id = b.doc_id AND a.fr = b.fr AND b.j = (a.j + 1) % $px),
       |bandsf AS (
       |  SELECT doc_id, fr,
       |    CAST(SUM(CASE WHEN j < 16 THEN bit * (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS band0,
       |    CAST(SUM(CASE WHEN j >= 16 AND j < 32 THEN bit * (1::BIGINT << (j - 16)) ELSE 0 END) AS BIGINT) AS band1,
       |    CAST(SUM(CASE WHEN j >= 32 AND j < 48 THEN bit * (1::BIGINT << (j - 32)) ELSE 0 END) AS BIGINT) AS band2,
       |    CAST(SUM(CASE WHEN j >= 48 THEN bit * (1::BIGINT << (j - 48)) ELSE 0 END) AS BIGINT) AS band3,
       |    CAST(SUM(CASE WHEN j < 16 THEN v ELSE 0 END) AS BIGINT) AS qt0,
       |    CAST(SUM(CASE WHEN j >= 16 AND j < 32 THEN v ELSE 0 END) AS BIGINT) AS qt1,
       |    CAST(SUM(CASE WHEN j >= 32 AND j < 48 THEN v ELSE 0 END) AS BIGINT) AS qt2,
       |    CAST(SUM(CASE WHEN j >= 48 THEN v ELSE 0 END) AS BIGINT) AS qt3
       |  FROM vb GROUP BY 1, 2),
       |f0 AS (
       |  SELECT b.doc_id, d.nf,
       |    b.band0 + b.qt0 * 65536 AS k0, b.band1 + b.qt1 * 65536 AS k1,
       |    b.band2 + b.qt2 * 65536 AS k2, b.band3 + b.qt3 * 65536 AS k3
       |  FROM bandsf b JOIN d ON b.doc_id = d.doc_id WHERE b.fr = 0)""".stripMargin
  }

  /** DuckDB twin of [[bandIndexProbe]]: given CTE text whose last CTE
    * is `bands(doc_id, band0..band3)`, append the q158 ingest-probe
    * semantics — a NEW item (doc_id % 5 >= 3) counts its band-agreeing
    * partners within the Hamming cut among the OLD corpus and among
    * prior-new items (pid < nid), accepted iff neither. The SQL band
    * rule is the plain OR-of-band-equalities, equivalent to the
    * engine's first-agreeing-band claim (each qualifying pair counts
    * exactly once in both). */
  private def bandProbeSql(withCtes: String, maxHamming: Long): String =
    s"""$withCtes,
       |cand AS (
       |  SELECT a.doc_id AS nid, b.doc_id AS pid,
       |    (b.doc_id % 5 >= 3) AS pnew,
       |    CAST(bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))
       |       + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.doc_id % 5 >= 3
       |   AND a.doc_id <> b.doc_id
       |   AND (b.doc_id % 5 < 3 OR b.doc_id < a.doc_id)
       |   AND ($composedBandRuleSql)),
       |agg AS (
       |  SELECT nid,
       |    CAST(SUM(CASE WHEN NOT pnew AND hamming <= $maxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_old,
       |    CAST(SUM(CASE WHEN pnew AND hamming <= $maxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_new_prior
       |  FROM cand GROUP BY nid)
       |SELECT d.doc_id,
       |  COALESCE(a.n_dup_old, 0) AS n_dup_old,
       |  COALESCE(a.n_dup_new_prior, 0) AS n_dup_new_prior,
       |  CASE WHEN COALESCE(a.n_dup_old, 0) = 0
       |        AND COALESCE(a.n_dup_new_prior, 0) = 0
       |    THEN 1::BIGINT ELSE 0::BIGINT END AS accepted
       |FROM documents d LEFT JOIN agg a ON d.doc_id = a.nid
       |WHERE d.doc_id % 5 >= 3 ORDER BY d.doc_id""".stripMargin

  /** DuckDB twin of [[vphashGraduationProbe]] — q171's graduation
    * semantics (frame-0 composed anchor keys + equal frame counts,
    * aligned-Hamming verify) over the GIF frame formulas, with an
    * optional partner-side exclusion (q181's takedown carve). */
  private def vphashGraduationSql(partnerFilter: String = ""): String =
      s"""$variantVideoBandsCtes,
         |cand AS (
         |  SELECT a.doc_id AS nid, b.doc_id AS pid,
         |    (b.doc_id % 5 >= 3) AS graduated
         |  FROM f0 a JOIN f0 b
         |    ON a.doc_id % 5 >= 3 AND a.doc_id % $PhashLsmBatchMod = 1
         |   AND (b.doc_id % 5 < 3 OR b.doc_id % $PhashLsmBatchMod = 0)
         |   $partnerFilter
         |   AND a.nf = b.nf
         |   AND (a.k0 = b.k0 OR a.k1 = b.k1 OR
         |        a.k2 = b.k2 OR a.k3 = b.k3)),
         |ham AS (
         |  SELECT c.nid, c.pid, c.graduated,
         |    CAST(SUM(bit_count(xor(fa.band0, fb.band0)) + bit_count(xor(fa.band1, fb.band1))
         |       + bit_count(xor(fa.band2, fb.band2)) + bit_count(xor(fa.band3, fb.band3))) AS BIGINT) AS hamming
         |  FROM cand c
         |  JOIN bandsf fa ON fa.doc_id = c.nid
         |  JOIN bandsf fb ON fb.doc_id = c.pid AND fb.fr = fa.fr
         |  GROUP BY 1, 2, 3),
         |agg AS (
         |  SELECT nid,
         |    CAST(SUM(CASE WHEN NOT graduated AND hamming <= $VphashMaxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_old,
         |    CAST(SUM(CASE WHEN graduated AND hamming <= $VphashMaxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_graduated
         |  FROM ham GROUP BY nid)
         |SELECT d.doc_id,
         |  COALESCE(a.n_dup_old, 0) AS n_dup_old,
         |  COALESCE(a.n_dup_graduated, 0) AS n_dup_graduated,
         |  CASE WHEN COALESCE(a.n_dup_old, 0) = 0
         |        AND COALESCE(a.n_dup_graduated, 0) = 0
         |    THEN 1::BIGINT ELSE 0::BIGINT END AS accepted
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.nid
         |WHERE d.doc_id % 5 >= 3 AND d.doc_id % $PhashLsmBatchMod = 1
         |ORDER BY d.doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q24_blob_features" ->
      s"""SELECT doc_id,
         |  octet_length(encode(text))::BIGINT AS n_bytes,
         |  CAST(ceil(octet_length(encode(text)) / ${Multimodal.DefaultChunkBytes}.0) AS BIGINT) AS n_chunks,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(
         |    list_filter(string_split(text, ''), c -> c != ''),
         |    c -> unicode(c)::BIGINT)), (a, b) -> (a + b) % $P) AS byte_sum
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q155_image_phash" -> {
      // pixel → gray → bit → 16-bit bands → canonical band rule →
      // exact Hamming: every stage is the integer arithmetic the
      // engine's decode round-trip must hand back bit-for-bit
      bandPairsSql(variantImageBandsCtes, PhashMaxHamming)
    },

    "q159_image_survivors" -> {
      // q155's band rule + Hamming cut as a pairs CTE, then the q31
      // recursive-components construction: reach = transitive closure
      // of the undirected pair graph, component = min reachable id,
      // survivor = the doc that IS its component's min
      val hamming =
        "bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))" +
          " + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3))"
      s"""WITH RECURSIVE ${variantImageBandsCtes.stripPrefix("WITH ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.doc_id < b.doc_id
         |   AND ($composedBandRuleSql)
         |   AND $hamming <= $PhashMaxHamming),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
         |SELECT d.doc_id,
         |  COALESCE(c.component, d.doc_id) AS component,
         |  CAST(COALESCE(c.component, d.doc_id) = d.doc_id AS INT) AS is_survivor
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |ORDER BY d.doc_id""".stripMargin
    },

    "q161_media_health" -> {
      // the bands CTE chain gives per-doc decoded gray mass; the
      // planted %37 rule decides which decodes MUST fail, so the
      // oracle states the exact health report the quarantine policy
      // has to produce
      s"""$variantImageBandsCtes
         |SELECT d.source,
         |  COUNT(*) AS n_blobs,
         |  CAST(SUM(CASE WHEN d.doc_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
         |  CAST(SUM(CASE WHEN d.doc_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
         |  CAST(SUM(CASE WHEN d.doc_id % 37 <> 0 THEN t.total ELSE 0 END) AS BIGINT) AS gray_mass
         |FROM documents d JOIN tot t ON d.doc_id = t.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    },

    "q160_image_export" -> {
      val (a, b) = graft.functions.PortableHash.ShardPair
      val nShards = ExtraQueries.NShards
      val hamming =
        "bit_count(xor(a.band0, b.band0)) + bit_count(xor(a.band1, b.band1))" +
          " + bit_count(xor(a.band2, b.band2)) + bit_count(xor(a.band3, b.band3))"
      // q159's survivor construction + q68's shard hash; gray_mass
      // comes from the same `tot` CTE the aHash bit threshold uses —
      // the decoded-pixel checksum the engine must reproduce
      s"""WITH RECURSIVE ${variantImageBandsCtes.stripPrefix("WITH ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.doc_id < b.doc_id
         |   AND ($composedBandRuleSql)
         |   AND $hamming <= $PhashMaxHamming),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
         |surv AS (
         |  SELECT d.doc_id FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |  WHERE COALESCE(c.component, d.doc_id) = d.doc_id),
         |t AS (
         |  SELECT s.doc_id, tt.total,
         |    (($a * (s.doc_id % $P) + $b) % $P) % $nShards AS shard
         |  FROM surv s JOIN tot tt ON s.doc_id = tt.doc_id)
         |SELECT shard, COUNT(*) AS n_images,
         |  CAST(SUM(total) AS BIGINT) AS gray_mass,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM t GROUP BY shard ORDER BY shard""".stripMargin
    },

    "q158_phash_index_probe" ->
      // same band arithmetic as q155; the shared probe semantics on
      // top — the oracle recomputes the whole corpus from the pixel
      // formulas, so the engine's artifact round-trip must be
      // invisible in the result
      bandProbeSql(variantImageBandsCtes, PhashMaxHamming),

    "q169_phash_ingest_lsm" ->
      // graduation probe: batch2 (odd new ids) against old ∪ batch1
      // (even new ids), partner classes split by which side serves —
      // a store that silently served nothing zeroes n_dup_graduated
      // and this prediction turns red
      graduationProbeSql(variantImageBandsCtes, PhashMaxHamming),

    "q170_afp_ingest_lsm" ->
      // the audio face: identical graduation semantics over the WAV
      // sample formulas
      graduationProbeSql(variantAudioBandsCtes, AfpMaxHamming),

    "q178_phash_takedown" ->
      // q169's graduation semantics with the takedown carve excluded
      // from BOTH partner classes: a deleted doc must answer from
      // neither the store (physical drop at the fold) nor the static
      // artifact (marker shadowing) — and only the carve may vanish
      graduationProbeSql(variantImageBandsCtes, PhashMaxHamming,
        partnerFilter = s"AND b.doc_id % $TakedownMod <> $TakedownRem"),

    "q180_afp_takedown" ->
      // the audio face: identical takedown semantics over the WAV
      // sample formulas
      graduationProbeSql(variantAudioBandsCtes, AfpMaxHamming,
        partnerFilter = s"AND b.doc_id % $TakedownMod <> $TakedownRem"),

    "q182_phash_rebuild" ->
      // the rebuilt static artifact serves ONE merged partner class:
      // (old ∪ graduated) minus the takedown carve — physical drops
      // and the generation swap must be invisible in the counts
      rebuildProbeSql(variantImageBandsCtes, PhashMaxHamming),

    "q183_afp_rebuild" ->
      // the audio face: identical rebuild semantics over the WAV
      // sample formulas
      rebuildProbeSql(variantAudioBandsCtes, AfpMaxHamming),

    "q184_vphash_rebuild" ->
      // the video face: q181's candidate + aligned-Hamming semantics
      // against one merged, carve-excluded partner class
      vphashRebuildSql(),

    "q171_vphash_ingest_lsm" ->
      // the video face: q168's candidate rule (frame-0 composed
      // anchor keys + equal frame counts) with the graduation carve —
      // batch2 (odd new ids) against old ∪ graduated batch1 (even new
      // ids) — and q157's aligned-Hamming verify; the oracle
      // recomputes BOTH index tables from the GIF frame formulas, so
      // the two-store fold + manifest resolution must be invisible
      vphashGraduationSql(),

    "q181_vphash_takedown" ->
      // the video takedown: q171's semantics with the carve excluded
      // from both partner classes — a taken-down clip must answer
      // from neither store table nor either static table
      vphashGraduationSql(
        partnerFilter = s"AND b.doc_id % $TakedownMod <> $TakedownRem"),


    "q156_audio_fingerprint" ->
      bandPairsSql(variantAudioBandsCtes, AfpMaxHamming),

    "q167_afp_index_probe" ->
      // q158's probe semantics over the audio band derivation: the
      // engine's artifact round-trip must be invisible in the result
      bandProbeSql(variantAudioBandsCtes, AfpMaxHamming),

    "q157_video_neardup" ->
      // frame gray → per-frame dHash bits → 16-bit bands + quarter
      // totals → frame-0 composed-key anchor rule (+ equal frame
      // counts) → exact aligned Hamming: the integer arithmetic the
      // engine's multi-frame GIF round-trip must hand back
      // bit-for-bit
      s"""$variantVideoBandsCtes,
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM f0 a JOIN f0 b
         |    ON a.doc_id < b.doc_id AND a.nf = b.nf
         |   AND (a.k0 = b.k0 OR a.k1 = b.k1 OR
         |        a.k2 = b.k2 OR a.k3 = b.k3)),
         |ham AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CAST(SUM(bit_count(xor(fa.band0, fb.band0)) + bit_count(xor(fa.band1, fb.band1))
         |       + bit_count(xor(fa.band2, fb.band2)) + bit_count(xor(fa.band3, fb.band3))) AS BIGINT) AS hamming
         |  FROM cand c
         |  JOIN bandsf fa ON fa.doc_id = c.doc_a
         |  JOIN bandsf fb ON fb.doc_id = c.doc_b AND fb.fr = fa.fr
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, hamming FROM ham
         |WHERE hamming <= $VphashMaxHamming ORDER BY doc_a, doc_b""".stripMargin,

    "q168_vphash_index_probe" ->
      // q158's probe semantics with q157's candidate rule (frame-0
      // composed anchor keys + equal frame counts) and aligned-Hamming
      // verify: the engine's two-table artifact round-trip must be
      // invisible
      s"""$variantVideoBandsCtes,
         |cand AS (
         |  SELECT a.doc_id AS nid, b.doc_id AS pid,
         |    (b.doc_id % 5 >= 3) AS pnew
         |  FROM f0 a JOIN f0 b
         |    ON a.doc_id % 5 >= 3
         |   AND a.doc_id <> b.doc_id
         |   AND (b.doc_id % 5 < 3 OR b.doc_id < a.doc_id)
         |   AND a.nf = b.nf
         |   AND (a.k0 = b.k0 OR a.k1 = b.k1 OR
         |        a.k2 = b.k2 OR a.k3 = b.k3)),
         |ham AS (
         |  SELECT c.nid, c.pid, c.pnew,
         |    CAST(SUM(bit_count(xor(fa.band0, fb.band0)) + bit_count(xor(fa.band1, fb.band1))
         |       + bit_count(xor(fa.band2, fb.band2)) + bit_count(xor(fa.band3, fb.band3))) AS BIGINT) AS hamming
         |  FROM cand c
         |  JOIN bandsf fa ON fa.doc_id = c.nid
         |  JOIN bandsf fb ON fb.doc_id = c.pid AND fb.fr = fa.fr
         |  GROUP BY 1, 2, 3),
         |agg AS (
         |  SELECT nid,
         |    CAST(SUM(CASE WHEN NOT pnew AND hamming <= $VphashMaxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_old,
         |    CAST(SUM(CASE WHEN pnew AND hamming <= $VphashMaxHamming THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_new_prior
         |  FROM ham GROUP BY nid)
         |SELECT d.doc_id,
         |  COALESCE(a.n_dup_old, 0) AS n_dup_old,
         |  COALESCE(a.n_dup_new_prior, 0) AS n_dup_new_prior,
         |  CASE WHEN COALESCE(a.n_dup_old, 0) = 0
         |        AND COALESCE(a.n_dup_new_prior, 0) = 0
         |    THEN 1::BIGINT ELSE 0::BIGINT END AS accepted
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.nid
         |WHERE d.doc_id % 5 >= 3 ORDER BY d.doc_id""".stripMargin,

    "q74_image_decode" -> {
      val (a, b) = graft.functions.PortableHash.PixelPair
      val p = graft.functions.PortableHash.P
      val n = Multimodal.SynthPixelValues
      val side = Multimodal.SynthSide
      // channel value of flat index k for doc d:
      // ((a * (((d % P)*n + k) % P) + b) % P) % 256 — the exact
      // integers the PNG round-trip must hand back; the input reduces
      // mod P before the multiply (same as Multimodal.synthChannel) so
      // the arithmetic never leaves BIGINT range at any doc_id
      def chanSum(c: Int) =
        s"CAST(SUM(CASE WHEN k % 3 = $c THEN ((($a * (((doc_id % $p) * $n + k) % $p) + $b) % $p) % 256) ELSE 0 END) AS BIGINT)"
      s"""SELECT doc_id, $side::BIGINT AS width, $side::BIGINT AS height,
         |  ${chanSum(0)} AS sum_r,
         |  ${chanSum(1)} AS sum_g,
         |  ${chanSum(2)} AS sum_b
         |FROM documents CROSS JOIN (SELECT unnest(range($n)) AS k)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q136_image_pool" -> {
      val (a, b) = graft.functions.PortableHash.PixelPair
      val p = graft.functions.PortableHash.P
      val n = Multimodal.SynthPixelValues
      val side = Multimodal.SynthSide
      val cw = side / 2
      // pooled cell value, channel c: floor-avg of the 4 pixel-channel
      // formulas inside the 2x2 block of cell (cell = cy*cw + cx);
      // every term is the exact q74 channel formula
      def chan(kE: String) =
        s"((($a * (((doc_id % $p) * $n + ($kE)) % $p) + $b) % $p) % 256)"
      def pooled(c: Int) = {
        val terms = for (dy <- 0 to 1; dx <- 0 to 1) yield
          chan(s"((((cell // $cw) * 2 + $dy) * $side + ((cell % $cw) * 2 + $dx)) * 3 + $c)")
        s"((${terms.mkString(" + ")}) // 4)"
      }
      s"""SELECT doc_id,
         |  CAST(SUM(${pooled(0)}) AS BIGINT) AS p_sum_r,
         |  CAST(SUM(${pooled(1)}) AS BIGINT) AS p_sum_g,
         |  CAST(SUM(${pooled(2)}) AS BIGINT) AS p_sum_b,
         |  CAST(SUM((cell + 1) * (${pooled(0)} + 256 * ${pooled(1)}
         |    + 65536 * ${pooled(2)})) AS BIGINT) AS p_fp
         |FROM documents CROSS JOIN (SELECT unnest(range(${cw * cw})) AS cell)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q137_audio_downsample" -> {
      val (a, b) = graft.functions.PortableHash.AudioPair
      val p = graft.functions.PortableHash.P
      val n = Multimodal.SynthSamples
      val f = DownFactor
      val nOut = n / f
      def v(kE: String) =
        s"(((($a * (((doc_id % $p) * $n + ($kE)) % $p) + $b) % $p) % 65536) - 32768)"
      // truncated avg of f consecutive sample formulas — integer `//`
      // truncates toward zero in DuckDB, matching Scala's `/` on the
      // (possibly negative) pooled sum
      val pooledV = s"((${(0 until f).map(d => v(s"j * $f + $d")).mkString(" + ")}) // $f)"
      s"""SELECT doc_id, $nOut::BIGINT AS n_out,
         |  CAST(SUM($pooledV) AS BIGINT) AS ds_sum,
         |  CAST(SUM($pooledV * $pooledV) AS BIGINT) AS ds_sum_sq,
         |  CAST(SUM((j + 1) * $pooledV) AS BIGINT) AS ds_fp
         |FROM documents CROSS JOIN (SELECT unnest(range($nOut)) AS j)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q76_audio_decode" -> {
      val (a, b) = graft.functions.PortableHash.AudioPair
      val p = graft.functions.PortableHash.P
      val n = Multimodal.SynthSamples
      // sample value of frame k for doc d:
      // ((a * (((d % P)*n + k) % P) + b) % P) % 65536 - 32768 — the
      // exact signed 16-bit integers the WAV round-trip must hand back;
      // same overflow guard as q74 (input reduced mod P before the
      // affine multiply)
      val v = s"(((($a * (((doc_id % $p) * $n + k) % $p) + $b) % $p) % 65536) - 32768)"
      s"""SELECT doc_id, $n::BIGINT AS n_samples,
         |  CAST(SUM($v) AS BIGINT) AS sum_s,
         |  CAST(SUM($v * $v) AS BIGINT) AS sum_sq
         |FROM documents CROSS JOIN (SELECT unnest(range($n)) AS k)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q61_frame_manifest" -> {
      val cb = Multimodal.DefaultChunkBytes
      val f0fold = s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"list_filter(string_split(substring(text, 1, $cb), ''), c -> c != ''), " +
        s"c -> unicode(c)::BIGINT)), (a, b) -> (a + b) % $P)"
      s"""WITH d AS (
         |  SELECT doc_id, text, octet_length(encode(text))::BIGINT AS nb
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, text, nb,
         |    unnest(list_filter(range(CAST(ceil(nb / $cb.0) AS BIGINT)),
         |      i -> i % $FrameEvery = 0)) AS idx
         |  FROM d WHERE nb > 0)
         |SELECT doc_id, COUNT(*) AS n_frames,
         |  CAST(SUM(least($cb, nb - idx * $cb)) AS BIGINT) AS frame_bytes,
         |  CAST(SUM(CASE WHEN idx = 0 THEN $f0fold ELSE 0 END) AS BIGINT)
         |    AS first_frame_sum
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q81_video_decode" -> {
      val (a, b) = graft.functions.PortableHash.FramePair
      val p = graft.functions.PortableHash.P
      val n = Multimodal.VideoMaxFrames * Multimodal.VideoPixels
      val px = Multimodal.VideoPixels
      // gray value of pixel j in frame fr of clip d:
      // ((a * (((d % P)*n + fr*px + j) % P) + b) % P) % 256 — the exact
      // integers the palette-indexed GIF round-trip must hand back;
      // same reduce-mod-P-before-multiply overflow guard as q74/q76
      s"""WITH d AS (SELECT doc_id, (2 + doc_id % 3)::BIGINT AS nf FROM documents),
         |f AS (SELECT doc_id, nf,
         |    unnest(list_filter(range(nf), x -> x % $VideoSampleEvery = 0)) AS fr
         |  FROM d),
         |px AS (SELECT doc_id, nf, fr, unnest(range($px)) AS j FROM f)
         |SELECT doc_id, MAX(nf)::BIGINT AS n_frames,
         |  COUNT(DISTINCT fr)::BIGINT AS n_sampled,
         |  CAST(SUM((($a * (((doc_id % $p) * $n + fr * $px + j) % $p) + $b) % $p) % 256)
         |    AS BIGINT) AS gray_mass
         |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
  )
}

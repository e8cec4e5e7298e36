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

  private def byteFoldSum(strCol: org.apache.spark.sql.Column) =
    aggregate(
      filter(split(strCol, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc + ascii(ch).cast("long")) % lit(P))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q24_blob_features" -> ((s, dir) => {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
      val blobs = Multimodal.ingestAsBlobs(docs)
      Multimodal.extractFeatures(blobs)
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("n_chunks"), col("byte_sum"))
        .orderBy(col("doc_id"))
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

  val oracleSql: Map[String, String] = Map(

    "q24_blob_features" ->
      s"""SELECT doc_id,
         |  octet_length(encode(text))::BIGINT AS n_bytes,
         |  CAST(ceil(octet_length(encode(text)) / ${Multimodal.DefaultChunkBytes}.0) AS BIGINT) AS n_chunks,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(
         |    list_filter(string_split(text, ''), c -> c != ''),
         |    c -> unicode(c)::BIGINT)), (a, b) -> (a + b) % $P) AS byte_sum
         |FROM documents ORDER BY doc_id""".stripMargin,

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

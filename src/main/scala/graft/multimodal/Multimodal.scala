package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (BASELINE.json
  * north star): media travels as opaque `BINARY` columns next to a typed
  * metadata struct; decode / feature-extraction runs batched inside
  * `mapPartitions` (the JVM analogue of `mapInPandas` — one decoder
  * instance per partition, rows processed in fixed-size batches, never
  * one model per row).
  *
  * Three media families decode FOR REAL with JDK codecs (zero-egress):
  * images via ImageIO ([[ImageIoDecoder]], q74), WAV audio via
  * javax.sound.sampled ([[WavDecoder]], q76), and multi-frame video
  * via animated GIF ([[GifDecoder]], q81). [[StubDecoder]] remains the
  * deterministic fake for formats that cannot be HASH-ORACLED: the JDK
  * does ship an ImageIO JPEG codec (and [[imageFeatures]] decodes
  * `image/jpeg` blobs with it — tolerance-spec'd in MultimodalSpec),
  * but lossy-codec output (JPEG IDCT, MP3, MP4) is not bit-exact
  * across implementations, so no cross-engine hash oracle is possible
  * and the oracle-checked queries use the lossless formats. The
  * Spark-side contract — schema, partitioning, batch shape, null
  * passthrough — is identical either way, so a native codec drops in
  * by replacing one function.
  *
  * Scale posture: blobs never shuffle (all feature extraction is
  * row-local within a scan); at 100 TB the blob table would be stored
  * with metadata + features in separate parquet column chunks so
  * predicate pushdown on metadata prunes row groups before any blob
  * byte is read.
  */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("chunk_bytes", IntegerType, nullable = false)))

  val DefaultChunkBytes = 256

  /** Wrap a text corpus as a blob table: `blob` = UTF-8 bytes of the
    * payload column + populated metadata struct. (Real pipelines read
    * pre-encoded media; the fixture corpus is text, so its bytes stand
    * in for media bytes.) */
  def ingestAsBlobs(df: DataFrame, payloadCol: String = "text"): DataFrame =
    df.withColumn("blob", encode(col(payloadCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("text/plain").as("media_type"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        lit(DefaultChunkBytes).as("chunk_bytes")))

  // ---------------------------------------------------------------
  // Real image path (javax.imageio — in the JDK, zero-egress-safe)
  // ---------------------------------------------------------------

  /** Synthetic-image geometry: 8×8 RGB. */
  val SynthSide = 8
  val SynthChannels = 3
  val SynthPixelValues: Int = SynthSide * SynthSide * SynthChannels

  /** Channel value of flat pixel-channel index `k` (k = (y·side + x)·3
    * + channel) for image `id`: the dedicated affine hash mod 256 —
    * reproducible by integer SQL, so the oracle can verify sums over
    * ACTUALLY-DECODED pixels without a codec of its own. The hash
    * input is reduced mod P BEFORE the affine multiply (PortableHash's
    * a·x < 2^62 invariant needs x < P): with ids up to ~5e16 the raw
    * `a·(id·192+k)` would overflow Long silently in Scala while DuckDB
    * errors — the twin-computation contract would break exactly at
    * scale. Value-identical to the unreduced form for id·192+k < P
    * (every fixture). */
  def synthChannel(id: Long, k: Int): Int = {
    val (a, b) = graft.functions.PortableHash.PixelPair
    val p = graft.functions.PortableHash.P
    val x = ((id % p) * SynthPixelValues + k) % p
    (((a * x + b) % p) % 256L).toInt
  }

  /** q155 planted-near-dup geometry: consecutive-id groups of 3 share
    * one base image (content keyed by `doc_id div 3` — integer
    * division truncates toward zero in Scala AND DuckDB, and ids are
    * non-negative, so the twin grouping is exact), and each member
    * perturbs exactly ONE flat pixel (position and replacement values
    * from their own affine hashes of doc_id). Same-group images are
    * near-identical; cross-group images are independent hash noise —
    * the planted structure a perceptual-hash dedup must recover. */
  val VariantGroupSize = 3

  /** The perturbed flat pixel of variant image `id`. */
  def variantPixel(id: Long): Int = {
    val (a, b) = graft.functions.PortableHash.VariantPixelPair
    val p = graft.functions.PortableHash.P
    (((a * (id % p) + b) % p) % (SynthSide * SynthSide)).toInt
  }

  /** Channel value of flat pixel-channel index `k` for VARIANT image
    * `id`: the group base pixel (QUADRATIC hash keyed by the group id
    * — see [[graft.functions.PortableHash.VariantBasePair]] for why
    * the affine [[synthChannel]] cannot serve here: affine-in-k bases
    * make different groups' images windows of one global progression
    * and their aHashes collide) unless `k` falls on [[variantPixel]],
    * which takes its three channels from the dedicated value hash
    * instead. Pure integer arithmetic — the oracle reproduces every
    * pixel; every intermediate stays under 2^62. */
  def variantChannel(id: Long, k: Int): Int = {
    val p = graft.functions.PortableHash.P
    if (k / SynthChannels == variantPixel(id)) {
      val (a, b) = graft.functions.PortableHash.VariantValuePair
      val x = ((id % p) * SynthChannels + (k % SynthChannels)) % p
      (((a * x + b) % p) % 256L).toInt
    } else {
      // affine FIRST (a·x wraps mod P, so y is equidistributed), THEN
      // square: squaring the RAW index never wraps for small ids
      // (x < √P) and mixes nothing — measured as near-identical hashes
      // for unrelated groups. y² mod P + y is a proper quadratic mix.
      val (a, b) = graft.functions.PortableHash.VariantBasePair
      val x = (((id / VariantGroupSize) % p) * SynthPixelValues + k) % p
      val y = (a * x + b) % p
      (((y * y) % p + y) % p % 256L).toInt
    }
  }

  /** ImageIO's default stream cache is a TEMP FILE per encode/decode
    * call — ~50 ms of filesystem churn per tiny image, which at corpus
    * scale dwarfs the codec itself. Heap-backed streams instead; set
    * once per JVM (executor), idempotent. */
  private lazy val imageIoHeapStreams: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Encode an 8×8 RGB PNG whose flat pixel-channel index `k` carries
    * `chan(k)` — the builder [[synthPng]]/[[synthVariantPng]] share,
    * exposed so specs can construct images with chosen properties
    * (e.g. the brightness-invariance law of the aHash). */
  def rgbPng(chan: Int => Int): Array[Byte] = {
    imageIoHeapStreams
    val img = new java.awt.image.BufferedImage(
      SynthSide, SynthSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < SynthSide) {
      var x = 0
      while (x < SynthSide) {
        val k = (y * SynthSide + x) * SynthChannels
        val rgb = (chan(k) << 16) | (chan(k + 1) << 8) | chan(k + 2)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PNG for `id`: every pixel channel from
    * [[synthChannel]], encoded by ImageIO. PNG is lossless, so decoding
    * gives back exactly these values — the property q74's oracle
    * check rests on. */
  def synthPng(id: Long): Array[Byte] = rgbPng(k => synthChannel(id, k))

  /** Deterministic VARIANT PNG for `id` — [[synthPng]]'s loop over
    * [[variantChannel]]: the planted-near-dup image family. */
  def synthVariantPng(id: Long): Array[Byte] = rgbPng(k => variantChannel(id, k))

  /** [[ingestSynthImages]] over the VARIANT family — the q155 ingest:
    * planted near-dup PNGs, encoded row-local, blobs never shuffle. */
  def ingestSynthVariantImages(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("blob", BinaryType, nullable = true),
      StructField("meta", MediaMetaType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = synthVariantPng(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(blob,
          Row("image/png", blob.length.toLong, DefaultChunkBytes)))
      }
    }(enc)
  }

  /** Attach a deterministic PNG blob per row (media_type "image/png") —
    * the ingest step standing in for reading pre-encoded media files;
    * encoding runs row-local inside mapPartitions, blobs never
    * shuffle. */
  def ingestSynthImages(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("blob", BinaryType, nullable = true),
      StructField("meta", MediaMetaType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = synthPng(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(blob,
          Row("image/png", blob.length.toLong, DefaultChunkBytes)))
      }
    }(enc)
  }

  /** Quarantine-not-crash: at 100 TB corrupt media is CERTAIN, and a
    * pipeline that dies on one truncated JPEG is not production-
    * shaped. Every feature-extraction path routes its decode through
    * this guard — an undecodable blob yields None, and the caller
    * passes the row through with null features (or emits no frame
    * rows), exactly the contract foreign media already gets. The
    * decoders themselves still throw (a direct caller wants the
    * error); the mapPartitions paths quarantine. Fixture blobs always
    * decode, so oracle-checked results are unaffected; MultimodalSpec
    * feeds garbage bytes to pin the policy for every modality. */
  private def tryDecode[A](f: => A): Option[A] =
    try Some(f) catch { case scala.util.control.NonFatal(_) => None }

  /** The real decoder: ImageIO (PNG/BMP/GIF — whatever the JDK
    * registers) → geometry + per-channel pixel sums. Integer-exact
    * features, so the oracle can reproduce them arithmetically. */
  object ImageIoDecoder extends Serializable {
    /** (width, height, sum_r, sum_g, sum_b) of one encoded image. */
    def features(blob: Array[Byte]): (Long, Long, Long, Long, Long) = {
      imageIoHeapStreams
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      require(img != null, "undecodable image blob")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      (img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
    }
  }

  /** Image feature extraction: adds `width`/`height`/`sum_r`/`sum_g`/
    * `sum_b` from ACTUALLY-DECODED pixels for image blobs — one decoder
    * per partition inside mapPartitions, per-image decode (ImageIO has
    * no batch API, so unlike [[extractFeatures]] there is no batch
    * grouping to fake). Non-image, unknown-type, or null blobs pass
    * through with null features: the codec dispatch is on the metadata
    * media_type — every image subtype ImageIO speaks decodes here,
    * including JPEG (lossy, so spec'd by tolerance, not hash oracle);
    * [[StubDecoder]] remains the fallback for non-image media. */
  def imageFeatures(blobs: DataFrame): DataFrame = {
    val featureFields = Seq("width", "height", "sum_r", "sum_g", "sum_b")
    val outSchema = StructType(blobs.schema.fields ++
      featureFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      val decoder = ImageIoDecoder // one decoder per partition
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val features: Seq[Any] =
          if (blob == null || mediaType == null || !mediaType.startsWith("image/"))
            Seq(null, null, null, null, null)
          else tryDecode(decoder.features(blob)) match {
            case Some((w, h, sr, sg, sb)) => Seq(w, h, sr, sg, sb)
            case None => Seq(null, null, null, null, null) // quarantined
          }
        Row.fromSeq(r.toSeq ++ features)
      }
    }(enc)
  }

  /** Average-hash (aHash) bands from ACTUALLY-DECODED pixels — the
    * public ancestor of the perceptual-hash families (pHash/PDQ) that
    * production pipelines run for near-dup image filtering: per pixel
    * a grayscale `r+g+b` (the sum, never divided — integers stay
    * exact), per image one bit per pixel `gray·64 > total` (strict
    * integer compare, no float mean), and the 64 bits packed as FOUR
    * 16-bit band integers — the SimHash-banding layout (q20): two
    * images within small Hamming distance agree exactly on at least
    * one band (pigeonhole: guaranteed for Hamming ≤ 3, heuristic
    * beyond), so candidate generation is a band equi-join, never an
    * all-pairs scan. Each band also carries `qt0..qt3` — its quarter's
    * EXACT gray mass (the sum of the band's own pixels' grays) — the
    * second component of the COMPOSED candidate key the index joins
    * on (the video family's proven recipe, [[videoFrameHashBands]]):
    * 16 threshold-relative bits alone admit ~n²/2¹⁶ random
    * coincidences and survive slowly-varying brightness drifts; an
    * exact quarter total does neither. Under a one-pixel edit the
    * untouched quarters keep their MASSES identical but their BITS
    * only heuristically: the edit shifts the global gray total — the
    * shared bit threshold — so threshold-straddling pixels anywhere
    * can flip (unlike the audio fingerprint's delta-sign bits, which
    * are local). Composed-key recall is therefore bounded by the
    * measured retention of the band-cand probe
    * (`bench/band_cand_r15.jsonl`: 99.03% of planted pairs), not by a
    * pigeonhole guarantee — which is why round 17 measured and ADOPTED
    * the threshold-free [[imageDHashBands]] family for every
    * production image path (`bench/dhash_probe_r17.json`: 100%
    * retention); this function remains as the measured alternative and
    * the lost-pairs harness's subject. Also emits
    * `gray_total` (the per-image gray mass the bit threshold divides
    * against = Σ qt_j) — the content checksum downstream export
    * manifests carry without a second decode pass (q160). Decode and
    * hashing run row-local in mapPartitions; only (doc_id, 9 longs)
    * ever move. Non-image / null blobs pass through with null
    * bands. */
  def imageAHashBands(blobs: DataFrame): DataFrame = {
    val bandFields = (0 until 4).map(j => s"band$j") ++
      (0 until 4).map(j => s"qt$j") :+ "gray_total"
    val outSchema = StructType(blobs.schema.fields ++
      bandFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      imageIoHeapStreams
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val nulls: Seq[Any] = Seq.fill(9)(null)
        val bands: Seq[Any] =
          if (blob == null || mediaType == null || !mediaType.startsWith("image/"))
            nulls
          else tryDecode {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
            require(img != null, "undecodable image blob")
            val n = img.getWidth * img.getHeight
            // band-packing guard: bands are 4 × (n/4)-bit integers in
            // Longs, so n must split into quarters and a quarter must
            // fit one 64-bit band — anything else quarantines LOUDLY
            // here instead of an index error (n % 4 != 0) or the
            // `1L << (fp % bandBits)` shift wrapping mod 64 and
            // silently aliasing distinct pixels onto one bit (n > 256)
            require(n % 4 == 0 && n / 4 <= 64,
              s"unsupported image geometry: ${img.getWidth}x${img.getHeight}" +
                s" ($n pixels; need n % 4 == 0 and n <= 256)")
            val gray = new Array[Long](n)
            var total = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val g = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                gray(y * img.getWidth + x) = g
                total += g
                x += 1
              }
              y += 1
            }
            val bandBits = n / 4
            val out = new Array[Long](4)
            val qt = new Array[Long](4)
            var fp = 0
            while (fp < n) {
              if (gray(fp) * n > total)
                out(fp / bandBits) |= 1L << (fp % bandBits)
              qt(fp / bandBits) += gray(fp)
              fp += 1
            }
            (out.toSeq ++ qt.toSeq) :+ total
          }.getOrElse(nulls) // quarantined
        Row.fromSeq(r.toSeq ++ bands)
      }
    }(enc)
  }

  /** DIFFERENCE-hash bands — [[imageAHashBands]] with a THRESHOLD-FREE
    * bit family, ADOPTED round-17 as THE image fingerprint (every
    * production image-dedup path — corpus bands, persisted index,
    * graduation stores, streaming twins — computes these): bit `fp` is
    * `gray(fp) > gray(fp+1 mod n)` — each bit compares two NEIGHBOR
    * pixels, no global mean anywhere, the image analogue of the audio
    * delta-sign bits. The round-16 lost-pairs receipt proved the aHash
    * family's ~2% loss is global-threshold coupling (a one-pixel edit
    * shifts the mean and flips far-away bits at EQUAL mass);
    * neighbor-local bits cannot couple that way — a local edit only
    * touches the bits whose pixel pair it overlaps. Measured before
    * adoption (`bench/dhash_probe_r17.json`, 500 k docs): 100.00%
    * planted-pair retention vs aHash's 98.01%, candidate volume still
    * flat per-n (2.53 vs 2.11 pairs/doc, max bucket 13). Same output
    * shape as [[imageAHashBands]] (band0–3, qt0–3, gray_total;
    * quadrant masses and total unchanged — the composed key's mass
    * half is shared), same row-local decode and quarantine
    * contract. */
  def imageDHashBands(blobs: DataFrame): DataFrame = {
    val bandFields = (0 until 4).map(j => s"band$j") ++
      (0 until 4).map(j => s"qt$j") :+ "gray_total"
    val outSchema = StructType(blobs.schema.fields ++
      bandFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      imageIoHeapStreams
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val nulls: Seq[Any] = Seq.fill(9)(null)
        val bands: Seq[Any] =
          if (blob == null || mediaType == null || !mediaType.startsWith("image/"))
            nulls
          else tryDecode {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
            require(img != null, "undecodable image blob")
            val n = img.getWidth * img.getHeight
            // band-packing guard: bands are 4 × (n/4)-bit integers in
            // Longs, so n must split into quarters and a quarter must
            // fit one 64-bit band — anything else quarantines LOUDLY
            // here instead of an index error (n % 4 != 0) or the
            // `1L << (fp % bandBits)` shift wrapping mod 64 and
            // silently aliasing distinct pixels onto one bit (n > 256)
            require(n % 4 == 0 && n / 4 <= 64,
              s"unsupported image geometry: ${img.getWidth}x${img.getHeight}" +
                s" ($n pixels; need n % 4 == 0 and n <= 256)")
            val gray = new Array[Long](n)
            var total = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val g = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                gray(y * img.getWidth + x) = g
                total += g
                x += 1
              }
              y += 1
            }
            val bandBits = n / 4
            val out = new Array[Long](4)
            val qt = new Array[Long](4)
            var fp = 0
            while (fp < n) {
              if (gray(fp) > gray((fp + 1) % n))
                out(fp / bandBits) |= 1L << (fp % bandBits)
              qt(fp / bandBits) += gray(fp)
              fp += 1
            }
            (out.toSeq ++ qt.toSeq) :+ total
          }.getOrElse(nulls) // quarantined
        Row.fromSeq(r.toSeq ++ bands)
      }
    }(enc)
  }

  /** Pooled-image feature extraction (q136): REAL decode, then
    * `pool`×`pool` average pooling per channel — the cheapest
    * vision-pipeline preprocessing step (thumbnailing / patch
    * embedding front-end), kept integer-exact so the oracle can
    * reproduce it arithmetically: each pooled cell value is
    * `(Σ of pool² pixel channels) div pool²` (non-negative, so
    * truncating and floor division agree across engines). Emits per
    * image the pooled per-channel sums plus a position-weighted
    * checksum `p_fp = Σ_cells (cell+1)·(pr + 256·pg + 65536·pb)` —
    * sensitive to WHERE each pooled value landed, so a decoder that
    * produced the right totals in the wrong cells still fails the
    * oracle. Same dispatch/null-passthrough contract as
    * [[imageFeatures]]; row-local, blobs never shuffle. */
  def imagePooledFeatures(blobs: DataFrame, pool: Int = 2): DataFrame = {
    val featureFields = Seq("p_sum_r", "p_sum_g", "p_sum_b", "p_fp")
    val outSchema = StructType(blobs.schema.fields ++
      featureFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val features: Seq[Any] =
          if (blob == null || mediaType == null || !mediaType.startsWith("image/"))
            Seq(null, null, null, null)
          else tryDecode {
            imageIoHeapStreams
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(blob))
            require(img != null, "undecodable image blob")
            val (cw, ch) = (img.getWidth / pool, img.getHeight / pool)
            var (spr, spg, spb, fp) = (0L, 0L, 0L, 0L)
            var cy = 0
            while (cy < ch) {
              var cx = 0
              while (cx < cw) {
                var (ar, ag, ab) = (0L, 0L, 0L)
                var dy = 0
                while (dy < pool) {
                  var dx = 0
                  while (dx < pool) {
                    val rgb = img.getRGB(cx * pool + dx, cy * pool + dy)
                    ar += (rgb >> 16) & 0xff
                    ag += (rgb >> 8) & 0xff
                    ab += rgb & 0xff
                    dx += 1
                  }
                  dy += 1
                }
                val n = pool.toLong * pool
                val (pr, pg, pb) = (ar / n, ag / n, ab / n)
                spr += pr; spg += pg; spb += pb
                fp += (cy.toLong * cw + cx + 1) * (pr + 256L * pg + 65536L * pb)
                cx += 1
              }
              cy += 1
            }
            Seq(spr, spg, spb, fp)
          }.getOrElse(Seq(null, null, null, null)) // quarantined
        Row.fromSeq(r.toSeq ++ features)
      }
    }(enc)
  }

  // ---------------------------------------------------------------
  // Real audio path (javax.sound.sampled — in the JDK, zero-egress-safe)
  // ---------------------------------------------------------------

  /** Synthetic-clip geometry: 64 samples of 16-bit signed mono PCM at
    * 8 kHz — small enough to synthesize per row, wide enough that the
    * sample-sum features are non-trivial. */
  val SynthSampleRate = 8000f
  val SynthSamples = 64

  /** Signed 16-bit PCM sample `k` of clip `id`: the dedicated audio
    * affine hash mod 2^16, recentered to [-32768, 32767] —
    * reproducible by integer SQL, so the oracle can verify sums over
    * ACTUALLY-DECODED samples without a codec of its own. Same
    * reduce-mod-P-before-multiply guard as [[synthChannel]] (the a·x <
    * 2^62 invariant). */
  def synthSample(id: Long, k: Int): Int = {
    val (a, b) = graft.functions.PortableHash.AudioPair
    val p = graft.functions.PortableHash.P
    val x = ((id % p) * SynthSamples + k) % p
    ((((a * x + b) % p) % 65536L) - 32768L).toInt
  }

  /** q156 planted-near-dup audio geometry — the audio twin of
    * [[variantChannel]]: consecutive-id groups of [[VariantGroupSize]]
    * share one base clip (content keyed by `doc_id div 3`, quadratic
    * mix — see [[graft.functions.PortableHash.AudioVariantBasePair]]
    * for why an affine base correlates unrelated groups' delta-sign
    * fingerprints), and each member perturbs exactly ONE sample
    * (position and replacement value from its own affine hashes of
    * doc_id). Pure integer arithmetic, every intermediate < 2^62 —
    * the oracle reproduces every sample. */
  def variantSamplePos(id: Long): Int = {
    val (a, b) = graft.functions.PortableHash.AudioVariantPosPair
    val p = graft.functions.PortableHash.P
    (((a * (id % p) + b) % p) % SynthSamples).toInt
  }

  /** Signed 16-bit PCM sample `k` of VARIANT clip `id`. */
  def variantSample(id: Long, k: Int): Int = {
    val p = graft.functions.PortableHash.P
    if (k == variantSamplePos(id)) {
      val (a, b) = graft.functions.PortableHash.AudioVariantValuePair
      ((((a * (id % p) + b) % p) % 65536L) - 32768L).toInt
    } else {
      val (a, b) = graft.functions.PortableHash.AudioVariantBasePair
      val x = (((id / VariantGroupSize) % p) * SynthSamples + k) % p
      val y = (a * x + b) % p
      ((((y * y) % p + y) % p % 65536L) - 32768L).toInt
    }
  }

  private def synthFormat = new javax.sound.sampled.AudioFormat(
    SynthSampleRate, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)

  /** The `AudioSystem` facade re-walks its SPI provider list on EVERY
    * encode/decode call; under a layered application classloader that
    * lookup costs ~0.4 ms — 12× the 128-sample codec itself (measured:
    * 5000 clips 0.2 s via direct providers, 2.3 s via the facade).
    * Resolve the WAV reader/writer ONCE per JVM (executor) and call
    * the providers directly — the same class of fix as ImageIO's
    * setUseCache(false) for q74. */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAV writer in this JVM"))
  }

  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    val probe = {
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](2)), synthFormat, 1L)
      val bos = new java.io.ByteArrayOutputStream()
      wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala
      .find { r =>
        try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
        catch { case _: Exception => false }
      }
      .getOrElse(throw new IllegalStateException("no WAV reader in this JVM"))
  }

  /** Frame an arbitrary signed-16-bit sample array as a WAV blob —
    * the builder [[synthWav]]/[[synthVariantWav]] share, exposed so
    * specs can construct clips with chosen properties (e.g. the
    * DC-offset-invariance law of the delta-sign fingerprint). */
  def pcmWav(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var k = 0
    while (k < samples.length) {
      val v = samples(k)
      pcm(2 * k) = (v & 0xff).toByte          // little-endian
      pcm(2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), synthFormat, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic WAV for `id`: every PCM sample from [[synthSample]],
    * framed by the JDK's WAV writer. PCM WAV is lossless, so decoding
    * hands back exactly these integers — the property q76's oracle
    * check rests on (the audio twin of [[synthPng]]). */
  def synthWav(id: Long): Array[Byte] =
    pcmWav(Array.tabulate(SynthSamples)(k => synthSample(id, k)))

  /** Deterministic VARIANT WAV for `id` — [[synthWav]]'s loop over
    * [[variantSample]]: the planted-near-dup clip family. */
  def synthVariantWav(id: Long): Array[Byte] =
    pcmWav(Array.tabulate(SynthSamples)(k => variantSample(id, k)))

  /** [[ingestSynthAudio]] over the VARIANT family — the q156 ingest:
    * planted near-dup WAV clips, encoded row-local, blobs never
    * shuffle. */
  def ingestSynthVariantAudio(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("blob", BinaryType, nullable = true),
      StructField("meta", MediaMetaType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = synthVariantWav(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(blob,
          Row("audio/wav", blob.length.toLong, DefaultChunkBytes)))
      }
    }(enc)
  }

  /** Attach a deterministic WAV blob per row (media_type "audio/wav") —
    * the audio twin of [[ingestSynthImages]]; encoding is row-local,
    * blobs never shuffle. */
  def ingestSynthAudio(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("blob", BinaryType, nullable = true),
      StructField("meta", MediaMetaType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = synthWav(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(blob,
          Row("audio/wav", blob.length.toLong, DefaultChunkBytes)))
      }
    }(enc)
  }

  /** The real audio decoder: `javax.sound.sampled` (WAV/PCM — in the
    * JDK) → frame geometry + integer sample statistics, so the oracle
    * can reproduce them arithmetically. */
  object WavDecoder extends Serializable {
    /** (n_samples, sum_s, sum_sq) of one encoded mono 16-bit clip:
      * signed sample sum and energy (the RMS numerator), both exact
      * integers. */
    def features(blob: Array[Byte]): (Long, Long, Long) = {
      val ais = wavReader.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected 16-bit mono PCM, got $fmt")
        val bytes = ais.readAllBytes()
        val big = fmt.isBigEndian
        var (n, s, sq) = (0L, 0L, 0L)
        var i = 0
        while (i + 1 < bytes.length) {
          val v =
            if (big) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
            else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
          n += 1
          s += v
          sq += v.toLong * v
          i += 2
        }
        (n, s, sq)
      } finally ais.close()
    }

    /** Integer-factor decimation with mean pooling (q137): output
      * sample j = (Σ of `factor` consecutive input samples) / factor,
      * TRUNCATING toward zero — pooled sums go negative, so the
      * division convention is part of the cross-engine contract, and
      * DuckDB's integer `//` truncates toward zero exactly like
      * Java's `/` (measured on DuckDB 1.0: -7 // 4 = -1, NOT the
      * floor -2 — its docs-level "floor division" name applies to
      * floats). Math.floorDiv here would be off by one on every
      * negative non-divisible window. A trailing partial window is
      * dropped (n_out = n div factor, the resampler convention).
      * Returns (n_out, sum of pooled, sum of pooled², pooled
      * position-weighted checksum Σ (j+1)·pooled_j) — the checksum
      * pins each pooled value to its position, like q136's p_fp. */
    def decimated(blob: Array[Byte], factor: Int): (Long, Long, Long, Long) = {
      val ais = wavReader.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected 16-bit mono PCM, got $fmt")
        val bytes = ais.readAllBytes()
        val big = fmt.isBigEndian
        val nIn = bytes.length / 2
        val nOut = nIn / factor
        var (s, sq, fp) = (0L, 0L, 0L)
        var j = 0
        while (j < nOut) {
          var acc = 0L
          var d = 0
          while (d < factor) {
            val i = (j * factor + d) * 2
            val v =
              if (big) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
              else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
            acc += v
            d += 1
          }
          val pv = acc / factor // truncating, like DuckDB integer //
          s += pv
          sq += pv * pv
          fp += (j + 1L) * pv
          j += 1
        }
        (nOut.toLong, s, sq, fp)
      } finally ais.close()
    }
  }

  /** Audio feature extraction: adds `n_samples`/`sum_s`/`sum_sq` from
    * ACTUALLY-DECODED PCM frames for WAV blobs — one decoder per
    * partition inside mapPartitions (the audio twin of
    * [[imageFeatures]]). Dispatch is on `audio/wav` specifically, not
    * every audio type: [[WavDecoder]] only speaks RIFF/WAVE, so compressed
    * audio (mpeg, ogg) must pass through with null features rather
    * than crash the task; [[StubDecoder]] remains the fallback for
    * formats the JDK sound stack cannot decode (MP3, MP4 audio). */
  def audioFeatures(blobs: DataFrame): DataFrame = {
    val featureFields = Seq("n_samples", "sum_s", "sum_sq")
    val outSchema = StructType(blobs.schema.fields ++
      featureFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      val decoder = WavDecoder // one decoder per partition
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val features: Seq[Any] =
          if (blob == null || mediaType == null ||
              (mediaType != "audio/wav" && mediaType != "audio/x-wav"))
            Seq(null, null, null)
          else tryDecode(decoder.features(blob)) match {
            case Some((n, s, sq)) => Seq(n, s, sq)
            case None => Seq(null, null, null) // quarantined
          }
        Row.fromSeq(r.toSeq ++ features)
      }
    }(enc)
  }

  /** Delta-sign audio fingerprint bands from ACTUALLY-DECODED PCM —
    * the audio twin of [[imageAHashBands]], after the shape of the
    * published Haitsma–Kalker audio fingerprint (sign of the
    * energy-band DELTA, not the raw value — robust to volume/DC
    * offset because any constant added to every sample cancels in the
    * comparison): per clip one bit per sample position,
    * `bit_k = s[(k+1) mod n] > s[k]` (strict integer compare,
    * wraparound closes the cycle so n samples give n bits), packed as
    * FOUR 16-bit band integers — the same SimHash-banding layout as
    * q155, so candidate generation is a band equi-join, never an
    * all-pairs scan. A single perturbed sample touches exactly two
    * deltas, so each planted variant flips ≤ 2 bits vs its group base
    * and same-group pairs sit at Hamming ≤ 4 while independent clips
    * sit near 32. Each band also carries `qt0..qt3` — its window's
    * EXACT raw-sample sum — the second component of the COMPOSED
    * candidate key ([[imageAHashBands]]'s recipe, audio face): 16
    * delta-sign bits alone admit ~n²/2¹⁶ random coincidences; an
    * exact window mass does not, while a one-sample perturbation
    * still leaves ≥ 2 of 4 windows bit-AND-mass identical (the
    * perturbed sample sits in one window's mass and its two touched
    * deltas span at most two windows). Decode + fingerprint run
    * row-local in mapPartitions; only (doc_id, 8 longs) ever move.
    * Non-WAV / null blobs pass through with null bands. */
  def audioFingerprintBands(blobs: DataFrame): DataFrame = {
    val bandFields = (0 until 4).map(j => s"band$j") ++
      (0 until 4).map(j => s"qt$j")
    val outSchema = StructType(blobs.schema.fields ++
      bandFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val nulls: Seq[Any] = Seq.fill(8)(null)
        val bands: Seq[Any] =
          if (blob == null || mediaType == null ||
              (mediaType != "audio/wav" && mediaType != "audio/x-wav"))
            nulls
          else tryDecode {
            val ais = wavReader.getAudioInputStream(
              new java.io.ByteArrayInputStream(blob))
            val samples =
              try {
                val fmt = ais.getFormat
                require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
                  s"expected 16-bit mono PCM, got $fmt")
                val bytes = ais.readAllBytes()
                val big = fmt.isBigEndian
                Array.tabulate(bytes.length / 2) { k =>
                  val i = 2 * k
                  if (big) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
                  else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
                }
              } finally ais.close()
            val n = samples.length
            // declared geometry contract: 4 equal bands of ≤64 bits
            // each. A foreign clip with n % 4 != 0 would otherwise
            // throw AIOOBE mid-pack (masquerading as a decode
            // failure), and n > 256 would alias shift counts mod 64,
            // silently corrupting fingerprints — fail the contract
            // explicitly so the quarantine reason is the geometry.
            require(n > 0 && n % 4 == 0 && n <= 256,
              s"unsupported clip geometry: $n samples (need >0, %4==0, <=256)")
            val bandBits = n / 4
            val out = new Array[Long](4)
            val qt = new Array[Long](4)
            var k = 0
            while (k < n) {
              if (samples((k + 1) % n) > samples(k))
                out(k / bandBits) |= 1L << (k % bandBits)
              qt(k / bandBits) += samples(k)
              k += 1
            }
            out.toSeq ++ qt.toSeq
          }.getOrElse(nulls) // quarantined
        Row.fromSeq(r.toSeq ++ bands)
      }
    }(enc)
  }

  /** Downsampled-audio feature extraction (q137): REAL decode, then
    * integer-factor decimation with mean pooling
    * ([[WavDecoder.decimated]]) — the standard resample-before-featurize
    * step of an audio training pipeline, kept integer-exact (floor
    * division both engines) so the oracle reproduces it
    * arithmetically. Same dispatch/null-passthrough contract as
    * [[audioFeatures]]; row-local, blobs never shuffle. */
  def audioDownsampled(blobs: DataFrame, factor: Int = 4): DataFrame = {
    val featureFields = Seq("n_out", "ds_sum", "ds_sum_sq", "ds_fp")
    val outSchema = StructType(blobs.schema.fields ++
      featureFields.map(StructField(_, LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      val decoder = WavDecoder // one decoder per partition
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        val features: Seq[Any] =
          if (blob == null || mediaType == null ||
              (mediaType != "audio/wav" && mediaType != "audio/x-wav"))
            Seq(null, null, null, null)
          else tryDecode(decoder.decimated(blob, factor)) match {
            case Some((n, s, sq, fp)) => Seq(n, s, sq, fp)
            case None => Seq(null, null, null, null) // quarantined
          }
        Row.fromSeq(r.toSeq ++ features)
      }
    }(enc)
  }

  // ---------------------------------------------------------------
  // Real video path (multi-frame animated GIF via javax.imageio —
  // in the JDK, zero-egress-safe). GIF is palette-indexed: with a
  // 256-entry grayscale palette (index i ↦ rgb(i,i,i)) every 8-bit
  // frame round-trips LOSSLESSLY, which is what makes a real decode
  // oracle-checkable by integer arithmetic (the video twin of the
  // q74 PNG / q76 WAV construction).
  // ---------------------------------------------------------------

  /** Synthetic-clip geometry: 8×8 grayscale frames; clip `id` has
    * 2 + (id mod 3) frames, so the corpus is RAGGED — frame counts,
    * not just pixel values, exercise the decoder loop. */
  val VideoSide = 8
  val VideoMaxFrames = 4
  val VideoPixels: Int = VideoSide * VideoSide

  def videoFrameCount(id: Long): Int = (2 + Math.floorMod(id, 3L)).toInt

  /** Gray value of pixel `j` of frame `f` in clip `id`: the dedicated
    * video affine hash of the flat (frame, pixel) index, mod 256. Same
    * reduce-mod-P-before-multiply guard as [[synthChannel]]. */
  def synthGray(id: Long, f: Int, j: Int): Int = {
    val (a, b) = graft.functions.PortableHash.FramePair
    val p = graft.functions.PortableHash.P
    val x = ((id % p) * (VideoMaxFrames * VideoPixels) + f * VideoPixels + j) % p
    (((a * x + b) % p) % 256L).toInt
  }

  /** q157 planted-near-dup video geometry — the video twin of
    * [[variantChannel]]/[[variantSample]]: consecutive-id groups of
    * [[VariantGroupSize]] share one base clip (frame COUNT and frame
    * content both keyed by `doc_id div 3`, so group members align
    * frame for frame; content is the quadratic mix — see
    * [[graft.functions.PortableHash.VideoVariantBasePair]]), and each
    * member perturbs exactly ONE flat (frame, pixel) position. Pure
    * integer arithmetic; the oracle reproduces every gray. */
  def videoVariantFrameCount(id: Long): Int =
    (2 + Math.floorMod(id / VariantGroupSize, 3L)).toInt

  /** The perturbed flat (frame·pixels + pixel) index of variant clip
    * `id` — over the GROUP's frame count, so the position always
    * lands on an existing frame. */
  def videoVariantPos(id: Long): Int = {
    val (a, b) = graft.functions.PortableHash.VideoVariantPosPair
    val p = graft.functions.PortableHash.P
    (((a * (id % p) + b) % p) % (videoVariantFrameCount(id) * VideoPixels)).toInt
  }

  /** Gray value of pixel `j` of frame `f` in VARIANT clip `id`. */
  def variantGray(id: Long, f: Int, j: Int): Int = {
    val p = graft.functions.PortableHash.P
    if (f * VideoPixels + j == videoVariantPos(id)) {
      val (a, b) = graft.functions.PortableHash.VideoVariantValuePair
      (((a * (id % p) + b) % p) % 256L).toInt
    } else {
      val (a, b) = graft.functions.PortableHash.VideoVariantBasePair
      val x = (((id / VariantGroupSize) % p) * (VideoMaxFrames * VideoPixels) +
        f * VideoPixels + j) % p
      val y = (a * x + b) % p
      (((y * y) % p + y) % p % 256L).toInt
    }
  }

  /** Identity grayscale palette — GIF stores this color table verbatim
    * and the decoder hands back exactly rgb(i,i,i) for stored index i,
    * the losslessness q81's oracle rests on. */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** The GIF reader/writer SPIs, resolved ONCE per JVM (executor):
    * `ImageIO.getImageReadersByFormatName` walks the service registry
    * on every call — the same per-call facade tax as the audio SPI
    * lookup ([[wavReader]]); provider instances are created per
    * partition instead. */
  private lazy val gifWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    imageIoHeapStreams
    javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      .getOriginatingProvider
  }
  private lazy val gifReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    imageIoHeapStreams
    javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      .getOriginatingProvider
  }

  /** Deterministic multi-frame GIF for `id`: [[videoFrameCount]] frames
    * of [[synthGray]] pixels, written as one animated-GIF sequence by
    * ImageIO. */
  def synthGif(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = gifWriterSpi.createWriterInstance()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val nf = videoFrameCount(id)
      var f = 0
      while (f < nf) {
        val img = new java.awt.image.BufferedImage(VideoSide, VideoSide,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var j = 0
        while (j < VideoPixels) {
          raster.setSample(j % VideoSide, j / VideoSide, 0, synthGray(id, f, j))
          j += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic VARIANT animated GIF for `id` — [[synthGif]]'s loop
    * over [[variantGray]] with the group-keyed frame count: the
    * planted-near-dup clip family. */
  def synthVariantGif(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = gifWriterSpi.createWriterInstance()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val nf = videoVariantFrameCount(id)
      var f = 0
      while (f < nf) {
        val img = new java.awt.image.BufferedImage(VideoSide, VideoSide,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var j = 0
        while (j < VideoPixels) {
          raster.setSample(j % VideoSide, j / VideoSide, 0, variantGray(id, f, j))
          j += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** [[ingestSynthVideo]] over the VARIANT family — the q157 ingest:
    * planted near-dup clips, encoded row-local, blobs never shuffle. */
  def ingestSynthVariantVideo(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("blob", BinaryType, nullable = true),
      StructField("meta", MediaMetaType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = synthVariantGif(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(blob,
          Row("image/gif", blob.length.toLong, DefaultChunkBytes)))
      }
    }(enc)
  }

  /** Per-frame hash bands + quarter gray totals from ACTUALLY-DECODED
    * video frames — the temporal member of the perceptual-hash family:
    * every frame box-resamples to a CANONICAL 8×8 grid (the geometry
    * guarantee — hash shape never follows the input size), hashes one
    * bit per virtual pixel packed as FOUR 16-bit band integers, and
    * carries each 16-pixel quarter's exact virtual-gray total
    * (`qt0..qt3`). Emitted as one row per frame (doc_id …, frame_idx,
    * n_frames, band0..band3, qt0..qt3).
    *
    * The bands alone are the VERIFY payload (aligned per-frame Hamming
    * — the metric with measured planted/unrelated separation); the
    * quarter totals exist for the CANDIDATE key: anchor candidacy
    * composes `band_j + qt_j·2^16`, so a blocking bucket requires a
    * quarter whose bit pattern AND exact gray mass both agree. That
    * kills the two collision families 16-bit bands alone admit —
    * random band coincidence (~n²/2^16 pairs) and this fixture's
    * near-affine cross-group drifts (comparison-type bits survive a
    * slowly-varying brightness shift; an exact 12-bit total does not)
    * — while planted near-dups keep 3 of 4 quarters bit-AND-total
    * identical (a one-pixel edit touches one quarter). Measured:
    * candidate volume linear through 20 k clips (SCALING.md round 14)
    * vs ~n²/2^16 before. Decode + hashing run row-local; blobs never
    * shuffle — only the small per-frame hash rows move. Non-GIF /
    * null blobs emit no rows (same contract as
    * [[videoFrameFeatures]]).
    *
    * THIS aHash variant (`v·64 > grid_total`, strict integer compare)
    * is the MEASURED ALTERNATIVE since round 18, not the production
    * family: a one-pixel edit shifts the frame total — the shared bit
    * threshold — so borderline bits anywhere in the frame can flip,
    * and `bench/vdhash_probe_r17.json` measured that coupling at
    * 99.74% planted anchor retention (15/6 000 anchor misses) vs the
    * neighbor-comparison family's 99.99%. Kept as the comparison
    * subject of `ScaleProbe --vdhash-probe`. */
  def videoFrameAHashBands(blobs: DataFrame): DataFrame =
    videoFrameBandsImpl(blobs, dhash = false)

  /** [[videoFrameAHashBands]] with the THRESHOLD-FREE difference-hash
    * bit rule — ADOPTED round-18 as THE production video fingerprint
    * (every video-dedup path: the q157 pair family, the q168/q171
    * two-table index + graduation, the q181 takedown and q184 rebuild
    * lifecycles, and the streaming twins compute these): bit j of the
    * canonical grid compares virtual gray j to virtual gray
    * (j+1) mod 64, no frame total anywhere — the video face of the
    * round-17 image adoption ([[imageDHashBands]]) and the same
    * local-bits argument: a one-pixel edit only touches the ≤ 2 bits
    * whose neighbor pair it overlaps, so a planted pair's total
    * aligned Hamming is ≤ 4 DETERMINISTICALLY (one edited pixel per
    * member), where the aHash threshold coupling could flip far-away
    * bits. Measured before adoption (`bench/vdhash_probe_r17.json`,
    * 500 k docs / 6 000-clip grain: 99.99% planted anchor retention
    * vs aHash's 99.74% — a 26× cut in anchor misses — candidate
    * volume still flat per-n). Quarter totals and frame counts are
    * identical to the aHash variant (the composed key's mass half is
    * shared). */
  def videoFrameDHashBands(blobs: DataFrame): DataFrame =
    videoFrameBandsImpl(blobs, dhash = true)

  private def videoFrameBandsImpl(blobs: DataFrame, dhash: Boolean): DataFrame = {
    val outSchema = StructType(blobs.schema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false)) ++
      (0 until 4).map(j => StructField(s"band$j", LongType, nullable = false)) ++
      (0 until 4).map(j => StructField(s"qt$j", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        if (blob == null || mediaType != "image/gif") Iterator.empty
        else {
          val frames = gifFrameBands(blob, dhash).getOrElse(Vector.empty) // quarantined
          frames.zipWithIndex.map { case (out, f) =>
            Row.fromSeq(r.toSeq ++ (Seq(f.toLong, frames.size.toLong) ++ out))
          }
        }
      }
    }(enc)
  }

  /** Decode a GIF blob's frames to per-frame hash rows of EIGHT longs —
    * `(band0..band3, qt0..qt3)`: 4×16-bit hash bands + the 4 exact
    * quarter gray totals of the canonical grid (frame order preserved);
    * None = quarantined (undecodable, or a frame below the declared
    * ≥8×8 geometry floor). The shared decode core of
    * [[videoFrameDHashBands]] / [[videoFrameAHashBands]] (per-frame
    * rows, batch) and [[videoFrameHashArray]] (one row per clip — the
    * stream-static probe's row-local shape).
    *
    * Construction — the geometry guarantee:
    *  1. Box-resample the W×H frame to a canonical 8×8 virtual grid:
    *     virtual pixel (cx, cy) = floor(mean gray) over the source box
    *     [⌊cx·W/8⌋, ⌊(cx+1)·W/8⌋) × [⌊cy·H/8⌋, ⌊(cy+1)·H/8⌋) — exact
    *     integer math, identity on an 8×8 source, area-average
    *     downsample on larger frames. Every decodable frame maps to
    *     the SAME 64-value grid, so hash and key shape never follow
    *     the input geometry (the round-13 scheme derived band width
    *     from the source pixel count — a thumbnail corpus collapsed
    *     its bucket space).
    *  2. One bit per virtual pixel, bit j of band j/16 at position
    *     j%16 (row-major): `dhash = true` (the round-18 production
    *     rule) compares grid neighbors `v(j) > v((j+1) mod 64)`;
    *     `dhash = false` is the aHash alternative `v·64 > grid_total`.
    *  3. `qt_q` = exact sum of quarter q's 16 virtual values (≤ 4080,
    *     12 bits) — the candidate key's second blocking signal; see
    *     [[videoFrameAHashBands]] for why bands alone under-block. */
  private def gifFrameBands(blob: Array[Byte],
                            dhash: Boolean = false): Option[Vector[Array[Long]]] =
    tryDecode {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val reader = gifReaderSpi.createReaderInstance()
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        (0 until n).iterator.map { f =>
          val img = reader.read(f)
          val w = img.getWidth
          val h = img.getHeight
          // geometry floor: anything at least as large as the canonical
          // grid resamples cleanly; smaller frames quarantine loudly
          // instead of aliasing into degenerate boxes
          require(w >= 8 && h >= 8,
            s"unsupported frame geometry: ${w}x$h (need >= 8x8)")
          val v = new Array[Long](64)
          var total = 0L
          var cy = 0
          while (cy < 8) {
            val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
            var cx = 0
            while (cx < 8) {
              val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
              var sum = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  sum += (img.getRGB(x, y) & 0xff).toLong
                  x += 1
                }
                y += 1
              }
              val vv = sum / ((y1 - y0).toLong * (x1 - x0))
              v(cy * 8 + cx) = vv
              total += vv
              cx += 1
            }
            cy += 1
          }
          val out = new Array[Long](8)
          var j = 0
          while (j < 64) {
            val bit = if (dhash) v(j) > v((j + 1) % 64) else v(j) * 64 > total
            if (bit) out(j / 16) |= 1L << (j % 16)
            out(4 + j / 16) += v(j)
            j += 1
          }
          out
        }.toVector // materialize BEFORE the finally disposes the reader
      } finally { reader.dispose(); iis.close() }
    }

  /** [[videoFrameDHashBands]] folded to ONE ROW PER CLIP (the SAME
    * production dHash bit family — the stream twin and its batch
    * oracle verify aligned Hamming between this array and the
    * per-frame rows, so the two shapes must ride one family): (input cols…,
    * n_frames, frames ARRAY<STRUCT<band0..band3, qt0..qt3>>) with array
    * position = frame index. This is the shape a STATELESS stream-static probe
    * needs — the whole clip's hash rides one row, so the aligned
    * per-frame Hamming against a static partner array is row-local
    * higher-order-function math (zip_with + aggregate), never a
    * streaming aggregation. Non-GIF / null / quarantined blobs emit
    * no row. */
  def videoFrameHashArray(blobs: DataFrame): DataFrame = {
    val bandStruct = StructType(
      (0 until 4).map(j => StructField(s"band$j", LongType, nullable = false)) ++
        (0 until 4).map(j => StructField(s"qt$j", LongType, nullable = false)))
    val outSchema = StructType(blobs.schema.fields ++ Seq(
      StructField("n_frames", LongType, nullable = false),
      StructField("frames", ArrayType(bandStruct, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        if (blob == null || mediaType != "image/gif") Iterator.empty
        else gifFrameBands(blob, dhash = true) match {
          // quarantined, or a frameless container (downstream consumers
          // anchor on frame 0 — a zero-frame row would put nulls into
          // the band keys instead of being absent like the per-frame
          // layout's natural empty)
          case None => Iterator.empty
          case Some(frames) if frames.isEmpty => Iterator.empty
          case Some(frames) => Iterator.single(Row.fromSeq(r.toSeq ++ Seq(
            frames.size.toLong, frames.map(out => Row.fromSeq(out.toSeq)))))
        }
      }
    }(enc)
  }

  /** Attach a deterministic animated-GIF blob per row (media_type
    * "image/gif") — the video twin of [[ingestSynthImages]]; encoding
    * is row-local, blobs never shuffle. */
  def ingestSynthVideo(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("blob", BinaryType, nullable = true),
      StructField("meta", MediaMetaType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val blob = synthGif(r.getLong(idIdx))
        Row.fromSeq(r.toSeq ++ Seq(blob,
          Row("image/gif", blob.length.toLong, DefaultChunkBytes)))
      }
    }(enc)
  }

  /** The real multi-frame decoder: one ImageIO GIF reader per call site
    * (instances are cheap once the SPI is resolved; not thread-safe, so
    * per-partition use only). */
  object GifDecoder extends Serializable {
    /** (n_frames, sampled (frame_idx, gray_sum) pairs) of one animated
      * GIF, sampling every `everyK`-th frame — REAL temporal frame
      * sampling over actually-decoded pixels (the video analogue of
      * [[sampleFrames]]' byte-chunk stand-in). */
    def sampledFrames(blob: Array[Byte], everyK: Int): (Long, Seq[(Long, Long)]) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val reader = gifReaderSpi.createReaderInstance()
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        val out = Seq.newBuilder[(Long, Long)]
        var f = 0
        while (f < n) {
          if (f % everyK == 0) {
            val img = reader.read(f)
            var s = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                s += (img.getRGB(x, y) & 0xff)
                x += 1
              }
              y += 1
            }
            out += ((f.toLong, s))
          }
          f += 1
        }
        (n.toLong, out.result())
      } finally { reader.dispose(); iis.close() }
    }
  }

  /** Temporal frame sampling over video blobs: one output row per
    * SAMPLED frame — (frame_idx, n_frames, gray_sum) appended to the
    * input row — from ACTUALLY-DECODED frames. Non-GIF, unknown-type,
    * or null blobs emit no rows (a video op over a mixed corpus scans
    * past foreign media). One decoder per partition; blobs never
    * shuffle — only the small per-frame feature rows move. */
  def videoFrameFeatures(blobs: DataFrame, everyK: Int): DataFrame = {
    require(everyK > 0, "everyK must be positive")
    val outSchema = StructType(blobs.schema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("gray_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      val decoder = GifDecoder // one decoder per partition
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](blobIdx)
        val mediaType = r.getStruct(metaIdx).getString(0)
        if (blob == null || mediaType != "image/gif") Iterator.empty
        else tryDecode(decoder.sampledFrames(blob, everyK)) match {
          case Some((n, frames)) =>
            frames.iterator.map { case (f, s) =>
              Row.fromSeq(r.toSeq ++ Seq(f, n, s))
            }
          case None => Iterator.empty // quarantined
        }
      }
    }(enc)
  }

  /** Deterministic fake "decode": byte statistics standing in for real
    * decoded features — the fallback contract for media types the JDK
    * has no codec for (the real paths are [[ImageIoDecoder]] for
    * images, [[WavDecoder]] for WAV audio, and [[GifDecoder]] for
    * multi-frame GIF video). */
  object StubDecoder extends Serializable {
    /** (byte_sum mod P, n_chunks) for one blob. */
    def features(blob: Array[Byte], chunkBytes: Int): (Long, Long) = {
      var sum = 0L
      var i = 0
      while (i < blob.length) {
        sum = (sum + (blob(i) & 0xff)) % graft.functions.PortableHash.P
        i += 1
      }
      val chunks = (blob.length + chunkBytes - 1) / chunkBytes
      (sum, chunks.toLong)
    }
  }

  /** Batched feature extraction over the blob column: adds
    * `byte_sum` and `n_chunks`. Runs as mapPartitions with an explicit
    * batch size — the decoder is instantiated once per partition and
    * fed batches, mirroring the mapInPandas batch contract. */
  def extractFeatures(blobs: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(blobs.schema.fields ++ Seq(
      StructField("byte_sum", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = blobs.schema.fieldIndex("blob")
    val metaIdx = blobs.schema.fieldIndex("meta")
    blobs.mapPartitions { rows =>
      // one decoder per partition (a model-backed decoder loads here)
      val decoder = StubDecoder
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val blob = r.getAs[Array[Byte]](blobIdx)
          val chunkBytes = r.getStruct(metaIdx).getInt(2)
          val (sum, chunks) =
            if (blob == null) (0L, 0L) else decoder.features(blob, chunkBytes)
          Row.fromSeq(r.toSeq ++ Seq(sum, chunks))
        }
      }
    }(enc)
  }

  /** "Resize" a blob column to at most `targetBytes`, updating the
    * metadata struct to the new size. With no media libraries in this
    * container the transform is a deterministic truncation standing in
    * for a real downscale — the contract a real resizer must keep is
    * what this implements and the spec asserts: row-local (no shuffle),
    * metadata consistent with the new payload, null blobs passed
    * through untouched, already-small blobs unchanged. */
  def resizeBlobs(blobs: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    blobs
      .withColumn("blob",
        when(col("blob").isNull, col("blob"))
          .otherwise(expr(s"substring(blob, 1, $targetBytes)")))
      .withColumn("meta", struct(
        col("meta.media_type").as("media_type"),
        when(col("blob").isNull, col("meta.n_bytes"))
          .otherwise(octet_length(col("blob")).cast("long")).as("n_bytes"),
        col("meta.chunk_bytes").as("chunk_bytes")))
  }

  /** Frame sampling: emit every k-th chunk of each blob as its own row
    * (`frame_idx`, `frame` BINARY) — the shape a video/audio sampler
    * produces. Row-local posexplode; no shuffle. Empty and null blobs
    * emit no frames (the `when` guard matters: an unguarded
    * `sequence(0, n_chunks - 1)` THROWS on n_chunks = 0 because
    * sequence refuses start > stop with a positive step). */
  def sampleFrames(blobs: DataFrame, everyK: Int = 4): DataFrame = {
    require(everyK > 0, "everyK must be positive")
    blobs
      .withColumn("n_chunks",
        ceil(octet_length(col("blob")).cast("double") / col("meta.chunk_bytes")).cast("int"))
      .withColumn("frame_idx",
        explode(when(col("n_chunks") > 0,
          filter(sequence(lit(0), col("n_chunks") - 1), i => i % everyK === 0))
          .otherwise(typedLit(Seq.empty[Int]))))
      .withColumn("frame",
        expr(s"substring(blob, frame_idx * meta.chunk_bytes + 1, meta.chunk_bytes)"))
      .drop("n_chunks")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val blobs = Multimodal.ingestAsBlobs(
    spark.read.parquet(s"$sf0001/documents.parquet")).cache()

  test("ingest produces binary blobs with consistent metadata") {
    val r = blobs.select(octet_length($"blob"), $"meta.n_bytes", length($"text")).head()
    assert(r.getInt(0).toLong === r.getLong(1))
    assert(r.getLong(1) === r.getInt(2).toLong) // ASCII corpus: bytes == chars
  }

  test("feature extraction matches a driver-side reference computation") {
    val row = Multimodal.extractFeatures(blobs)
      .select($"text", $"byte_sum", $"n_chunks").head()
    val bytes = row.getString(0).getBytes("UTF-8")
    val (wantSum, wantChunks) = Multimodal.StubDecoder.features(bytes, 256)
    assert(row.getLong(1) === wantSum)
    assert(row.getLong(2) === wantChunks)
  }

  test("feature extraction passes null blobs through as zero features") {
    val df = Seq(("x", Option.empty[Array[Byte]])).toDF("id", "blob")
      .withColumn("meta", struct(lit("text/plain").as("media_type"),
        lit(0L).as("n_bytes"), lit(256).as("chunk_bytes")))
    val out = Multimodal.extractFeatures(df).select($"byte_sum", $"n_chunks").head()
    assert(out.getLong(0) === 0L && out.getLong(1) === 0L)
  }

  test("batch size does not change results (batch contract)") {
    val a = Multimodal.extractFeatures(blobs, batchSize = 1)
      .select($"doc_id", $"byte_sum").orderBy($"doc_id").collect().toSeq
    val b = Multimodal.extractFeatures(blobs, batchSize = 500)
      .select($"doc_id", $"byte_sum").orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  test("frame sampling emits every k-th chunk with correct sizes") {
    val frames = Multimodal.sampleFrames(blobs, everyK = 2)
      .select($"doc_id", $"frame_idx", octet_length($"frame").as("len"), $"meta.n_bytes")
    val r = frames.filter($"frame_idx" === 0).head()
    assert(r.getInt(2) === math.min(256L, r.getLong(3)).toInt)
    // all sampled indexes are multiples of k
    assert(frames.filter($"frame_idx" % 2 =!= 0).count() === 0)
    // frame count per doc = ceil(chunks / k)
    val perDoc = frames.groupBy($"doc_id").agg(count(lit(1)).as("n"), first($"n_bytes").as("nb"))
      .withColumn("chunks", ceil($"nb" / 256.0))
      .withColumn("want", ceil($"chunks" / 2.0).cast("long"))
    assert(perDoc.filter($"n" =!= $"want").count() === 0)
  }

  test("resize truncates to the target, keeps metadata consistent, passes nulls") {
    val resized = Multimodal.resizeBlobs(blobs, targetBytes = 100)
    val bad = resized.filter(
      octet_length($"blob") =!= $"meta.n_bytes" || $"meta.n_bytes" > 100)
    assert(bad.count() === 0)
    // small blobs unchanged byte-for-byte
    val small = blobs.filter(octet_length($"blob") <= 100).select($"doc_id", $"blob")
    val smallAfter = Multimodal.resizeBlobs(blobs, 100)
      .filter(octet_length($"blob") <= 100 && $"meta.n_bytes" === octet_length($"blob"))
      .select($"doc_id", $"blob")
    assert(small.except(smallAfter).count() === 0)
    // null blob passes through with metadata untouched
    val n = Seq((1L, "x")).toDF("doc_id", "text")
      .withColumn("blob", lit(null).cast("binary"))
      .withColumn("meta", struct(lit("text/plain").as("media_type"),
        lit(42L).as("n_bytes"), lit(256).as("chunk_bytes")))
    val r = Multimodal.resizeBlobs(n, 10).select($"blob", $"meta.n_bytes").head()
    assert(r.isNullAt(0) && r.getLong(1) === 42L)
  }

  test("synthetic PNG round-trips through a real ImageIO decode to the exact pixels") {
    // encode with ImageIO, decode with ImageIO, compare against the
    // arithmetic the oracle uses: known image -> known features
    val id = 5L
    val png = Multimodal.synthPng(id)
    // PNG magic bytes: this is a real encoded image, not byte stats
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
      png(2) === 'N'.toByte && png(3) === 'G'.toByte)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === Multimodal.SynthSide && img.getHeight === Multimodal.SynthSide)
    for (y <- 0 until Multimodal.SynthSide; x <- 0 until Multimodal.SynthSide) {
      val k = (y * Multimodal.SynthSide + x) * Multimodal.SynthChannels
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === Multimodal.synthChannel(id, k))
      assert(((rgb >> 8) & 0xff) === Multimodal.synthChannel(id, k + 1))
      assert((rgb & 0xff) === Multimodal.synthChannel(id, k + 2))
    }
    // the distributed path lands on the same sums as the direct formula
    val feats = Multimodal.imageFeatures(
        Multimodal.ingestSynthImages(Seq(id).toDF("doc_id")))
      .select($"width", $"height", $"sum_r", $"sum_g", $"sum_b").head()
    def wantSum(c: Int): Long =
      (0 until Multimodal.SynthPixelValues).filter(_ % 3 == c)
        .map(k => Multimodal.synthChannel(id, k).toLong).sum
    assert(feats.getLong(0) === Multimodal.SynthSide.toLong)
    assert(feats.getLong(1) === Multimodal.SynthSide.toLong)
    assert(feats.getLong(2) === wantSum(0))
    assert(feats.getLong(3) === wantSum(1))
    assert(feats.getLong(4) === wantSum(2))
  }

  test("JPEG blobs decode for real through imageFeatures, within lossy tolerance") {
    // JPEG is lossy and its IDCT is implementation-defined, so there is
    // no hash oracle — the law here is tolerance: geometry must be
    // exact, channel sums must be close to the lossless truth. Encode
    // the known synthetic image as JPEG with the JDK's own writer,
    // then run it through the SAME distributed path the PNG test uses.
    val id = 5L
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthPng(id)))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", baos),
      "JDK ImageIO must ship a JPEG writer")
    val jpeg = baos.toByteArray
    // JPEG SOI marker: a real encoded JPEG, not a renamed PNG
    assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8)
    val blobs = Seq((id, jpeg)).toDF("doc_id", "blob")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        lit("image/jpeg").as("media_type"),
        lit(jpeg.length.toLong).as("n_bytes"),
        lit(Multimodal.DefaultChunkBytes).as("chunk_bytes")))
    val feats = Multimodal.imageFeatures(blobs)
      .select($"width", $"height", $"sum_r", $"sum_g", $"sum_b").head()
    assert(feats.getLong(0) === Multimodal.SynthSide.toLong)
    assert(feats.getLong(1) === Multimodal.SynthSide.toLong)
    def wantSum(c: Int): Long =
      (0 until Multimodal.SynthPixelValues).filter(_ % 3 == c)
        .map(k => Multimodal.synthChannel(id, k).toLong).sum
    val nPix = Multimodal.SynthSide * Multimodal.SynthSide
    // mean per-pixel channel error under default-quality JPEG on an
    // 8x8 high-frequency image: generous but non-vacuous bound of 48
    // (channel range is 0..255; a stub or zeroed decode would fail)
    Seq(2, 3, 4).zipWithIndex.foreach { case (i, c) =>
      val got = feats.getLong(i)
      val want = wantSum(c)
      assert(math.abs(got - want) <= 48L * nPix,
        s"channel $c: got $got want ~$want")
      assert(got > 0L)
    }
  }

  test("2x2 average pooling matches the integer formula cell for cell") {
    val id = 7L
    val side = Multimodal.SynthSide
    val cw = side / 2
    // driver recompute straight from the synth formula: pooled cell
    // value = floor-avg of its 4 pixel channels
    def pix(y: Int, x: Int, c: Int) =
      Multimodal.synthChannel(id, (y * side + x) * 3 + c).toLong
    def pooledCell(cy: Int, cx: Int, c: Int): Long =
      (pix(2 * cy, 2 * cx, c) + pix(2 * cy, 2 * cx + 1, c) +
        pix(2 * cy + 1, 2 * cx, c) + pix(2 * cy + 1, 2 * cx + 1, c)) / 4
    var (wr, wg, wb, wfp) = (0L, 0L, 0L, 0L)
    for (cy <- 0 until cw; cx <- 0 until cw) {
      val (pr, pg, pb) =
        (pooledCell(cy, cx, 0), pooledCell(cy, cx, 1), pooledCell(cy, cx, 2))
      wr += pr; wg += pg; wb += pb
      wfp += (cy.toLong * cw + cx + 1) * (pr + 256L * pg + 65536L * pb)
    }
    val got = Multimodal.imagePooledFeatures(
        Multimodal.ingestSynthImages(Seq(id).toDF("doc_id")), pool = 2)
      .select($"p_sum_r", $"p_sum_g", $"p_sum_b", $"p_fp").head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ===
      ((wr, wg, wb, wfp)))
    // non-image blobs pass through with null pooled features
    val t = Multimodal.imagePooledFeatures(Multimodal.ingestAsBlobs(
      Seq((1L, "text")).toDF("doc_id", "text")))
    assert(t.select($"p_fp").head().isNullAt(0))
  }

  test("audio decimation truncates negative windows like DuckDB's integer //") {
    val id = 7L
    val f = 4
    val samples = (0 until Multimodal.SynthSamples)
      .map(k => Multimodal.synthSample(id, k).toLong)
    val pooled = samples.grouped(f).map(w => w.sum / f).toSeq
    // the synthetic clip actually exercises the windows where the
    // division CONVENTION matters (negative, non-divisible — floor
    // and truncation differ there) — otherwise this test is vacuous
    assert(pooled.exists(_ < 0), "fixture clip should have negative pooled windows")
    assert(samples.grouped(f).exists(w => w.sum < 0 && w.sum % f != 0),
      "need a window where floor and truncation differ")
    val want = (pooled.length.toLong, pooled.sum,
      pooled.map(v => v * v).sum,
      pooled.zipWithIndex.map { case (v, j) => (j + 1L) * v }.sum)
    val got = Multimodal.audioDownsampled(
        Multimodal.ingestSynthAudio(Seq(id).toDF("doc_id")), factor = f)
      .select($"n_out", $"ds_sum", $"ds_sum_sq", $"ds_fp").head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) === want)
  }

  test("synthetic WAV round-trips through a real javax.sound decode to the exact samples") {
    // encode with the JDK's WAV writer, decode with the JDK's reader,
    // compare against the arithmetic the oracle uses: known waveform ->
    // known features (the audio twin of the PNG round-trip test)
    val id = 5L
    val wav = Multimodal.synthWav(id)
    // RIFF/WAVE magic: this is a real encoded container, not byte stats
    assert(wav(0) === 'R'.toByte && wav(1) === 'I'.toByte &&
      wav(2) === 'F'.toByte && wav(3) === 'F'.toByte)
    assert(wav(8) === 'W'.toByte && wav(9) === 'A'.toByte &&
      wav(10) === 'V'.toByte && wav(11) === 'E'.toByte)
    // direct decoder: every frame equals the synth formula
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bytes = ais.readAllBytes()
    assert(bytes.length === Multimodal.SynthSamples * 2)
    for (k <- 0 until Multimodal.SynthSamples) {
      val v = (bytes(2 * k + 1) << 8) | (bytes(2 * k) & 0xff)
      assert(v === Multimodal.synthSample(id, k), s"sample $k")
    }
    // the distributed path lands on the same statistics as the formula
    val feats = Multimodal.audioFeatures(
        Multimodal.ingestSynthAudio(Seq(id).toDF("doc_id")))
      .select($"n_samples", $"sum_s", $"sum_sq").head()
    val samples = (0 until Multimodal.SynthSamples)
      .map(k => Multimodal.synthSample(id, k).toLong)
    assert(feats.getLong(0) === Multimodal.SynthSamples.toLong)
    assert(feats.getLong(1) === samples.sum)
    assert(feats.getLong(2) === samples.map(v => v * v).sum)
    // the waveform is non-trivial: both signs present
    assert(samples.exists(_ < 0) && samples.exists(_ > 0))
  }

  test("audio feature extraction passes non-audio and null blobs through as nulls") {
    // the audio/mpeg row is the load-bearing case: the WAV-only decoder
    // must not be handed a compressed-audio type it cannot parse (a
    // startsWith("audio/") dispatch would crash the task here)
    val mixed = Multimodal.ingestAsBlobs(Seq((1L, "text row")).toDF("doc_id", "text"))
      .select($"doc_id", $"blob", $"meta")
      .unionByName(Multimodal.ingestSynthAudio(Seq(2L).toDF("doc_id"))
        .select($"doc_id", $"blob", $"meta"))
      .unionByName(Multimodal.ingestAsBlobs(Seq((3L, "not mpeg")).toDF("doc_id", "text"))
        .select($"doc_id", $"blob",
          struct(lit("audio/mpeg").as("media_type"), $"meta.n_bytes",
            $"meta.chunk_bytes").as("meta")))
    val out = Multimodal.audioFeatures(mixed).orderBy($"doc_id")
      .select($"doc_id", $"n_samples", $"sum_sq").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2)) // text/plain: untouched
    assert(!out(1).isNullAt(1) &&
      out(1).getLong(1) === Multimodal.SynthSamples.toLong)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // audio/mpeg: no JDK codec
  }

  test("image feature extraction passes non-image and null blobs through as nulls") {
    // the stub remains the declared fallback for codec-less media; the
    // image decoder must not try to decode it
    val mixed = Multimodal.ingestAsBlobs(Seq((1L, "text row")).toDF("doc_id", "text"))
      .select($"doc_id", $"blob", $"meta")
      .unionByName(Multimodal.ingestSynthImages(Seq(2L).toDF("doc_id"))
        .select($"doc_id", $"blob", $"meta"))
    val out = Multimodal.imageFeatures(mixed).orderBy($"doc_id")
      .select($"doc_id", $"width", $"sum_r").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2)) // text/plain: untouched
    assert(!out(1).isNullAt(1) && out(1).getLong(1) === Multimodal.SynthSide.toLong)
  }

  test("frame sampling emits nothing for empty and null blobs, without erroring") {
    val edge = Multimodal.ingestAsBlobs(
        Seq((1L, "payload"), (2L, "")).toDF("doc_id", "text"))
      .unionByName(
        Seq((3L, "x")).toDF("doc_id", "text")
          .withColumn("blob", lit(null).cast("binary"))
          .withColumn("meta", struct(
            lit("text/plain").as("media_type"),
            lit(0L).as("n_bytes"),
            lit(256).as("chunk_bytes"))))
    val out = Multimodal.sampleFrames(edge, everyK = 1)
      .select($"doc_id").as[Long].collect().toSeq
    assert(out === Seq(1L)) // only the non-empty blob produces frames
  }

  test("synthetic GIF round-trips through a real multi-frame decode to exact grays") {
    // encode with ImageIO's GIF writer, decode with its reader; the
    // identity gray palette makes the 8-bit round-trip lossless, so
    // every decoded pixel must equal the synth formula (the video twin
    // of the PNG and WAV round-trip tests)
    val id = 7L // 7 % 3 = 1 -> 3 frames
    val gif = Multimodal.synthGif(id)
    assert(gif(0) === 'G'.toByte && gif(1) === 'I'.toByte && gif(2) === 'F'.toByte)
    val (n, all) = Multimodal.GifDecoder.sampledFrames(gif, everyK = 1)
    assert(n === 3L)
    assert(all.map(_._1) === Seq(0L, 1L, 2L))
    all.foreach { case (f, s) =>
      val want = (0 until Multimodal.VideoPixels)
        .map(j => Multimodal.synthGray(id, f.toInt, j).toLong).sum
      assert(s === want, s"frame $f gray sum")
    }
    // temporal sampling: every 2nd frame of a 3-frame clip is {0, 2}
    val (_, sampled) = Multimodal.GifDecoder.sampledFrames(gif, everyK = 2)
    assert(sampled.map(_._1) === Seq(0L, 2L))
    // the distributed path lands on the same statistics
    val rows = Multimodal.videoFrameFeatures(
        Multimodal.ingestSynthVideo(Seq(id).toDF("doc_id")), everyK = 2)
      .select($"frame_idx", $"n_frames", $"gray_sum")
      .orderBy($"frame_idx")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq(0L, 2L))
    assert(rows.forall(_._2 === 3L))
    assert(rows.map(r => r._1 -> r._3).toMap === sampled.toMap)
  }

  test("video frame features scan past non-gif blobs instead of decoding them") {
    val mixed = Multimodal.ingestAsBlobs(Seq((1L, "text row")).toDF("doc_id", "text"))
      .select($"doc_id", $"blob", $"meta")
      .unionByName(Multimodal.ingestSynthVideo(Seq(2L).toDF("doc_id"))
        .select($"doc_id", $"blob", $"meta"))
    val out = Multimodal.videoFrameFeatures(mixed, everyK = 1)
      .select($"doc_id").distinct().as[Long].collect().toSeq
    assert(out === Seq(2L)) // the text blob emits no frame rows
  }

  test("aHash bands from a decoded variant PNG match the pixel formula bit for bit") {
    val id = 77L
    val got = Multimodal.imageAHashBands(
        Multimodal.ingestSynthVariantImages(Seq(id).toDF("doc_id")))
      .select($"band0", $"band1", $"band2", $"band3")
      .as[(Long, Long, Long, Long)].head()
    // driver-side reference straight from variantChannel — the decode
    // round-trip must reproduce exactly these bits
    val gray = (0 until 64).map(fp =>
      (0 until 3).map(c => Multimodal.variantChannel(id, fp * 3 + c).toLong).sum)
    val total = gray.sum
    val bands = new Array[Long](4)
    for (fp <- 0 until 64 if gray(fp) * 64 > total)
      bands(fp / 16) |= 1L << (fp % 16)
    assert((got._1, got._2, got._3, got._4) === ((bands(0), bands(1), bands(2), bands(3))))
  }

  test("dHash bands from a decoded variant PNG match the pixel formula bit for bit") {
    // the ADOPTED image bit family (round-17, bench/dhash_probe_r17):
    // bit fp compares NEIGHBOR grays — threshold-free, so the decode
    // round-trip must reproduce the neighbor-comparison bits exactly
    val id = 77L
    val got = Multimodal.imageDHashBands(
        Multimodal.ingestSynthVariantImages(Seq(id).toDF("doc_id")))
      .select($"band0", $"band1", $"band2", $"band3")
      .as[(Long, Long, Long, Long)].head()
    val gray = (0 until 64).map(fp =>
      (0 until 3).map(c => Multimodal.variantChannel(id, fp * 3 + c).toLong).sum)
    val bands = new Array[Long](4)
    for (fp <- 0 until 64 if gray(fp) > gray((fp + 1) % 64))
      bands(fp / 16) |= 1L << (fp % 16)
    assert((got._1, got._2, got._3, got._4) === ((bands(0), bands(1), bands(2), bands(3))))
  }

  test("a planted variant pair flips at most 4 dHash bits, deterministically") {
    // the adoption's structural claim: each member perturbs ONE pixel,
    // a pixel touches exactly two neighbor comparisons, two members
    // differ in ≤ 2 pixels → ≤ 4 bit flips, NO global-threshold
    // coupling (the aHash family's measured 2% loss mechanism)
    val ids = Seq(9L, 10L, 11L) // one variant group
    val bands = Multimodal.imageDHashBands(
        Multimodal.ingestSynthVariantImages(ids.toDF("doc_id")))
      .select($"doc_id", $"band0", $"band1", $"band2", $"band3")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    for (a <- ids; b <- ids if a < b) {
      val ham = bands(a).zip(bands(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(ham <= 4, s"planted pair ($a,$b) at dHash Hamming $ham > 4")
    }
  }

  test("variant images perturb exactly one pixel of the group base") {
    val id = 10L // group 3 member
    val pstar = Multimodal.variantPixel(id)
    val diffs = (0 until 64).filter { fp =>
      (0 until 3).exists { c =>
        val k = fp * 3 + c
        // the group base is the id-independent quadratic mix: compare
        // against a SIBLING with a different perturbed pixel
        Multimodal.variantChannel(id, k) != Multimodal.variantChannel(id + 1, k)
      }
    }
    // siblings differ exactly on the union of their two perturbed
    // pixels (they share the group base everywhere else)
    assert(diffs.toSet === Set(pstar, Multimodal.variantPixel(id + 1)))
  }

  test("fingerprint bands from a decoded variant WAV match the sample formula bit for bit") {
    val id = 23L
    val df = Seq(id).toDF("doc_id")
    val got = Multimodal.audioFingerprintBands(Multimodal.ingestSynthVariantAudio(df))
      .select($"band0", $"band1", $"band2", $"band3")
      .as[(Long, Long, Long, Long)].head()
    val n = Multimodal.SynthSamples
    val s = Array.tabulate(n)(k => Multimodal.variantSample(id, k))
    val bands = new Array[Long](4)
    for (k <- 0 until n if s((k + 1) % n) > s(k))
      bands(k / (n / 4)) |= 1L << (k % (n / 4))
    assert(got === ((bands(0), bands(1), bands(2), bands(3))))
  }

  test("variant clips perturb exactly one sample of the group base") {
    val id = 10L // group 3 member; compare against a sibling
    val diffs = (0 until Multimodal.SynthSamples).filter(k =>
      Multimodal.variantSample(id, k) != Multimodal.variantSample(id + 1, k))
    // siblings differ exactly on the union of their two perturbed
    // samples (they share the group base everywhere else)
    assert(diffs.toSet ===
      Set(Multimodal.variantSamplePos(id), Multimodal.variantSamplePos(id + 1)))
  }

  test("a one-sample perturbation flips at most two delta-sign bits") {
    // the Hamming bound AfpMaxHamming rests on: member vs its group
    // base differ only at the two deltas adjacent to the perturbed
    // sample, so same-group pairs sit at Hamming <= 4
    val n = Multimodal.SynthSamples
    def bits(s: Array[Int]): Set[Int] =
      (0 until n).filter(k => s((k + 1) % n) > s(k)).toSet
    for (id <- 0L until 12L) {
      val member = Array.tabulate(n)(k => Multimodal.variantSample(id, k))
      val base = member.clone()
      // reconstruct the unperturbed base at the perturbed position
      val pos = Multimodal.variantSamplePos(id)
      val (a, b) = graft.functions.PortableHash.AudioVariantBasePair
      val p = graft.functions.PortableHash.P
      val x = (((id / Multimodal.VariantGroupSize) % p) * n + pos) % p
      val y = (a * x + b) % p
      base(pos) = ((((y * y) % p + y) % p % 65536L) - 32768L).toInt
      val flipped = (bits(member) diff bits(base)) union (bits(base) diff bits(member))
      assert(flipped.size <= 2, s"id=$id flipped ${flipped.size} bits")
    }
  }

  test("q156 recovers the planted audio near-dup groups with no cross-group noise") {
    val out = SparkEntry.queries("q156_audio_fingerprint")(spark, sf0001)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSeq
    val g = Multimodal.VariantGroupSize
    assert(out.nonEmpty)
    // every pair is same-group (no spurious cross-group collisions)…
    assert(out.forall { case (a, b, _) => a / g == b / g })
    assert(out.forall(_._3 <= graft.queries.MultimodalQueries.AfpMaxHamming))
    // …and recall over the planted pairs is near-total (a pair can
    // only miss when neither of its <= 4 differing bits leaves a band
    // agreeing — the banding heuristic's declared semantics)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id").as[Long].collect().toSeq
    val planted = docs.groupBy(_ / g).values.map(m => m.size * (m.size - 1) / 2).sum
    assert(out.size >= (planted * 9) / 10,
      s"recovered ${out.size} of $planted planted pairs")
  }

  test("per-frame hash bands from a decoded variant GIF match the gray formula bit for bit") {
    val id = 17L
    val df = Seq(id).toDF("doc_id")
    val px = Multimodal.VideoPixels
    val nf = Multimodal.videoVariantFrameCount(id)
    def collect(fn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      fn(Multimodal.ingestSynthVariantVideo(df))
        .select($"frame_idx", $"n_frames", $"band0", $"band1", $"band2", $"band3",
          $"qt0", $"qt1", $"qt2", $"qt3")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1)
    // the PRODUCTION family: dHash neighbor-comparison bits
    val gotD = collect(Multimodal.videoFrameDHashBands)
    // the measured alternative: aHash frame-total-threshold bits
    val gotA = collect(Multimodal.videoFrameAHashBands)
    assert(gotD.length === nf && gotD.forall(_._2 === nf.toLong))
    assert(gotA.length === nf && gotA.forall(_._2 === nf.toLong))
    for (f <- 0 until nf) {
      // the fixture frame IS the canonical 8×8 grid, so the
      // box-resample is identity: virtual pixel = formula gray. qt_q
      // is quarter q's exact gray total — the candidate key's second
      // blocking signal, IDENTICAL between the two bit families
      val gray = Array.tabulate(px)(j => Multimodal.variantGray(id, f, j).toLong)
      val total = gray.sum
      val bandsD = new Array[Long](4)
      val bandsA = new Array[Long](4)
      val qt = new Array[Long](4)
      for (j <- 0 until px) {
        if (gray(j) > gray((j + 1) % px)) bandsD(j / 16) |= 1L << (j % 16)
        if (gray(j) * px > total) bandsA(j / 16) |= 1L << (j % 16)
        qt(j / 16) += gray(j)
      }
      assert((gotD(f)._3, gotD(f)._4, gotD(f)._5, gotD(f)._6) ===
        ((bandsD(0), bandsD(1), bandsD(2), bandsD(3))), s"frame $f dhash")
      assert((gotA(f)._3, gotA(f)._4, gotA(f)._5, gotA(f)._6) ===
        ((bandsA(0), bandsA(1), bandsA(2), bandsA(3))), s"frame $f ahash")
      assert((gotD(f)._7, gotD(f)._8, gotD(f)._9, gotD(f)._10) ===
        ((qt(0), qt(1), qt(2), qt(3))), s"frame $f quarter totals")
      assert((gotA(f)._7, gotA(f)._8, gotA(f)._9, gotA(f)._10) ===
        ((qt(0), qt(1), qt(2), qt(3))), s"frame $f quarter totals (ahash)")
    }
  }

  test("planted sibling clips sit within deterministic dHash Hamming 4 (one edited pixel each flips <= 2 neighbor bits)") {
    val id = 10L // group 3 member; sibling id+1
    val px = Multimodal.VideoPixels
    val nf = Multimodal.videoVariantFrameCount(id)
    def clipBits(cid: Long): Seq[Long] = (0 until nf).flatMap { f =>
      val gray = Array.tabulate(px)(j => Multimodal.variantGray(cid, f, j).toLong)
      (0 until px).map(j => if (gray(j) > gray((j + 1) % px)) 1L else 0L)
    }
    val ham = clipBits(id).zip(clipBits(id + 1)).count { case (a, b) => a != b }
    // each member's ONE edited pixel overlaps exactly two neighbor
    // comparisons — the locality argument behind the round-18 video
    // adoption (the aHash threshold could flip far-away bits)
    assert(ham <= 4, s"sibling dHash Hamming $ham exceeds the deterministic bound")
    assert(ham <= graft.queries.MultimodalQueries.VphashMaxHamming)
  }

  test("variant clips share the group's frame count and perturb one (frame, pixel)") {
    val id = 10L // group 3 member; sibling id+1
    assert(Multimodal.videoVariantFrameCount(id) ===
      Multimodal.videoVariantFrameCount(id + 1))
    val nf = Multimodal.videoVariantFrameCount(id)
    val diffs = for {
      f <- 0 until nf; j <- 0 until Multimodal.VideoPixels
      if Multimodal.variantGray(id, f, j) != Multimodal.variantGray(id + 1, f, j)
    } yield f * Multimodal.VideoPixels + j
    // siblings differ exactly on the union of their two perturbed
    // flat positions (they share the group base everywhere else)
    assert(diffs.toSet ===
      Set(Multimodal.videoVariantPos(id), Multimodal.videoVariantPos(id + 1)))
  }

  test("q157 recovers the planted video near-dup groups with no cross-group noise") {
    val out = SparkEntry.queries("q157_video_neardup")(spark, sf0001)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSeq
    val g = Multimodal.VariantGroupSize
    assert(out.nonEmpty)
    // every pair is same-group (no spurious cross-group collisions)…
    assert(out.forall { case (a, b, _) => a / g == b / g })
    assert(out.forall(_._3 <= graft.queries.MultimodalQueries.VphashMaxHamming))
    // …and recall over the planted pairs is near-total (a pair can
    // miss when borderline frame-total shifts push its aligned
    // Hamming past the cut or its frame-0 bands all diverge — the
    // declared anchor-rule semantics; measured 498/499 at 500 clips)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id").as[Long].collect().toSeq
    val planted = docs.groupBy(_ / g).values.map(m => m.size * (m.size - 1) / 2).sum
    assert(out.size >= (planted * 9) / 10,
      s"recovered ${out.size} of $planted planted pairs")
  }

  test("q158 exercises both partner classes and keeps the accepted flag consistent") {
    import graft.queries.MultimodalQueries
    val out = SparkEntry.queries("q158_phash_index_probe")(spark, sf0001)
      .select($"doc_id", $"n_dup_old", $"n_dup_new_prior", $"accepted")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id").as[Long].collect().toSeq
    val isNew: Long => Boolean =
      id => id % MultimodalQueries.PhashProbeNewMod >= MultimodalQueries.PhashProbeNewMin
    // every new doc reports exactly once, accepted iff no dup of either class
    assert(out.map(_._1).sorted === docs.filter(isNew).sorted)
    assert(out.forall(r => (r._4 == 1L) === (r._2 == 0L && r._3 == 0L)))
    // the % 5 split exists so BOTH partner classes are real on the
    // planted fixture (old partners AND earlier-new partners) — pin it
    assert(out.exists(_._2 > 0), "no old-corpus duplicates exercised")
    assert(out.exists(_._3 > 0), "no prior-new duplicates exercised")
    // a new doc's dup counts never exceed its group's other members
    val g = Multimodal.VariantGroupSize
    val bySize = docs.groupBy(_ / g).view.mapValues(_.size).toMap
    assert(out.forall(r => r._2 + r._3 <= bySize(r._1 / g) - 1 + 2),
      "dup counts exceed plausible group size + collision slack")
  }

  test("q159 survivor labels agree with the q155 pair graph") {
    val pairs = SparkEntry.queries("q155_image_phash")(spark, sf0001)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSeq
    val out = SparkEntry.queries("q159_image_survivors")(spark, sf0001)
      .select($"doc_id", $"component", $"is_survivor")
      .as[(Long, Long, Int)].collect().toSeq
    val comp = out.map(r => r._1 -> r._2).toMap
    // paired docs share a component; the component is the min member;
    // exactly the min member of each component survives
    assert(pairs.forall { case (a, b) => comp(a) == comp(b) })
    val members = out.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(members.forall { case (c, ms) => ms.min == c })
    assert(out.forall(r => (r._3 == 1) == (r._1 == r._2)))
    // unpaired docs are their own singleton component
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(out.filter(r => !inPairs(r._1)).forall(r => r._2 == r._1))
  }

  test("q160 manifest shards exactly the q159 survivors under the dedicated shard hash") {
    val surv = SparkEntry.queries("q159_image_survivors")(spark, sf0001)
      .filter($"is_survivor" === 1).select($"doc_id").as[Long].collect().toSeq
    val out = SparkEntry.queries("q160_image_export")(spark, sf0001)
      .select($"shard", $"n_images", $"min_doc", $"max_doc")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val (a, b) = graft.functions.PortableHash.ShardPair
    val p = graft.functions.PortableHash.P
    val want = surv.groupBy(id => ((a * (id % p) + b) % p) % graft.queries.ExtraQueries.NShards)
    assert(out.map(_._2).sum === surv.size.toLong)
    assert(out.map(r => r._1 -> r._2).toMap ===
      want.view.mapValues(_.size.toLong).toMap)
    assert(out.forall(r => r._3 == want(r._1).min && r._4 == want(r._1).max))
  }

  test("corrupt blobs quarantine as null features in every modality — never a task failure") {
    // at 100 TB corrupt media is certain; a pipeline that dies on one
    // truncated file is not production-shaped. Garbage bytes carrying
    // each real media type must pass through with null features (or
    // emit no frame rows) exactly like foreign media — the task must
    // never fail.
    def junkRow(mt: String) = {
      val junk: Array[Byte] = Array.fill(64)(0x5a.toByte)
      Seq((7L, junk)).toDF("doc_id", "blob")
        .withColumn("meta", struct(lit(mt).as("media_type"),
          lit(64L).as("n_bytes"), lit(256).as("chunk_bytes")))
    }
    val img = Multimodal.imageFeatures(junkRow("image/png"))
      .select($"width", $"sum_r").head()
    assert(img.isNullAt(0) && img.isNullAt(1))
    val pooled = Multimodal.imagePooledFeatures(junkRow("image/png"))
      .select($"p_sum_r", $"p_fp").head()
    assert(pooled.isNullAt(0) && pooled.isNullAt(1))
    val bands = Multimodal.imageAHashBands(junkRow("image/png"))
      .select($"band0", $"gray_total").head()
    assert(bands.isNullAt(0) && bands.isNullAt(1))
    val dbands = Multimodal.imageDHashBands(junkRow("image/png"))
      .select($"band0", $"gray_total").head()
    assert(dbands.isNullAt(0) && dbands.isNullAt(1))
    val au = Multimodal.audioFeatures(junkRow("audio/wav"))
      .select($"n_samples", $"sum_sq").head()
    assert(au.isNullAt(0) && au.isNullAt(1))
    val ds = Multimodal.audioDownsampled(junkRow("audio/wav"))
      .select($"n_out", $"ds_fp").head()
    assert(ds.isNullAt(0) && ds.isNullAt(1))
    val afp = Multimodal.audioFingerprintBands(junkRow("audio/wav"))
      .select($"band0").head()
    assert(afp.isNullAt(0))
    // frame emitters: a corrupt clip contributes no frames, the scan continues
    assert(Multimodal.videoFrameFeatures(junkRow("image/gif"), 2).count() === 0L)
    assert(Multimodal.videoFrameDHashBands(junkRow("image/gif")).count() === 0L)
  }

  test("delta-sign fingerprint is exactly invariant to DC offset (its design law)") {
    // the Haitsma–Kalker motivation for delta coding: any constant
    // added to every sample cancels in the s[k+1] > s[k] comparison,
    // so re-leveled/re-normalized copies of a clip fingerprint
    // IDENTICALLY — not approximately. Verified through the full
    // encode → decode → fingerprint path.
    val rng = new scala.util.Random(42)
    val base = Array.fill(Multimodal.SynthSamples)(rng.nextInt(20000) - 10000)
    for (dc <- Seq(-5000, -1, 1, 4321)) {
      val shifted = base.map(_ + dc)
      def bandsOf(samples: Array[Int]) = {
        val df = Seq((1L, Multimodal.pcmWav(samples))).toDF("doc_id", "blob")
          .withColumn("meta", struct(lit("audio/wav").as("media_type"),
            lit(0L).as("n_bytes"), lit(256).as("chunk_bytes")))
        Multimodal.audioFingerprintBands(df)
          .select($"band0", $"band1", $"band2", $"band3")
          .as[(Long, Long, Long, Long)].head()
      }
      assert(bandsOf(base) === bandsOf(shifted), s"dc=$dc changed the fingerprint")
    }
  }

  test("aHash is exactly invariant to additive brightness (its design law)") {
    // (g + c)·n > total + n·c  ⟺  g·n > total: a uniformly brightened
    // copy aHashes IDENTICALLY — the perceptual robustness that makes
    // the hash a near-dup signal rather than a content checksum.
    // Verified through the full encode → decode → hash path.
    val rng = new scala.util.Random(7)
    val base = Array.fill(Multimodal.SynthPixelValues)(rng.nextInt(200))
    def bandsOf(chan: Int => Int) = {
      val df = Seq((1L, Multimodal.rgbPng(chan))).toDF("doc_id", "blob")
        .withColumn("meta", struct(lit("image/png").as("media_type"),
          lit(0L).as("n_bytes"), lit(256).as("chunk_bytes")))
      Multimodal.imageAHashBands(df)
        .select($"band0", $"band1", $"band2", $"band3")
        .as[(Long, Long, Long, Long)].head()
    }
    for (c <- Seq(1, 17, 55))
      assert(bandsOf(k => base(k)) === bandsOf(k => base(k) + c),
        s"brightness +$c changed the aHash")
  }

  test("q161 health report quarantines exactly the planted corruption") {
    val out = SparkEntry.queries("q161_media_health")(spark, sf0001)
      .select($"source", $"n_blobs", $"n_ok", $"n_quarantined")
      .as[(String, Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect().toSeq
    val wantBad = docs.filter(_._1 % 37 == 0).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(out.map(_._2).sum === docs.size.toLong)
    assert(out.forall(r => r._2 === r._3 + r._4))
    assert(out.map(r => r._1 -> r._4).toMap.filter(_._2 > 0) === wantBad)
    assert(out.map(_._4).sum > 0, "fixture should plant at least one corrupt blob")
  }

  test("q155 recovers the planted near-dup groups with no cross-group noise") {
    val out = SparkEntry.queries("q155_image_phash")(spark, sf0001)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSeq
    val g = Multimodal.VariantGroupSize
    assert(out.nonEmpty)
    // every pair is same-group (no spurious cross-group collisions)…
    assert(out.forall { case (a, b, _) => a / g == b / g })
    assert(out.forall(_._3 <= graft.queries.MultimodalQueries.PhashMaxHamming))
    // …and recall over the planted pairs is near-total (a few pairs may
    // exceed the Hamming cut when the one-pixel perturbations shift the
    // mean across borderline bits — that is the declared semantics)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id").as[Long].collect().toSeq
    val planted = docs.groupBy(_ / g).values.map(m => m.size * (m.size - 1) / 2).sum
    assert(out.size >= (planted * 9) / 10,
      s"recovered ${out.size} of $planted planted pairs")
  }

  test("q178 takedown unserves exactly the carve, from both partner classes") {
    import graft.queries.MultimodalQueries
    def rows(q: String) = SparkEntry.queries(q)(spark, sf0001)
      .select($"doc_id", $"n_dup_old", $"n_dup_graduated")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val before = rows("q169_phash_ingest_lsm")
    val after = rows("q178_phash_takedown")
    assert(before.keySet === after.keySet)
    // a takedown only removes partners — counts never grow
    assert(before.forall { case (id, (o, g)) =>
      after(id)._1 <= o && after(id)._2 <= g })
    // …and it actually removed some, from BOTH classes (the carve is
    // 1-in-7 of each side; a silent no-op on either side fails here)
    assert(before.exists { case (id, (o, _)) => after(id)._1 < o },
      "no old-corpus partner was unserved by the takedown")
    assert(before.exists { case (id, (_, g)) => after(id)._2 < g },
      "no graduated partner was unserved by the takedown")
    // the AUDIO face rides the same recipe — same monotonicity and
    // same both-classes sensitivity
    val beforeA = rows("q170_afp_ingest_lsm")
    val afterA = rows("q180_afp_takedown")
    assert(beforeA.keySet === afterA.keySet)
    assert(beforeA.forall { case (id, (o, g)) =>
      afterA(id)._1 <= o && afterA(id)._2 <= g })
    assert(beforeA.exists { case (id, (o, _)) => afterA(id)._1 < o },
      "no old-corpus audio partner was unserved")
    assert(beforeA.exists { case (id, (_, g)) => afterA(id)._2 < g },
      "no graduated audio partner was unserved")
    // and the VIDEO face — the two-table store's markers must shadow
    // both the anchor and frame tables with the same monotonic rule
    val beforeV = rows("q171_vphash_ingest_lsm")
    val afterV = rows("q181_vphash_takedown")
    assert(beforeV.keySet === afterV.keySet)
    assert(beforeV.forall { case (id, (o, g)) =>
      afterV(id)._1 <= o && afterV(id)._2 <= g })
    assert(beforeV.exists { case (id, (o, _)) => afterV(id)._1 < o },
      "no old-corpus video partner was unserved")
    assert(beforeV.exists { case (id, (_, g)) => afterV(id)._2 < g },
      "no graduated video partner was unserved")
  }

  test("takedown fold physically drops the carve's rows; markers survive") {
    import graft.queries.MultimodalQueries
    SparkEntry.queries("q178_phash_takedown")(spark, sf0001).collect()
    val store = graft.sources.SegmentStore.read(spark,
      MultimodalQueries.phashTakedownLsmDir(spark, sf0001))
    val carve = $"doc_id" % MultimodalQueries.TakedownMod ===
      MultimodalQueries.TakedownRem
    // the marker batch's fold ran (compactEvery = 1): no data row of a
    // taken-down doc survives on disk — the drop is physical, not a
    // probe-side mask
    assert(store.filter(carve && !$"_del").count() === 0L,
      "taken-down data rows still present after the fold")
    // the markers themselves survive the fold — they are what shadows
    // the immutable static artifact at probe time
    assert(store.filter(carve && $"_del").count() > 0L,
      "takedown markers vanished at the fold")
  }
  test("static rebuild: taken-down rows physically absent, zero markers, probe == lifecycle probe") {
    import graft.queries.MultimodalQueries
    // q182 == q178 with the two partner classes merged: the rebuild
    // must change NOTHING about what serves, only where it lives
    val lifecycle = SparkEntry.queries("q178_phash_takedown")(spark, sf0001)
      .select($"doc_id", ($"n_dup_old" + $"n_dup_graduated").as("n_dup"),
        $"accepted")
      .as[(Long, Long, Long)].collect().toSeq
    val rebuilt = SparkEntry.queries("q182_phash_rebuild")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rebuilt === lifecycle,
      "the rebuilt static must serve exactly the lifecycle answer")
    // the fresh generation: carve physically absent, survivors static,
    // and NOT ONE marker or lifecycle column left to shadow anything
    val bands = spark.read.parquet(
      s"${MultimodalQueries.phashRebuildDir(spark, sf0001)}/bands")
    val carve = $"doc_id" % MultimodalQueries.TakedownMod ===
      MultimodalQueries.TakedownRem
    assert(bands.filter(carve).count() === 0L,
      "taken-down docs must be physically absent from the rebuilt static")
    assert(!bands.columns.contains("_del") &&
      !bands.columns.contains(graft.sources.SegmentStore.BatchCol),
      "the rebuilt static is a plain artifact — no lifecycle columns")
    // graduated (batch-1, non-carve) docs are static now
    val grad = bands.filter($"doc_id" % MultimodalQueries.PhashProbeNewMod >=
        MultimodalQueries.PhashProbeNewMin &&
        $"doc_id" % MultimodalQueries.PhashLsmBatchMod === 0 && !carve)
      .select($"doc_id").distinct().count()
    assert(grad > 0, "graduated docs must ride the rebuilt static")
    // old non-carve docs survive untouched
    val old = bands.filter($"doc_id" % MultimodalQueries.PhashProbeNewMod <
        MultimodalQueries.PhashProbeNewMin && !carve)
      .select($"doc_id").distinct().count()
    assert(old > 0)
    // the audio and video faces ride the same fold rule
    val lifecycleA = SparkEntry.queries("q180_afp_takedown")(spark, sf0001)
      .select($"doc_id", ($"n_dup_old" + $"n_dup_graduated").as("n_dup"),
        $"accepted")
      .as[(Long, Long, Long)].collect().toSeq
    val rebuiltA = SparkEntry.queries("q183_afp_rebuild")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rebuiltA === lifecycleA)
    val lifecycleV = SparkEntry.queries("q181_vphash_takedown")(spark, sf0001)
      .select($"doc_id", ($"n_dup_old" + $"n_dup_graduated").as("n_dup"),
        $"accepted")
      .as[(Long, Long, Long)].collect().toSeq
    val rebuiltV = SparkEntry.queries("q184_vphash_rebuild")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rebuiltV === lifecycleV)
    // ...and BOTH video tables dropped the carve physically
    val vdir = MultimodalQueries.vphashRebuildDir(spark, sf0001)
    assert(spark.read.parquet(s"$vdir/f0bands").filter(carve).count() === 0L)
    assert(spark.read.parquet(s"$vdir/frames").filter(carve).count() === 0L)
  }
  test("media serving root: pointer-resolved probes, marker trigger actuates the rebuild") {
    import org.apache.spark.sql.functions.pmod
    import graft.queries.MultimodalQueries
    import graft.search.AnnIndex.ServingRoot
    // baselines: the lifecycle answer (q178) and the rebuilt answer
    // (q182) — the root faces must reproduce both, state by state
    val q178 = SparkEntry.queries("q178_phash_takedown")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val q182 = SparkEntry.queries("q182_phash_rebuild")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    // a media root seeded from the image static band artifact
    val root = java.nio.file.Files
      .createTempDirectory("graft_media_root_spec").toString + "/r"
    MultimodalQueries.mediaRootInit(spark,
      s"${MultimodalQueries.phashIndexDir(spark, sf0001)}/bands", root,
      MultimodalQueries.ImageBandFamily)
    val (_, store0) = ServingRoot.resolve(spark, root)
    // replay the q178 store recipe against the root's epoch-0 store
    // (stamping first, as every production writer does)
    graft.sources.SegmentStore.ensureFormat(
      org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration),
      store0, MultimodalQueries.ImageBandFamily)
    val b1 = MultimodalQueries.phashNewBatchBands(spark, sf0001)
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashLsmBatchMod)) === 0)
    graft.sources.SegmentStore.appendBatch(spark, store0,
      MultimodalQueries.bandStoreRows(b1), 0L, compactEvery = 1,
      partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
    val serving = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id")
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashProbeNewMod)) <
        MultimodalQueries.PhashProbeNewMin ||
        pmod($"doc_id", lit(MultimodalQueries.PhashLsmBatchMod)) === 0)
    graft.sources.SegmentStore.appendBatch(spark, store0,
      MultimodalQueries.bandTakedownMarkers(serving.filter(
        pmod($"doc_id", lit(MultimodalQueries.TakedownMod)) ===
          MultimodalQueries.TakedownRem)),
      1L, compactEvery = 1, partitionCol = "j", dedupKeys = Seq("doc_id", "j"))
    val b2 = MultimodalQueries.phashNewBatchBands(spark, sf0001)
      .filter(pmod($"doc_id", lit(MultimodalQueries.PhashLsmBatchMod)) === 1)
    def probeRoot() = MultimodalQueries.graduatedBandProbeRoot(spark, root,
      b2, MultimodalQueries.PhashMaxHamming,
      MultimodalQueries.ImageBandFamily)
    // pre-rebuild: the root probe serves the LIFECYCLE answer
    assert(probeRoot().as[(Long, Long, Long, Long)].collect().toSeq === q178,
      "the root probe must serve the lifecycle answer pre-rebuild")
    // under the trigger: counted, not rebuilt
    assert(MultimodalQueries
      .bandRebuildIfMarkersDue(spark, root, maxRows = 10000000L).isEmpty)
    assert(ServingRoot.resolve(spark, root)._1.endsWith("epoch_0"))
    // over the trigger: the rebuild actuates and publishes epoch 1
    assert(MultimodalQueries
      .bandRebuildIfMarkersDue(spark, root, maxRows = 0L) === Some(1L))
    val (idx1, store1) = ServingRoot.resolve(spark, root)
    assert(idx1.endsWith("epoch_1"))
    // post-rebuild: store-less probe, the REBUILT answer; carve gone
    // physically; fresh store empty; not due again at the same trigger
    assert(probeRoot().as[(Long, Long, Long)].collect().toSeq === q182,
      "the root probe must serve the rebuilt answer post-publish")
    assert(spark.read.parquet(s"$idx1/bands")
      .filter($"doc_id" % MultimodalQueries.TakedownMod ===
        MultimodalQueries.TakedownRem).count() === 0L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.SegmentStore.segments(fs, store1).isEmpty)
    assert(MultimodalQueries
      .bandRebuildIfMarkersDue(spark, root, maxRows = 0L).isEmpty,
      "a clean generation has no markers to rebuild away")
  }
  test("video media root: one pointer governs both tables, marker trigger actuates the two-table rebuild") {
    import org.apache.spark.sql.functions.pmod
    import graft.queries.MultimodalQueries
    import graft.search.AnnIndex.ServingRoot
    val q181 = SparkEntry.queries("q181_vphash_takedown")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val q184 = SparkEntry.queries("q184_vphash_rebuild")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    val root = java.nio.file.Files
      .createTempDirectory("graft_vph_root_spec").toString + "/r"
    MultimodalQueries.vphashRootInit(spark,
      MultimodalQueries.vphashIndexDir(spark, sf0001), root)
    // replay the q181 two-store recipe into the root's epoch-0 delta
    // (the session store q181 built has the same content — copy its
    // resolved segments as one batch per table)
    val (_, delta0) = ServingRoot.resolve(spark, root)
    val lsm = MultimodalQueries.vphashTakedownLsmDir(spark, sf0001)
    for ((table, key) <- Seq("f0bands" -> "j", "frames" -> "frame_idx")) {
      val rows = graft.sources.SegmentStore.read(spark, s"$lsm/$table")
        .drop(graft.sources.SegmentStore.BatchCol)
      // stamp first, as every production writer does
      graft.sources.SegmentStore.ensureFormat(
        org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration),
        s"$delta0/$table", MultimodalQueries.VideoBandFamily)
      graft.sources.SegmentStore.appendBatch(spark, s"$delta0/$table",
        rows, 0L, compactEvery = 0, partitionCol = key,
        dedupKeys = Seq("doc_id", key))
    }
    // pre-rebuild: the lifecycle probe over (epoch-0 static == session
    // static, root delta == session store) serves the q181 answer
    val pre = MultimodalQueries.vphashGraduationProbe(spark, sf0001, delta0)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(pre === q181, "the root's epoch-0 lifecycle must serve q181's answer")
    // trigger: under -> counted; over -> BOTH tables fold, one pointer
    assert(MultimodalQueries
      .vphashRebuildIfMarkersDue(spark, root, maxRows = 10000000L).isEmpty)
    assert(MultimodalQueries
      .vphashRebuildIfMarkersDue(spark, root, maxRows = 0L) === Some(1L))
    val (idx1, delta1) = ServingRoot.resolve(spark, root)
    assert(idx1.endsWith("epoch_1"))
    val post = MultimodalQueries.rebuiltVphashProbe(spark, sf0001, idx1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(post === q184, "the rebuilt epoch must serve q184's answer")
    val carve = $"doc_id" % MultimodalQueries.TakedownMod ===
      MultimodalQueries.TakedownRem
    assert(spark.read.parquet(s"$idx1/f0bands").filter(carve).count() === 0L)
    assert(spark.read.parquet(s"$idx1/frames").filter(carve).count() === 0L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.SegmentStore.segments(fs, s"$delta1/f0bands").isEmpty)
    assert(MultimodalQueries
      .vphashRebuildIfMarkersDue(spark, root, maxRows = 0L).isEmpty)
  }
}

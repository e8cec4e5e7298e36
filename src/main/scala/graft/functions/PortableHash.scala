package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing that is *portable across engines*: every hash
  * here is defined by plain modular arithmetic over code points, so the
  * same value is computable in Spark (higher-order functions, staying
  * inside whole-stage codegen) and in ANSI-ish SQL (the DuckDB oracle).
  * This is what lets MinHash / SimHash / LSH dedup be hash-exact
  * oracle-checked rather than merely row-counted: engine-native hash
  * functions (Spark murmur3/xxhash64, DuckDB `hash`) differ, a
  * polynomial-mod hash does not.
  *
  * The reference delegates all hashing to Neo4j's HNSW internals
  * (reference server.py:87); hashes here serve the *extension* surface
  * (dedup/fingerprint/LSH — SURVEY.md §2.2, BASELINE.json north star).
  *
  * Every constant is derived from a fixed seed at class-load, and the
  * same constants are interpolated into both the Column tree and the
  * generated oracle SQL, so the two sides cannot drift.
  */
object PortableHash {

  /** Modulus: largest common 30-bit-ish prime; products `a*x` with
    * `a, x < P` stay below 2^62, safely inside BIGINT/LongType. */
  val P: Long = 1000000007L

  // ---------------------------------------------------------------
  // char-fold polynomial hash: h = fold(chars)((acc, c) => (acc*31 + code(c)) % P)
  // ---------------------------------------------------------------

  /** Polynomial hash of a string column over its characters.
    * Left fold in character order — sequential, partition-independent.
    * Backed by the codegen'd [[graft.expressions.PolyHashExpr]];
    * [[charHashHof]] is the higher-order-function reference. */
  def charHash(c: Column): Column = graft.expressions.HashExpressions.polyHash(c)

  /** Reference formulation of [[charHash]] in pure built-ins. */
  def charHashHof(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch).cast("long")) % lit(P))

  /** DuckDB SQL computing exactly [[charHash]] of expression `e`. */
  def charHashSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"list_filter(string_split($e, ''), c -> c != ''), " +
      s"c -> unicode(c)::BIGINT)), (a, b) -> (a * 31 + b) % $P)"

  // ---------------------------------------------------------------
  // universal affine hash family h_i(x) = (a_i * x + b_i) % P
  // ---------------------------------------------------------------

  private def affineConstants(seed: Long, n: Int): IndexedSeq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Vector.fill(n) {
      val a = 1L + math.abs(rng.nextLong()) % (P - 1) // a in [1, P-1]
      val b = math.abs(rng.nextLong()) % P            // b in [0, P-1]
      (a, b)
    }
  }

  /** MinHash family: 16 affine hashes (4 bands × 4 rows — SURVEY.md §2.2
    * joins row: LSH banding turns near-dup search into an equi-join). */
  val MinhashFamily: IndexedSeq[(Long, Long)] = affineConstants(101L, 16)
  val MinhashBands = 4
  val MinhashRowsPerBand = 4

  /** SimHash family: one affine hash per signature bit (48 bits keeps
    * `sum(bit_j << j)` far from Long overflow in both engines). */
  val SimhashBits = 48
  val SimhashFamily: IndexedSeq[(Long, Long)] = affineConstants(202L, SimhashBits)

  /** KMV (k-minimum-values) sketch hash — one affine member dedicated to
    * distinct-count estimation so estimates are decoupled from the
    * MinHash family. */
  val KmvPair: (Long, Long) = affineConstants(404L, 1).head

  /** Train/val/test split hash — its own family member, so changing any
    * sketch can never silently reshuffle a dataset's split assignment. */
  val SplitPair: (Long, Long) = affineConstants(505L, 1).head

  /** Stratified-sampling hash — independent of [[SplitPair]], so a doc's
    * sample membership and its train/val/test assignment are
    * uncorrelated (sampling inside the train split stays unbiased). */
  val SamplePair: (Long, Long) = affineConstants(606L, 1).head

  /** Domain-mixing hash — its own member for the same reason as
    * [[SamplePair]]: which docs a target-distribution mix selects must
    * be uncorrelated with split assignment and with every sketch. */
  val MixPair: (Long, Long) = affineConstants(707L, 1).head

  /** Export-shard hash — its own member so shard assignment is
    * uncorrelated with split/sample/mix membership: a training run
    * streaming shards in order must not see docs grouped by any other
    * pipeline decision. */
  val ShardPair: (Long, Long) = affineConstants(909L, 1).head

  /** Training-order shuffle hash — its own member so the order a
    * training run visits documents in is uncorrelated with split,
    * sample, mix and shard membership (a correlated order would feed
    * the model systematically biased batches — e.g. all of one
    * domain-mix stratum first). */
  val ShufflePair: (Long, Long) = affineConstants(1414L, 1).head

  /** HyperLogLog sketch hash — its own affine member so register
    * contents are decoupled from the KMV sketch and every other
    * family (two distinct-count sketches sharing a hash would produce
    * correlated errors, defeating cross-checks between them). */
  val HllPair: (Long, Long) = affineConstants(1616L, 1).head

  /** Count-min sketch row hashes — one affine member per sketch row,
    * decoupled from every other family (its own seed). */
  val CmsDepth = 4
  val CmsFamily: IndexedSeq[(Long, Long)] = affineConstants(808L, CmsDepth)

  /** Synthetic-pixel hash — its own member: the multimodal fixtures'
    * pixel values derive from it ((a·k + b) mod P mod 256 for flat
    * pixel-channel index k), so a decoded image's channel sums are
    * reproducible by pure integer SQL in the oracle. */
  val PixelPair: (Long, Long) = affineConstants(1111L, 1).head

  /** Variant-image perturbation hashes (q155's planted near-dup
    * fixtures): WHICH flat pixel of a variant image is perturbed, and
    * the perturbed channel VALUES — separate pairs (and both separate
    * from [[PixelPair]]) so position, content, and base pixels can
    * never alias. Seeds 2525/2727 are deliberately fresh: the first
    * cut reused 1717/1919, silently aliasing
    * [[WeightedSamplePair]]/[[BootPair]] — same (a, b), so a variant
    * image's perturbed-pixel position was exactly correlated with the
    * same doc's weighted-sample draw, violating the independence
    * contract every pair's scaladoc asserts. Every seed in this file
    * must be unique (PortableHashSpec pins this). */
  val VariantPixelPair: (Long, Long) = affineConstants(2525L, 1).head
  val VariantValuePair: (Long, Long) = affineConstants(2727L, 1).head

  /** Variant-image BASE hash (quadratic): the plain affine pixel hash
    * is affine in the flat index, so two groups' images are windows of
    * ONE global arithmetic progression mod P mod 256 — their aHash bit
    * patterns come out near-periodic and cross-group Hamming
    * distances collapse (measured: ~3 000 spurious sub-6 pairs on 500
    * docs). The variant base therefore mixes with `x² + a·x + b mod P`
    * — the square breaks the progression and cross-group bits return
    * to independent coin flips. x < P keeps x² < 2^60: exact in both
    * engines' 64-bit integers. */
  val VariantBasePair: (Long, Long) = affineConstants(2323L, 1).head

  /** Synthetic-audio hash — its own member (decoupled from [[PixelPair]]
    * so the image and audio fixtures can never alias): PCM sample k of
    * clip id is ((a·x + b) mod P) mod 2^16 − 2^15, a signed 16-bit
    * value reproducible by pure integer SQL in the oracle. */
  val AudioPair: (Long, Long) = affineConstants(1212L, 1).head

  /** Variant-audio planted-near-dup hashes (q156 — the audio twin of
    * the q155 variant-image family), all fresh seeds so no pair in
    * this file aliases another:
    *  - [[AudioVariantBasePair]]: the GROUP base samples, mixed
    *    quadratically (y = a·x + b mod P, then y² mod P + y) for the
    *    same reason as [[VariantBasePair]] — an affine-in-k base makes
    *    every group's clip a window of one global progression and the
    *    delta-sign fingerprints of unrelated groups correlate; the
    *    square restores independent coin flips. y < P keeps y² < 2^60.
    *  - [[AudioVariantPosPair]]: WHICH sample of a variant clip is
    *    perturbed.
    *  - [[AudioVariantValuePair]]: the perturbed sample VALUE. */
  val AudioVariantBasePair: (Long, Long) = affineConstants(2929L, 1).head
  val AudioVariantPosPair: (Long, Long) = affineConstants(3131L, 1).head
  val AudioVariantValuePair: (Long, Long) = affineConstants(3333L, 1).head

  /** Synthetic-video hash — its own member (decoupled from
    * [[PixelPair]]/[[AudioPair]] so no two media fixtures can alias):
    * gray value of flat (frame, pixel) index k of clip id is
    * ((a·x + b) mod P) mod 256, reproducible by pure integer SQL in
    * the oracle. */
  val FramePair: (Long, Long) = affineConstants(1313L, 1).head

  /** Variant-video planted-near-dup hashes (q157 — the video twin of
    * the q155/q156 variant families), all fresh seeds:
    *  - [[VideoVariantBasePair]]: the GROUP base frames, mixed
    *    quadratically for the same cross-group-independence reason as
    *    [[VariantBasePair]]/[[AudioVariantBasePair]].
    *  - [[VideoVariantPosPair]]: WHICH flat (frame, pixel) of a
    *    variant clip is perturbed.
    *  - [[VideoVariantValuePair]]: the perturbed gray VALUE. */
  val VideoVariantBasePair: (Long, Long) = affineConstants(3535L, 1).head
  val VideoVariantPosPair: (Long, Long) = affineConstants(3737L, 1).head
  val VideoVariantValuePair: (Long, Long) = affineConstants(3939L, 1).head

  /** Weighted-sampling (Efraimidis-Spirakis) uniform draw — its own
    * member so a doc's weighted-sample key is uncorrelated with its
    * split, stratified-sample, mix, shard and shuffle assignments
    * (the same independence argument as [[SamplePair]]; a quality-
    * weighted subsample must not systematically favor one split). */
  val WeightedSamplePair: (Long, Long) = affineConstants(1717L, 1).head

  /** DSIR importance-resampling draw — its own member, independent of
    * [[WeightedSamplePair]]: the quality-weighted sample (q107) and the
    * importance-resampled corpus (q108) are different downstream
    * datasets and must not share draw randomness (shared draws would
    * correlate their selections beyond what the weights imply). */
  val DsirSamplePair: (Long, Long) = affineConstants(1818L, 1).head

  /** Poisson-bootstrap replicate draw (q116) — its own member so a
    * doc's resampling weights are uncorrelated with every other hash
    * role; the hashed key is ((doc_id % P)·B + rep) % P — NOT the raw
    * doc_id·B + rep, which could breach the a·x < 2^62 overflow
    * contract for large ids. Each (doc, replicate) cell still gets an
    * independent uniform; callers must use the mod-P-reduced key form
    * exactly as q116 does. */
  val BootPair: (Long, Long) = affineConstants(1919L, 1).head

  /** Every dedicated affine pair with its role name — the registry the
    * uniqueness spec (PortableHashSpec) checks pairwise, so no two
    * roles can silently share constants again (the seed-reuse bug
    * recorded in [[VariantPixelPair]]'s scaladoc: aliased pairs make
    * "independent" pipeline decisions exactly correlated). */
  val DedicatedPairs: Seq[(String, (Long, Long))] = Seq(
    "kmv" -> KmvPair, "split" -> SplitPair, "sample" -> SamplePair,
    "mix" -> MixPair, "shard" -> ShardPair, "shuffle" -> ShufflePair,
    "hll" -> HllPair, "pixel" -> PixelPair,
    "variant_pixel" -> VariantPixelPair,
    "variant_value" -> VariantValuePair,
    "variant_base" -> VariantBasePair,
    "audio" -> AudioPair,
    "audio_variant_base" -> AudioVariantBasePair,
    "audio_variant_pos" -> AudioVariantPosPair,
    "audio_variant_value" -> AudioVariantValuePair,
    "frame" -> FramePair,
    "video_variant_base" -> VideoVariantBasePair,
    "video_variant_pos" -> VideoVariantPosPair,
    "video_variant_value" -> VideoVariantValuePair,
    "weighted_sample" -> WeightedSamplePair,
    "dsir_sample" -> DsirSamplePair, "boot" -> BootPair)

  /** h_i applied to a long column. */
  def affine(i: (Long, Long), x: Column): Column =
    (lit(i._1) * x + lit(i._2)) % lit(P)

  /** DuckDB SQL for h_i of long-typed expression `x`. */
  def affineSql(i: (Long, Long), x: String): String =
    s"((${i._1} * $x + ${i._2}) % $P)"

  // ---------------------------------------------------------------
  // seeded random hyperplanes for sign-LSH over embeddings
  // ---------------------------------------------------------------

  /** 8 Gaussian hyperplanes in 64-d (the fixture embedding dim,
    * FIXTURES.md), rounded to 6 decimals so the literal values written
    * into oracle SQL are bit-identical to the Scala-side literals. */
  val LshPlanes: IndexedSeq[IndexedSeq[Double]] = {
    val rng = new scala.util.Random(303L)
    Vector.fill(8)(Vector.fill(64)(math.rint(rng.nextGaussian() * 1e6) / 1e6))
  }

  /** Johnson–Lindenstrauss projection planes: 16 Gaussian rows in 64-d
    * (own seed, decoupled from [[LshPlanes]] so sign-LSH buckets and JL
    * coordinates can never correlate), rounded to 6 decimals so the
    * literals written into oracle SQL are bit-identical to the
    * Scala-side literals. The projection scale 1/sqrt(16) = 0.25 is
    * exactly representable in binary — no rounding convention needed
    * on the scale factor itself. */
  val JlDim = 16
  val JlPlanes: IndexedSeq[IndexedSeq[Double]] = {
    val rng = new scala.util.Random(1717L)
    Vector.fill(JlDim)(Vector.fill(64)(math.rint(rng.nextGaussian() * 1e6) / 1e6))
  }

  /** Sign-LSH bucket id of an ARRAY<FLOAT> embedding column: bit p is
    * set iff dot(v, plane_p) >= 0. 8 planes → 256 buckets. */
  def lshBucket(v: Column): Column =
    LshPlanes.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(v, typedLit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, d) => acc + d)
      when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB SQL computing [[lshBucket]] of embedding expression `v`. */
  def lshBucketSql(v: String): String =
    LshPlanes.zipWithIndex.map { case (plane, p) =>
      val lits = plane.mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip($v, $lits), " +
        s"p -> CAST(p[1] AS DOUBLE) * p[2])) >= 0.0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---------------------------------------------------------------
  // corpus-scaled sign-LSH (q163): plane count derived from n
  // ---------------------------------------------------------------

  /** Expected bucket population target for the corpus-scaled buckets:
    * with p = [[planesFor]](n) planes, 2^p buckets hold ≈ n/2^p ≤ 32
    * vectors each, so same-bucket candidate volume is
    * ≈ n·[[ParaTargetPop]]/2 — LINEAR in the corpus. A FIXED plane
    * count makes per-bucket population ∝ n and candidate volume
    * quadratic (round-12 verdict: ~78 M scored pairs at 200 k under 8
    * fixed planes) — the classic LSH scale-killer. */
  val ParaTargetPop = 32L

  /** Plane-pool bound: 24 planes cover 32·2^24 ≈ 537 M vectors per
    * Spark-side corpus slice at the target population; beyond that the
    * cap trades candidate linearity for recall smoothly (population
    * grows again), and a 100 TB deployment would extend the pool — the
    * rule, not the constant, is the contract. */
  val LshPlanesMax = 24

  /** [[LshPlanes]] extended to [[LshPlanesMax]]: the FIRST 8 ARE
    * LshPlanes verbatim (a small corpus's scaled buckets are exactly
    * the q22-portable 8-plane buckets), the extension has its own seed
    * so no other hash family can correlate with it. Same 6-decimal
    * rounding so oracle SQL literals are bit-identical. */
  val LshPlanesExt: IndexedSeq[IndexedSeq[Double]] = {
    val rng = new scala.util.Random(909L)
    LshPlanes ++ Vector.fill(LshPlanesMax - LshPlanes.size)(
      Vector.fill(64)(math.rint(rng.nextGaussian() * 1e6) / 1e6))
  }

  /** The smallest plane count p in [8, [[LshPlanesMax]]] with
    * [[ParaTargetPop]]·2^p ≥ n — integer-exact (no float log2 at a
    * power-of-two boundary can disagree between engines; the oracle
    * walks the identical threshold chain, [[planesForSql]]). */
  def planesFor(n: Long): Int = {
    var p = 8
    while (p < LshPlanesMax && (ParaTargetPop << p) < n) p += 1
    p
  }

  /** DuckDB CASE chain computing [[planesFor]] of count expression
    * `nExpr`. */
  def planesForSql(nExpr: String): String =
    (8 until LshPlanesMax)
      .map(p => s"WHEN $nExpr <= ${ParaTargetPop << p} THEN $p")
      .mkString("(CASE ", " ", s" ELSE $LshPlanesMax END)")

  /** Sign-LSH bucket over the first `nPlanes` of [[LshPlanesExt]] —
    * [[lshBucket]]'s corpus-scaled generalization (identical at
    * nPlanes = 8). */
  def lshBucketScaled(v: Column, nPlanes: Int): Column =
    LshPlanesExt.take(nPlanes).zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(v, typedLit(plane), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, d) => acc + d)
      when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB SQL computing [[lshBucketScaled]] of embedding expression
    * `v` with the plane count from expression `npExpr`: all
    * [[LshPlanesMax]] plane terms are emitted, each gated on
    * `p < npExpr` — the SQL stays one static string while the rule
    * stays data-derived, exactly like the Scala side's
    * driver-computed count. */
  def lshBucketScaledSql(v: String, npExpr: String): String =
    LshPlanesExt.zipWithIndex.map { case (plane, p) =>
      val lits = plane.mkString("[", ",", "]")
      s"(CASE WHEN $p < $npExpr AND list_sum(list_transform(list_zip($v, $lits), " +
        s"p -> CAST(p[1] AS DOUBLE) * p[2])) >= 0.0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}

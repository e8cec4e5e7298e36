package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** Deduplication operators for training-data curation (BASELINE.json
  * north star; absent from the reference, which stores whatever Neo4j
  * holds — reference server.py:85-91 reads, never dedups).
  *
  * Three families, in increasing scale-sophistication:
  *  1. exact     — group by content hash, keep min-id survivor. One
  *                 shuffle on the hash key; at 100 TB this is the
  *                 classic map-side-combine groupBy.
  *  2. MinHash+LSH — shingle → signature → banded bucket equi-join.
  *                 Candidate generation touches only same-bucket pairs:
  *                 O(sum of bucket² ) instead of O(n²). The signature
  *                 computation is row-local (no shuffle); only the
  *                 band explode (×4) and the bucket join shuffle.
  *  3. SimHash   — 48-bit signature, near-dup = small Hamming distance;
  *                 row-local signature + blocked pair join.
  *
  * Every hash is [[graft.functions.PortableHash]] modular arithmetic, so
  * the DuckDB oracle reproduces results exactly (the `...Sql` twins
  * generate the oracle text from the same constants).
  */
object Dedup {

  // ---------------------------------------------------------------
  // MinHash signatures
  // ---------------------------------------------------------------

  /** MinHash signature (array of [[MinhashFamily]].size longs) over a
    * column of *hashed* shingles (ARRAY<LONG>). Empty input → all-P
    * sentinel (P never collides with a real hash, which is < P).
    * Backed by the codegen'd [[graft.expressions.MinHashSigExpr]];
    * [[minhashSignatureHof]] is the built-ins reference. */
  def minhashSignature(shingleHashes: Column): Column =
    graft.expressions.HashExpressions.minhashSig(shingleHashes)

  /** Reference formulation of [[minhashSignature]] in pure built-ins. */
  def minhashSignatureHof(shingleHashes: Column): Column =
    array(MinhashFamily.map { ab =>
      coalesce(array_min(transform(shingleHashes, x => affine(ab, x))), lit(P))
    }: _*)

  def minhashSignatureSql(shingleHashesE: String): String =
    MinhashFamily.map { ab =>
      s"coalesce(list_min(list_transform($shingleHashesE, x -> ${affineSql(ab, "x")})), $P)"
    }.mkString("[", ", ", "]")

  /** LSH band keys from a signature: [[MinhashBands]] strings, each the
    * '_'-joined run of [[MinhashRowsPerBand]] signature slots. Docs
    * sharing *any* band key become candidate pairs. */
  def bandKeys(sig: Column): Column =
    array((0 until MinhashBands).map { b =>
      val slots = (0 until MinhashRowsPerBand)
        .map(r => element_at(sig, b * MinhashRowsPerBand + r + 1).cast("string"))
      struct(lit(b).as("band"), concat_ws("_", slots: _*).as("key"))
    }: _*)

  def bandKeySql(sigE: String, band: Int): String =
    (0 until MinhashRowsPerBand)
      .map(r => s"CAST($sigE[${band * MinhashRowsPerBand + r + 1}] AS VARCHAR)")
      .mkString(" || '_' || ")

  // ---------------------------------------------------------------
  // Jaccard over distinct-element arrays
  // ---------------------------------------------------------------

  /** Jaccard similarity of two *sorted, distinct* ARRAY<LONG> columns:
    * |A∩B| via codegen'd two-pointer merge, |A∪B| = |A|+|B|-|A∩B|
    * (valid because inputs are distinct) — no per-pair hash sets, no
    * union materialization. On a multi-million-pair verification join
    * this is the difference between 84 s and seconds at sf0.1. */
  def jaccard(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.sortedJaccard(a, b)

  /** Reference formulation over unsorted arrays in pure built-ins. */
  def jaccardHof(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  def jaccardSql(aE: String, bE: String): String =
    s"(len(list_intersect($aE, $bE))::DOUBLE / " +
      s"(len($aE)::DOUBLE + len($bE)::DOUBLE - len(list_intersect($aE, $bE))::DOUBLE))"

  /** Containment of the smaller set in the larger: |A∩B| / min(|A|,|B|).
    * The asymmetric companion to Jaccard — a short doc quoted whole
    * inside a long one has containment ≈ 1 while its Jaccard can sit
    * far below any near-dup threshold, so containment is the number a
    * curation audit reads to catch doc-inside-doc duplication. Inputs
    * are the same sorted, distinct ARRAY<LONG> shingle-hash sets as
    * [[jaccard]]; same codegen'd two-pointer intersection. */
  def containment(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.sortedIntersectSize(a, b).cast("double") /
      least(size(a), size(b)).cast("double")

  def containmentSql(aE: String, bE: String): String =
    s"(len(list_intersect($aE, $bE))::DOUBLE / least(len($aE), len($bE))::DOUBLE)"

  // ---------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------

  /** 48-bit SimHash over a column of token hashes (ARRAY<LONG>),
    * frequency-weighted (duplicates vote repeatedly). Bit j is set iff
    * the majority of tokens hash odd under family member j; ties → 0.
    * Backed by the codegen'd [[graft.expressions.SimHash48Expr]];
    * [[simhashHof]] is the built-ins reference. */
  def simhash(tokenHashes: Column): Column =
    graft.expressions.HashExpressions.simhash48(tokenHashes)

  /** Reference formulation of [[simhash]] in pure built-ins. */
  def simhashHof(tokenHashes: Column): Column =
    SimhashFamily.zipWithIndex.map { case (ab, j) =>
      val vote = aggregate(tokenHashes, lit(0L), (acc, x) =>
        acc + when(affine(ab, x) % 2L === 1L, lit(1L)).otherwise(lit(-1L)))
      when(vote > 0L, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def simhashSql(tokenHashesE: String): String =
    SimhashFamily.zipWithIndex.map { case (ab, j) =>
      val vote = s"list_reduce(list_prepend(0::BIGINT, list_transform($tokenHashesE, " +
        s"x -> (CASE WHEN ${affineSql(ab, "x")} % 2 = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END))), (a, b) -> a + b)"
      s"(CASE WHEN $vote > 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END)"
    }.mkString("(", " + ", ")")

  /** Hamming distance between two SimHash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")
  def hammingSql(aE: String, bE: String): String = s"bit_count(xor($aE, $bE))::BIGINT"

  // ---------------------------------------------------------------
  // Incremental LSH dedup (daily-ingest shape)
  // ---------------------------------------------------------------

  /** A pair agreeing in several bands matches the band equi-join once
    * per band; requiring the matched band to be the pair's CANONICAL
    * (lowest-index) agreeing band emits each candidate exactly once,
    * so no `distinct()` shuffle of the candidate set exists (the same
    * trick as the monolithic q19 path and q20's chunks). Band-key
    * equality ⟺ slot-wise signature equality, so earlier bands are
    * compared as raw signature longs. Expects both sides' full
    * signatures as `sigA`/`sigB` columns and the matched band as
    * `band`. */
  private[graft] def canonicalBand(sigA: Column, sigB: Column, band: Column): Column =
    (0 until MinhashBands).map { b =>
      lit(b) >= band || (0 until MinhashRowsPerBand).map { r =>
        element_at(sigA, b * MinhashRowsPerBand + r + 1) =!=
          element_at(sigB, b * MinhashRowsPerBand + r + 1)
      }.reduce(_ || _)
    }.reduce(_ && _)

  /** Verified near-dup pairs touching a NEW batch only — the
    * incremental-ingest shape: band keys of the new docs equi-join the
    * full corpus's band keys, so candidate volume is O(|new| × bucket
    * collision rate), never O(corpus²) and never a recompute of the
    * existing pair set. The canonical-band predicate sits inside the
    * join, so each candidate pair is emitted exactly once — no
    * pair-dedup shuffle anywhere in the daily job. At 100 TB this is
    * the daily dedup shape: the corpus side's signatures/band keys are
    * a persisted artifact (written once by the full build), the new
    * batch's are computed fresh, and the join reads only colliding
    * buckets.
    *
    * @param sh (idCol, hsCol ARRAY<LONG> distinct sorted shingle
    *           hashes, isNewCol BOOLEAN) for the full corpus.
    * @return (idCol, partner, partner_is_new, jac) — one row per
    *         verified (new doc, partner) pair, both directions when
    *         both are new. */
  def incrementalPairs(sh: DataFrame, idCol: String, hsCol: String,
                       isNewCol: String, threshold: Double): DataFrame = {
    val sigs = sh.select(col(idCol), col(isNewCol),
      minhashSignature(col(hsCol)).as("sig"))
    val bands = sigs
      .select(col(idCol), col(isNewCol), col("sig"),
        explode(bandKeys(col("sig"))).as("bk"))
      .select(col(idCol), col(isNewCol), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val nb = bands.filter(col(isNewCol))
      .select(col(idCol).as("__nid"), col("sig").as("__nsig"),
        col("band"), col("key"))
    val pb = bands.select(col(idCol).as("__pid"),
      col(isNewCol).as("partner_is_new"), col("sig").as("__psig"),
      col("band").as("__pband"), col("key").as("__pkey"))
    val cand = nb.join(pb,
        col("band") === col("__pband") && col("key") === col("__pkey") &&
          col("__nid") =!= col("__pid") &&
          canonicalBand(col("__nsig"), col("__psig"), col("band")))
      .select(col("__nid"), col("__pid"), col("partner_is_new"))
    val a = sh.select(col(idCol).as("__nid"), col(hsCol).as("__hsa"))
    val b = sh.select(col(idCol).as("__pid"), col(hsCol).as("__hsb"))
    cand.join(a, "__nid").join(b, "__pid")
      .withColumn("jac", round(jaccard(col("__hsa"), col("__hsb")), 6))
      .filter(col("jac") >= threshold)
      .select(col("__nid").as(idCol), col("__pid").as("partner"),
        col("partner_is_new"), col("jac"))
  }

  /** Persist the corpus side of the daily-dedup job as reusable
    * artifacts: the band-key table (written PARTITIONED BY band, so an
    * incremental probe reads only colliding band directories; each row
    * also carries the doc's full signature — ×bands redundancy that
    * buys the probe its no-pair-dedup-shuffle canonical-band join) and
    * the shingle sets needed for Jaccard verification. Written once by
    * the full corpus build; every subsequent ingest batch joins
    * against it via [[incrementalPairsVsIndex]] instead of recomputing
    * corpus signatures. */
  def saveCorpusIndex(sh: DataFrame, idCol: String, hsCol: String, dir: String): Unit = {
    val sigs = sh.select(col(idCol), minhashSignature(col(hsCol)).as("sig"))
    sigs.select(col(idCol), col("sig"), explode(bandKeys(col("sig"))).as("bk"))
      .select(col(idCol), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$dir/bands")
    sh.select(col(idCol), col(hsCol))
      .write.mode("overwrite").parquet(s"$dir/shingles")
  }

  /** Fail fast with an actionable message when a persisted corpus
    * index predates the current on-disk format (e.g. a bands table
    * without the `sig` column) — not an opaque missing-column
    * AnalysisException from deep inside a probe plan. Shared by every
    * reader of the artifact (batch probe AND the streaming twin in
    * [[graft.streaming.EventStreams.incrementalDedupVsIndex]]). */
  private[graft] def requireIndexCols(df: DataFrame, indexDir: String,
                                      part: String, cols: Seq[String]): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"corpus index at $indexDir/$part is missing column(s) " +
        s"${missing.mkString(", ")} — written by an older release? " +
        "Rebuild it with Dedup.saveCorpusIndex.")
  }

  /** [[incrementalPairs]] against a PERSISTED corpus index
    * ([[saveCorpusIndex]]): the corpus side's band keys and shingles
    * are read back from parquet — nothing about the existing corpus is
    * recomputed, which is the property that makes daily ingest O(new)
    * at 100 TB. Output contract matches [[incrementalPairs]] run over
    * (corpus ∪ new batch) with the batch flagged as new.
    *
    * @param newSh (idCol, hsCol) for the new batch only. */
  def incrementalPairsVsIndex(spark: SparkSession, indexDir: String,
                              newSh: DataFrame, idCol: String, hsCol: String,
                              threshold: Double): DataFrame = {
    val corpusBands = spark.read.parquet(s"$indexDir/bands")
    val corpusSh = spark.read.parquet(s"$indexDir/shingles")
    requireIndexCols(corpusBands, indexDir, "bands", Seq(idCol, "sig", "band", "key"))
    requireIndexCols(corpusSh, indexDir, "shingles", Seq(idCol, hsCol))
    val newSigs = newSh.select(col(idCol), minhashSignature(col(hsCol)).as("sig"))
    val newBands = newSigs
      .select(col(idCol).as("__nid"), col("sig"),
        explode(bandKeys(col("sig"))).as("bk"))
      .select(col("__nid"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val allBands = corpusBands
      .select(col(idCol), lit(false).as("__pnew"), col("sig"), col("band"), col("key"))
      .union(newBands.select(col("__nid").as(idCol), lit(true).as("__pnew"),
        col("sig"), col("band"), col("key")))
    val pb = allBands.select(col(idCol).as("__pid"), col("__pnew"),
      col("sig").as("__psig"), col("band").as("__pband"), col("key").as("__pkey"))
    // canonical-band join (see incrementalPairs): each candidate pair
    // exactly once, no distinct() shuffle in the probe
    val cand = newBands
      .select(col("__nid"), col("sig").as("__nsig"), col("band"), col("key"))
      .join(pb,
        col("band") === col("__pband") && col("key") === col("__pkey") &&
          col("__nid") =!= col("__pid") &&
          canonicalBand(col("__nsig"), col("__psig"), col("band")))
      .select(col("__nid"), col("__pid"), col("__pnew").as("partner_is_new"))
    val a = newSh.select(col(idCol).as("__nid"), col(hsCol).as("__hsa"))
    val b = corpusSh.select(col(idCol).as("__pid"), col(hsCol).as("__hsb"))
      .union(newSh.select(col(idCol).as("__pid"), col(hsCol).as("__hsb")))
    cand.join(a, "__nid").join(b, "__pid")
      .withColumn("jac", round(jaccard(col("__hsa"), col("__hsb")), 6))
      .filter(col("jac") >= threshold)
      .select(col("__nid").as(idCol), col("__pid").as("partner"),
        col("partner_is_new"), col("jac"))
  }

  // ---------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------

  /** Keep one survivor (min id) per exact content value. The groupBy
    * shuffles only (key-hash, id) pairs — map-side combine reduces each
    * partition to one candidate per key before the exchange. */
  def exactSurvivors(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Edge-count cutover for [[connectedComponents]]: at or below this
    * many verified duplicate edges the component solve runs as a
    * driver-local union-find — O(E α(E)) with zero shuffle stages —
    * because a fixpoint loop of distributed joins costs several
    * scheduler round-trips per iteration regardless of data size.
    * Above it (a 100 TB corpus can produce billions of dup edges) the
    * distributed min-label propagation takes over. 10M edges ≈ 160 MB
    * of longs on the driver — comfortably under any real driver heap. */
  val LocalComponentsMaxEdges = 10000000L

  /** Connected components over an undirected pair list.
    *
    * Distributed path: alternating large-star/small-star contraction
    * ([[starContract]]) — O(log n) rounds regardless of graph shape,
    * so a chain-shaped dup graph converges as fast as a clique. Small
    * graphs (≤ [[LocalComponentsMaxEdges]]) solve on the driver
    * instead — identical output, none of the per-iteration stage
    * overhead.
    *
    * @param pairs two LONG columns (a, b), undirected edges.
    * @param localMaxEdges cutover for the driver-local solve
    *                      (overridable for testing the distributed path).
    * @return (id, component) for every id appearing in pairs, where
    *         component = min id reachable from it. */
  def connectedComponents(pairs: DataFrame,
                          localMaxEdges: Long = LocalComponentsMaxEdges): DataFrame = {
    val spark = pairs.sparkSession
    val a = pairs.select(col(pairs.columns(0)).as("u"), col(pairs.columns(1)).as("v"))
    val nEdges = a.count()
    if (nEdges <= localMaxEdges) {
      // union-find on the driver: one collect of (u, v) longs
      import spark.implicits._
      val edges = a.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      for ((u, v) <- edges) {
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
      // min-root invariant: union always keeps the smaller root, so
      // find(x) is exactly "min id reachable from x"
      return parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "component")
    }
    starContract(a)._1
  }

  /** One large-star round: every node u hangs its strictly-LARGER
    * neighbors off m(u) = min(Γ(u) ∪ {u}). Halves the depth of tall
    * trees in one round. Input/output edges are canonically oriented
    * (u > v); the output keeps that orientation because v > u ≥ m(u). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = nbrs.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("m"))
    nbrs.filter(col("v") > col("u"))
      .join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node u re-hangs its SMALLER neighbors
    * (and itself) off its minimum neighbor. Output stays canonically
    * oriented: every emitted (x, m) has x > m. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    val relinked = e.join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
    val selfEdge = m.select(col("u"), col("m").as("v"))
    relinked.union(selfEdge).distinct()
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SOCC'14): each
    * round is two join+groupBy stages, and the edge forest provably
    * contracts to depth-1 stars rooted at each component's minimum in
    * O(log n) rounds — graph DIAMETER does not appear in the bound,
    * which is what makes chain-shaped dup graphs (the worst case for
    * plain min-label propagation) converge fast.
    *
    * @param pairs undirected edges as two LONG columns.
    * @return ((id, component) for every id in pairs, rounds taken). */
  private[graft] def starContract(pairs: DataFrame): (DataFrame, Int) = {
    // canonical orientation: every edge points from the larger id to
    // the smaller, so star roots can only be component minima.
    // localCheckpoint (not cache) each generation: both star steps
    // reference their input SEVERAL times (symmetric union + join), so
    // the logical plan grows geometrically per round — caching
    // materializes blocks but leaves the analyzer walking the full
    // lineage, which goes exponential around ~10 rounds. Truncating
    // lineage each round keeps analysis O(1) per round; on a real
    // cluster with flaky executors, `checkpoint` to reliable storage
    // is the same call shape.
    var edges = pairs
      .select(greatest(col(pairs.columns(0)), col(pairs.columns(1))).as("u"),
        least(col(pairs.columns(0)), col(pairs.columns(1))).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // converged when the edge set is stable under both stars
      changed = next.except(edges).union(edges.except(next)).count()
      edges.unpersist(blocking = false)
      edges = next
      rounds += 1
    }
    // fixpoint = depth-1 stars: (leaf, root) edges with root = the
    // component min. Roots appear only on the v side; label them with
    // themselves via the symmetric view.
    val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val labels = nbrs.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("component"))
      .select(col("u").as("id"), col("component"))
    (labels, rounds)
  }

  /** Dedup survivor selection: given docs and verified near-dup pairs,
    * keep the min-id member of every component (and all unpaired docs).
    * Returns the input plus (component, is_survivor). */
  def survivors(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.join(comp, docs(idCol) === comp("id"), "left")
      .withColumn("component", coalesce(col("component"), docs(idCol)))
      .withColumn("is_survivor", col("component") === docs(idCol))
      .drop("id")
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the embedding corpus — the
  * *scale path* replacing the reference's resident HNSW index (reference
  * server.py:87, `db.index.vector.queryNodes`): no index server exists
  * in a batch engine, so candidate pruning comes from hash bucketing.
  *
  * q22 uses the seeded sign-LSH of [[graft.functions.PortableHash]]
  * (8 hyperplanes → 256 buckets) with multi-probe radius 1 (probe the
  * query's bucket and all buckets differing in one plane). The bucket
  * id is row-local math; at 100 TB the corpus would be *written
  * partitioned by bucket*, so a query reads ~9/256 of the data instead
  * of all of it — the batch analogue of an index probe.
  *
  * MLlib-backed variants (BucketedRandomProjectionLSH, IVF/KMeans) live
  * in [[graft.search.AnnIndex]]; their hashes are not portable to the
  * oracle, so they are recall-tested in scalatest instead (SURVEY.md §5).
  */
object AnnQueries {

  /** The flagship prompt: embedded driver-side by the deterministic
    * [[graft.search.HashingEmbedder]]; the resulting vector is inlined
    * as a literal in BOTH the Spark plan and the oracle SQL, so the
    * reference's full tool path (prompt → embed → cosine top-k →
    * payload projection, reference server.py:71-102) is hash-exact
    * oracle-checked end to end. */
  val FlagshipPrompt = "fast hash join on a big table"

  /** q58: how many centroid outliers to surface. */
  val CentroidOutlierK = 20

  /** q72: cosine floor for the LSH near-dup candidate join. The fixture
    * corpus plants no high-cosine embedding clones (max pair cosine is
    * ~0.51 at sf0.01, ~0.60 at sf0.1) and q21's top-20 pairs all sit at
    * cosine >= 0.43 at every SF, so 0.4 keeps every pair the oracle
    * ranks while still bounding the similarity join's distance
    * threshold (maxDist = sqrt(2(1-minCos)) on unit vectors). When new
    * fixtures plant tighter clones, raise this floor toward the clone
    * band — the join gets cheaper, never less correct (the oracle
    * compare fails closed on any recall miss). */
  val NearDupMinCos = 0.4

  /** q72: pairs surfaced (matches q21, whose result is the oracle). */
  val NearDupTopK = 20

  /** q47/q72: hash tables in the shared session BRP index. Round-9
    * tuning study (ScaleProbe --brp-tables, measurements in
    * SCALING.md): 8 tables recall q72's exact top-20 PAIRS at every
    * fixture SF and would roughly halve the similarity-join cost (warm
    * 5.8 s vs 10.8 s at the sf0.1 probe), but q47's POINT probe then
    * misses its rank-3 neighbor outright at sf0.01 (zero bucket
    * collisions in all 8 tables — no over-probe recovers it), and
    * giving the two queries different geometries would double the
    * cached index footprint and abandon the one-fit-per-session
    * design. Decision: 12 stays — recall slack for the weakest
    * consumer prices the shared index. bucketLength stays 2.0:
    * NARROWER buckets measured SLOWER (12 tables at 1.0 → warm
    * 13.6 s vs 10.8 s; the per-table explode, not candidate volume,
    * dominates on this corpus). */
  val BrpTables = 12

  /** q85 SemDeDup geometry: 8 cells / 2 Lloyd's iterations keeps the
    * oracle's unrolled CTE tractable while exercising a full
    * assign→update→assign→update→assign cycle; a production corpus runs
    * k ≈ 10⁴–10⁵ (Abbas et al. 2023) with the SAME plan shape. The pair
    * threshold is the Neo4j score convention (0.7 ⇔ cosine 0.4 — the
    * q72 floor; the fixture plants no high-cosine clones, so this is
    * the band where its near-dups live). */
  val SemCells = 8
  val SemIters = 2
  val SemMinScore = 0.7

  /** q144 product-quantization geometry (Jégou et al. 2011): the
    * 64-dim space splits into PqM contiguous PqDim-dim subspaces, each
    * with its own PqK-cell codebook learned by the SAME deterministic
    * Lloyd's machinery as q85 (SemDedup.fit on the sliced corpus) —
    * a PQ code is the m-tuple of per-subspace cell ids, compressing
    * 64 floats to m small ints. Small here so the oracle's
    * 4-subspace × 2-iteration unrolled chain stays tractable;
    * production PQ runs m=8-16, k=256 with identical plan shape. */
  val PqM = 4
  val PqDim = 16
  val PqK = 4
  val PqIters = 2

  /** q97: greedy k-center rounds — 5 keeps the oracle's unrolled CTE
    * chain tractable (4 argmax rounds past the seed) while exercising
    * the full farthest-point trace; on the clone-free fixture the
    * radii spread across genuinely distant embeddings. */
  val KCenterK = 5

  /** q101 geometry: k=6 centers in batches of B=3 — seed scan, one
    * full 3-pick scan (picks 2..4), one SHORT 2-pick scan (picks 5..6,
    * take = k − chosen): 3 corpus scans vs 6 sequential, small enough
    * for a fully unrolled oracle while exercising the truncated final
    * batch. */
  val KCenterBatchK = 6
  val KCenterBatchB = 3

  /** q99: vectors in the JL distortion audit's deterministic id-prefix
    * sample — 100 vectors → 4,950 audited pairs, plenty for the
    * ratio statistics and corpus-size-independent by construction. */
  val JlSampleN = 100

  /** q75: IVF geometry. The fixture corpus plants NO embedding clusters
    * (the same no-clones property behind q72's minCos note), so the
    * exact top-10 neighbors of the probe sit at cosine ~0.4-0.5 —
    * essentially angular noise — and scatter nearly uniformly across
    * cells: under the layout-canonical quantizer
    * ([[graft.search.AnnIndex.IvfFitPartitions]]) the measured minimum
    * nProbe for 10/10 recall at cells=16 is 11 (sf0.001), 15 (sf0.01),
    * 13 (sf0.1) — `ScaleProbe --ivf-tune` re-measures in one command.
    * 15 is the measured worst case; more slack would probe EVERY cell
    * and delete the pruning the query exists to certify, and on a
    * structureless corpus the worst neighbor's cell rank is an order
    * statistic near cells·(1−1/11) at ANY cell count, so raising
    * `cells` cannot buy headroom. The oracle compare FAILS CLOSED on
    * any recall miss (q47's gate construction): if a regeneration
    * flips this red, re-run --ivf-tune and set the new measured
    * worst — never weaken the oracle. On a real corpus with semantic
    * clusters the ratio is nProbe/cells ≈ 4/256; the property q75
    * certifies is the PLAN (the probe's `cell IN (...)` reaching the
    * scan as a PartitionFilter), which is scale-independent. */
  val IvfCells = 16
  val IvfNProbe = 15

  /** q148 IVF-PQ geometry: [[IvfCells]] coarse cells (the q75
    * quantizer machinery, layout-canonical) composed with per-subspace
    * PQ codebooks over the q144 slicing ([[IvfPqM]]=4 ×
    * [[IvfPqSubDim]]=16). k=16 per subspace — finer than q144's 4 —
    * because q148's oracle is the EXACT top-10 (q47's fails-closed
    * recall gate), not an unrolled Lloyd's chain, so codebook fidelity
    * costs the oracle nothing; 4×4-bit codes still compress the
    * 256-byte float vector 128×. [[IvfPqShortlist]] is the number of
    * ADC-ranked candidates exact-rescored. Measured minima for 10/10
    * recall under `--ivfpq-tune` (re-run after any fixture
    * regeneration): 179 (sf0.001), 86 (sf0.01), 481 (sf0.1); m=8×8-dim
    * measured WORSE at sf0.1 (1189), so m stays 4. The minima are an
    * honest property of THIS corpus: the fixture plants no embedding
    * clusters (q75's no-clones note), so the exact top-10 sits at
    * angular noise and PQ codes — any codes — cannot finely rank it;
    * the shortlist is then a large order statistic of the ADC error.
    * 600 covers the measured worst with ~25% headroom and the oracle
    * still FAILS CLOSED on any miss. On a clustered production corpus
    * the ADC margin is inter-cluster distance, not noise ordering, and
    * the shortlist/corpus ratio collapses; the property q148 certifies
    * is the PLAN — cell-partition pruning on both scans, an ADC scan
    * whose ReadSchema is codes-only, a shortlist-bounded exact rescore
    * — which is scale-independent (PlanSpec-pinned). */
  val IvfPqM = 4
  val IvfPqSubDim = 16
  val IvfPqK = 16
  val IvfPqIters = 2
  val IvfPqShortlist = 600

  /** q165 served search — the SERVICE entry point routed through the
    * q148 IVF-PQ artifact ([[graft.search.SearchEngine.searchIndexed]]):
    * the reference's tool call IS an index probe
    * (`db.index.vector.queryNodes`, reference server.py:87), so the
    * engine's public path must be one too, not a corpus scan. The
    * prompt is a FIXED string (the tool's one argument); its
    * deterministic [[graft.search.HashingEmbedder]] vector probes the
    * same session artifact q148–q154 share, and the oracle is the
    * EXACT top-10 (computed from the prompt vector's literals inlined
    * into the SQL — the q33 embedder-portability convention), joined
    * to the document payloads — fails closed on a cell miss, an ADC
    * shortlist miss, or a payload-fetch defect.
    * [[ServedShortlist]]: `--served-tune` measures the minimum ADC
    * shortlist for 10/10 recall of the PROMPT vector (a sparse
    * normalized-TF query — geometrically unlike the corpus's dense
    * synthetics, so it carries its own constant): minima 148
    * (sf0.001), 152 (sf0.01), 886 (sf0.1), zero cell misses at
    * [[IvfNProbe]] on every SF. 1100 covers the measured worst with
    * ~24% headroom; re-run after any fixture regeneration. */
  val ServedPrompt = "similarity search over document embeddings"
  val ServedShortlist = 1100

  /** q172/q173 delete-lifecycle script — the tombstone path's declared
    * fixture: three documents ingested into the session LSM delta,
    * then a scripted mix of deletes and a correction, exercising every
    * lifecycle rule on BOTH serve routes (q172: the raw
    * [[graft.search.AnnIndex.probeIvfPqLsm]] vector probe; q173: the
    * full [[graft.search.SearchEngine.searchIndexed]] service path):
    *
    *  - corpus doc [[DeletedCorpusId]] is DELETED — it is its own
    *    exact top-1 under q172's query vector, so a probe that ignores
    *    the tombstone instantly flips both oracles red;
    *  - `beta` is ingested then deleted (a fresh-id takedown);
    *  - `gamma` is ingested, deleted, and RE-INGESTED with corrected
    *    text (del + put = re-ingest-with-correction — the newest
    *    version serves);
    *  - `alpha` just lives.
    *
    * The batch carve (puts at 0/1/3, deletes at 1/2, compactEvery 2)
    * makes both stores FOLD mid-script, so the oracles also certify
    * that last-writer-wins and tombstone shadowing survive compaction
    * and the manifest swap. All texts are static: the oracle inlines
    * their deterministic embedder vectors as literals (the q165
    * convention). */
  val ServedDeleteDocs: Seq[(Long, String)] = Seq(
    2000000101L -> "tombstone lifecycle alpha document",
    2000000102L -> "tombstone lifecycle beta document",
    2000000103L -> "tombstone lifecycle gamma draft wording")
  val ServedDeleteCorrected: (Long, String) =
    (2000000103L, "tombstone lifecycle gamma corrected wording")
  val ServedDeletePrompt: String = ServedDeleteCorrected._2
  val DeletedCorpusId = 0L

  /** q176 evolving-index eval queries — dedicated NEAR-DUP probes of
    * the lifecycle script's LIVE documents (4-of-5 / 4-of-4 word
    * overlap → cosine 0.8 / 0.894, far above the corpus's random-max
    * cosine at every SF), so the standing report can only be perfect
    * if the served route actually retrieves the ingested content: a
    * delta-serving miss drops the planted top-1, a wrongly-served
    * tombstoned row (beta, or the gamma draft — both textually close
    * to these queries by construction) pushes a non-relevant id into
    * the top-k. Ids are labels only (not documents). */
  val EvolvingEvalQueries: Seq[(Long, String)] = Seq(
    3000000001L -> "tombstone lifecycle gamma corrected phrasing",
    3000000002L -> "tombstone lifecycle alpha document extra")

  /** q174 refit trigger: rebuild the artifact when the delta's mean
    * PQ quantization distortion under the MAIN-fitted codebooks
    * exceeds this multiple of the main rows' own mean — the standing
    * gauge that says WHEN the frozen geometry has drifted from the
    * data (between folds the codebooks never refit, so on a
    * distribution-shifted ingest the ratio climbs). 1.25 sits far
    * above the measured fixture ratio (~1.0 — the delta carve is an
    * affine hash of the same distribution, the in-distribution
    * baseline) and far below what a genuine shift produces. */
  val RefitDriftMax = 1.25

  /** Tombstone-mass fold trigger — q174's twin for the OTHER reason a
    * major fold becomes due: accumulated deletes. Every live tombstone
    * costs each probe's exclusion join and its store's disk until a
    * fold drops the ids physically; the `--tombstone-probe` receipt
    * (`bench/tombstone_probe_r15.json`) measures the serving path flat
    * through 10⁶ live tombstones (broadcast exclusion) and gracefully
    * degraded — not broken — at 10⁷ (the size guard withholds the
    * broadcast hint and the planner shuffles), so the trigger sits at
    * the top of the measured-flat region, two orders of magnitude
    * under the broadcast ceiling
    * ([[graft.search.AnnIndex.TombstoneBroadcastMaxBytes]]): fold when
    * the store's live tombstones exceed this many rows, even if the
    * q174 drift gauge still reads calm. ACTUATED (not just guidance)
    * by [[graft.search.AnnIndex.foldIfTombstonesDue]], which the
    * serve loop's `--maintain-every` wires to the serving root —
    * tombstones can no longer accumulate past the trigger with
    * nothing folding them. */
  val TombstoneFoldRows = 1000000L

  /** q150 incremental (main + delta) search: the corpus splits by the
    * engine's affine split hash — ~90% MAIN (indexed: the q148 IVF-PQ
    * artifact built on main only) + ~10% DELTA (recent, unindexed,
    * exact-scanned) — and the query merges the two sides' top-k's:
    * the LSM read path every vector store runs between index
    * rebuilds. The delta side is always exact, so recall can only be
    * lost on the main path; `--ivfpq-tune --tune-split true` measures
    * the main-built artifact against the FULL-corpus exact top-10's
    * main members (9 of 10 on every fixture SF): zero cell misses at
    * nProbe 15 and ADC shortlist minima 234/89/372 at
    * sf0.001/0.01/0.1 — inside the full-artifact envelope, so q150
    * reuses [[IvfNProbe]] and [[IvfPqShortlist]] (both fail closed at
    * the oracle; re-tune after any fixture regeneration). */
  val DeltaBucketMin = 90

  /** q151 per-query ADC shortlist: the batch pays the WORST query's
    * shortlist (q87's worst-case-not-slack policy), and
    * `--ivfpq-multi-tune` measures the per-query minima against the
    * q148 artifact at MultiProbeNProbe cells: batch worst 299
    * (sf0.001), 349 (sf0.01), 1084 (sf0.1 — query 4's exact top-10
    * scatters deep into ADC order; the q148 isotropic-corpus honesty
    * note, amplified by taking a 5-query max). 1300 covers the
    * measured worst with ~20% headroom; the oracle (exact per-query
    * top-10) fails closed on any miss. The certified property stays
    * the PLAN — per-query DPP-pruned code reads, window-group-limited
    * shortlists, heap top-k — not the fixture's unflattering ratio. */
  val IvfPqMultiShortlist = 1300

  /** q152 filtered ANN (the metadata-filter search every production
    * vector store exposes — Qdrant payloads / Milvus scalar fields):
    * the fixture's ~10%-selective `label` column is persisted IN the
    * q148 artifact as a payload column, and the predicate
    * `label = FilterLabel` is applied INSIDE both artifact scans (a
    * PushedFilter under the cell PartitionFilter) — the PRE-filter
    * strategy, so the ADC shortlist ranks qualifying rows only and a
    * selective filter cannot starve the top-k the way
    * oversample-then-post-filter can. `--ivfpq-filter-tune` measures
    * the filtered shortlist minima (ranks are over filtered candidates
    * only, so they run far BELOW the unfiltered q148 minima: 22/23/71
    * across SFs) and the cell misses at IvfNProbe (0 on every SF);
    * 120 covers the worst with ~69% headroom and the exact
    * filtered-top-10 oracle fails closed on any miss. */
  val FilterLabel = 7
  val IvfPqFilteredShortlist = 120

  /** q153 minor compaction (the LSM write path that retires q150's
    * exact delta scan): the delta graduates into an INDEXED segment —
    * cells assigned by the MAIN quantizer, codes by the MAIN codebooks,
    * no refit, main files untouched, O(delta) work — and the probe
    * runs the q148 read path over BOTH cell-partitioned segments with
    * ONE shortlist over the unioned ADC ranking. Query is vec_id=1
    * (q150 already certifies vec 0 on this split).
    * `--ivfpq-compact-tune` measures the union-ADC shortlist minima
    * for it: 62/247/796 across SFs — vec 1's exact top-10 scatters
    * deeper into ADC order than vec 0's (the q148 isotropic-corpus
    * honesty note: on a clone-free fixture the true neighbors sit at
    * angular noise that 4×16-way codes cannot finely rank, and the
    * main-fitted codebooks quantize the delta slightly worse than
    * their own fit corpus), so q153 carries its own constant: 1000
    * covers the measured worst with ~25% headroom and the exact
    * full-corpus oracle fails closed on any miss (re-tune after any
    * fixture regeneration). */
  val CompactQueryId = 1L
  val CompactShortlist = 1000

  /** q154 residual IVF-PQ — IVFADC proper (Jégou et al. 2011 §III-C):
    * PQ codes quantize the residual `xn − c_cell` of the NORMALIZED
    * vector after coarse quantization (q148 encodes the raw vector).
    * The published rationale: residuals concentrate near the origin
    * once the coarse step has explained the between-cell variance, so
    * the same code budget resolves what the cell id doesn't already
    * say — and on unit vectors ‖qn − xn‖² = 2 − 2·cos, so residual ADC
    * estimates the TRUE ranking metric. The honest measured result on
    * THIS fixture (`--ivfpq-res-tune`, vs `--ivfpq-tune` raw-space for
    * the same query vec 0): raw 179/86/481 → residual 137/132/746 —
    * parity within order-statistic noise, NOT an improvement, and the
    * tune explains why: the corpus is isotropic (q75's no-clones
    * note), so 16 coarse cells explain almost no variance, the k-means
    * centers sit near the origin, and the residual ≈ xn itself — the
    * regime where IVFADC's advantage is DESIGNED to vanish. On a
    * clustered production corpus the residual norm shrinks with
    * cluster tightness and the published gap reappears; the operator
    * certifies the machinery (per-(cell, code) broadcast-literal
    * lookup tables — 16×16×4 = 1024 doubles, row-local codegen, zero
    * joins — over the unchanged q148 plan shape) with the fails-closed
    * exact oracle. q154's query (vec 2) measures 162/196/440; 600
    * covers the worst with ~36% headroom. */
  val ResQueryId = 2L
  val IvfPqResShortlist = 600

  /** q87: how many query vectors (vec_id < this) probe the artifact in
    * one batch — q11's query set. Recall slack is per query and the
    * oracle fails closed on any miss, so the batch needs the WORST
    * query's nProbe: measured batch minima under the canonical
    * quantizer are 11 (sf0.001), 15 (sf0.01), 13 (sf0.1) — the same
    * worst-case-not-slack policy as [[IvfNProbe]] (16 of 16 would stop
    * pruning). The scale property (the probe reading nProbe/cells of
    * the partition directories) is cell-count relative, not
    * absolute. */
  val MultiProbeQueries = 5
  val MultiProbeNProbe = 15

  /** q89: neighbors per side feeding the margin normalizer (Artetxe &
    * Schwenk 2019 use k = 4; the criterion is robust to k as long as
    * both directions use the same one). */
  val MarginK = 4

  /** q164 IR-metrics geometry: the query batch (first [[IrQueries]]
    * vec_ids, evaluated over the REST of the corpus so a self-hit
    * cannot pad the scores) and the metric depth k. */
  val IrQueries = 5
  val IrK = 10

  /** nDCG position discounts 1/log2(1+pos), pos = 1..[[IrK]], as exact
    * 12-dp decimals computed ONCE here and emitted as literals into
    * BOTH engines' CASE ladders — the PortableHash shared-snippet rule:
    * two engines evaluating ln-based discounts independently could
    * drift in the last ulp; identical decimal literals cannot. */
  private[queries] val irDisc: IndexedSeq[java.math.BigDecimal] =
    (1 to IrK).map { p =>
      new java.math.BigDecimal(math.log(2.0) / math.log(1.0 + p))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }

  /** Ideal-DCG prefix sums of [[irDisc]]: idcg(n) for n = 1..[[IrK]]
    * relevant items — exact decimal sums of the 12-dp literals. */
  private[queries] val irIdcg: IndexedSeq[java.math.BigDecimal] =
    irDisc.scanLeft(java.math.BigDecimal.ZERO)(_.add(_)).tail

  /** CASE ladder mapping a 1..[[IrK]] rank to its decimal discount —
    * valid in Spark SQL (`expr`) and DuckDB verbatim. */
  private[queries] def irDiscSql(pos: String): String =
    s"CASE $pos " + (1 to IrK).map { p =>
      s"WHEN $p THEN CAST(${irDisc(p - 1).toPlainString} AS DECIMAL(14,12))"
    }.mkString(" ") + " END"

  /** CASE ladder mapping a relevant-set size 1..[[IrK]] to its ideal
    * DCG (the rank filter caps n_rel at [[IrK]], so the ladder is
    * total over every value the plan can produce). */
  private[queries] def irIdcgSql(n: String): String =
    s"CASE $n " + (1 to IrK).map { p =>
      s"WHEN $p THEN CAST(${irIdcg(p - 1).toPlainString} AS DECIMAL(28,12))"
    }.mkString(" ") + " END"

  private[queries] lazy val flagshipVec: Seq[Float] =
    new graft.search.HashingEmbedder(64).embed(FlagshipPrompt).toSeq

  /** q165's query vector — the served prompt through the same
    * deterministic embedder the service constructs (SearchEngine's
    * default). Used only by the ORACLE (the engine path embeds inside
    * [[graft.search.SearchEngine.searchIndexed]] itself — the oracle
    * must not share the engine's code path, only its declared rule). */
  private[queries] lazy val servedVec: Seq[Float] =
    new graft.search.HashingEmbedder(64).embed(ServedPrompt).toSeq

  /** q173's query vector + the scripted docs' vectors — the same
    * deterministic embedder both the engine's ingest (embedCorpus) and
    * its serve path construct; used by the oracles as literals. */
  private[queries] def docVec(text: String): Seq[Float] =
    new graft.search.HashingEmbedder(64).embed(text).toSeq

  /** DuckDB literal rows for the delete-lifecycle's LIVE synthetic
    * docs (alpha + corrected gamma — beta and the gamma draft are
    * tombstoned/superseded): `(vec_id, embedding, text)` VALUES the
    * oracle unions with the live corpus. */
  private[queries] def servedDeleteLiveValuesSql: String =
    Seq(ServedDeleteDocs.head, ServedDeleteCorrected)
      .map { case (id, text) =>
        val lits = docVec(text).map(_.toDouble).mkString("[", ", ", "]")
        s"($id::BIGINT, $lits, '$text')"
      }.mkString(",\n         ")

  /** Write-once-per-session persisted IVF artifact for q75 — the vector
    * side of the reference's CREATE-INDEX-once / probe-many lifecycle
    * (reference README.md:71-79 provisions the index, server.py:87
    * probes it on every call): the corpus is written PARTITIONED BY
    * cell ([[graft.search.AnnIndex.saveIvf]]) exactly once, and every
    * probe in the session reads only its nProbe cell directories back.
    * The artifact-side twin of the q73 band index. */
  private val sessionIvfIndex = new graft.SessionMemo[String, String]

  private[graft] def ivfIndexDir(s: SparkSession, dir: String): String =
    sessionIvfIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      // cache=false: the assigned table is consumed exactly once by the
      // write; no unmanaged cached blocks should outlive the build
      val idx = graft.search.AnnIndex.buildIvf(e, cells = IvfCells, cache = false)
      graft.search.AnnIndex.saveIvf(idx, out)
      out
    }

  /** Write-once-per-session persisted IVF-PQ artifact for q148 — the
    * COMPOSED layout (q144's own scaladoc names it): the q75 cell
    * partitioning with each resident row carrying its PQ code columns,
    * plus the tiny persisted codebooks. Built by the same
    * layout-canonical quantizer and the deterministic per-subspace
    * Lloyd's fits. */
  private val sessionIvfPqIndex = new graft.SessionMemo[String, String]

  private[graft] def ivfPqIndexDir(s: SparkSession, dir: String): String =
    sessionIvfPqIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      // `label` rides along as a persisted PAYLOAD column (q152's
      // metadata filter pushes down onto it inside the artifact scans);
      // the quantizer/codebook fits never see it, so q148/q150/q151's
      // geometry — and their measured tune minima — are unchanged, and
      // their plans prune it away at the reader
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"), col("label"))
      val idx = graft.search.AnnIndex.buildIvf(e, cells = IvfCells, cache = false)
      val codebooks = (0 until IvfPqM).map { sub =>
        graft.operators.SemDedup.fit(
          e.select(col("vec_id"),
            slice(col("embedding"), sub * IvfPqSubDim + 1, IvfPqSubDim).as("embedding")),
          IvfPqK, IvfPqIters)
      }
      graft.search.AnnIndex.saveIvfPq(idx, codebooks, IvfPqSubDim, out)
      out
    }

  private val sessionServedDelta = new graft.SessionMemo[String, String]

  /** Session-once SCRIPTED delete-lifecycle delta next to the shared
    * q148 artifact — the [[ServedDeleteDocs]] script through the same
    * batch building blocks the streaming faces wrap
    * ([[graft.search.AnnIndex.appendDeltaBatch]] /
    * [[graft.search.AnnIndex.appendTombstones]]; the streaming op
    * stream itself — [[graft.search.SearchEngine.streamingDocApply]] —
    * is spec-tied to produce this exact store state). Batch ids:
    * b0 put(alpha, beta); b1 put(gamma draft) + del(corpus 0, beta);
    * b2 del(gamma); b3 put(gamma corrected). compactEvery=2 folds both
    * stores mid-script. */
  private[graft] def servedDeltaDir(s: SparkSession, dir: String): String =
    sessionServedDelta.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_served_delta_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      scriptDeleteLifecycle(s, ivfPqIndexDir(s, dir), out)
      out
    }

  /** The [[ServedDeleteDocs]] op script against an LSM delta at
    * `deltaDir` — shared by [[servedDeltaDir]] (q172/q173 probe it
    * live) and [[foldedIndexDir]] (q175 folds it into a fresh
    * artifact; separate directories keep the two queries
    * order-independent and their snapshots disjoint). */
  private def scriptDeleteLifecycle(s: SparkSession, mainDir: String,
                                    deltaDir: String): Unit = {
    import s.implicits._
    def put(docs: Seq[(Long, String)], batchId: Long): Unit =
      graft.search.AnnIndex.appendDeltaBatch(s, mainDir, deltaDir,
        docs.map { case (id, t) => (id, docVec(t), t) }
          .toDF("vec_id", "embedding", "text"),
        batchId, compactEvery = 2)
    def del(ids: Seq[Long], batchId: Long): Unit =
      graft.search.AnnIndex.appendTombstones(s, deltaDir,
        ids.toDF("vec_id"), batchId, compactEvery = 2)
    put(ServedDeleteDocs.take(2), 0L)
    put(Seq(ServedDeleteDocs(2)), 1L)
    del(Seq(DeletedCorpusId, ServedDeleteDocs(1)._1), 1L)
    del(Seq(ServedDeleteDocs(2)._1), 2L)
    put(Seq(ServedDeleteCorrected), 3L)
  }

  private val sessionServedRoot = new graft.SessionMemo[String, String]

  /** Session-once SERVING ROOT for q185: the same delete-lifecycle
    * script as q172/q173, run against a root's epoch-0 pair, then ONE
    * [[graft.search.AnnIndex.majorFoldPublish]] — so the pointer has
    * actually swapped once (epoch 1), the live synthetic docs' text
    * rides the EPOCH CORPUS itself (payload custody moved from the
    * delta segments to the artifact at the fold), and the tombstoned
    * keys are physically gone. q185 resolves the pointer and serves —
    * the root face of the q173 route, same live set by construction. */
  private[graft] def servedRootDir(s: SparkSession, dir: String): String =
    sessionServedRoot.getOrCompute(s, dir) {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_served_root_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId) + "/r"
      graft.search.AnnIndex.ServingRoot.init(s, ivfPqIndexDir(s, dir), root,
        embedderSig = Some(new graft.search.HashingEmbedder().signature))
      val (idx0, delta0) = graft.search.AnnIndex.ServingRoot.resolve(s, root)
      scriptDeleteLifecycle(s, idx0, delta0)
      graft.search.AnnIndex.majorFoldPublish(s, root)
      root
    }

  /** q186's standing prompt batch — the ServedPrompt plus two prompts
    * whose token overlap targets different corpus regions; the batch
    * route must answer each exactly. */
  val BatchServedPrompts: Seq[String] = Seq(
    ServedPrompt,
    "fast hash join on a big table",
    "sorted merge of event batches")

  /** q187's prompt batch: the delete-lifecycle prompt (whose top hit
    * is the CORRECTED document — payload custody on the epoch
    * artifact) plus the two standing region prompts, all answered by
    * one batched probe THROUGH the serving root. */
  val RootBatchPrompts: Seq[String] =
    ServedDeletePrompt +: BatchServedPrompts.tail

  private val sessionFoldedIndex = new graft.SessionMemo[String, String]

  /** Session-once MAJOR-COMPACTED artifact for q175: the delete
    * lifecycle scripted into its own delta, then
    * [[graft.search.AnnIndex.majorCompact]] folds main ∪ live delta
    * into a fresh artifact (tombstoned keys physically dropped; the
    * fold is write-only — retirement is the serving root's grace GC).
    * q175 probes THIS artifact with no delta at all — its
    * oracle is the same live-set exact top-10 as q172's, so
    * hash-green IS the post-fold == pre-fold proof. */
  private[graft] def foldedIndexDir(s: SparkSession, dir: String): String =
    sessionFoldedIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_folded_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val delta = s"${System.getProperty("java.io.tmpdir")}/graft_fold_delta_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val main = ivfPqIndexDir(s, dir)
      scriptDeleteLifecycle(s, main, delta)
      graft.search.AnnIndex.majorCompact(s, main, delta, out)
      out
    }

  /** The q150 split column: the engine's affine split hash bucketed
    * 0..99 ([[graft.functions.PortableHash.SplitPair]], q89's
    * geometry). main = bucket < [[DeltaBucketMin]], delta = rest. */
  private def splitBucket(vecId: Column): Column = {
    val (a, b) = SplitPair
    ((lit(a) * vecId + lit(b)) % lit(P)) % 100
  }

  /** Write-once-per-session q150 MAIN artifact: the q148 IVF-PQ build
    * restricted to the main split — quantizer AND codebooks fitted on
    * main only, exactly what a store that indexed yesterday's corpus
    * has when today's delta arrives. */
  private val sessionIvfPqMainIndex = new graft.SessionMemo[String, String]

  private[graft] def ivfPqMainIndexDir(s: SparkSession, dir: String): String =
    sessionIvfPqMainIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpqmain_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .filter(splitBucket(col("vec_id")) < DeltaBucketMin)
        .select(col("vec_id"), col("embedding"))
      val idx = graft.search.AnnIndex.buildIvf(e, cells = IvfCells, cache = false)
      val codebooks = (0 until IvfPqM).map { sub =>
        graft.operators.SemDedup.fit(
          e.select(col("vec_id"),
            slice(col("embedding"), sub * IvfPqSubDim + 1, IvfPqSubDim).as("embedding")),
          IvfPqK, IvfPqIters)
      }
      graft.search.AnnIndex.saveIvfPq(idx, codebooks, IvfPqSubDim, out)
      out
    }

  /** Write-once-per-session q153 COMPACTED delta segment: the q150
    * delta split encoded into the MAIN artifact's geometry
    * ([[graft.search.AnnIndex.encodeSegment]] — main quantizer assigns
    * cells, main codebooks assign codes, nothing refits) and written
    * cell-partitioned, so it probes exactly like the main corpus. This
    * is LSM minor compaction: O(delta) work, the main segment's files
    * untouched, and q150's exact delta scan retired. */
  private val sessionDeltaSegment = new graft.SessionMemo[String, String]

  private[graft] def deltaSegmentDir(s: SparkSession, dir: String): String =
    sessionDeltaSegment.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpqdelta_segment_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val delta = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .filter(splitBucket(col("vec_id")) >= DeltaBucketMin)
        .select(col("vec_id"), col("embedding"), col("label"))
      graft.search.AnnIndex
        .encodeSegment(s, ivfPqMainIndexDir(s, dir), delta)
        .write.mode("overwrite").partitionBy("cell").parquet(out)
      out
    }

  /** Write-once-per-session q154 RESIDUAL IVF-PQ artifact: the same
    * canonical quantizer as q148, but PQ codebooks fitted on (and codes
    * assigned from) the per-cell residuals
    * ([[graft.search.AnnIndex.saveIvfPqResidual]]). */
  private val sessionIvfPqResIndex = new graft.SessionMemo[String, String]

  private[graft] def ivfPqResIndexDir(s: SparkSession, dir: String): String =
    sessionIvfPqResIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpqres_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      val idx = graft.search.AnnIndex.buildIvf(e, cells = IvfCells, cache = false)
      graft.search.AnnIndex.saveIvfPqResidual(idx, IvfPqSubDim, IvfPqK,
        IvfPqIters, out)
      out
    }

  /** q140 MMR geometry: selection size and the relevance/diversity
    * trade-off. λ and 1−λ are SEPARATE stored doubles (0.7 / 0.3)
    * used verbatim in both engines — computing `1 − 0.7` at runtime
    * yields 0.30000000000000004 in IEEE and would break the
    * twin-expression contract on the 6-dp boundary. */
  val MmrK = 5
  val MmrLambda = 0.7
  val MmrOneMinusLambda = 0.3

  /** q146 relevance-pool size: the greedy reranks only the top-N by
    * relevance. 64 comfortably contains every fixture MMR winner
    * (spec-audited q146 == q140) while making the rerank cost
    * pool-bounded, not corpus-bounded. */
  val MmrPoolN = 64

  /** q149: how many query vectors (vec_id < this) are reranked in one
    * batch; candidates are the rest of the corpus (vec_id >= this) so
    * query and candidate sets stay disjoint. */
  val MmrMultiQueries = 3

  /** The K-step MMR greedy over ONE query's pooled candidates, run as
    * plain Scala inside an executor ([[q149]]'s mapGroups): `cand` =
    * (vec_id, embedding, rel) with rel already 6-dp rounded. Arithmetic
    * is the TWIN of the column form ([[mmrGreedy]]) and the oracle —
    * the same sequential left-to-right cosine fold, the same
    * (1+cos)/2, each sim rounded to 6 dp BEFORE the max, the same
    * separate λ / 1−λ doubles, ties to the lowest vec_id — so the
    * result is bit-identical to the unrolled SQL (spec-asserted
    * against the column machinery in MarginMiningSpec). */
  private[graft] def mmrGreedyLocal(
      cand: Seq[(Long, Seq[Float], Double)]): Seq[(Long, Long, Double, Double, Double)] = {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sim(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      r6((1.0 + dot / (na * nb)) / 2.0)
    }
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[Float], Double, Double, Double)]
    (1 to MmrK).foreach { _ =>
      val pickedIds = picked.map(_._1).toSet
      val best = cand.iterator
        .filterNot(c => pickedIds(c._1))
        .map { case (id, emb, rel) =>
          val ms = if (picked.isEmpty) 0.0 else picked.map(p => sim(emb, p._2)).max
          (id, emb, rel, ms, r6(MmrLambda * rel - MmrOneMinusLambda * ms))
        }
        .minBy { case (id, _, _, _, mmr) => (-mmr, id) }
      picked += best
    }
    picked.toSeq.zipWithIndex
      .map { case ((id, _, rel, ms, mmr), i) => (i + 1L, id, rel, ms, mmr) }
  }

  /** Session-memoized probe vectors: the 64-d embedding of a pinned
    * `vec_id` in `dir` — the query vector ~10 ANN queries collect
    * before building their probe plan. The corpus file set is
    * immutable within a session ([[graft.SparkEntry.tbl]]'s stated
    * contract, the same assumption every session index artifact
    * rests on), so the row cannot change between evaluations;
    * memoizing removes one driver-side collect JOB per query
    * evaluation and changes nothing else. Missing-vector failures
    * stay loud and name the caller. */
  private val sessionProbeVecs =
    new graft.SessionMemo[(String, Long), Array[Float]]

  private[graft] def probeVec64(s: SparkSession, dir: String, vecId: Long,
                                who: String): Array[Float] =
    sessionProbeVecs.getOrCompute(s, (dir, vecId)) {
      graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64) && col("vec_id") === vecId)
        .select(col("embedding")).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          s"$who: no 64-d embedding with vec_id=$vecId in " +
            s"$dir/embeddings.parquet — cannot form the probe vector"))
        .getSeq[Float](0).toArray
    }

  /** (vec_id, embedding, rel) for every non-query vector — q140/q146's
    * shared scored-candidate table. */
  private def scoredCandidates(s: SparkSession, dir: String): DataFrame = {
    val e = graft.SparkEntry.tbl(s, dir, "embeddings")
      .filter(hasDim(col("embedding"), 64))
    val qv: Seq[Float] = probeVec64(s, dir, 0L, "scoredCandidates").toSeq
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"),
        round(neo4jScore(col("embedding"), typedLit(qv)), 6).as("rel"))
  }

  /** The K-step MMR greedy over an arbitrary scored candidate table —
    * q140 passes the full corpus, q146 the bounded relevance pool.
    * Each step is ONE TakeOrderedAndProject scan of `cand`; the
    * selected set is ≤ K broadcast-literal expressions. */
  private def mmrGreedy(s: SparkSession, cand: DataFrame): DataFrame = {
    import s.implicits._
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[Float], Double, Double, Double)]
    (1 to MmrK).foreach { _ =>
      val sims = picked.toSeq.map(p =>
        round(neo4jScore(col("embedding"), typedLit(p._2)), 6))
      val maxSim: Column = sims match {
        case Seq() => lit(0.0)
        case Seq(one) => one
        case many => greatest(many: _*)
      }
      // no exclusion filter at all on the first step — a magic
      // sentinel id would wrongly exclude a candidate carrying it
      val base =
        if (picked.isEmpty) cand
        else cand.filter(!col("vec_id").isInCollection(picked.toSeq.map(_._1)))
      val r = base
        .withColumn("max_sim", maxSim)
        .withColumn("mmr", round(lit(MmrLambda) * col("rel") -
          lit(MmrOneMinusLambda) * col("max_sim"), 6))
        .orderBy(col("mmr").desc, col("vec_id").asc)
        .limit(1)
        .select(col("vec_id"), col("embedding"), col("rel"),
          col("max_sim"), col("mmr"))
        .head()
      picked += ((r.getLong(0), r.getSeq[Float](1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    }
    picked.toSeq.zipWithIndex
      .map { case ((id, _, rel, ms, mmr), i) => (i + 1L, id, rel, ms, mmr) }
      .toDF("step", "vec_id", "rel", "max_sim", "mmr")
      .orderBy(col("step"))
  }

  /** q162: the first SemDecontamBenchN vectors play the eval suite —
    * a FIXED-size benchmark, deliberately not a corpus-fraction rule:
    * real eval suites do not grow with the training corpus, and the
    * fixed size is what keeps the screen LINEAR in corpus at 100 TB
    * (O(corpus × |bench|), |bench| a broadcast constant). The
    * contamination cut on the (1+cos)/2 score sits at the fixture's
    * p90 so both verdicts are well represented; production would set
    * it from a held-out calibration. */
  val SemDecontamBenchN = 50L
  val SemDecontamTau = 0.68

  /** q163: paraphrase candidacy = embedding score ≥ ParaSimTau (the
    * fixture's ~p99 of all-pairs similarity) among pairs sharing a
    * CORPUS-SCALED sign-LSH bucket
    * ([[graft.functions.PortableHash.planesFor]] planes — buckets ∝ n
    * so candidate volume stays corpus-linear; at fixture sizes the
    * buckets are q22's 8-plane ones), minus lexical near-copies
    * (3-shingle Jaccard must stay ≤
    * ParaJacMax — a high-Jaccard pair is a COPY, not a paraphrase).
    * Honesty note: this fixture's text and embeddings are independent
    * synthetics, so the lexical gate excludes zero pairs here
    * (measured at sf0.01) — it exists because production corpora
    * correlate the two (a copy IS embedding-similar), and the oracle
    * applies the identical gate either way, so hash-green covers the
    * gate's arithmetic even while the fixture cannot make it bite. */
  val ParaSimTau = 0.66
  val ParaJacMax = 0.5

  // ---------------------------------------------------------------
  // Standing-eval machinery shared by q176 (evolving route) and q179
  // (lifecycle composition) — one definition of the query batch, the
  // exact ground truth, the rerank rule, and the metric tail.
  // ---------------------------------------------------------------

  /** The standing eval's query batch: the 5 corpus vectors + the two
    * planted near-dup ingest probes, as (query_id, qe). */
  private def evolvingEvalQueryBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.SparkEntry.tbl(s, dir, "embeddings")
      .filter(hasDim(col("embedding"), 64))
      .filter(col("vec_id") < IrQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .unionByName(EvolvingEvalQueries
        .map { case (id, t) => (id, docVec(t)) }.toDF("query_id", "qe"))
  }

  /** Exact per-query top-IrK over `universe` (vec_id, embedding)
    * excluding self — the one ground-truth construction every
    * standing-eval arm scores against (map-side partial top-k heaps,
    * never a per-query window over the corpus). */
  private def exactTopIrK(universe: DataFrame, q: DataFrame): DataFrame =
    universe.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(neo4jScore(col("embedding"), col("qe")), 6).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKAggExpr
        .topK(col("vec_id"), col("score"), IrK).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("p0", "hit")))
      .select(col("query_id"), col("hit.id").as("vec_id"))

  /** SESSION-CACHED live-set ground truth of the evolving eval —
    * corpus minus the deleted doc, plus the script's surviving
    * ingests, exact top-IrK per standing query. Shared verbatim by
    * q176 and q179's post-fold arm (the fold preserves liveness by
    * construction, so one truth serves both routes), and cached so a
    * warm bench rep reads ≤ 7·IrK rows instead of re-scanning the
    * corpus per rep (the round-14 verdict's q176 cost finding). */
  private def evolvingEvalRel(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s,
      "graft_cache_evolving_rel_" + graft.SparkEntry.pathSlug(dir)) {
      import s.implicits._
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      val liveSyn = Seq(ServedDeleteDocs.head, ServedDeleteCorrected)
        .map { case (id, t) => (id, docVec(t)) }.toDF("vec_id", "embedding")
      exactTopIrK(e.filter(col("vec_id") =!= DeletedCorpusId)
        .unionByName(liveSyn), evolvingEvalQueryBatch(s, dir))
    }

  /** The served-arm rerank rule: self dropped, positions 1..IrK by the
    * engine-wide (rounded score desc, vec_id asc) total order. */
  private def rerankEval(raw: DataFrame): DataFrame = raw
    .filter(col("vec_id") =!= col("query_id"))
    .withColumn("pos", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)))
    .filter(col("pos") <= IrK)
    .select(col("query_id"), col("vec_id"), col("pos"))

  /** The standing-eval metric tail: recall@IrK / MRR / nDCG@IrK per
    * key set (query_id, optionally an arm column) — the metric frames
    * are a handful of rows, broadcast explicitly rather than trusting
    * AQE's estimates on the deep hits side. */
  private def irReport(rel: DataFrame, ret: DataFrame,
                       keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    // ONE pass over the probe side: `ret` (the expensive arm — for
    // q176/q179 a full multi-segment artifact probe) is left-joined
    // against the hit set and aggregated ONCE per key. The pre-r18
    // shape consumed `ret` in two sibling subtrees (hit metrics +
    // returned counts), and Spark re-executes duplicated subtrees —
    // the probe ran twice per evaluation for no additional
    // information. n_hit/first_pos/dcg are conditioned on the hit
    // flag, so every value is bit-identical to the two-subtree form
    // (counts of inner-join rows == sums of the flag).
    // rel is ≤ arms·queries·IrK rows by construction — broadcast it
    // explicitly: the static estimate of the reranked probe side is
    // unknown, and without the hint the static plan sorts+merges two
    // 70-row frames
    val perKey = ret
      .join(broadcast(rel.withColumn("rel_hit", lit(1))),
        keys :+ "vec_id", "left")
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n_ret"),
        sum(coalesce(col("rel_hit"), lit(0))).cast("long").as("n_hit0"),
        min(when(col("rel_hit") === 1, col("pos"))).as("first_pos"),
        sum(when(col("rel_hit") === 1, expr(irDiscSql("pos")))).as("dcg"))
      // an arm that returned rows but hit nothing must render n_hit=0
      // with first_pos/dcg NULL — exactly what the old inner-join
      // produced by having no row at all for that key
      .withColumn("n_hit", col("n_hit0")).drop("n_hit0")
    val nrel = rel.groupBy(kc: _*).agg(count(lit(1)).as("n_rel"))
    nrel.join(broadcast(perKey), keys, "left")
      .select(kc ++ Seq(col("n_rel"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_rel"), 6).as("recall_at_10"),
        round(when(col("first_pos").isNotNull,
          lit(1.0) / col("first_pos")).otherwise(lit(0.0)), 6).as("mrr"),
        round(coalesce(col("dcg").cast("double"), lit(0.0))
          / expr(irIdcgSql("n_rel")).cast("double"), 6).as("ndcg_at_10")): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q163_paraphrase_mining" -> ((s, dir) => {
      // paraphrase mining — the standard recipe for paraphrase /
      // contrastive training sets: pairs that are EMBEDDING-similar
      // but LEXICALLY distinct (semantically same thing, said
      // differently). Cross-modal composition of machinery the engine
      // already owns: candidates from the PORTABLE sign-LSH bucket
      // equi-join with the plane count DERIVED FROM CORPUS SIZE
      // (PortableHash.planesFor — same-CORPUS-SCALED-bucket is the
      // declared candidate rule, and the oracle applies the identical
      // count-threshold chain and buckets; at fixture n ≤ 8192 the
      // buckets ARE q22's 8-plane buckets), verified by exact cosine
      // score ≥ ParaSimTau, then the LEXICAL gate — 3-shingle Jaccard
      // ≤ ParaJacMax via the session-cached shingle sets (doc_id ≡
      // vec_id across the fixture tables) — so near-copies are
      // excluded by content, not by id. Scale shape: bucket equi-join
      // (never all-pairs) whose expected per-bucket population stays
      // ≈ ParaTargetPop because buckets scale with n, so scored
      // candidate volume grows LINEARLY with the corpus (fixed planes
      // made it quadratic — round-12 verdict; --para-probe receipts
      // the linearity); the tiny candidate set joins the shingle view
      // by id, and every stage before the final sort is
      // shuffle-bounded by candidates.
      val base = graft.SparkEntry.tbl(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // one metadata-cheap count job at plan time picks the plane
      // count — the engine-side twin of the oracle's scalar subquery
      val np = graft.functions.PortableHash.planesFor(base.count())
      val e = base
        .withColumn("bucket",
          graft.functions.PortableHash.lshBucketScaled(col("embedding"), np))
      val a = e.toDF("vec_a", "emb_a", "bucket")
      val b = e.toDF("vec_b", "emb_b", "bucket")
      val cand = a.join(b, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("score", round(neo4jScore(col("emb_a"), col("emb_b")), 6))
        .filter(col("score") >= ParaSimTau)
        .select(col("vec_a"), col("vec_b"), col("score"))
      val sh = DedupQueries.hashedShingles(s, dir)
      val sa = sh.select(col("doc_id").as("vec_a"), col("hs").as("hs_a"))
      val sb = sh.select(col("doc_id").as("vec_b"), col("hs").as("hs_b"))
      cand.join(sa, "vec_a").join(sb, "vec_b")
        .withColumn("jac",
          round(graft.operators.Dedup.jaccard(col("hs_a"), col("hs_b")), 6))
        .filter(col("jac") <= ParaJacMax)
        .select(col("vec_a"), col("vec_b"), col("score"), col("jac"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    "q162_semantic_decontam" -> ((s, dir) => {
      // semantic train/eval overlap screen — the embedding-space
      // complement of the LEXICAL decontamination family (q52 n-gram,
      // q65 bloom, q102 span): paraphrased or templated benchmark
      // leakage carries no shared n-grams, but its embedding sits next
      // to the eval item, so production pipelines screen BOTH ways.
      // Every non-benchmark vector reports its maximum similarity to
      // any benchmark item and a contaminated flag at Tau. Scale
      // shape: the benchmark side BROADCASTS (eval suites are
      // thousands of items vs a trillion-token corpus), the corpus
      // scans ONCE, and the per-vector max folds map-side inside the
      // broadcast nested-loop — no corpus shuffle anywhere before the
      // final sort.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
      val bench = e.filter(col("vec_id") < SemDecontamBenchN)
        .select(col("embedding").as("bemb"))
      e.filter(col("vec_id") >= SemDecontamBenchN)
        .crossJoin(broadcast(bench))
        .groupBy(col("vec_id"))
        .agg(round(max(neo4jScore(col("embedding"), col("bemb"))), 6)
          .as("max_eval_sim"))
        .withColumn("contaminated",
          (col("max_eval_sim") >= SemDecontamTau).cast("int"))
        .select(col("vec_id"), col("max_eval_sim"), col("contaminated"))
        .orderBy(col("vec_id"))
    }),

    "q140_mmr_select" -> ((s, dir) => {
      // Maximal Marginal Relevance (Carbonell & Goldstein 1998)
      // diversity-aware selection — the dedup-at-retrieval-time
      // operator RAG rerankers and hard-negative miners run: greedily
      // pick argmax of λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s),
      // so near-duplicates of an already-picked result are penalized
      // out. Both rel and sim use the engine's (1+cos)/2 score
      // convention, each rounded to 6 dp BEFORE the combination (the
      // q10/q11 portability rule), and the oracle unrolls all K greedy
      // steps as CTEs — hash-green certifies every argmax, not just
      // the final set. Shape: K bounded iterations, each ONE scan of
      // the scored corpus topping out in per-partition heaps
      // (TakeOrderedAndProject); the selected set is ≤ K vectors, so
      // the max-sim column is K broadcast-literal expressions — no
      // join, no corpus-sized state, driver holds exactly K rows.
      mmrGreedy(s, scoredCandidates(s, dir))
    }),

    "q146_mmr_pooled" -> ((s, dir) => {
      // The PRODUCTION form of q140 (its own scaladoc names this): the
      // greedy never scans the corpus — candidates first reduce to the
      // top-MmrPoolN by pure relevance (ONE TakeOrderedAndProject,
      // per-partition heaps), and all K greedy steps run over that
      // bounded pool. At 100 TB the pool fetch is the only
      // corpus-sized work (identical to q10's plan); the reranking
      // cost no longer depends on corpus size at all. Same scores,
      // same tie-breaks, same unrolled oracle; identical output to
      // q140 whenever every q140 winner sits inside the pool — which
      // the spec asserts on the fixture, making the pool size an
      // AUDITED approximation, not a hope.
      import s.implicits._
      val pool = scoredCandidates(s, dir)
        .orderBy(col("rel").desc, col("vec_id").asc)
        .limit(MmrPoolN)
      mmrGreedy(s, pool)
    }),

    "q149_mmr_multi" -> ((s, dir) => {
      // MULTI-QUERY pooled MMR — q146's production shape made
      // multi-tenant (round-11 verdict item #8): a batch of queries is
      // reranked in ONE plan. Stage 1 (the only corpus-sized work,
      // q87's broadcast-query geometry): every candidate scores
      // against every query in one scan, and the per-query
      // top-MmrPoolN rank filter pushes down map-side as a
      // WindowGroupLimit (PlanSpec-pinned) — ≤ queries × pool rows
      // survive to the shuffle. Stage 2: the K-step greedy runs INSIDE
      // mapGroups per query — each group is the ≤ MmrPoolN-row pool,
      // so the rerank is pool-bounded Scala on the executors, in
      // parallel across queries, with zero further corpus work and no
      // driver loop (q140/q146 drive K jobs for ONE query; the batch
      // form cannot pay K jobs PER query). Arithmetic is the rounded
      // twin of the column machinery (mmrGreedyLocal's contract); the
      // group's rows are sorted before the greedy so partitioning and
      // iterator order cannot move a pick. The oracle unrolls every
      // query's pool and all K greedy steps as per-query CTE chains.
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val q = e.filter(col("vec_id") < MmrMultiQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("rel").desc, col("vec_id").asc)
      val pool = e.filter(col("vec_id") >= MmrMultiQueries)
        .join(broadcast(q))
        .select(col("query_id"), col("vec_id"), col("embedding"),
          round(neo4jScore(col("embedding"), col("qe")), 6).as("rel"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= MmrPoolN)
        .select(col("query_id"), col("vec_id"), col("rel"), col("embedding"))
      pool.as[(Long, Long, Double, Seq[Float])]
        .groupByKey(_._1)
        .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Seq[Float])]) =>
          val rows = it.toArray.sortBy(r => (-r._3, r._2))
            .map(r => (r._2, r._4, r._3)).toSeq
          mmrGreedyLocal(rows).map { case (step, id, rel, ms, mmr) =>
            (qid, step, id, rel, ms, mmr) }
        }
        .toDF("query_id", "step", "vec_id", "rel", "max_sim", "mmr")
        .orderBy(col("query_id"), col("step"))
    }),

    "q164_retrieval_metrics" -> ((s, dir) => {
      // IR-quality audit of the approximate arm — per-query recall@k,
      // MRR and nDCG@k of sign-LSH bucket retrieval (q22's arm,
      // Hamming radius <= 1) against the exact cosine top-k as the
      // relevant set, with n_cand (candidates the arm actually scored)
      // making the coverage/recall trade explicit. The eval every
      // retrieval deployment runs before trusting an index; the tuning
      // probes certify recall for ONE constant, this query makes the
      // quality surface a standing, oracle-checked report — and on
      // this isotropic fixture it reports the single-table arm's
      // honest weakness (tiny bucket coverage ⇒ near-zero recall),
      // exactly the evidence that justifies the multi-table BRP (q47)
      // and IVF (q75/q148) paths. Shape at scale: each arm is one
      // corpus scan against the broadcast query batch (the LSH arm
      // scores only bucket-radius candidates), per-query top-k comes
      // from the bounded-state [[graft.expressions.TopKAggExpr]]
      // partial aggregate (≤ k heap rows per mapper — no window, so
      // no per-query-key shuffle of the full candidate set and no
      // 5-key skew), n_cand rides the same aggregate for free, and
      // every row past the two scans lives in ≤ IrQueries × IrK
      // frames — the metric math is directory-sized however big the
      // corpus. Determinism: scores round to 6 dp before ranking with
      // vec_id tie-breaks (the aggregate's (score desc, id asc) total
      // order), and the nDCG discounts/ideals are the SHARED 12-dp
      // decimal CASE ladders ([[irDiscSql]]) — both engines sum
      // identical literals, so the one double division per metric is
      // IEEE-identical.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val q = e.filter(col("vec_id") < IrQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          lshBucket(col("embedding")).as("qb"))
      val corpus = e.filter(col("vec_id") >= IrQueries)
      // scored (query_id, vec_id, score) → per-query ranked top-IrK
      // (query_id, n_cand, vec_id, pos) via the partial top-k heap
      def ranked(scored: DataFrame): DataFrame = scored
        .groupBy(col("query_id"))
        .agg(graft.expressions.TopKAggExpr
            .topK(col("vec_id"), col("score"), IrK).as("hits"),
          count(lit(1)).as("n_cand"))
        .select(col("query_id"), col("n_cand"),
          posexplode(col("hits")).as(Seq("p0", "hit")))
        .select(col("query_id"), col("n_cand"),
          col("hit.id").as("vec_id"),
          (col("p0") + 1).cast("long").as("pos"))
      // ground truth: exact per-query top-k over the full corpus
      val rel = ranked(
          corpus.join(broadcast(q.select(col("query_id"), col("qe"))))
            .select(col("query_id"), col("vec_id"),
              round(neo4jScore(col("embedding"), col("qe")), 6).as("score")))
        .select(col("query_id"), col("vec_id"))
      // retrieved: the LSH arm ranks bucket-radius candidates only
      val ret = ranked(
        corpus.withColumn("bucket", lshBucket(col("embedding")))
          .join(broadcast(q),
            bit_count(col("bucket").bitwiseXOR(col("qb"))) <= 1)
          .select(col("query_id"), col("vec_id"),
            round(neo4jScore(col("embedding"), col("qe")), 6).as("score")))
      val hits = ret.join(rel, Seq("query_id", "vec_id"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hit"), min(col("pos")).as("first_pos"),
          sum(expr(irDiscSql("pos"))).as("dcg"))
      val cand = ret.groupBy(col("query_id"))
        .agg(max(col("n_cand")).as("n_cand"))
      val nrel = rel.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_rel"))
      nrel.join(cand, Seq("query_id"), "left")
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_rel"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double")
            / col("n_rel"), 6).as("recall_at_10"),
          round(when(col("first_pos").isNotNull,
              lit(1.0) / col("first_pos")).otherwise(lit(0.0)), 6).as("mrr"),
          round(coalesce(col("dcg").cast("double"), lit(0.0))
            / expr(irIdcgSql("n_rel")).cast("double"), 6).as("ndcg_at_10"))
        .orderBy(col("query_id"))
    }),

    "q166_retrieval_arms" -> ((s, dir) => {
      // the PRODUCTION-arm IR report — q164's metric machinery turned
      // on the arms a deployment actually serves (round-12 verdict
      // item #3: the standing eval must certify what users get, not
      // only the sign-LSH strawman): per-query recall@10 / MRR /
      // nDCG@10 of (a) the session BRP index (q47's arm, candidates =
      // all bucket-sharing vectors via the canonical first-agreeing-
      // table band join), (b) the persisted IVF artifact at the
      // shipped IvfNProbe (q87's batched probe), and (c) the persisted
      // IVF-PQ artifact at the shipped MultiProbeNProbe +
      // IvfPqMultiShortlist (q151's batched probe). Ground truth is
      // the exact top-IrK EXCLUDING SELF (the standard eval rule —
      // a self-hit pads every metric); each arm over-probes k+1, drops
      // self, and re-ranks by the engine's (rounded score desc,
      // vec_id) total order. The ORACLE declares the arms PERFECT
      // (recall = mrr = ndcg = 1.0 at the shipped constants — exactly
      // what the q47/q87/q151 fails-closed exact oracles certify), so
      // any cell miss, shortlist miss, or band miss on any arm flips
      // this red: the report is a standing per-arm quality gate, and
      // on a clustered production corpus the same query emits the
      // honest sub-1.0 surface. Scale shape: each arm is one
      // candidate-bounded scan/join against the broadcast 5-query
      // batch; everything past the arms lives in ≤ 3·IrQueries·(IrK+1)
      // rows.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qdf = e.filter(col("vec_id") < IrQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val qvecs = e.filter(col("vec_id") < IrQueries)
        .select(col("vec_id"), col("embedding"))
      // ground truth: exact per-query top-IrK over everything but self
      // — SESSION-CACHED (the evolvingEvalRel precedent: one standing
      // truth serves every rep), because it feeds both the hit join
      // and the per-query n_rel count; uncached, the corpus-×-queries
      // exact scoring subtree executed once per consumer
      val rel = graft.SparkEntry.cachedView(s,
        "graft_cache_ir_rel_" + graft.SparkEntry.pathSlug(dir)) {
        e.join(broadcast(qdf), col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            round(neo4jScore(col("embedding"), col("qe")), 6).as("score"))
          .groupBy(col("query_id"))
          .agg(graft.expressions.TopKAggExpr
            .topK(col("vec_id"), col("score"), IrK).as("hits"))
          .select(col("query_id"), posexplode(col("hits")).as(Seq("p0", "hit")))
          .select(col("query_id"), col("hit.id").as("vec_id"))
      }
      // (query_id, vec_id, score) → self dropped, re-ranked 1..IrK by
      // the engine-wide (rounded score desc, id asc) total order —
      // frames are ≤ IrK+1 rows per query
      def rerank(raw: DataFrame): DataFrame = raw
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("vec_id").asc)))
        .filter(col("pos") <= IrK)
        .select(col("query_id"), col("vec_id"), col("pos"))
      val retIvf = rerank(graft.search.AnnIndex
        .probeIvfMulti(s, ivfIndexDir(s, dir), qvecs, IrK + 1, IvfNProbe)
        .select(col("query_id"), col("doc_id").as("vec_id"), col("score")))
      val retPq = rerank(graft.search.AnnIndex
        .probeIvfPqMulti(s, ivfPqIndexDir(s, dir), qvecs, IrK + 1,
          MultiProbeNProbe, IvfPqMultiShortlist)
        .select(col("query_id"), col("doc_id").as("vec_id"), col("score")))
      // BRP arm: query signatures from the SAME fitted model, candidates
      // from the canonical banded equi-join (each (query, vector) pair
      // claimed once at its lowest agreeing table — no distinct), exact
      // rescore with the engine's scoring expression
      val idx = graft.search.AnnIndex.sessionBrp(s, dir,
        e.select(col("vec_id"), col("embedding")), numTables = BrpTables)
      val qh = idx.model.transform(graft.search.AnnIndex.prepare(
        qdf.select(col("query_id"), col("qe"), col("qe").as("embedding"))))
      val qb = qh.select(col("query_id"), col("qe"),
          transform(col("hashes"), v =>
            element_at(org.apache.spark.ml.functions.vector_to_array(v), 1)).as("qsig"))
        .select(col("query_id"), col("qe"), col("qsig"),
          posexplode(col("qsig")))
        .toDF("query_id", "qe", "qsig", "t", "b")
      val canonical = (0 until BrpTables).map { j =>
        lit(j) >= col("x.t") ||
          element_at(col("x.sig"), j + 1) =!= element_at(col("y.qsig"), j + 1)
      }.reduce(_ && _)
      val retBrp = rerank(idx.banded.alias("x")
        .join(broadcast(qb.alias("y")),
          col("x.t") === col("y.t") && col("x.b") === col("y.b") && canonical)
        .select(col("y.query_id"), col("x.vec_id"),
          round(neo4jScore(col("x.embedding"), col("y.qe")), 6).as("score")))
      val ret = retBrp.withColumn("arm", lit("brp"))
        .unionByName(retIvf.withColumn("arm", lit("ivf")))
        .unionByName(retPq.withColumn("arm", lit("ivfpq")))
      // ONE pass over the three probe arms (irReport's r18 shape): the
      // hit flag rides a left join against the cached truth and every
      // per-(arm, query) metric aggregates in a single consumption of
      // `ret` — the pre-r18 sibling hits/nret subtrees re-executed all
      // three arm probes twice per evaluation. Values are
      // bit-identical: counts of inner-join rows == sums of the flag,
      // and a hit-less (arm, query) renders n_hit=0 with NULL
      // first_pos/dcg exactly as the old missing-row left join did.
      val perArm = ret
        .join(broadcast(rel.withColumn("rel_hit", lit(1))),
          Seq("query_id", "vec_id"), "left")
        .groupBy(col("arm"), col("query_id"))
        .agg(count(lit(1)).as("n_ret"),
          sum(coalesce(col("rel_hit"), lit(0))).cast("long").as("n_hit"),
          min(when(col("rel_hit") === 1, col("pos"))).as("first_pos"),
          sum(when(col("rel_hit") === 1, expr(irDiscSql("pos")))).as("dcg"))
      val nrel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
      // the report frame is the FULL arms × queries grid, not whatever
      // (arm, query) pairs happened to retrieve: an arm returning zero
      // candidates for a query must surface as an explicit all-zero
      // row — the total-miss case is exactly what a standing quality
      // gate exists to catch, not to go blind on
      val arms = s.range(1)
        .select(explode(typedLit(Seq("brp", "ivf", "ivfpq"))).as("arm"))
      nrel.crossJoin(broadcast(arms))
        .join(broadcast(perArm), Seq("arm", "query_id"), "left")
        .select(col("arm"), col("query_id"), col("n_rel"),
          coalesce(col("n_ret"), lit(0L)).as("n_ret"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double")
            / col("n_rel"), 6).as("recall_at_10"),
          round(when(col("first_pos").isNotNull,
            lit(1.0) / col("first_pos")).otherwise(lit(0.0)), 6).as("mrr"),
          round(coalesce(col("dcg").cast("double"), lit(0.0))
            / expr(irIdcgSql("n_rel")).cast("double"), 6).as("ndcg_at_10"))
        .orderBy(col("arm"), col("query_id"))
    }),

    "q177_served_filtered" -> ((s, dir) => {
      // METADATA-FILTERED search at the SERVICE surface (every
      // production vector store's table-stakes argument — Qdrant
      // payload filters, Milvus scalar fields; the reference's Cypher
      // could add a WHERE but its tool takes only a prompt): the same
      // searchIndexed call the MCP tool routes when the caller passes
      // {"filter": {"label": N}} — q152's PRE-filter strategy, so the
      // predicate reaches both artifact scans as a PushedFilter under
      // the cell PartitionFilter and the ADC shortlist ranks
      // qualifying rows only. Oracle: the exact FILTERED top-10 with
      // payloads — fails closed on a recall miss AND on a filter leak
      // (any non-matching label in the output flips the hash).
      new graft.search.SearchEngine(s).searchIndexed(dir, ServedPrompt, 10,
        filter = Seq("label" -> FilterLabel))
    }),

    "q179_lifecycle_eval" -> ((s, dir) => {
      // the COMPOSED standing eval (round-14 verdict: q175 proves the
      // fold once, q177 the filter once — interaction bugs between the
      // lifecycle features should fail a STANDING oracle, not wait for
      // a new spec): two arms through q176's exact metric machinery.
      //  - post_fold: the full 7-query evolving eval re-run against
      //    the major-compacted artifact with NO delta — the fold
      //    composed with deletes, corrections, and ingests must still
      //    serve the same live set perfectly;
      //  - filtered: the 5 corpus queries through the LSM route
      //    (main ∪ delete-lifecycle delta) with the q177 label filter
      //    PRE-applied to every segment scan — filter composed with
      //    tombstones and the delta (the delta's unlabeled ingests
      //    must be excluded by the predicate, not served around it).
      // Ground truths are session-cached exact top-IrK tables
      // ([[evolvingEvalRel]] shared verbatim with q176; the filtered
      // rel over the live labeled universe) — the oracle predicts
      // perfection on every row and fails closed on any interaction
      // regression. Scale shape: 12 bounded artifact probes + metric
      // math over ≤ 12·(IrK+1) rows.
      import s.implicits._
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"), col("label"))
      val q7 = evolvingEvalQueryBatch(s, dir)
        .select(col("query_id").as("vec_id"), col("qe").as("embedding"))
      val folded = foldedIndexDir(s, dir)
      val retFold = graft.search.AnnIndex.probeIvfPqSegmentsMulti(s, folded,
          Seq(s.read.parquet(s"$folded/corpus")), q7,
          IrK + 1, IvfNProbe, ServedShortlist)
        .select(col("query_id"), col("doc_id").as("vec_id"), col("score"))
      val main = ivfPqIndexDir(s, dir)
      val lsmSegs = graft.search.AnnIndex.lsmLiveSegments(
        s, main, servedDeltaDir(s, dir))
      // the q177 pre-filter strategy over every live segment: delta
      // segments that never carried the column contribute nothing (a
      // null label row can't equal the literal)
      val filteredSegs = lsmSegs.map { seg =>
        if (seg.columns.contains("label"))
          seg.filter(col("label") === FilterLabel)
        else seg.limit(0)
      }
      val retFilt = graft.search.AnnIndex.probeIvfPqSegmentsMulti(s, main,
          filteredSegs, q7.filter(col("vec_id") < IrQueries),
          IrK + 1, IvfNProbe, ServedShortlist)
        .select(col("query_id"), col("doc_id").as("vec_id"), col("score"))
      val relFold = evolvingEvalRel(s, dir).withColumn("arm", lit("post_fold"))
      val relFilt = graft.SparkEntry.cachedView(s,
        "graft_cache_q179_filt_rel_" + graft.SparkEntry.pathSlug(dir)) {
        exactTopIrK(
          e.filter(col("vec_id") =!= DeletedCorpusId &&
              col("label") === FilterLabel)
            .select(col("vec_id"), col("embedding")),
          evolvingEvalQueryBatch(s, dir)
            .filter(col("query_id") < IrQueries))
      }.withColumn("arm", lit("filtered"))
      val ret = rerankEval(retFold).withColumn("arm", lit("post_fold"))
        .unionByName(rerankEval(retFilt).withColumn("arm", lit("filtered")))
      irReport(relFold.unionByName(relFilt), ret, Seq("arm", "query_id"))
        .orderBy(col("arm"), col("query_id"))
    }),

    "q176_evolving_eval" -> ((s, dir) => {
      // the EVOLVING-index arm on the standing eval (q166's metric
      // machinery pointed at the route `--delta` users get): per-query
      // recall@10 / MRR / nDCG@10 of probeIvfPqLsm over main ∪ the
      // delete-lifecycle delta, against the exact top-IrK (excluding
      // self) over the LIVE set — corpus minus the deleted doc, plus
      // the script's surviving ingests. Queries: the 5 standing corpus
      // vectors (vec 0's DOCUMENT is deleted, so querying its own
      // vector also certifies the unserve) + two planted near-dup
      // probes of the live ingests (EvolvingEvalQueries — overlap
      // engineered above the corpus's random-max cosine, so only a
      // route that serves the ingested content, and ONLY its newest
      // version, can be perfect). The oracle predicts perfection at
      // the shipped constants — any delta-serving miss, resurrected
      // tombstone, or superseded version flips it red. Scale shape:
      // 7 bounded artifact probes + metric math over ≤ 7·(IrK+1) rows;
      // the ground truth is the SESSION-CACHED live-set exact table
      // ([[evolvingEvalRel]] — shared with q179's post-fold arm), so
      // a warm rep pays the probes, not a corpus re-scan.
      val q = evolvingEvalQueryBatch(s, dir)
      // the served arm: ONE batched probe serves the whole query set
      // against main ∪ delta (probeIvfPqSegmentsMulti) — the LSM
      // liveness resolution, delta window, and every segment scan run
      // once per eval, not once per query (the round-14 cost was the
      // 7 sequential probe subtrees); self dropped, re-ranked by the
      // engine total order
      val main = ivfPqIndexDir(s, dir)
      val segs = graft.search.AnnIndex.lsmLiveSegments(
        s, main, servedDeltaDir(s, dir))
      val ret = graft.search.AnnIndex.probeIvfPqSegmentsMulti(s, main, segs,
          q.select(col("query_id").as("vec_id"), col("qe").as("embedding")),
          IrK + 1, IvfNProbe, ServedShortlist)
        .select(col("query_id"), col("doc_id").as("vec_id"), col("score"))
      irReport(evolvingEvalRel(s, dir), rerankEval(ret), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    "q32_filtered_knn" -> ((s, dir) => {
      // metadata-filtered search: the predicate applies BEFORE scoring,
      // so at scale it prunes parquet row groups before any vector math
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64) && col("label") === 2)
      val q = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.join(broadcast(q))
        .withColumn("score", round(neo4jScore(col("embedding"), col("qe")), 6))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("label"), col("score"))
    }),

    "q33_prompt_search" -> ((s, dir) => {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      e.join(docs, e("vec_id") === docs("doc_id"))
        .withColumn("score",
          round(neo4jScore(col("embedding"), typedLit(flagshipVec)), 6))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("text"), col("score"))
    }),

    "q22_lsh_bucket_knn" -> ((s, dir) => {
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), lshBucket(col("embedding")).as("qb"))
      e.withColumn("bucket", lshBucket(col("embedding")))
        .join(broadcast(q), bit_count(col("bucket").bitwiseXOR(col("qb"))) <= 1)
        .withColumn("score", round(neo4jScore(col("embedding"), col("qe")), 6))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("bucket"), col("score"))
    }),

    "q49_int8_quant" -> ((s, dir) => {
      // scalar quantization — the storage-compression arm of a vector
      // database (4× smaller than float32 at rest; the reference stores
      // raw 1536-d floats in Neo4j, README.md:74). Symmetric int8:
      // q_i = round(x_i * 127 / max|x|), all row-local HOF math. The
      // oracle compares INTEGER statistics (sums, saturation counts) —
      // integer-exact across engines, no float-summation-order risk.
      val x = col("embedding")
      val amax = array_max(transform(x, v => abs(v.cast("double"))))
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .withColumn("amax", amax)
        .withColumn("quant",
          when(col("amax") > 0.0,
            transform(x, v =>
              round(v.cast("double") * lit(127.0) / col("amax"), 0).cast("long")))
            .otherwise(transform(x, _ => lit(0L))))
      e.select(col("label").cast("long").as("label"),
          aggregate(col("quant"), lit(0L), (a, q) => a + q).as("sum_q"),
          size(filter(col("quant"), q => abs(q) === 127L)).cast("long").as("n_sat"),
          size(filter(col("quant"), q => q === 0L)).cast("long").as("n_zero"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(col("sum_q")).as("sum_q"),
          sum(col("n_sat")).as("n_saturated"),
          sum(col("n_zero")).as("n_zeroed"))
        .orderBy(col("label"))
    }),

    "q58_centroid_outliers" -> ((s, dir) => {
      // embedding-space outlier audit: distance of every vector to its
      // label's centroid, top-k furthest surface (label-noise / junk
      // screen over a training corpus). Centroids are a label×dim
      // table — tiny at any corpus size — so the join back is a
      // BROADCAST; per-dimension sums route through decimal (order-
      // free) and the centroid rounds to 6 dp before any distance, so
      // both engines square identical doubles.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val pe = e.select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos"),
          col("col").cast("double").as("v"))
      val cent = pe.groupBy(col("label"), col("pos"))
        .agg(round(sum(col("v").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("c"))
      pe.join(broadcast(cent), Seq("label", "pos"))
        .withColumn("d2", (col("v") - col("c")) * (col("v") - col("c")))
        .groupBy(col("vec_id"), col("label"))
        .agg(round(sqrt(sum(col("d2").cast("decimal(28,12)")).cast("double")), 6)
          .as("dist"))
        .orderBy(col("dist").desc, col("vec_id").asc)
        .limit(CentroidOutlierK)
    }),

    "q47_brp_knn" -> ((s, dir) => {
      // the MLlib batch-index path as a declared query: seeded
      // BucketedRandomProjectionLSH over L2-normalized vectors (unit
      // norm ⇒ L2-NN ordering == cosine-NN ordering), probe via
      // approxNearestNeighbors. The model's random projections are not
      // portable to the oracle, but the QUERY's contract is: candidates
      // selected by the index are exact-rescored with the same cosine
      // expression as q10, so the output equals the exact top-10 iff
      // the index achieves 10/10 recall on this probe — which makes the
      // declared oracle (exact top-10) a genuine end-to-end recall
      // gate, not just a rows check. BRP's "fit" only draws seeded
      // hyperplanes (no iterative jobs), so the build is cheap at any
      // scale; at 100 TB the hashed table is persisted partitioned by
      // bucket (AnnIndex.saveBrp) and probes read matching buckets only.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, 0L, "q47_brp_knn")
      // 12 tables + a 2× over-probe (20 candidates for a top-10): both
      // are recall slack so the oracle compare certifies 10/10 recall
      // rather than riding the edge of it (5 tables + exact-k missed
      // one neighbor at sf0.01). This gate intentionally FAILS CLOSED:
      // a new fixture/SF (or an exact score tie at the k boundary) can
      // flip it red while the index behaves as designed — the expected
      // re-tune is to raise numTables and/or the over-probe until the
      // exact top-10 is recovered, never to weaken the oracle
      // the index is fitted once per session+corpus (sessionBrp memo):
      // the probe pays probe cost, never the build — same split as the
      // persisted-artifact path (saveBrp/probe at 100 TB)
      val hits = graft.search.AnnIndex
        .sessionBrp(s, dir, e.select(col("vec_id"), col("embedding")),
          numTables = BrpTables)
        .topK(qv, k = 20)
        .select(col("vec_id"))
      // exact rescore of the index-selected candidates — bit-identical
      // arithmetic to q10 (same neo4jScore expression, same rounding)
      e.join(hits, "vec_id")
        .withColumn("score",
          round(neo4jScore(col("embedding"), typedLit(qv.toSeq)), 6))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("score"))
    }),

    "q75_ivf_index_probe" -> ((s, dir) => {
      // the PERSISTED-index probe as a declared query: the IVF artifact
      // (corpus PARTITIONED BY cell + the seeded KMeans quantizer) is
      // written once per session; this query reloads the quantizer,
      // picks the IvfNProbe cells nearest the probe vector, and
      // exact-scores ONLY those cell directories off parquet —
      // `cell IN (...)` reaches the scan as a PartitionFilter
      // (PlanSpec-pinned), so probe I/O is bounded by nProbe/cells of
      // the corpus at any scale. Candidates are exact-rescored with the
      // same neo4jScore expression as q10, and the declared oracle IS
      // the exact top-10 — hash-green certifies end-to-end recall of
      // the disk-backed index route (q47's fail-closed construction;
      // see IvfCells/IvfNProbe for the fixture-specific tuning).
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, 0L, "q75_ivf_index_probe")
      graft.search.AnnIndex
        .probeIvf(s, ivfIndexDir(s, dir), qv, k = 10, nProbe = IvfNProbe)
        .select(col("vec_id"), col("score"))
    }),

    "q72_brp_neardup" -> ((s, dir) => {
      // the PRODUCTION embedding-dedup shape (q21 is its declared
      // verify-only exact baseline): candidate pairs come from the
      // session BRP index's LSH similarity self-join — a hash-bucket
      // equi-join, never an all-pairs scan — then get exact-rescored
      // with the same neo4jScore expression as q21 and top-k'd. The
      // oracle IS q21's exact all-pairs result, so a hash-green row
      // certifies the index recalled every top-20 pair end-to-end
      // (same fail-closed gate construction as q47 vs q10). Reuses
      // q47's session-memoized index: the similarity join pays join
      // cost, never a refit. At 100 TB the hashed corpus is a persisted
      // artifact partitioned by bucket (AnnIndex.saveBrp) and this join
      // reads colliding buckets only.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      graft.search.AnnIndex
        .sessionBrp(s, dir, e.select(col("vec_id"), col("embedding")),
          numTables = BrpTables)
        .nearDupPairsCanonical(NearDupMinCos)
        .orderBy(col("score").desc, col("vec_a").asc, col("vec_b").asc)
        .limit(NearDupTopK)
    }),

    "q87_ivf_multiprobe" -> ((s, dir) => {
      // the PERSISTED artifact probed by a BATCH of queries — the
      // multi-tenant/streaming face of q75 (one artifact, many
      // callers; graft.search.SearchEngine.streamingKnnVsIvf runs this
      // exact plan per micro-batch): per-query cell selection ranks
      // the broadcast quantizer centers, the corpus is ONE pruned
      // artifact read joined on the partition column (dynamic
      // partition pruning — PlanSpec-pinned), candidates exact-rescore
      // and top-k in map-side heaps. The oracle is the exact per-query
      // top-10 (q11's construction at k=10), so hash-green certifies
      // recall of the multi-probe route end to end.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      graft.search.AnnIndex
        .probeIvfMulti(s, ivfIndexDir(s, dir),
          e.filter(col("vec_id") < MultiProbeQueries), k = 10, nProbe = MultiProbeNProbe)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q89_margin_mining" -> ((s, dir) => {
      // margin-based neighbor mining (Artetxe & Schwenk 2019 — the
      // bitext-mining / hard-pair selection criterion): absolute cosine
      // is a biased match score because hub vectors score high against
      // EVERYTHING, so each candidate pair is rescored by the ratio
      // margin = cos(x,y) / ((mean_k NN-cos of x + mean_k NN-cos of y)/2)
      // — a pair only wins if it stands out against BOTH sides'
      // neighborhoods. Query side = the q56 test bucket, corpus side =
      // the q56 train bucket (the auto-labeling geometry: mine a
      // mate in the pool for every held-out vector).
      val (a, b) = SplitPair
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .withColumn("bucket", ((lit(a) * col("vec_id") + lit(b)) % lit(P)) % 100)
      marginMine(
          e.filter(col("bucket") >= 90).select(col("vec_id"), col("embedding").as("qe")),
          e.filter(col("bucket") < 80)
            .select(col("vec_id").as("nn_id"), col("embedding").as("pe")),
          MarginK)
        .orderBy(col("vec_id"))
    }),

    "q85_semdedup" -> ((s, dir) => {
      // SemDeDup (Abbas et al. 2023): deterministic Lloyd's k-means,
      // then near-dup pruning WITHIN cells only — the cluster count
      // bounds candidate-pair volume, which is the whole scale story.
      // The unrolled DuckDB twin replays both Lloyd's iterations
      // op-for-op, so hash-green certifies the full clustering AND the
      // keep-farthest-from-centroid policy, not just the pair list.
      import graft.operators.SemDedup
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      // fit-once-per-session (SemDedup.sessionFit): the clustering is
      // the offline half of SemDeDup — the report pays assignment +
      // pair cost per evaluation, never a refit (the sessionBrp
      // build/probe split)
      val cents = SemDedup.sessionFit(s, dir, "semdedup-64d", e,
        SemCells, SemIters)
      SemDedup.report(e, cents, SemMinScore)
        .orderBy(col("vec_id"))
    }),

    "q144_pq_codebook" -> ((s, dir) => {
      // Product quantization (see PqM scaladoc) — the vector
      // COMPRESSION leg of the ANN stack (IVF-PQ is the standard
      // billion-scale layout: q75's IVF prunes cells, PQ shrinks
      // residents 64×): per subspace, the q85 deterministic Lloyd's
      // fit runs on the SLICED corpus, every vector gets its
      // nearest-cell code, and the report carries each (subspace,
      // cell)'s population + mean quantization distortion — the
      // codebook-quality table a PQ deployment watches. Shape: PqM
      // independent fits over 16-dim slices (each iteration one
      // map-side-combined k×dim-bounded exchange, the SemDedup
      // argument), assignment row-local against ≤PqK inlined literals,
      // final rollup ≤ m×k rows. Oracle unrolls all m×iters Lloyd's
      // rounds — hash-green certifies every per-subspace update and
      // every code assignment.
      import graft.operators.SemDedup
      import s.implicits._
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      (0 until PqM).map { sub =>
        val sliced = e.select(col("vec_id"),
          slice(col("embedding"), sub * PqDim + 1, PqDim).as("embedding"))
        // per-subspace codebooks fit once per session and SHARED with
        // q145's ADC search (identical slice definition → same tag):
        // the codebook is the offline artifact, the scan pays lookup
        // cost only
        val cents = SemDedup.sessionFit(s, dir, s"pq-slice$sub",
          sliced, PqK, PqIters)
        val centDf = cents.zipWithIndex.map { case (c, i) => (i, c) }
          .toDF("cell", "ce")
        SemDedup.assignCells(sliced, cents)
          .join(broadcast(centDf), "cell")
          .select(lit(sub.toLong).as("sub"), col("cell").cast("long").as("cell"),
            round(graft.expressions.VectorExpressions.sqDist(
              col("embedding"), col("ce")), 6).as("d"))
          .groupBy(col("sub"), col("cell"))
          .agg(count(lit(1)).as("n_vecs"),
            round(sum(col("d").cast("decimal(27,10)")).cast("double") /
              count(lit(1)), 6).as("mean_sqdist"))
      }.reduce(_ unionByName _)
        .orderBy(col("sub"), col("cell"))
    }),

    "q145_pq_adc" -> ((s, dir) => {
      // PQ asymmetric distance search (Jégou et al. 2011 ADC) — the
      // query-time half of q144: the corpus lives as m-tuple codes,
      // the query stays EXACT, and distance(q, v) ≈ Σ_sub
      // sqdist(q_sub, centroid[code_sub(v)]) — per subspace a ≤PqK-
      // entry lookup table, so scoring a vector is m table lookups
      // instead of 64 multiplies. Top-k by ADC distance (asc, vec_id
      // tie), each hit audited in-row: its EXACT score and whether it
      // makes the exact top-k — recall is a measured, deterministic
      // column, the q47 honesty pattern (k=4 cells/subspace is a
      // coarse 64× compression; imperfect recall is the truthful
      // outcome, not a bug). Shape: fits are q144's (k×dim-bounded
      // jobs, run BEFORE the scoring scan); then ALL m code
      // assignments + LUT lookups are SIBLING COLUMNS of ONE
      // projection over ONE corpus scan — every term derives from the
      // same row's embedding, so no join is semantically needed and
      // none exists (round-11 verdict: the previous m-way vec_id
      // self-join planned as corpus-sided BroadcastHashJoins that
      // only broadcast at fixture scale; PlanSpec pins the join-free
      // scoring path now). ONE TakeOrderedAndProject ends the scan.
      // Oracle unrolls the m Lloyd's chains, the code assignment, the
      // LUT arithmetic and both top-k's.
      import graft.operators.SemDedup
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      val qv = probeVec64(s, dir, 0L, "q145_pq_adc").map(_.toDouble).toSeq
      val cand = e.filter(col("vec_id") =!= 0)
      def r6d(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // per-subspace: codebook (q144's fit) + the query's LUT row,
      // fused into one row-local column: code = SemDedup's
      // literal-path argmin on the slice, ADC term = lut(code)
      val terms = (0 until PqM).map { sub =>
        val slc = slice(col("embedding"), sub * PqDim + 1, PqDim)
        // same sliceTag as q144: the two queries fit the IDENTICAL
        // codebook over the identical slice, so one session fit serves
        // both (QualityClassifier's q86/q117 sharing pattern)
        val cents = SemDedup.sessionFit(s, dir, s"pq-slice$sub",
          e.select(col("vec_id"), slc.as("embedding")), PqK, PqIters)
        val qSub = qv.slice(sub * PqDim, (sub + 1) * PqDim)
        val lut = cents.map(c => r6d(qSub.zip(c)
          .foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }))
        element_at(typedLit(lut), SemDedup.assignCell(slc, cents) + 1).as(s"t$sub")
      }
      val scored = cand.select((col("vec_id") +: terms): _*)
        .withColumn("adc_d",
          round((0 until PqM).map(sub => col(s"t$sub")).reduce(_ + _), 6))
      val exactTop = cand
        .withColumn("score", round(neo4jScore(col("embedding"), typedLit(qv.map(_.toFloat).toSeq)), 6))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("score").as("exact_score"),
          lit(1).as("in_exact_topk"))
      scored
        .orderBy(col("adc_d").asc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("adc_d"))
        .join(broadcast(exactTop), Seq("vec_id"), "left")
        .na.fill(0, Seq("in_exact_topk"))
        .select(col("vec_id"), col("adc_d"),
          col("exact_score"), col("in_exact_topk").cast("long").as("in_exact_topk"))
        .orderBy(col("adc_d").asc, col("vec_id").asc)
    }),

    "q165_served_search" -> ((s, dir) => {
      // the SERVICE entry point, declared as a query: the same
      // prompt-in/hits-out call the MCP `vector_search` tool routes
      // (Search.serve → searchJsonIndexed → THIS), minus only the JSON
      // rendering — embed ServedPrompt, probe the shared session
      // IVF-PQ artifact (cell PartitionFilters on both scans,
      // codes-only ADC ReadSchema, broadcast shortlist rescore), fetch
      // the k hit payloads by id (PushedFilter In on the documents
      // scan — point lookups, never a table scan). Oracle is the
      // EXACT top-10 with payloads recomputed from the prompt
      // vector's literals, so hash-green certifies the full served
      // route: recall (fails closed on a cell or shortlist miss),
      // scoring, and the payload fetch.
      new graft.search.SearchEngine(s).searchIndexed(dir, ServedPrompt, 10)
    }),

    "q172_lsm_delete" -> ((s, dir) => {
      // the tombstone path on the RAW LSM probe: main ∪ scripted delta
      // under latest-op-wins. The query vector is corpus vec 0's own
      // embedding and vec 0 is DELETED — its exact self-match (score
      // 1.0) must be unserved, so a probe that ignores the tombstone
      // store, misses the main-shadowing rule, or lets a superseded
      // delta row rank flips the exact oracle red. The oracle is the
      // exact top-10 over (corpus \ deleted) ∪ the script's live
      // synthetic vectors (inlined literals).
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, DeletedCorpusId, "q172_lsm_delete")
      graft.search.AnnIndex.probeIvfPqLsm(s, ivfPqIndexDir(s, dir),
        servedDeltaDir(s, dir), qv, k = 10,
        nProbe = IvfNProbe, shortlist = ServedShortlist)
    }),

    "q173_served_delete" -> ((s, dir) => {
      // the tombstone path on the SERVICE route: the same scripted
      // delta through searchIndexed. The prompt IS the corrected
      // gamma text, so the corrected re-ingest must rank first at
      // 1.0 (del + put serves the newest version), the deleted beta
      // and the superseded gamma draft must be absent even though
      // their texts are near the prompt, and the corpus back-fills
      // the rest (minus the deleted corpus doc). Oracle: exact top-10
      // over (live corpus) ∪ live synthetic literal rows, payloads
      // included — fails closed on any lifecycle rule breaking on
      // either the hit side or the payload side.
      new graft.search.SearchEngine(s).searchIndexed(dir, ServedDeletePrompt,
        10, deltaDir = Some(servedDeltaDir(s, dir)))
    }),

    "q185_root_served" -> ((s, dir) => {
      // the SERVING-ROOT face of q173 (round-16: the pointer wired to
      // the tool surface): the same delete-lifecycle script runs
      // against a root's epoch 0, a majorFoldPublish SWAPS the
      // pointer, and the serve resolves it per request — exactly what
      // `graft.Search --root` does minus the JSON rendering. The
      // oracle is q173's live-set exact top-10 VERBATIM: hash-green
      // certifies (a) the fold is invisible to the served answer,
      // (b) the payload custody moved to the epoch corpus (the
      // corrected gamma's text now serves from the artifact's own
      // text column — the documents table never had it), and (c) the
      // tombstones hold with no delta left to carry them (physically
      // dropped at the fold).
      val root = servedRootDir(s, dir)
      val (idx, delta) = graft.search.AnnIndex.ServingRoot.resolve(s, root)
      new graft.search.SearchEngine(s).searchIndexed(dir, ServedDeletePrompt,
        10, deltaDir = Some(delta), mainDir = Some(idx))
    }),

    "q187_root_batch_served" -> ((s, dir) => {
      // BATCHED serving THROUGH THE POINTER (round-17: the fold-soak's
      // batch face declared as a query): one searchIndexedBatch call
      // against the q185 serving root — pointer resolved once for the
      // whole batch (one logical request), the delete lifecycle and a
      // major fold behind it — answers the lifecycle prompt plus the
      // two standing region prompts. The oracle recomputes each
      // prompt's exact top-10 over the LIVE set (corpus ∖ deleted ∪
      // the lifecycle's surviving docs) with payloads, so hash-green
      // certifies the batch face serves the same fold-invisible,
      // custody-moved, tombstone-holding answer the single face
      // (q185) does — per prompt, at rank.
      import s.implicits._
      val root = servedRootDir(s, dir)
      val (idx, delta) = graft.search.AnnIndex.ServingRoot.resolve(s, root)
      val eng = new graft.search.SearchEngine(s)
      eng.searchIndexedBatch(dir, RootBatchPrompts, 10,
          deltaDir = Some(delta), mainDir = Some(idx))
        .zipWithIndex.flatMap { case (hs, i) =>
          hs.zipWithIndex.map { case (h, r) =>
            (i.toLong, h.doc_id, h.text, h.score, (r + 1).toLong)
          }
        }.toDF("prompt_idx", "doc_id", "text", "score", "rank")
        .orderBy(col("prompt_idx"), col("rank"))
    }),

    "q186_batch_served" -> ((s, dir) => {
      // BATCHED serving declared as a query (round-16: the
      // vector_search_batch tool minus the JSON rendering): one
      // searchIndexedBatch call answers three standing prompts with
      // ONE probe plan — cell ranking, ADC shortlist and exact
      // rescore shared across the batch — and the oracle recomputes
      // each prompt's exact top-10 with payloads from the literal
      // prompt vectors, so hash-green certifies per-prompt recall,
      // scoring, ordering, and the batched payload fetch.
      import s.implicits._
      val eng = new graft.search.SearchEngine(s)
      eng.searchIndexedBatch(dir, BatchServedPrompts, 10)
        .zipWithIndex.flatMap { case (hs, i) =>
          hs.zipWithIndex.map { case (h, r) =>
            (i.toLong, h.doc_id, h.text, h.score, (r + 1).toLong)
          }
        }.toDF("prompt_idx", "doc_id", "text", "score", "rank")
        .orderBy(col("prompt_idx"), col("rank"))
    }),

    "q174_refit_gauge" -> ((s, dir) => {
      // the REFIT TRIGGER: between major folds the artifact's
      // quantizer/codebooks never refit (q153's no-refit graduation),
      // so an indefinitely-running ingest needs a standing gauge that
      // says when the frozen geometry has drifted from the data. The
      // statistic is mean PQ quantization distortion — per row, the
      // squared distance to its assigned code under the MAIN-fitted
      // codebooks (q144's statistic, pointed at the drift question):
      // the q150 delta carve plays the "arrived after the build" role,
      // codebooks are fitted on the main split exactly as the q150
      // artifact's are, and the report is one row — populations, both
      // means, their ratio, and the refit flag (ratio > RefitDriftMax).
      // Shape: the codebooks are READ from the session's q150 main
      // artifact (the gauge judges THE codebooks a deployment serves,
      // not a re-derivation — and the artifact's fits are the same
      // calls by construction, so the oracle's unrolled chains still
      // predict them bit-for-bit), then ONE corpus scan computes every
      // row's distortion row-local (codegen'd argmin over ≤16 inlined
      // centroids per subspace) and a single conditional aggregate
      // folds both sides — no fits at query time, no joins, no second
      // pass. Oracle unrolls the Lloyd's chains on the main split and
      // the same assignment + decimal-mean arithmetic.
      import graft.operators.SemDedup
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .select(col("vec_id"), col("embedding"))
      val isMain = splitBucket(col("vec_id")) < DeltaBucketMin
      val cb = graft.search.AnnIndex.loadCodebooks(s, ivfPqMainIndexDir(s, dir))
      val dcols = (0 until IvfPqM).map { sub =>
        val slc = slice(col("embedding"), sub * IvfPqSubDim + 1, IvfPqSubDim)
        val cents = cb(sub)
        round(graft.expressions.VectorExpressions.sqDist(
          slc, element_at(typedLit(cents.map(_.toSeq)),
            SemDedup.assignCell(slc, cents) + 1)), 6)
      }
      val scored = e.select(isMain.as("is_main"),
        round(dcols.reduce(_ + _), 6).as("d"))
      // one conditional aggregate folds both sides in a single pass —
      // no grouping, no join, one row out (the oracle's exact shape)
      def sideMean(side: Column) = round(
        sum(when(side, col("d").cast("decimal(27,10)"))).cast("double") /
          sum(when(side, 1L)), 6)
      scored.agg(
          sum(when(col("is_main"), 1L)).cast("long").as("n_main"),
          sum(when(!col("is_main"), 1L)).cast("long").as("n_delta"),
          sideMean(col("is_main")).as("main_mean_distortion"),
          sideMean(!col("is_main")).as("delta_mean_distortion"))
        .withColumn("drift_ratio",
          round(col("delta_mean_distortion") / col("main_mean_distortion"), 6))
        .withColumn("refit",
          (col("drift_ratio") > lit(RefitDriftMax)).cast("long"))
    }),

    "q175_major_fold" -> ((s, dir) => {
      // MAJOR compaction, probed: the delete-lifecycle delta is folded
      // back into a fresh main artifact (majorCompact — live rows
      // only, tombstoned keys physically dropped, delta retired) and
      // THIS probe runs against the folded artifact with no delta at
      // all. The oracle is the same live-set exact top-10 as q172's —
      // hash-green IS the post-fold == pre-fold proof, and it fails
      // closed if the fold resurrects a deleted row, drops a live one,
      // serves a superseded version, or breaks the carried geometry's
      // probe minima.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, DeletedCorpusId, "q175_major_fold")
      graft.search.AnnIndex.probeIvfPq(s, foldedIndexDir(s, dir), qv,
        k = 10, nProbe = IvfNProbe, shortlist = ServedShortlist)
    }),

    "q148_ivfpq_search" -> ((s, dir) => {
      // IVF-PQ, COMPOSED (Jégou et al. 2011; the billion-scale layout
      // q144's scaladoc promises, round-11 verdict item #3): the
      // persisted artifact is the q75 cell-partitioned corpus whose
      // rows also carry their PQ codes. The probe (a) prunes to the
      // IvfNProbe nearest cells — `cell IN (...)` reaches both scans
      // as a PartitionFilter; (b) ADC-scores ONLY the resident CODES
      // (the ADC scan's ReadSchema is (vec_id, c0..c3) — the raw
      // vectors never enter it; scoring is m lookups in ≤16-entry
      // broadcast-literal tables) and shortlists the IvfPqShortlist
      // best in per-partition heaps; (c) exact-rescores the shortlist
      // alone via a broadcast semi-join back onto the pruned cells.
      // The declared oracle IS the exact top-10 (q75's text), so
      // hash-green certifies end-to-end recall of the
      // compressed+pruned route — fails closed on a cell miss OR an
      // ADC shortlist miss (IvfPqShortlist scaladoc carries the
      // measured minima).
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, 0L, "q148_ivfpq_search")
      graft.search.AnnIndex
        .probeIvfPq(s, ivfPqIndexDir(s, dir), qv, k = 10,
          nProbe = IvfNProbe, shortlist = IvfPqShortlist)
    }),

    "q150_ivfpq_delta" -> ((s, dir) => {
      // INCREMENTAL search over main + delta — the LSM read path
      // (every vector store between index rebuilds: an immutable
      // indexed segment plus a small recent unindexed one): ~90% of
      // the corpus is served by the q148 composed IVF-PQ artifact
      // BUILT ON MAIN ONLY (cell pruning → codes-only ADC shortlist →
      // exact rescore), the ~10% delta is exact-scanned in full (it
      // is small and fresh by construction — indexing it would cost
      // more than scanning it), and the answer is the merge of the
      // two sides' top-10's — top-k of a union distributes over the
      // union, so merging per-side top-k's is exact. from_delta rides
      // along so hash-green also certifies WHICH SIDE each hit came
      // from. Oracle is the exact top-10 over the FULL corpus with
      // the membership flag recomputed — fails closed on a main-path
      // cell/shortlist miss AND on a delta row leaking or missing.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, 0L, "q150_ivfpq_delta")
      val mainTop = graft.search.AnnIndex
        .probeIvfPq(s, ivfPqMainIndexDir(s, dir), qv, k = 10,
          nProbe = IvfNProbe, shortlist = IvfPqShortlist)
        .withColumn("from_delta", lit(0L))
      val deltaTop = e
        .filter(splitBucket(col("vec_id")) >= DeltaBucketMin)
        .withColumn("score", round(neo4jScore(col("embedding"), typedLit(qv.toSeq)), 6))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
        .select(col("vec_id"), col("score"))
        .withColumn("from_delta", lit(1L))
      mainTop.unionByName(deltaTop)
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
    }),

    "q151_ivfpq_multiprobe" -> ((s, dir) => {
      // the PERSISTED IVF-PQ artifact probed by a BATCH of queries —
      // q87's multi-tenant shape composed with the PQ compression
      // (and graft.search.SearchEngine.streamingKnnVsIvfPq runs this
      // exact plan per micro-batch): per-query cell selection ranks
      // the broadcast quantizer centers DISTRIBUTED, the code-only
      // corpus read joins broadcast (query × nProbe) cells under
      // dynamic partition pruning, ADC distances are m row-local
      // sqdists against the broadcast-literal codebooks (the per-query
      // LUT evaluated inline — zero per-query driver work), per-query
      // shortlists come from a window-group-limited rank, and the
      // exact rescore DPP-joins the shortlist back and tops out in
      // map-side heaps. Oracle is the exact per-query top-10 (q87's
      // construction) — fails closed on any query's cell or shortlist
      // miss (IvfPqMultiShortlist carries the measured minima).
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      graft.search.AnnIndex
        .probeIvfPqMulti(s, ivfPqIndexDir(s, dir),
          e.filter(col("vec_id") < MultiProbeQueries),
          k = 10, nProbe = MultiProbeNProbe, shortlist = IvfPqMultiShortlist)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q152_filtered_ivfpq" -> ((s, dir) => {
      // FILTERED ANN over the persisted IVF-PQ artifact — the
      // metadata-constrained search every production vector store
      // exposes (Qdrant payload filters, Milvus scalar fields,
      // Filtered-DiskANN's problem statement): the artifact persists
      // `label` as a payload column, and the ~10%-selective predicate
      // label = FilterLabel is applied INSIDE both artifact scans —
      // under the cell PartitionFilter it reaches the parquet reader
      // as a PushedFilter, so row groups whose label statistics
      // exclude the value are skipped without decoding. PRE-filtering
      // (not oversample-then-post-filter) means the ADC shortlist
      // ranks qualifying rows only, so selectivity cannot starve the
      // top-k; the oracle is the exact FILTERED top-10 — fails closed
      // on a cell miss, a shortlist miss, or a filter leak
      // (IvfPqFilteredShortlist carries the measured minima).
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, 0L, "q152_filtered_ivfpq")
      graft.search.AnnIndex
        .probeIvfPq(s, ivfPqIndexDir(s, dir), qv, k = 10,
          nProbe = IvfNProbe, shortlist = IvfPqFilteredShortlist,
          predicate = col("label") === FilterLabel,
          payload = Seq("label"))
    }),

    "q153_ivfpq_compact" -> ((s, dir) => {
      // MINOR COMPACTION read path — the LSM step after q150: the
      // delta segment GRADUATES into the index (cells assigned by the
      // main quantizer, PQ codes by the main codebooks, no refit, main
      // files untouched, O(delta) write) and the probe runs the q148
      // shape over BOTH cell-partitioned segments: one cell ranking
      // serves both (one quantizer), each segment scan partition-prunes
      // to the probed cells, the codes-only ADC pass ranks the UNION,
      // one shortlist bounds the exact rescore. q150 exact-scans its
      // delta in full; q153 reads nProbe/cells of it like any other
      // segment. from_delta rides along, so hash-green also certifies
      // each hit's segment of origin. Oracle is the exact top-10 over
      // the FULL corpus for query vec CompactQueryId with the
      // membership flag recomputed — fails closed on a cell miss, a
      // shortlist miss, or a row served from the wrong segment.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, CompactQueryId, "q153_ivfpq_compact")
      val mainDir = ivfPqMainIndexDir(s, dir)
      val main = s.read.parquet(s"$mainDir/corpus")
        .withColumn("from_delta", lit(0L))
      val delta = s.read.parquet(deltaSegmentDir(s, dir))
        .withColumn("from_delta", lit(1L))
      graft.search.AnnIndex
        .probeIvfPqSegments(s, mainDir, Seq(main, delta), qv, k = 10,
          nProbe = IvfNProbe, shortlist = CompactShortlist,
          payload = Seq("from_delta"))
    }),

    "q154_ivfpq_residual" -> ((s, dir) => {
      // RESIDUAL IVF-PQ — IVFADC proper (Jégou et al. 2011 §III-C):
      // the PQ codes in this artifact quantize xn − c_cell (the
      // normalized vector's residual after coarse quantization), so
      // ADC approximates ‖qn − xn‖² = 2 − 2·cos — the true ranking
      // metric — with per-(cell, code) broadcast-literal lookup tables
      // (1024 doubles; still row-local codegen, zero joins). The plan
      // is exactly q148's (cell-pruned codes-only ADC scan → bounded
      // shortlist → broadcast exact rescore); what changed is the
      // ENCODING. The tune receipts are honestly flat on this fixture
      // — isotropic vectors give 16 coarse cells nothing to explain,
      // so residual ≈ xn and the published IVFADC gap vanishes by
      // design (IvfPqResShortlist scaladoc has the numbers and the
      // regime analysis). Oracle is the exact top-10 for query vec
      // ResQueryId — fails closed on a cell or shortlist miss.
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
      val qv = probeVec64(s, dir, ResQueryId, "q154_ivfpq_residual")
      graft.search.AnnIndex
        .probeIvfPqResidual(s, ivfPqResIndexDir(s, dir), qv, k = 10,
          nProbe = IvfNProbe, shortlist = IvfPqResShortlist)
    }),

    "q97_kcenter" -> ((s, dir) => {
      // greedy k-center coreset selection (Gonzalez 1985 / Sener &
      // Savarese 2018): each round adds the embedding farthest from
      // every chosen center — diversity sampling, the complement of
      // q85's prune-the-dense step. One corpus scan per round against
      // inlined center literals, one top-1 row to the driver (the
      // BpeTrain loop contract). The oracle unrolls all
      // [[KCenterK]] rounds, so hash-green certifies every argmax,
      // tie-break and radius — the full selection trace.
      graft.operators.KCenter.selectReport(
        graft.SparkEntry.tbl(s, dir, "embeddings")
          .filter(hasDim(col("embedding"), 64))
          .select(col("vec_id"), col("embedding")),
        KCenterK)
    }),

    "q101_kcenter_batch" -> ((s, dir) => {
      // batch-B k-center (KCenter.selectBatch): the production variant
      // q97's scaladoc names — top-B farthest per scan against the
      // pre-round centers, ⌈(k-1)/B⌉ + 1 scans instead of k. The
      // oracle unrolls every scan (each round's min-distance table,
      // the (d desc, vec_id) top-B, the pick numbering), so hash-green
      // certifies the complete batched trace; the B=1 == select law
      // lives in KCenterSpec.
      graft.operators.KCenter.selectBatchReport(
        graft.SparkEntry.tbl(s, dir, "embeddings")
          .filter(hasDim(col("embedding"), 64))
          .select(col("vec_id"), col("embedding")),
        KCenterBatchK, KCenterBatchB)
    }),

    "q99_jl_distortion" -> ((s, dir) => {
      // JL random projection + distortion audit (operators/JlProject):
      // 64-d → 16-d with the seeded literal plane family, then the
      // audit MEASURES the pairwise-distance ratio the lemma promises
      // over a deterministic sample — the verify-the-prefilter step a
      // pipeline runs before trusting projected distances for
      // clustering/dedup. Projection is row-local expression work at
      // any scale; the audit's pair volume is sample²-bounded.
      graft.operators.JlProject.distortionAudit(
        graft.SparkEntry.tbl(s, dir, "embeddings")
          .filter(hasDim(col("embedding"), 64))
          .select(col("vec_id"), col("embedding")),
        JlSampleN)
    }),
  )

  /** q85 twins: squared-L2 distance (rounded 6 dp, the argmin compare
    * key), one Lloyd's assignment (row_number argmin — min distance,
    * ties to the lowest cell, matching the strict-less Spark fold), and
    * one centroid update (decimal-routed per-dimension sums, one
    * round(…, 6) after the double divide; an emptied cell KEEPS its
    * previous centroid via the left-join COALESCE — the same rule
    * [[graft.operators.SemDedup.fit]] applies). */
  private def semDistSql(aE: String, bE: String): String =
    s"round(list_sum(list_transform(list_zip($aE, $bE), " +
      s"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
  /** One subspace's full PQ Lloyd's chain (q144/q145/q174 oracles):
    * slices `src` to subspace `sb`, seeds from the k smallest PRESENT
    * vec_ids (on a full corpus identical to the original `vec_id < k`
    * rule — [[graft.operators.SemDedup.fit]]'s documented seeding),
    * runs `iters` assign→update rounds, and ends with the final
    * assignment `af_$sb$tag(vec_id, embedding, cell)` + codebook
    * `c{iters}_$sb$tag`. `tag` namespaces the CTEs so one statement
    * can carry chains over different source tables. */
  private def pqChainSql(sb: Int, src: String = "e", tag: String = "",
                         dim: Int = PqDim, k: Int = PqK,
                         iters: Int = PqIters): String = {
    val sfx = s"${sb}$tag"
    def assign(from: String, cents: String, out: String): String =
      s"""${out}_d AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    ${semDistSql("e.embedding", "c.ce")} AS d
         |  FROM $from e CROSS JOIN $cents c),
         |$out AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d, cell) AS rk FROM ${out}_d)
         |  WHERE rk = 1)""".stripMargin
    def update(asg: String, prev: String, out: String): String =
      s"""${out}_s AS (
         |  SELECT cell, pos,
         |    SUM(CAST(CAST(embedding[pos + 1] AS DOUBLE) AS DECIMAL(27,10))) AS sd,
         |    COUNT(*) AS n
         |  FROM $asg CROSS JOIN (SELECT unnest(range($dim)) AS pos)
         |  GROUP BY cell, pos),
         |${out}_m AS (
         |  SELECT cell, list(round(CAST(sd AS DOUBLE) / n, 6) ORDER BY pos) AS ce
         |  FROM ${out}_s GROUP BY cell),
         |$out AS (
         |  SELECT p.cell, COALESCE(m.ce, p.ce) AS ce
         |  FROM $prev p LEFT JOIN ${out}_m m ON p.cell = m.cell)""".stripMargin
    val lo = sb * dim + 1
    val hi = (sb + 1) * dim
    val iterCtes = (1 to iters).map { t =>
      s"""${assign(s"e$sfx", s"c${t - 1}_$sfx", s"a${t}_$sfx")},
         |${update(s"a${t}_$sfx", s"c${t - 1}_$sfx", s"c${t}_$sfx")}""".stripMargin
    }.mkString(",\n")
    s"""e$sfx AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM $src),
       |c0_$sfx AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
       |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS ce
       |  FROM (SELECT vec_id, embedding FROM e$sfx ORDER BY vec_id LIMIT $k)),
       |$iterCtes,
       |${assign(s"e$sfx", s"c${iters}_$sfx", s"af_$sfx")}""".stripMargin
  }

  /** Shared q140/q146 oracle: every greedy step unrolled as its own
    * CTE (the qcIterSql pattern) — step t excludes the t−1
    * already-picked ids and takes the arg-max of the 6-dp MMR score
    * with the same tie-break. `pool = Some(n)` inserts the q146
    * relevance-pool reduction between the scored candidates and the
    * greedy. */
  private def mmrOracleSql(pool: Option[Int]): String = {
    val lam = s"CAST($MmrLambda AS DOUBLE)"
    val oml = s"CAST($MmrOneMinusLambda AS DOUBLE)"
    def stepCte(t: Int): String = {
      val prev = (1 until t).map(i => s"s$i")
      val from = (Seq("cand c") ++ prev).mkString(", ")
      val excl =
        if (prev.isEmpty) ""
        else s"WHERE c.vec_id NOT IN (${prev.map(p => s"$p.vec_id").mkString(", ")}) "
      val ms = prev match {
        case Seq() => "CAST(0.0 AS DOUBLE)"
        case Seq(one) => s"round(${cosSql("c.embedding", s"$one.embedding")}, 6)"
        case many => "greatest(" + many.map(p =>
          s"round(${cosSql("c.embedding", s"$p.embedding")}, 6)").mkString(", ") + ")"
      }
      s"""s$t AS (
         |  SELECT vec_id, embedding, rel, ms AS max_sim,
         |    round($lam * rel - $oml * ms, 6) AS mmr
         |  FROM (SELECT c.vec_id, c.embedding, c.rel, $ms AS ms
         |        FROM $from $excl)
         |  ORDER BY mmr DESC, vec_id ASC LIMIT 1)""".stripMargin
    }
    val steps = (1 to MmrK).map(stepCte).mkString(",\n")
    val out = (1 to MmrK).map(t =>
      s"SELECT $t::BIGINT AS step, vec_id, rel, max_sim, mmr FROM s$t")
      .mkString("\nUNION ALL ")
    val candCte = pool match {
      case None =>
        s"""cand AS (
           |  SELECT e.vec_id, e.embedding,
           |    round(${cosSql("e.embedding", "q.qe")}, 6) AS rel
           |  FROM embeddings e CROSS JOIN q
           |  WHERE len(e.embedding) = 64 AND e.vec_id <> 0)""".stripMargin
      case Some(n) =>
        s"""scored AS (
           |  SELECT e.vec_id, e.embedding,
           |    round(${cosSql("e.embedding", "q.qe")}, 6) AS rel
           |  FROM embeddings e CROSS JOIN q
           |  WHERE len(e.embedding) = 64 AND e.vec_id <> 0),
           |cand AS (SELECT * FROM scored
           |  ORDER BY rel DESC, vec_id ASC LIMIT $n)""".stripMargin
    }
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |$candCte,
       |$steps
       |$out
       |ORDER BY step""".stripMargin
  }

  /** q149 oracle: the q146 pool+greedy chain unrolled PER QUERY —
    * `pool` ranks every (query, candidate) pair, `cand$qid` slices one
    * query's pool, and each query gets its own s{qid}_{t} greedy step
    * CTEs; all queries' traces union at the end. Hash-green certifies
    * every pool membership and every argmax of every query. */
  private def mmrMultiOracleSql: String = {
    val lam = s"CAST($MmrLambda AS DOUBLE)"
    val oml = s"CAST($MmrOneMinusLambda AS DOUBLE)"
    def chain(qid: Int): String = {
      def stepCte(t: Int): String = {
        val prev = (1 until t).map(i => s"s${qid}_$i")
        val from = (Seq(s"cand$qid c") ++ prev).mkString(", ")
        val excl =
          if (prev.isEmpty) ""
          else s"WHERE c.vec_id NOT IN (${prev.map(p => s"$p.vec_id").mkString(", ")}) "
        val ms = prev match {
          case Seq() => "CAST(0.0 AS DOUBLE)"
          case Seq(one) => s"round(${cosSql("c.embedding", s"$one.embedding")}, 6)"
          case many => "greatest(" + many.map(p =>
            s"round(${cosSql("c.embedding", s"$p.embedding")}, 6)").mkString(", ") + ")"
        }
        s"""s${qid}_$t AS (
           |  SELECT vec_id, embedding, rel, ms AS max_sim,
           |    round($lam * rel - $oml * ms, 6) AS mmr
           |  FROM (SELECT c.vec_id, c.embedding, c.rel, $ms AS ms
           |        FROM $from $excl)
           |  ORDER BY mmr DESC, vec_id ASC LIMIT 1)""".stripMargin
      }
      s"""cand$qid AS (SELECT vec_id, embedding, rel FROM pool WHERE query_id = $qid),
         |${(1 to MmrK).map(stepCte).mkString(",\n")}""".stripMargin
    }
    val chains = (0 until MmrMultiQueries).map(chain).mkString(",\n")
    val out = (for (qid <- 0 until MmrMultiQueries; t <- 1 to MmrK) yield
      s"SELECT $qid::BIGINT AS query_id, $t::BIGINT AS step, vec_id, rel, max_sim, mmr FROM s${qid}_$t")
      .mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |  FROM embeddings WHERE vec_id < $MmrMultiQueries AND len(embedding) = 64),
       |scored AS (
       |  SELECT q.query_id, e.vec_id, e.embedding,
       |    round(${cosSql("e.embedding", "q.qe")}, 6) AS rel
       |  FROM embeddings e CROSS JOIN q
       |  WHERE len(e.embedding) = 64 AND e.vec_id >= $MmrMultiQueries),
       |pool AS (SELECT * FROM scored
       |  QUALIFY row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, vec_id ASC) <= $MmrPoolN),
       |$chains
       |$out
       |ORDER BY query_id, step""".stripMargin
  }

  private def semAssignSql(cents: String, out: String): String =
    s"""${out}_d AS (
       |  SELECT e.vec_id, e.embedding, c.cell, ${semDistSql("e.embedding", "c.ce")} AS d
       |  FROM e CROSS JOIN $cents c),
       |$out AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rk FROM ${out}_d)
       |  WHERE rk = 1)""".stripMargin
  private def semUpdateSql(asg: String, prev: String, out: String): String =
    s"""${out}_s AS (
       |  SELECT cell, pos,
       |    SUM(CAST(CAST(embedding[pos + 1] AS DOUBLE) AS DECIMAL(27,10))) AS sd,
       |    COUNT(*) AS n
       |  FROM $asg CROSS JOIN (SELECT unnest(range(64)) AS pos) GROUP BY cell, pos),
       |${out}_m AS (
       |  SELECT cell, list(round(CAST(sd AS DOUBLE) / n, 6) ORDER BY pos) AS ce
       |  FROM ${out}_s GROUP BY cell),
       |$out AS (
       |  SELECT p.cell, COALESCE(m.ce, p.ce) AS ce
       |  FROM $prev p LEFT JOIN ${out}_m m ON p.cell = m.cell)""".stripMargin

  /** q89 core, testable on synthetic frames: mine the best-margin pool
    * mate for every query vector. `test` = (vec_id, qe), `pool` =
    * (nn_id, pe); output one row per query — (vec_id, nn_id, score,
    * margin), score the 6-dp cosine, margin = score normalized by the
    * mean of both sides' top-k scores. Shape: the small mining batch
    * broadcasts against the streamed pool (q56's geometry — corpus side
    * linear, never materialized); both normalizers are window sums over
    * the SAME scored cross (no second scan, no join back: the per-query
    * windows and the per-candidate windows each cost one keyed shuffle
    * of the cross). Scores are rounded to 6 dp BEFORE any use and the
    * normalizer sums are decimal-routed, so every downstream comparison
    * and the final margin are partition-order-independent and exactly
    * reproducible in the DuckDB twin. */
  private[graft] def marginMine(test: DataFrame, pool: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(col("vec_id"))
    val wy = Window.partitionBy(col("nn_id"))
    // window columns GROUPED BY PARTITION KEY (r18): the natural
    // rkx/rky/sx/sy/rk order alternates vec_id/nn_id partitioning five
    // times, so the scored cross reshuffled on every step. All nn_id
    // windows first, then all vec_id windows, costs exactly two keyed
    // exchanges of the cross; each column's definition (and so every
    // value) is unchanged.
    pool.join(broadcast(test))
      .withColumn("score", round(cosineSimilarity(col("pe"), col("qe")), 6))
      .select(col("vec_id"), col("nn_id"), col("score"))
      .withColumn("rky", row_number().over(
        wy.orderBy(col("score").desc, col("vec_id").asc)))
      .withColumn("sy",
        sum(when(col("rky") <= k, col("score").cast("decimal(18,6)"))).over(wy))
      .withColumn("rkx", row_number().over(
        wx.orderBy(col("score").desc, col("nn_id").asc)))
      .withColumn("sx",
        sum(when(col("rkx") <= k, col("score").cast("decimal(18,6)"))).over(wx))
      .withColumn("margin",
        round(col("score") * lit(2 * k) / (col("sx") + col("sy")).cast("double"), 6))
      .withColumn("rk", row_number().over(
        wx.orderBy(col("margin").desc, col("nn_id").asc)))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("nn_id"), col("score"), col("margin"))
  }

  /** Raw cosine twin (the [[cosSql]] score convention strips to this
    * when the consumer wants cos itself, e.g. q89's margin). */
  private[queries] def rawCosSql(aE: String, bE: String): String =
    s"""list_sum(list_transform(list_zip($aE, $bE),
       |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform($aE, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform($bE, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  /** q165's served-search oracle over the LIVE delete-lifecycle set,
    * payloads included — shared VERBATIM by q173 (session-route
    * serve, delta live) and q185 (serving-root route, post-fold):
    * identical expected output from two different physical custodies
    * of the same documents. */
  private lazy val servedDeleteExactTop10Sql: String = {
    val lits = docVec(ServedDeletePrompt).map(_.toDouble).mkString("[", ", ", "]")
    s"""WITH live AS (
       |  SELECT e.vec_id AS doc_id, e.embedding, d.text
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
       |  WHERE len(e.embedding) = 64 AND e.vec_id <> $DeletedCorpusId
       |  UNION ALL
       |  SELECT vec_id AS doc_id, embedding, text
       |  FROM (VALUES
       |         $servedDeleteLiveValuesSql) AS t(vec_id, embedding, text))
       |SELECT doc_id, text,
       |  round(${cosSql("embedding", lits)}, 6) AS score
       |FROM live
       |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
  }

  private[queries] def cosSql(aE: String, bE: String): String =
    s"""(1.0 +
       |      ${rawCosSql(aE, bE)}) / 2.0""".stripMargin

  /** Exact top-10 of corpus vec [[DeletedCorpusId]]'s own embedding
    * over the delete-lifecycle's LIVE set — shared verbatim by q172
    * (live LSM probe) and q175 (post-fold probe): identical expected
    * output from two different physical layouts is exactly the
    * pre/post-fold equivalence claim. */
  private lazy val liveSetExactTop10Sql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings
       |           WHERE vec_id = $DeletedCorpusId),
       |live AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE len(embedding) = 64 AND vec_id <> $DeletedCorpusId
       |  UNION ALL
       |  SELECT vec_id, embedding
       |  FROM (VALUES
       |         $servedDeleteLiveValuesSql) AS t(vec_id, embedding, text))
       |SELECT l.vec_id,
       |  round(${cosSql("l.embedding", "q.qe")}, 6) AS score
       |FROM live l CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q163_paraphrase_mining" ->
      s"""WITH sh AS (${DedupQueries.hashedShinglesSql}),
         |nc AS (SELECT ${graft.functions.PortableHash.planesForSql("count(*)")} AS np
         |  FROM embeddings),
         |e AS (SELECT vec_id, embedding,
         |    ${graft.functions.PortableHash.lshBucketScaledSql("embedding", "nc.np")} AS bucket
         |  FROM embeddings CROSS JOIN nc),
         |cand AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(${cosSql("a.embedding", "b.embedding")}, 6) AS score
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE round(${cosSql("a.embedding", "b.embedding")}, 6) >= $ParaSimTau)
         |SELECT c.vec_a, c.vec_b, c.score,
         |  round(${graft.operators.Dedup.jaccardSql("x.hs", "y.hs")}, 6) AS jac
         |FROM cand c JOIN sh x ON c.vec_a = x.doc_id JOIN sh y ON c.vec_b = y.doc_id
         |WHERE round(${graft.operators.Dedup.jaccardSql("x.hs", "y.hs")}, 6) <= $ParaJacMax
         |ORDER BY c.vec_a, c.vec_b""".stripMargin,

    "q162_semantic_decontam" ->
      s"""WITH b AS (
         |  SELECT embedding AS bemb FROM embeddings
         |  WHERE vec_id < $SemDecontamBenchN),
         |m AS (
         |  SELECT c.vec_id,
         |    round(MAX(${cosSql("c.embedding", "b.bemb")}), 6) AS max_eval_sim
         |  FROM embeddings c CROSS JOIN b
         |  WHERE c.vec_id >= $SemDecontamBenchN
         |  GROUP BY c.vec_id)
         |SELECT vec_id, max_eval_sim,
         |  CASE WHEN max_eval_sim >= $SemDecontamTau THEN 1 ELSE 0 END AS contaminated
         |FROM m ORDER BY vec_id""".stripMargin,

    "q140_mmr_select" -> mmrOracleSql(pool = None),

    "q146_mmr_pooled" -> mmrOracleSql(pool = Some(MmrPoolN)),

    "q149_mmr_multi" -> mmrMultiOracleSql,

    "q49_int8_quant" -> {
      val amax = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
      s"""WITH e AS (
         |  SELECT label, $amax AS amax, embedding
         |  FROM embeddings WHERE len(embedding) = 64),
         |q AS (
         |  SELECT label,
         |    CASE WHEN amax > 0.0 THEN
         |      list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 127.0 / amax, 0) AS BIGINT))
         |    ELSE list_transform(embedding, v -> 0::BIGINT) END AS quant
         |  FROM e),
         |st AS (
         |  SELECT label,
         |    list_reduce(list_prepend(0::BIGINT, quant), (a, b) -> a + b) AS sum_q,
         |    len(list_filter(quant, x -> abs(x) = 127))::BIGINT AS n_sat,
         |    len(list_filter(quant, x -> x = 0))::BIGINT AS n_zero
         |  FROM q)
         |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
         |  CAST(SUM(sum_q) AS BIGINT) AS sum_q,
         |  CAST(SUM(n_sat) AS BIGINT) AS n_saturated,
         |  CAST(SUM(n_zero) AS BIGINT) AS n_zeroed
         |FROM st GROUP BY label ORDER BY label""".stripMargin
    },

    "q32_filtered_knn" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, label, embedding FROM embeddings
         |      WHERE len(embedding) = 64 AND label = 2)
         |SELECT e.vec_id, e.label,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM e, q
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "q33_prompt_search" -> {
      // exact double widening of the embedder's float vector; Double
      // .toString round-trips, so DuckDB parses the identical value
      val lits = flagshipVec.map(_.toDouble).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64)
         |SELECT e.vec_id AS doc_id, d.text,
         |  round(${cosSql("e.embedding", lits)}, 6) AS score
         |FROM e JOIN documents d ON e.vec_id = d.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    "q58_centroid_outliers" ->
      s"""WITH pe AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label, pos,
         |    CAST(embedding[pos + 1] AS DOUBLE) AS v
         |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS pos)
         |  WHERE len(embedding) = 64),
         |cent AS (
         |  SELECT label, pos,
         |    round(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS c
         |  FROM pe GROUP BY label, pos),
         |d AS (
         |  SELECT pe.vec_id, pe.label, (pe.v - cent.c) * (pe.v - cent.c) AS d2
         |  FROM pe JOIN cent ON pe.label = cent.label AND pe.pos = cent.pos)
         |SELECT vec_id, label,
         |  round(sqrt(CAST(SUM(CAST(d2 AS DECIMAL(28,12))) AS DOUBLE)), 6) AS dist
         |FROM d GROUP BY vec_id, label
         |ORDER BY dist DESC, vec_id ASC LIMIT $CentroidOutlierK""".stripMargin,

    // exact top-10 by cosine: q47's LSH-selected + exact-rescored output
    // must equal this, so a hash-green row certifies 10/10 index recall
    "q47_brp_knn" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // exact top-10 (q47's oracle text): the persisted-IVF probe must
    // recover it end to end off the cell-partitioned artifact
    "q75_ivf_index_probe" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // exact top-10 (q75's oracle text): the composed IVF-PQ route —
    // cell pruning, code-only ADC shortlist, exact rescore — must
    // recover it end to end; fails closed on any recall miss
    // exact top-10 BY THE SERVED PROMPT'S VECTOR with document
    // payloads: the index-served service route must recover it end to
    // end — fails closed on a recall miss and on a payload-fetch defect
    "q165_served_search" -> {
      val lits = servedVec.map(_.toDouble).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64)
         |SELECT e.vec_id AS doc_id, d.text,
         |  round(${cosSql("e.embedding", lits)}, 6) AS score
         |FROM e JOIN documents d ON e.vec_id = d.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    // exact top-10 over the LIVE set: corpus minus the deleted doc,
    // plus the script's surviving synthetic vectors — the tombstone,
    // latest-op-wins, and correction rules all inlined into what
    // "live" means; a probe serving any dead row (or dropping vec 0's
    // replacement ranks) flips the hash
    "q172_lsm_delete" -> liveSetExactTop10Sql,

    // the SAME live-set exact top-10 as q172 — but the engine side
    // probes the FOLDED artifact with no delta, so green here is the
    // post-fold == pre-fold certificate
    "q175_major_fold" -> liveSetExactTop10Sql,

    // exact FILTERED top-10 with payloads for the served prompt — the
    // q152 oracle shape on the service route: recall misses AND filter
    // leaks both flip the hash
    "q177_served_filtered" -> {
      val lits = servedVec.map(_.toDouble).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings
         |           WHERE len(embedding) = 64 AND label = $FilterLabel)
         |SELECT e.vec_id AS doc_id, d.text,
         |  round(${cosSql("e.embedding", lits)}, 6) AS score
         |FROM e JOIN documents d ON e.vec_id = d.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    // the standing evolving-index report PREDICTS PERFECTION (the q166
    // convention): every query retrieves its exact live top-IrK at the
    // shipped constants, so a delta-serving miss, a resurrected
    // tombstone, or a superseded version breaking into the top-k turns
    // a 1.0 into not-1.0 and the gate red
    "q176_evolving_eval" -> {
      val ids = ((0 until IrQueries).map(_.toLong) ++
        EvolvingEvalQueries.map(_._1)).sorted
      s"""SELECT CAST(query_id AS BIGINT) AS query_id,
         |  $IrK::BIGINT AS n_rel, $IrK::BIGINT AS n_ret, $IrK::BIGINT AS n_hit,
         |  CAST(1.0 AS DOUBLE) AS recall_at_10,
         |  CAST(1.0 AS DOUBLE) AS mrr,
         |  CAST(1.0 AS DOUBLE) AS ndcg_at_10
         |FROM (SELECT unnest([${ids.mkString(", ")}]) AS query_id)
         |ORDER BY query_id""".stripMargin
    },

    // perfection predicted PER ARM: any fold×delete×correction or
    // filter×tombstone×delta interaction regression lands on a
    // specific (arm, query_id) row and flips the hash
    "q179_lifecycle_eval" -> {
      val foldIds = ((0 until IrQueries).map(_.toLong) ++
        EvolvingEvalQueries.map(_._1)).sorted
      val filtIds = (0 until IrQueries).map(_.toLong)
      s"""SELECT arm, CAST(query_id AS BIGINT) AS query_id,
         |  $IrK::BIGINT AS n_rel, $IrK::BIGINT AS n_ret, $IrK::BIGINT AS n_hit,
         |  CAST(1.0 AS DOUBLE) AS recall_at_10,
         |  CAST(1.0 AS DOUBLE) AS mrr,
         |  CAST(1.0 AS DOUBLE) AS ndcg_at_10
         |FROM (
         |  SELECT 'post_fold' AS arm, unnest([${foldIds.mkString(", ")}]) AS query_id
         |  UNION ALL
         |  SELECT 'filtered' AS arm, unnest([${filtIds.mkString(", ")}]) AS query_id)
         |ORDER BY arm, query_id""".stripMargin
    },

    // the Lloyd's chains on the main split (the q150 artifact's own
    // codebook fits), every row's assigned-code distortion, and the
    // decimal means + ratio + flag — the exact arithmetic of the gauge
    "q174_refit_gauge" -> {
      val (a, b) = SplitPair
      val chains = (0 until IvfPqM).map { sb =>
        pqChainSql(sb, src = "m", tag = "g", dim = IvfPqSubDim,
          k = IvfPqK, iters = IvfPqIters)
      }.mkString(",\n")
      val subCtes = (0 until IvfPqM).map { sb =>
        val lo = sb * IvfPqSubDim + 1
        val hi = (sb + 1) * IvfPqSubDim
        s"""es$sb AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM e),
           |ad$sb AS (
           |  SELECT s.vec_id, MIN(${semDistSql("s.embedding", "c.ce")}) AS d$sb
           |  FROM es$sb s CROSS JOIN c${IvfPqIters}_${sb}g c
           |  GROUP BY s.vec_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |m AS (SELECT vec_id, embedding FROM e
         |      WHERE ((($a * vec_id + $b) % $P) % 100) < $DeltaBucketMin),
         |$chains,
         |$subCtes,
         |rowd AS (
         |  SELECT e.vec_id,
         |    ((($a * e.vec_id + $b) % $P) % 100) < $DeltaBucketMin AS is_main,
         |    round(ad0.d0 + ad1.d1 + ad2.d2 + ad3.d3, 6) AS d
         |  FROM e JOIN ad0 USING (vec_id) JOIN ad1 USING (vec_id)
         |       JOIN ad2 USING (vec_id) JOIN ad3 USING (vec_id)),
         |g AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN is_main THEN 1 ELSE 0 END) AS BIGINT) AS n_main,
         |    CAST(SUM(CASE WHEN is_main THEN 0 ELSE 1 END) AS BIGINT) AS n_delta,
         |    round(CAST(SUM(CASE WHEN is_main THEN CAST(d AS DECIMAL(27,10)) END) AS DOUBLE)
         |      / SUM(CASE WHEN is_main THEN 1 END), 6) AS main_mean_distortion,
         |    round(CAST(SUM(CASE WHEN NOT is_main THEN CAST(d AS DECIMAL(27,10)) END) AS DOUBLE)
         |      / SUM(CASE WHEN NOT is_main THEN 1 END), 6) AS delta_mean_distortion
         |  FROM rowd)
         |SELECT n_main, n_delta, main_mean_distortion, delta_mean_distortion,
         |  round(delta_mean_distortion / main_mean_distortion, 6) AS drift_ratio,
         |  CASE WHEN round(delta_mean_distortion / main_mean_distortion, 6) > $RefitDriftMax
         |    THEN 1::BIGINT ELSE 0::BIGINT END AS refit
         |FROM g""".stripMargin
    },

    // q165's served-search oracle over the LIVE set, payloads
    // included: the corrected gamma text must sit at rank 1 score 1.0,
    // beta/the draft must be absent, corpus back-fills minus the
    // deleted doc
    "q173_served_delete" -> servedDeleteExactTop10Sql,

    // q185 serves the SAME live set through the serving-root route
    // (post-fold, pointer-resolved): identical expected output from a
    // different physical layout IS the fold-invisibility claim at the
    // service surface
    "q185_root_served" -> servedDeleteExactTop10Sql,

    // q187: per-prompt exact top-10 over the LIFECYCLE live set — the
    // q185 oracle batched (one arm per prompt, ranks pinned): the
    // batch face through the pointer must serve exactly what the
    // single face serves, prompt by prompt
    "q187_root_batch_served" -> {
      val arms = RootBatchPrompts.zipWithIndex.map { case (p, i) =>
        val lits = docVec(p).map(_.toDouble).mkString("[", ", ", "]")
        s"""s$i AS (
           |  SELECT $i::BIGINT AS prompt_idx, doc_id, text,
           |    round(${cosSql("embedding", lits)}, 6) AS score
           |  FROM live ORDER BY score DESC, doc_id ASC LIMIT 10)"""
          .stripMargin
      }.mkString(",\n")
      val union = RootBatchPrompts.indices
        .map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
      s"""WITH live AS (
         |  SELECT e.vec_id AS doc_id, e.embedding, d.text
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE len(e.embedding) = 64 AND e.vec_id <> $DeletedCorpusId
         |  UNION ALL
         |  SELECT vec_id AS doc_id, embedding, text
         |  FROM (VALUES
         |         $servedDeleteLiveValuesSql) AS t(vec_id, embedding, text)),
         |$arms,
         |u AS ($union)
         |SELECT prompt_idx, doc_id, text, score,
         |  row_number() OVER (PARTITION BY prompt_idx
         |    ORDER BY score DESC, doc_id ASC) AS rank
         |FROM u ORDER BY prompt_idx, rank""".stripMargin
    },

    "q186_batch_served" -> {
      val arms = BatchServedPrompts.zipWithIndex.map { case (p, i) =>
        val lits = docVec(p).map(_.toDouble).mkString("[", ", ", "]")
        s"""s$i AS (
           |  SELECT $i::BIGINT AS prompt_idx, doc_id, text,
           |    round(${cosSql("embedding", lits)}, 6) AS score
           |  FROM c ORDER BY score DESC, doc_id ASC LIMIT 10)"""
          .stripMargin
      }.mkString(",\n")
      val union = BatchServedPrompts.indices
        .map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
      s"""WITH c AS (
         |  SELECT e.vec_id AS doc_id, e.embedding, d.text
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE len(e.embedding) = 64),
         |$arms,
         |u AS ($union)
         |SELECT prompt_idx, doc_id, text, score,
         |  row_number() OVER (PARTITION BY prompt_idx
         |    ORDER BY score DESC, doc_id ASC) AS rank
         |FROM u ORDER BY prompt_idx, rank""".stripMargin
    },

    "q148_ivfpq_search" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // exact per-query top-10 (q87's construction): the batched
    // compressed route must recall every neighbor of every query
    "q151_ivfpq_multiprobe" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id < $MultiProbeQueries AND len(embedding) = 64),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS doc_id,
         |    round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |  FROM embeddings e CROSS JOIN q
         |  WHERE len(e.embedding) = 64),
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT query_id, doc_id, score, rank FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // exact FILTERED top-10: the pre-filtered compressed route must
    // recover it end to end — fails closed on a recall miss AND on a
    // filter leak (a non-matching label in the output changes the hash)
    "q152_filtered_ivfpq" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64 AND e.label = $FilterLabel
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // exact top-10 for query vec ResQueryId: the residual-encoded
    // compressed route must recover it end to end — fails closed
    "q154_ivfpq_residual" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings
         |           WHERE vec_id = $ResQueryId)
         |SELECT e.vec_id,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // exact top-10 over the FULL corpus (query vec CompactQueryId)
    // with the split membership recomputed: the post-compaction
    // two-segment index route must recover it end to end
    "q153_ivfpq_compact" -> {
      val (a, b) = SplitPair
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings
         |           WHERE vec_id = $CompactQueryId)
         |SELECT e.vec_id,
         |  CAST(CASE WHEN ((($a * e.vec_id + $b) % $P) % 100) >= $DeltaBucketMin
         |    THEN 1 ELSE 0 END AS BIGINT) AS from_delta,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // exact top-10 over the FULL corpus with the split membership
    // recomputed: the main+delta merge must recover it end to end
    "q150_ivfpq_delta" -> {
      val (a, b) = SplitPair
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${cosSql("e.embedding", "q.qe")}, 6) AS score,
         |  CAST(CASE WHEN ((($a * e.vec_id + $b) % $P) % 100) >= $DeltaBucketMin
         |    THEN 1 ELSE 0 END AS BIGINT) AS from_delta
         |FROM embeddings e CROSS JOIN q
         |WHERE len(e.embedding) = 64
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // exact all-pairs top-20 (q21's oracle text): q72's LSH-candidate +
    // exact-rescore output must equal it, so hash-green certifies the
    // similarity join recalled every top-20 pair
    "q72_brp_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS score
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |ORDER BY score DESC, vec_a ASC, vec_b ASC LIMIT $NearDupTopK""".stripMargin,

    // exact per-query top-10 (q11's construction): the multi-probe
    // route must recall every neighbor of every query — fails closed
    "q87_ivf_multiprobe" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id < $MultiProbeQueries AND len(embedding) = 64),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS doc_id,
         |    round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |  FROM embeddings e CROSS JOIN q
         |  WHERE len(e.embedding) = 64),
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT query_id, doc_id, score, rank FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q89_margin_mining" -> {
      val k = MarginK
      val (a, b) = SplitPair
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ((($a * vec_id + $b) % $P) % 100) AS bucket
         |  FROM embeddings WHERE len(embedding) = 64),
         |cx AS (SELECT t.vec_id, p.vec_id AS nn_id,
         |    round(${rawCosSql("p.embedding", "t.embedding")}, 6) AS score
         |  FROM e t JOIN e p ON t.bucket >= 90 AND p.bucket < 80),
         |c2 AS (SELECT *,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rkx,
         |    row_number() OVER (PARTITION BY nn_id ORDER BY score DESC, vec_id) AS rky
         |  FROM cx),
         |c3 AS (SELECT *,
         |    SUM(CASE WHEN rkx <= $k THEN CAST(score AS DECIMAL(18,6)) END)
         |      OVER (PARTITION BY vec_id) AS sx,
         |    SUM(CASE WHEN rky <= $k THEN CAST(score AS DECIMAL(18,6)) END)
         |      OVER (PARTITION BY nn_id) AS sy
         |  FROM c2),
         |m AS (SELECT vec_id, nn_id, score,
         |    round(score * ${2 * k} / CAST(sx + sy AS DOUBLE), 6) AS margin FROM c3)
         |SELECT vec_id, nn_id, score, margin
         |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY margin DESC, nn_id) AS rk FROM m)
         |WHERE rk = 1 ORDER BY vec_id""".stripMargin
    },

    // both Lloyd's iterations unrolled op-for-op: hash-green certifies
    // the clustering, the pair set AND the removal policy
    "q144_pq_codebook" -> {
      val chains = (0 until PqM).map { sb =>
        s"""${pqChainSql(sb)},
           |r$sb AS (
           |  SELECT $sb::BIGINT AS sub, CAST(a.cell AS BIGINT) AS cell,
           |    COUNT(*)::BIGINT AS n_vecs,
           |    round(CAST(SUM(CAST(${semDistSql("a.embedding", "c.ce")}
           |      AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*), 6) AS mean_sqdist
           |  FROM af_$sb a JOIN c${PqIters}_$sb c USING (cell)
           |  GROUP BY a.cell)""".stripMargin
      }.mkString(",\n")
      val out = (0 until PqM).map(sb => s"SELECT * FROM r$sb")
        .mkString("\nUNION ALL ")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |$chains
         |$out
         |ORDER BY sub, cell""".stripMargin
    },

    "q145_pq_adc" -> {
      // q144's chains + the query's per-subspace lookup table + both
      // top-k's, all unrolled
      val chains = (0 until PqM).map { sb =>
        val lo = sb * PqDim + 1
        val hi = (sb + 1) * PqDim
        s"""${pqChainSql(sb)},
           |qs$sb AS (SELECT qe[$lo:$hi] AS q FROM q),
           |lut$sb AS (SELECT c.cell, ${semDistSql("q.q", "c.ce")} AS t$sb
           |  FROM c${PqIters}_$sb c CROSS JOIN qs$sb q),
           |ad$sb AS (SELECT a.vec_id, l.t$sb
           |  FROM af_$sb a JOIN lut$sb l USING (cell)
           |  WHERE a.vec_id <> 0)""".stripMargin
      }.mkString(",\n")
      val joined = (1 until PqM).foldLeft("ad0") { (acc, sb) =>
        s"$acc JOIN ad$sb USING (vec_id)" }
      val tsum = (0 until PqM).map(sb => s"t$sb").mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |q AS (SELECT embedding AS qe FROM e WHERE vec_id = 0),
         |$chains,
         |sc AS (SELECT vec_id, round($tsum, 6) AS adc_d FROM $joined),
         |top AS (SELECT vec_id, adc_d FROM sc
         |  ORDER BY adc_d ASC, vec_id ASC LIMIT 10),
         |ex AS (SELECT e.vec_id,
         |    round(${cosSql("e.embedding", "q.qe")}, 6) AS exact_score
         |  FROM e CROSS JOIN q WHERE e.vec_id <> 0
         |  ORDER BY exact_score DESC, vec_id ASC LIMIT 10)
         |SELECT t.vec_id, t.adc_d, ex.exact_score,
         |  CAST(CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS in_exact_topk
         |FROM top t LEFT JOIN ex ON t.vec_id = ex.vec_id
         |ORDER BY t.adc_d ASC, t.vec_id ASC""".stripMargin
    },

    "q85_semdedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |c0 AS (
         |  SELECT vec_id AS cell, list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS ce
         |  FROM e WHERE vec_id < $SemCells),
         |${semAssignSql("c0", "a1")},
         |${semUpdateSql("a1", "c0", "c1")},
         |${semAssignSql("c1", "a2")},
         |${semUpdateSql("a2", "c1", "c2")},
         |${semAssignSql("c2", "a3")},
         |f AS (
         |  SELECT a3.vec_id, a3.cell, a3.embedding,
         |    round(${cosSql("a3.embedding", "c.ce")}, 6) AS cscore
         |  FROM a3 JOIN c2 c USING (cell)),
         |p AS (
         |  SELECT x.vec_id AS va, y.vec_id AS vb, x.cscore AS sa, y.cscore AS sb
         |  FROM f x JOIN f y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  WHERE ${cosSql("x.embedding", "y.embedding")} >= $SemMinScore),
         |nb AS (
         |  SELECT vec_id, COUNT(*) AS n_nbrs, MAX(CASE WHEN worse THEN 1 ELSE 0 END) AS removed
         |  FROM (
         |    SELECT va AS vec_id, (sa > sb OR (sa = sb AND va > vb)) AS worse FROM p
         |    UNION ALL
         |    SELECT vb AS vec_id, (sb > sa OR (sb = sa AND vb > va)) AS worse FROM p)
         |  GROUP BY vec_id)
         |SELECT f.vec_id, CAST(f.cell AS INT) AS cell, f.cscore AS centroid_score,
         |  COALESCE(nb.n_nbrs, 0)::BIGINT AS n_nbrs, COALESCE(nb.removed, 0)::INT AS removed
         |FROM f LEFT JOIN nb ON f.vec_id = nb.vec_id ORDER BY f.vec_id""".stripMargin,

    // all KCenterK greedy rounds unrolled: each m_r computes every
    // vector's min distance to the chosen set (the same rounded
    // pairwise distance the Spark fold uses), p_r takes the
    // (d desc, vec_id asc) argmax, ch_r appends it — hash-green
    // certifies the complete selection trace
    "q97_kcenter" -> {
      val d = "round(list_sum(list_transform(list_zip(e.emb, c.emb), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
      val rounds = (2 to KCenterK).map { r =>
        s"""m$r AS (
           |  SELECT e.vec_id, e.emb, MIN($d) AS dmin
           |  FROM e2 e CROSS JOIN ch${r - 1} c
           |  GROUP BY e.vec_id, e.emb),
           |p$r AS (SELECT vec_id, emb, CAST($r AS BIGINT) AS round, dmin AS radius
           |  FROM m$r ORDER BY dmin DESC, vec_id ASC LIMIT 1),
           |ch$r AS (SELECT vec_id, emb, round, radius FROM ch${r - 1}
           |  UNION ALL SELECT vec_id, emb, round, radius FROM p$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |e2 AS (SELECT vec_id,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS emb
         |  FROM e),
         |ch1 AS (SELECT vec_id, emb, CAST(1 AS BIGINT) AS round, 0.0::DOUBLE AS radius
         |  FROM e2 ORDER BY vec_id LIMIT 1),
         |$rounds
         |SELECT round, vec_id, radius FROM ch$KCenterK ORDER BY round""".stripMargin
    },

    // every batched scan unrolled: m_r re-derives each vector's min
    // distance to the PRE-round center set, p_r takes the top-take by
    // (d desc, vec_id) and numbers the picks globally, ch_r appends —
    // hash-green certifies the complete batch-B selection trace
    // including the truncated final batch
    "q101_kcenter_batch" -> {
      val d = "round(list_sum(list_transform(list_zip(e.emb, c.emb), " +
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
      // scan schedule after the seed: (scan round, picks this scan,
      // picks already chosen) — mirrors KCenter.selectBatch's loop
      val sched = List.unfold((2, 1)) { case (r, off) =>
        if (off >= KCenterBatchK) None
        else {
          val take = math.min(KCenterBatchB, KCenterBatchK - off)
          Some(((r, take, off), (r + 1, off + take)))
        }
      }
      val rounds = sched.map { case (r, take, off) =>
        s"""m$r AS (
           |  SELECT e.vec_id, e.emb, MIN($d) AS dmin
           |  FROM e2 e CROSS JOIN ch${r - 1} c
           |  GROUP BY e.vec_id, e.emb),
           |p$r AS (SELECT vec_id, emb, CAST($r AS BIGINT) AS round,
           |    CAST($off + row_number() OVER (ORDER BY dmin DESC, vec_id ASC)
           |      AS BIGINT) AS pick,
           |    dmin AS radius
           |  FROM m$r ORDER BY dmin DESC, vec_id ASC LIMIT $take),
           |ch$r AS (SELECT vec_id, emb, round, pick, radius FROM ch${r - 1}
           |  UNION ALL SELECT vec_id, emb, round, pick, radius FROM p$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |e2 AS (SELECT vec_id,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS emb
         |  FROM e),
         |ch1 AS (SELECT vec_id, emb, CAST(1 AS BIGINT) AS round,
         |    CAST(1 AS BIGINT) AS pick, 0.0::DOUBLE AS radius
         |  FROM e2 ORDER BY vec_id LIMIT 1),
         |$rounds
         |SELECT round, pick, vec_id, radius FROM ch${sched.last._1}
         |ORDER BY pick""".stripMargin
    },

    "q99_jl_distortion" -> {
      def sq(aE: String, bE: String): String =
        s"list_sum(list_transform(list_zip($aE, $bE), " +
          s"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE len(embedding) = 64 AND vec_id < $JlSampleN),
         |p AS (SELECT vec_id, embedding,
         |    ${graft.operators.JlProject.projectSql("embedding")} AS proj
         |  FROM e),
         |pr AS (
         |  SELECT round(sqrt(${sq("a.proj", "b.proj")})
         |      / sqrt(${sq("a.embedding", "b.embedding")}), 6) AS ratio,
         |    ${sq("a.embedding", "b.embedding")} AS d2
         |  FROM p a JOIN p b ON a.vec_id < b.vec_id)
         |SELECT CAST(${graft.functions.PortableHash.JlDim} AS BIGINT) AS k,
         |  COUNT(*) AS n_pairs,
         |  round(CAST(SUM(CAST(ratio AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6)
         |    AS mean_ratio,
         |  MIN(ratio) AS min_ratio,
         |  MAX(ratio) AS max_ratio
         |FROM pr WHERE d2 > 0.0""".stripMargin
    },

    "q22_lsh_bucket_knn" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |q AS (SELECT embedding AS qe, ${lshBucketSql("embedding")} AS qb
         |      FROM e WHERE vec_id = 0),
         |b AS (SELECT vec_id, embedding, ${lshBucketSql("embedding")} AS bucket FROM e)
         |SELECT b.vec_id, CAST(b.bucket AS BIGINT) AS bucket,
         |  round((1.0 +
         |    list_sum(list_transform(list_zip(b.embedding, q.qe),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |     * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
         |    / 2.0, 6) AS score
         |FROM b, q WHERE bit_count(xor(b.bucket, q.qb)) <= 1
         |ORDER BY score DESC, b.vec_id ASC LIMIT 10""".stripMargin,

    // the production arms at their SHIPPED constants must be PERFECT
    // on this fixture — recall@10 = MRR = nDCG@10 = 1.0 per query per
    // arm (what q47/q87/q151's exact oracles already certify, here as
    // the standing report): any band/cell/shortlist miss flips the
    // predicted 1.0 rows red. n_rel is recomputed (exact top-IrK
    // excluding self), so the prediction also fails closed on a
    // ground-truth defect.
    "q166_retrieval_arms" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |q AS (SELECT vec_id AS query_id, embedding AS qe FROM e
         |  WHERE vec_id < $IrQueries),
         |ex AS (SELECT query_id, e.vec_id,
         |    round(${cosSql("e.embedding", "q.qe")}, 6) AS score
         |  FROM e JOIN q ON e.vec_id <> q.query_id),
         |rel AS (SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, vec_id ASC) AS pos FROM ex)
         |  WHERE pos <= $IrK),
         |nr AS (SELECT query_id, COUNT(*) AS n_rel FROM rel GROUP BY query_id)
         |SELECT arm, query_id, n_rel, n_rel AS n_ret, n_rel AS n_hit,
         |  CAST(1.0 AS DOUBLE) AS recall_at_10,
         |  CAST(1.0 AS DOUBLE) AS mrr,
         |  CAST(1.0 AS DOUBLE) AS ndcg_at_10
         |FROM nr CROSS JOIN (SELECT unnest(['brp', 'ivf', 'ivfpq']) AS arm)
         |ORDER BY arm, query_id""".stripMargin,

    "q164_retrieval_metrics" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = 64),
         |q AS (SELECT vec_id AS query_id, embedding AS qe,
         |    ${graft.functions.PortableHash.lshBucketSql("embedding")} AS qb
         |  FROM e WHERE vec_id < $IrQueries),
         |c AS (SELECT vec_id, embedding,
         |    ${graft.functions.PortableHash.lshBucketSql("embedding")} AS bucket
         |  FROM e WHERE vec_id >= $IrQueries),
         |ex AS (SELECT query_id, c.vec_id,
         |    round(${cosSql("c.embedding", "q.qe")}, 6) AS score FROM c, q),
         |rel AS (SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, vec_id ASC) AS pos FROM ex)
         |  WHERE pos <= $IrK),
         |ls AS (SELECT query_id, c.vec_id,
         |    round(${cosSql("c.embedding", "q.qe")}, 6) AS score
         |  FROM c JOIN q ON bit_count(xor(c.bucket, q.qb)) <= 1),
         |ret AS (SELECT query_id, vec_id, pos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, vec_id ASC) AS pos FROM ls)
         |  WHERE pos <= $IrK),
         |hits AS (SELECT query_id, COUNT(*) AS n_hit, MIN(pos) AS first_pos,
         |    SUM(${irDiscSql("pos")}) AS dcg
         |  FROM ret JOIN rel USING (query_id, vec_id) GROUP BY query_id),
         |cand AS (SELECT query_id, COUNT(*) AS n_cand FROM ls GROUP BY query_id),
         |nr AS (SELECT query_id, COUNT(*) AS n_rel FROM rel GROUP BY query_id)
         |SELECT query_id, n_rel,
         |  CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand,
         |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |  round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_rel, 6) AS recall_at_10,
         |  round(CASE WHEN first_pos IS NULL THEN 0.0
         |    ELSE 1.0 / first_pos END, 6) AS mrr,
         |  round(CAST(coalesce(dcg, 0) AS DOUBLE)
         |    / CAST(${irIdcgSql("n_rel")} AS DOUBLE), 6) AS ndcg_at_10
         |FROM nr LEFT JOIN cand USING (query_id)
         |  LEFT JOIN hits USING (query_id) ORDER BY query_id""".stripMargin,
  )
}

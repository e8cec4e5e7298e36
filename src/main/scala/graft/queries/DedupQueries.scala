package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._
import graft.functions.TextFunctions._
import graft.operators.Dedup._
import graft.queries.TextQueries.{shingleCol, shingleSql}
import graft.SparkEntry.IngestOps

/** Deduplication queries over `documents` (BASELINE.json north star).
  * The fixture plants near-duplicate pairs (shingle-Jaccard >= 0.8 vs a
  * < 0.1 background) and, at sf0.1, exact duplicate texts — so these
  * queries have non-degenerate answers the DuckDB oracle checks exactly.
  *
  * Scale shapes (100 TB posture):
  *  - q17: one map-side-combined groupBy on the content hash.
  *  - q18: exact pairwise is blocked by `lang` AND pre-filtered by the
  *    shingle-count band (|A|/|B| must lie in [t, 1/t] for Jaccard >= t)
  *    before any set intersection runs.
  *  - q19: MinHash+LSH — candidates come from a band-key equi-join, the
  *    only O(n²)-avoiding route; signatures are row-local.
  *  - q20: SimHash — row-local 48-bit signature, Hamming join blocked
  *    by lang.
  *  - q21: brute-force cosine pairs as the correctness baseline for the
  *    LSH path (global top-k → TakeOrderedAndProject, no full sort).
  *  - q59: incremental (daily-ingest) dedup — new-batch band keys join
  *    the corpus band keys, O(new) candidates, never an O(corpus²)
  *    recompute; spec-verified identical to filtering the full pair set.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.tbl(s, dir, "documents")

  /** (doc_id, lang, hs): distinct hashed 3-token shingles per doc,
    * sorted so pairwise intersection is a two-pointer merge
    * ([[graft.operators.Dedup.jaccard]]). One codegen'd pass per doc
    * ([[graft.expressions.ShingleHashSetExpr]]) — no intermediate
    * shingle strings; sorting is row-local and order-irrelevant to
    * every consumer (min, sizes). */
  private[graft] def hashedShingles(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s, "graft_cache_shingles_" + graft.SparkEntry.pathSlug(dir)) {
      // repartition BEFORE the per-doc hashing: the corpus parquet can
      // arrive as one input split (it's small on disk), which would run
      // the expensive row-local shingle pass single-threaded; shuffling
      // raw text rows is cheap, hashing them is not
      docs(s, dir).spreadIfNarrow(s).select(
        col("doc_id"), col("lang"),
        graft.expressions.HashExpressions.shingleHashSet(col("text"), 3).as("hs"))
    }

  // distinct applied AFTER hashing (matching the Spark side) so both
  // engines hold true sets of hash values and |A∪B| = |A|+|B|-|A∩B|
  private[queries] val hashedShinglesSql: String = {
    val sh = shingleSql(tokensSql("text"))
    s"SELECT doc_id, lang, list_distinct(list_transform($sh, s -> ${charHashSql("s")})) AS hs FROM documents"
  }

  val JaccardThreshold = 0.5

  /** SimHash near-dup: 48-bit signatures in 6 chunks of 8 bits; the
    * Hamming cutoff 5 < 6 chunks guarantees (pigeonhole) a shared exact
    * chunk, making chunk equi-join blocking lossless. */
  val SimhashChunks = 6
  val SimhashChunkBits = 8
  val HammingMax = 5L

  /** q83: fixed PageRank depth (fixed-depth plan, no convergence loop)
    * and how many hub documents the report surfaces. */
  val PageRankRounds = 3
  val PageRankTopK = 20

  /** q88 anchor length: duplicated runs shorter than 8 tokens are
    * ignored (Lee et al. 2022 use 50 BPE tokens at web scale; 8 word
    * tokens on the 10-99-token fixture docs keeps planted clone
    * overlaps detectable while the word-soup background — where even
    * 3-gram chance collisions are common, q52's scaladoc — stays
    * silent: a chance 8-gram match needs 8 consecutive draws to agree.
    * Measured: ~45 of 500 docs surface at both test SFs, dup_frac
    * 0.9-1.0 — exactly the planted clones, zero background noise. */
  val DupSpanLen = 8

  /** q102 anchor length: the 13-gram decontamination rule published
    * with GPT-3 (Brown et al. 2020, appendix C) and re-used by Lee et
    * al. 2022 — a 13-token exact run shared with an eval document
    * flags the training doc. */
  val DecontamSpanLen = 13

  /** q113: normalized edit-similarity cutoff for the character-grain
    * verification of LSH candidates — 1 − lev/max(|a|,|b|) ≥ τ, the
    * file-level near-dup rule used by public code-corpus dedup
    * pipelines where token-set Jaccard is too coarse (reordered
    * shingle sets score high on Jaccard; edit distance charges every
    * move). One literal string interpolated into both engines. */
  val EditSimThreshold = "0.8"

  /** q115 winnowing geometry (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS fingerprinting algorithm): window of WinnowW consecutive
    * 3-token shingle hashes, min per window, giving the published
    * guarantee that any shared token run of ≥ w + k − 1 = 6 tokens
    * yields ≥ 1 shared fingerprint at ~2/(w+1) the storage of the
    * full shingle set. Pair threshold measured on the fixture:
    * planted verbatim clones share 9–42 fingerprints, the word-soup
    * chance background ≤ 2 — MinShared 3 separates exactly. */
  val WinnowW = 4
  val WinnowMinShared = 3

  /** q19's pipeline: MinHash band-key candidates verified by exact
    * Jaccard — shared by q19 (pairs) and q31 (survivor selection). */
  private[queries] def lshVerifiedPairs(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s, "graft_cache_lshpairs_" + graft.SparkEntry.pathSlug(dir)) {
      buildLshVerifiedPairs(s, dir)
    }

  /** (doc_id, component, is_survivor) for every document — the LSH
    * pipeline's terminal artifact, session-cached because BOTH q31 (the
    * full labeling) and q43's curation funnel (survivors only) consume
    * it; the connected-components solve runs once per session. */
  private[queries] def survivorLabels(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s, "graft_cache_survivors_" + graft.SparkEntry.pathSlug(dir)) {
      graft.operators.Dedup.survivors(
        docs(s, dir).select(col("doc_id")), "doc_id",
        lshVerifiedPairs(s, dir).select(col("doc_a"), col("doc_b")))
    }

  /** MinHash band-join candidate pairs (doc_a < doc_b), BEFORE the
    * Jaccard verification threshold — session-cached because two
    * consumers read the same candidate set: the verified-pairs
    * pipeline ([[buildLshVerifiedPairs]] → q19/q31/q43/q59) and the
    * q64 containment audit. */
  private[queries] def lshCandidates(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s, "graft_cache_lshcand_" + graft.SparkEntry.pathSlug(dir)) {
      val sh = hashedShingles(s, dir)
      val sigs = sh.withColumn("sig", minhashSignature(col("hs")))
      val bands = sigs
        .select(col("doc_id"), col("sig"), explode(bandKeys(col("sig"))).as("bk"))
        .select(col("doc_id"), col("sig"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      // a pair agreeing in several bands matches the equi-join once per
      // band; requiring the matched band to be the pair's CANONICAL
      // (lowest-index) agreeing band emits each candidate exactly once,
      // so no distinct() shuffle of the candidate set exists (same trick
      // as q20's chunks). Band-key equality ⟺ slot-wise signature
      // equality, so earlier bands are compared as raw longs — no string
      // rebuilding
      def bandDiffers(b: Int) = (0 until MinhashRowsPerBand).map { r =>
        element_at(col("x.sig"), b * MinhashRowsPerBand + r + 1) =!=
          element_at(col("y.sig"), b * MinhashRowsPerBand + r + 1)
      }.reduce(_ || _)
      val canonical = (0 until MinhashBands).map { b =>
        lit(b) >= col("x.band") || bandDiffers(b)
      }.reduce(_ && _)
      bands.alias("x")
        .join(bands.alias("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id") && canonical)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    }

  private def buildLshVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = hashedShingles(s, dir)
    val a = sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    lshCandidates(s, dir).join(a, "doc_a").join(b, "doc_b")
      .withColumn("jac", round(jaccard(col("hs_a"), col("hs_b")), 6))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** Write-once-per-session corpus band-key index for q73: the OLD
    * corpus side (everything outside the q59/q73 "new batch") saved as
    * the daily-dedup artifacts ([[graft.operators.Dedup.saveCorpusIndex]]
    * — band table PARTITIONED BY band + shingle sets). Returns the
    * index directory; memoized so repeated probes in one session pay
    * probe cost only — the artifact-side twin of the in-session
    * [[hashedShingles]] cache. */
  private val sessionBandIndex = new graft.SessionMemo[String, String]

  private[graft] def bandIndexDir(s: SparkSession, dir: String): String =
    sessionBandIndex.getOrCompute(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_band_index_" +
        graft.SparkEntry.pathSlug(dir) + "_" +
        graft.SparkEntry.pathSlug(s.sparkContext.applicationId)
      val oldSh = hashedShingles(s, dir)
        .filter(pmod(col("doc_id"), lit(10L)) =!= 7)
        .select(col("doc_id"), col("hs"))
      graft.operators.Dedup.saveCorpusIndex(oldSh, "doc_id", "hs", out)
      out
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q17_dedup_exact" -> ((s, dir) => {
      // exact dedup survivor stats per source: content key = charHash(text)
      docs(s, dir)
        .withColumn("fp", charHash(col("text")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_distinct"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_dupes"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source"))
    }),

    "q18_jaccard_pairs" -> ((s, dir) => {
      // materialized per-doc signatures (session-cached view): without
      // the barrier, Catalyst inlines the shingle-hash expression into
      // the join's output projection and recomputes it per *pair*
      val sh = hashedShingles(s, dir)
      // the group key (lang) has ~5 distinct values, so a plain
      // lang-equi self-join serializes onto 5 tasks no matter how many
      // cores exist. Chunk the pair space instead: the b side gets a
      // deterministic chunk from its id, the a side is exploded once
      // per chunk, and the equi-key becomes (lang, chunk) — 5×chunks
      // balanced tasks, identical output (chunks only reroute pairs).
      val chunks = 8
      val a = sh.select(col("doc_id").as("doc_a"), col("lang"), col("hs").as("hs_a"),
          size(col("hs")).as("n_a"))
        .withColumn("peer_chunk",
          explode(array((0 until chunks).map(i => lit(i.toLong)): _*)))
      val b = sh.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("hs").as("hs_b"),
          size(col("hs")).as("n_b"))
        .withColumn("chunk", pmod(col("doc_b"), lit(chunks.toLong)))
      // the jaccard predicate sits INSIDE the join condition: candidate
      // pairs are verified before any output row materializes, so the
      // ~2.4 KB signature arrays are copied only for surviving pairs,
      // never for the millions of rejected ones
      a.join(b, col("lang") === col("lang_b") && col("peer_chunk") === col("chunk") &&
          col("doc_a") < col("doc_b") &&
          // size band: Jaccard >= t needs t <= |A|/|B| <= 1/t
          col("n_a").cast("double") >= col("n_b") * JaccardThreshold &&
          col("n_b").cast("double") >= col("n_a") * JaccardThreshold &&
          round(jaccard(col("hs_a"), col("hs_b")), 6) >= JaccardThreshold)
        .withColumn("jac", round(jaccard(col("hs_a"), col("hs_b")), 6))
        .select(col("doc_a"), col("doc_b"), col("jac"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q19_minhash_lsh" -> ((s, dir) =>
      lshVerifiedPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))),

    "q64_containment_audit" -> ((s, dir) => {
      // the dedup audit table: for every LSH candidate pair (pre-
      // threshold), the symmetric (jaccard) and asymmetric
      // (containment, size ratio) overlap numbers — containment ≈ 1
      // with low jaccard is the doc-quoted-inside-doc case a plain
      // near-dup threshold misses. Same cached candidate set and
      // shingle table as q19: the audit adds one join, no new pass
      // over the corpus.
      val sh = hashedShingles(s, dir)
      val a = sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
      lshCandidates(s, dir).join(a, "doc_a").join(b, "doc_b")
        .filter(size(col("hs_a")) > 0 && size(col("hs_b")) > 0)
        .select(col("doc_a"), col("doc_b"),
          round(graft.operators.Dedup.jaccard(col("hs_a"), col("hs_b")), 6).as("jac"),
          round(graft.operators.Dedup.containment(col("hs_a"), col("hs_b")), 6).as("cont"),
          round(least(size(col("hs_a")), size(col("hs_b"))).cast("double") /
            greatest(size(col("hs_a")), size(col("hs_b"))).cast("double"), 6).as("size_ratio"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q115_winnowing" -> ((s, dir) => {
      // winnowing fingerprint candidates ([[WinnowW]] scaladoc): the
      // VERBATIM-SPAN dedup lens — q19's MinHash finds scattered-edit
      // near-dups, q88 finds exact runs, winnowing finds long quoted
      // spans at 1/w the index size of full shingling (what MOSS runs
      // at web scale). Shape: fingerprint extraction is row-local
      // (codegen'd positional shingle hashes + HOF window-min, no
      // shuffle); the fingerprint equi-join is vocabulary-bounded and
      // lang-blocked exactly like the q52 shingle join — it SHUFFLES,
      // never broadcasts; the shared-count threshold prunes the
      // chance-collision background before the nfp joins.
      val w = WinnowW
      // localCheckpoint (r18): fp feeds the per-doc count AND both
      // self-join sides — left lazy, the winnowing extraction (shingle
      // hashes + HOF window-min over full text, the expensive part)
      // re-ran per consumer. The table is 1/w of the shingle stream by
      // winnowing's own density bound; values untouched.
      val fp = docs(s, dir)
        .spreadIfNarrow(s)
        .select(col("doc_id"), col("lang"),
          graft.expressions.HashExpressions.shingleHashSeq(col("text"), 3).as("hs"))
        .filter(size(col("hs")) >= w)
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(
            transform(sequence(lit(0), size(col("hs")) - w), j =>
              array_min(slice(col("hs"), j + 1, lit(w)))))).as("fp"))
        .localCheckpoint()
      val cnt = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
      val pairs = fp.alias("a")
        .join(fp.alias("b"),
          col("a.fp") === col("b.fp") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= WinnowMinShared)
      pairs
        .join(cnt.select(col("doc_id").as("doc_a"), col("nfp").as("nfp_a")), "doc_a")
        .join(cnt.select(col("doc_id").as("doc_b"), col("nfp").as("nfp_b")), "doc_b")
        .withColumn("fp_jac", round(col("shared").cast("double") /
          (col("nfp_a") + col("nfp_b") - col("shared")).cast("double"), 6))
        .select(col("doc_a"), col("doc_b"), col("shared"),
          col("nfp_a"), col("nfp_b"), col("fp_jac"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q113_edit_verified" -> ((s, dir) => {
      // character-grain verification of the LSH candidate set: exact
      // Levenshtein similarity with a kept/cut decision per pair — the
      // third verification lens after set-Jaccard (q19) and
      // containment (q64), charging REORDERING moves that token-set
      // measures are blind to. Shape: reuses the session-cached
      // candidate pairs (band equi-join bounded — never all-pairs);
      // the two text joins are id-keyed equi-joins; the O(|a|·|b|) DP
      // runs ONLY on candidates. At 100 TB the production gate also
      // skips the DP when the length band already refutes:
      // |len_a − len_b| > (1−τ)·max(len) ⇒ lev ≥ |len_a − len_b| ⇒
      // sim < τ with no DP — the fixture's candidates all pass the
      // band, so the audit computes every distance honestly.
      val d = docs(s, dir)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      lshCandidates(s, dir).select(col("doc_a"), col("doc_b"))
        .join(d.select(col("doc_id").as("doc_a"),
          col("text").as("text_a"), col("len").as("len_a")), "doc_a")
        .join(d.select(col("doc_id").as("doc_b"),
          col("text").as("text_b"), col("len").as("len_b")), "doc_b")
        .withColumn("lev", levenshtein(col("text_a"), col("text_b")).cast("long"))
        .withColumn("sim", round(lit(1.0) - col("lev").cast("double") /
          greatest(col("len_a"), col("len_b")).cast("double"), 6))
        .withColumn("kept",
          (col("sim") >= lit(EditSimThreshold.toDouble)).cast("int"))
        .select(col("doc_a"), col("doc_b"),
          col("len_a").cast("long").as("len_a"),
          col("len_b").cast("long").as("len_b"),
          col("lev"), col("sim"), col("kept"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q120_lens_kappa" -> ((s, dir) => {
      // Inter-lens agreement audit: Cohen's kappa (Cohen 1960) between
      // the two verification verdicts the pipeline can apply to the
      // SAME LSH candidate set — token-set Jaccard ≥ 0.5 (q19's rule)
      // vs normalized edit similarity ≥ 0.8 (q113's rule). Raw
      // agreement po overstates consensus when both lenses mostly say
      // "not dup"; kappa subtracts the chance agreement pe implied by
      // the marginals — the number to watch when swapping a cheap
      // lens for an expensive one at 100 TB. Shape: the candidate set
      // is band-join bounded (session-cached), the four joins are
      // id-keyed, the confusion matrix is ONE map-side-combined
      // aggregate to a single row; every count stays a LONG and the
      // chance term is exact integer arithmetic until the two final
      // divisions (the pe = 1 degenerate marginal guards to NULL by
      // INTEGER comparison, identically in both engines).
      val sh = hashedShingles(s, dir)
      val d = docs(s, dir)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      val v = lshCandidates(s, dir).select(col("doc_a"), col("doc_b"))
        .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
        .join(d.select(col("doc_id").as("doc_a"),
          col("text").as("text_a"), col("len").as("len_a")), "doc_a")
        .join(d.select(col("doc_id").as("doc_b"),
          col("text").as("text_b"), col("len").as("len_b")), "doc_b")
        .select(
          (round(jaccard(col("hs_a"), col("hs_b")), 6) >= JaccardThreshold)
            .cast("long").as("ja"),
          (round(lit(1.0) -
            levenshtein(col("text_a"), col("text_b")).cast("double") /
              greatest(col("len_a"), col("len_b")).cast("double"), 6) >=
            lit(EditSimThreshold.toDouble)).cast("long").as("ed"))
      val t = v.agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(col("ja") * col("ed")), lit(0L)).as("n11"),
        coalesce(sum(col("ja") * (lit(1L) - col("ed"))), lit(0L)).as("n10"),
        coalesce(sum((lit(1L) - col("ja")) * col("ed")), lit(0L)).as("n01"),
        coalesce(sum((lit(1L) - col("ja")) * (lit(1L) - col("ed"))), lit(0L))
          .as("n00"))
      val prod = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
        (col("n01") + col("n00")) * (col("n10") + col("n00"))
      val n2 = col("n_pairs") * col("n_pairs")
      val poRaw = (col("n11") + col("n00")).cast("double") /
        col("n_pairs").cast("double")
      val peRaw = prod.cast("double") / n2.cast("double")
      t.select(col("n_pairs"),
        col("n11").as("both_dup"), col("n10").as("jaccard_only"),
        col("n01").as("edit_only"), col("n00").as("neither"),
        when(col("n_pairs") > 0, round(poRaw, 6))
          .otherwise(lit(null).cast("double")).as("po"),
        when(col("n_pairs") > 0, round(peRaw, 6))
          .otherwise(lit(null).cast("double")).as("pe"),
        when(col("n_pairs") > 0 && n2 > prod,
          round((poRaw - peRaw) / (lit(1.0) - peRaw), 6))
          .otherwise(lit(null).cast("double")).as("kappa"))
    }),

    "q122_dup_flows" -> ((s, dir) => {
      // Cross-source duplication-flow matrix: which sources copy from
      // which — every verified near-dup pair charged to its unordered
      // (source, source) cell with the cell's pair count, corpus share
      // and mean similarity. The provenance forensics a crawl pipeline
      // runs when one feed is a mirror of another: a hot off-diagonal
      // cell says drop (or down-weight) the mirror at INGEST, before
      // paying dedup on its whole volume. Shape: the session-cached
      // verified pairs join `documents` twice on id, the cell rollup
      // is one map-side-combined groupBy to ≤ sources² rows, and the
      // one-row total returns by broadcast; mean_jac routes through
      // decimal so the cell means are partition-order-free.
      val pairs = lshVerifiedPairs(s, dir)
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      val cells = pairs
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
          "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
          "doc_b")
        .select(least(col("sa"), col("sb")).as("src_lo"),
          greatest(col("sa"), col("sb")).as("src_hi"), col("jac"))
      val tot = cells.agg(count(lit(1)).as("total_pairs"))
      cells.groupBy(col("src_lo"), col("src_hi"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("jac").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("mean_jac"))
        .crossJoin(broadcast(tot))
        .select(col("src_lo"), col("src_hi"), col("n_pairs"),
          round(col("n_pairs").cast("double") /
            col("total_pairs").cast("double"), 6).as("share"),
          col("mean_jac"))
        .orderBy(col("src_lo"), col("src_hi"))
    }),

    "q31_dedup_survivors" -> ((s, dir) =>
      // the full near-dup dedup pipeline: LSH pairs → connected
      // components → min-id survivor per cluster, over all documents
      survivorLabels(s, dir)
        .select(col("doc_id"), col("component"),
          col("is_survivor").cast("int").as("is_survivor"))
        .orderBy(col("doc_id"))),

    "q71_quality_survivors" -> ((s, dir) => {
      // the survivor POLICY is pluggable: q31 keeps the min-id doc per
      // near-dup cluster (deterministic, cheap); production pipelines
      // keep the BEST doc — here argmax quality, ties broken by min id.
      // Reuses the cached component labels and the cached enriched
      // columns; the only new work is one id-keyed join plus a window
      // partitioned by component (state bounded by cluster size).
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      val avgTokLen = col("char_sum").cast("double") / col("n_tokens")
      val qual = TextQueries.enriched(s, dir)
        .select(col("doc_id"),
          qualityScore(col("n_tokens"), col("n_distinct"), stopRatio, avgTokLen)
            .as("quality"))
      survivorLabels(s, dir).select(col("doc_id"), col("component"))
        .join(qual, "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("quality").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("component"), col("quality"),
          (col("rk") === 1).cast("int").as("is_survivor"))
        .orderBy(col("doc_id"))
    }),

    "q83_dup_pagerank" -> ((s, dir) => {
      // hub documents of the near-dup graph: damped PageRank (3
      // unrolled rounds) over the SAME session-cached verified LSH
      // pairs q19/q31/q67 consume, symmetrized — inside a duplicate
      // cluster the highest-rank doc is the one most connected to
      // other dups (the "canonical copy" signal, complementary to the
      // min-id / quality-argmax survivor policies). Each round is one
      // map-side-combined shuffle keyed on the destination node over
      // edge-sized data (≪ corpus); ranks/degrees are node-sized.
      val pairs = lshVerifiedPairs(s, dir)
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      graft.operators.PageRank.ranks(edges, PageRankRounds)
        .select(col("id").as("doc_id"), col("degree"),
          round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("doc_id").asc)
        .limit(PageRankTopK)
    }),

    "q67_cluster_stats" -> ((s, dir) =>
      // the dedup run report: duplicate-cluster size distribution —
      // how many clusters of each size exist, how many documents they
      // hold, and how many the survivor policy removes. Reads the same
      // session-cached component labels as q31, then two
      // map-side-combined aggregations over component-cardinality-
      // sized data (≪ corpus); the published audit artifact of every
      // large-scale dedup job (cf. the cluster-size histograms in the
      // Lee et al. 2022 dedup paper) at any corpus size.
      survivorLabels(s, dir)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(
          count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("cluster_size")).as("n_docs"),
          (count(lit(1)) * (col("cluster_size") - 1)).as("n_removed"))
        .orderBy(col("cluster_size"))),

    "q20_simhash" -> ((s, dir) => {
      // Global near-dup by SimHash with pigeonhole chunk blocking
      // (Charikar/Manku-style): ham <= HammingMax over SimhashChunks
      // chunks forces at least one *exact* chunk match, so candidates
      // come from an equi-join on (chunk_idx, chunk_value) — never a
      // nested-loop over all pairs. Identical output to brute force.
      val sigs = graft.SparkEntry.cachedView(s,
        "graft_cache_simhash_" + graft.SparkEntry.pathSlug(dir)) {
        docs(s, dir).spreadIfNarrow(s).select(
          col("doc_id"),
          simhash(transform(tokens(col("text")), x => charHash(x))).as("sig"))
      }
      val chunks = sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until SimhashChunks).map { c =>
          struct(lit(c).as("c"), shiftright(col("sig"), c * SimhashChunkBits)
            .bitwiseAND(lit((1L << SimhashChunkBits) - 1)).as("v"))
        }: _*)).as("ck"))
        .select(col("doc_id"), col("sig"), col("ck.c").as("c"), col("ck.v").as("v"))
      // the Hamming cutoff sits INSIDE the join condition (one XOR +
      // popcount, codegen'd): rejected candidate pairs never
      // materialize. A pair sharing several chunks would match in each
      // of them, so the join also requires the matched chunk to be the
      // pair's CANONICAL (lowest-index) agreeing chunk — every
      // surviving pair is emitted exactly once and NO distinct()
      // shuffle of the pair set exists at all. On a clone-dense corpus
      // (ScaleProbe: 5.5M pairs at 50k docs) that dedup shuffle was
      // the dominant cost; with the canonical-chunk predicate the
      // plan is join → sort, nothing else.
      def chunkVal(sig: org.apache.spark.sql.Column, j: Int) =
        shiftright(sig, j * SimhashChunkBits)
          .bitwiseAND(lit((1L << SimhashChunkBits) - 1))
      val canonical = (0 until SimhashChunks).map { j =>
        lit(j) >= col("x.c") ||
          chunkVal(col("x.sig"), j) =!= chunkVal(col("y.sig"), j)
      }.reduce(_ && _)
      chunks.alias("x").join(chunks.alias("y"),
          col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id") &&
            hamming(col("x.sig"), col("y.sig")) <= HammingMax &&
            canonical)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          hamming(col("x.sig"), col("y.sig")).as("ham"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    "q59_incremental_dedup" -> ((s, dir) => {
      // incremental (daily-ingest) dedup: docs with doc_id % 10 == 7
      // play the "new batch"; their band keys join the FULL corpus's
      // band keys ([[graft.operators.Dedup.incrementalPairs]]) — O(new)
      // candidates, the existing pair set is never recomputed. A new
      // doc is accepted when it has no old near-dup partner and no
      // prior (smaller-id) partner within its own batch.
      val sh = hashedShingles(s, dir)
        .withColumn("is_new", pmod(col("doc_id"), lit(10L)) === 7)
      val pairs = graft.operators.Dedup.incrementalPairs(
        sh, "doc_id", "hs", "is_new", JaccardThreshold)
      val agg = pairs.groupBy(col("doc_id")).agg(
        sum(when(!col("partner_is_new"), 1L).otherwise(0L))
          .cast("long").as("n_dup_old"),
        sum(when(col("partner_is_new") && col("partner") < col("doc_id"), 1L)
          .otherwise(0L)).cast("long").as("n_dup_new_prior"))
      sh.filter(col("is_new")).select(col("doc_id"), col("lang"))
        .join(agg, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_dup_old", "n_dup_new_prior"))
        .withColumn("accepted",
          (col("n_dup_old") === 0 && col("n_dup_new_prior") === 0).cast("long"))
        .orderBy(col("doc_id"))
    }),

    "q73_band_index_probe" -> ((s, dir) => {
      // q59's daily-ingest dedup, via the PERSISTED corpus artifact:
      // the old corpus's band keys + shingle sets are WRITTEN once per
      // session (Dedup.saveCorpusIndex — band table PARTITIONED BY
      // band) and the new batch (doc_id % 10 == 7) probes them back
      // off parquet (Dedup.incrementalPairsVsIndex) — nothing about
      // the existing corpus is recomputed, which is the property that
      // makes daily ingest O(new) at 100 TB. Output contract and
      // oracle are exactly q59's: the artifact round-trip must be
      // invisible in the result.
      val sh = hashedShingles(s, dir)
      val indexDir = bandIndexDir(s, dir)
      val newSh = sh.filter(pmod(col("doc_id"), lit(10L)) === 7)
        .select(col("doc_id"), col("hs"))
      val pairs = graft.operators.Dedup.incrementalPairsVsIndex(
        s, indexDir, newSh, "doc_id", "hs", JaccardThreshold)
      val agg = pairs.groupBy(col("doc_id")).agg(
        sum(when(!col("partner_is_new"), 1L).otherwise(0L))
          .cast("long").as("n_dup_old"),
        sum(when(col("partner_is_new") && col("partner") < col("doc_id"), 1L)
          .otherwise(0L)).cast("long").as("n_dup_new_prior"))
      sh.filter(pmod(col("doc_id"), lit(10L)) === 7)
        .select(col("doc_id"), col("lang"))
        .join(agg, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_dup_old", "n_dup_new_prior"))
        .withColumn("accepted",
          (col("n_dup_old") === 0 && col("n_dup_new_prior") === 0).cast("long"))
        .orderBy(col("doc_id"))
    }),

    "q21_embedding_neardup" -> ((s, dir) => {
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
      // the nested-loop pair join parallelizes by the streamed side's
      // partitioning; one input split would mean one task computing all
      // n²/2 cosines — spread the streamed side across the cluster
      val a = e.spreadIfNarrow(s)
        .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("score",
          round(graft.functions.VectorFunctions.neo4jScore(col("emb_a"), col("emb_b")), 6))
        .select(col("vec_a"), col("vec_b"), col("score"))
        .orderBy(col("score").desc, col("vec_a").asc, col("vec_b").asc)
        .limit(20)
    }),

    "q66_span_dedup" -> ((s, dir) => {
      // chunk-grain exact dedup (span dedup): documents are cut into
      // q39's 32-token / stride-24 windows, each chunk identified by
      // its content hash, and a chunk is a duplicate iff the same hash
      // occurred earlier in corpus order (doc_id, chunk index) — the
      // sub-document twin of q17 that catches boilerplate and quoted
      // passages whole-doc dedup misses. Shape: chunking and hashing
      // are row-local codegen'd passes; the ONLY corpus-wide movement
      // is one shuffle on the chunk hash (the window), then a
      // map-side-combined per-doc rollup. First-occurrence-wins is a
      // total order, so the output is deterministic at any parallelism.
      val st = TextQueries.ChunkStride
      val cs = TextQueries.ChunkSize
      val chunks = docs(s, dir)
        .spreadIfNarrow(s)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("n_chunks", expr(s"(n_toks + ${st - 1}) div $st"))
        .filter(col("n_chunks") > 0)
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0L), col("n_chunks") - 1), i =>
            charHash(concat_ws(" ",
              slice(col("toks"), (i * st + 1).cast("int"), lit(cs)))))))
        .toDF("doc_id", "idx", "h")
      chunks
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum((col("rn") > 1).cast("long")).cast("long").as("n_dup_chunks"))
        .withColumn("dup_ratio",
          round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
        .orderBy(col("doc_id"))
    }),

    "q88_dup_spans" -> ((s, dir) => {
      // cross-document duplicated-SPAN detection (Lee et al. 2022's
      // exact-substring dedup, re-expressed relationally — see
      // operators/DupSpans): every token position carries an 8-token
      // anchor gram; anchors whose hash occurs under >= 2 distinct
      // doc_ids mark duplicated content at ARBITRARY offsets (q66's
      // chunk grain only catches duplication aligned to its stride);
      // per doc the surviving positions merge gaps-and-islands style
      // into maximal spans. Shape: shingling row-local on the cached
      // token table; the >= 2-docs test is a map-side-combined
      // groupBy(h) carrying min/max doc_id (vocabulary-sized exchange,
      // no distinct count); the flag-back is the q52 equi-join; island
      // windows are per-doc. All-integer until one final rounded
      // division — the oracle is op-for-op.
      val L = DupSpanLen
      val anchors = TextQueries.enriched(s, dir)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          posexplode(TextQueries.shingleCol(col("toks"), L)))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("pos").cast("long").as("pos"), charHash(col("col")).as("h"))
      graft.operators.DupSpans.report(anchors, L).orderBy(col("doc_id"))
    }),

    "q102_span_decontam" -> ((s, dir) => {
      // cross-corpus SPAN decontamination (the GPT-3 appendix-C /
      // Lee et al. 2022 13-gram rule at span grain): flag TRAIN docs
      // sharing a >= 13-token run with the TEST split — catches the
      // partially-copied eval example that q52's shingle-overlap ratio
      // dilutes below threshold and q65's exact hash misses entirely.
      // Same anchors as q88 (row-local shingling off the shared token
      // cache) with each doc's split from the shared SplitPair hash
      // (decontamination is only meaningful against the split the
      // funnel ships); the duplicated-gram test keys on (train-side,
      // test-side) instead of min!=max doc — see
      // [[graft.operators.DupSpans.leakedSpans]]. Val-split anchors
      // never enter the gram table: train-val sharing is not leakage
      // under this rule and must not create false flags.
      val L = DecontamSpanLen
      val (sa, sb) = SplitPair
      val anchors = TextQueries.enriched(s, dir)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          posexplode(TextQueries.shingleCol(col("toks"), L)))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("pos").cast("long").as("pos"), charHash(col("col")).as("h"),
          (((lit(sa) * col("doc_id") + lit(sb)) % lit(P)) % 100).as("bucket"))
      val train = anchors.filter(col("bucket") < 80).drop("bucket")
      val test = anchors.filter(col("bucket") >= 90).drop("bucket")
      graft.operators.DupSpans.leakedSpans(train, test, L)
        .orderBy(col("doc_id"))
    }),

    "q124_component_split" -> ((s, dir) => {
      // the FIX for what q100 audits: assign train/val/test by hashing
      // the near-dup COMPONENT id instead of the doc id, so a
      // paraphrase cluster moves between splits as a unit and can
      // never straddle the train/test boundary. The query runs BOTH
      // assignments over the session-cached component labels and
      // proves the property in-plan: straddle/leak counts under the
      // doc-keyed baseline (q100's failure mode, honestly nonzero)
      // next to the component-keyed counts (structurally zero), plus
      // the realized split sizes — the price of leakage-safety is the
      // ratio drift from 80/10/10 as whole clusters move. Shape: one
      // map-side-combined groupBy(component), two one-row aggregates,
      // one broadcast crossJoin — component-cardinality-sized after
      // the first exchange at any corpus size.
      val (a, b) = SplitPair
      def bucket(c: Column) = ((lit(a) * c + lit(b)) % lit(P)) % 100
      def splitOf(c: Column) = {
        val bk = bucket(c)
        when(bk < 80, "train").when(bk >= 90, "test").otherwise("val")
      }
      val lab = survivorLabels(s, dir)
        .select(col("doc_id"), col("component"))
        .withColumn("dsplit", splitOf(col("doc_id")))
        .withColumn("csplit", splitOf(col("component")))
      val perComp = lab.groupBy(col("component")).agg(
        countDistinct(col("dsplit")).as("nd"),
        countDistinct(col("csplit")).as("nc"),
        max((col("dsplit") === "train").cast("long")).as("dtr"),
        max((col("dsplit") === "test").cast("long")).as("dte"),
        max((col("csplit") === "train").cast("long")).as("ctr"),
        max((col("csplit") === "test").cast("long")).as("cte"))
      val compAgg = perComp.agg(
        count(lit(1)).as("n_components"),
        sum((col("nd") > 1).cast("long")).as("straddle_doc"),
        sum((col("nc") > 1).cast("long")).as("straddle_comp"),
        sum((col("dtr") === 1 && col("dte") === 1).cast("long")).as("leaky_doc"),
        sum((col("ctr") === 1 && col("cte") === 1).cast("long")).as("leaky_comp"))
      val splitCounts = lab.agg(
        count(lit(1)).as("n_docs"),
        sum((col("csplit") === "train").cast("long")).as("n_train"),
        sum((col("csplit") === "val").cast("long")).as("n_val"),
        sum((col("csplit") === "test").cast("long")).as("n_test"))
      compAgg.crossJoin(broadcast(splitCounts))
        .select(col("n_docs"), col("n_components"),
          col("n_train"), col("n_val"), col("n_test"),
          col("straddle_doc"), col("leaky_doc"),
          col("straddle_comp"), col("leaky_comp"))
    }),

    "q100_split_leakage" -> ((s, dir) => {
      // near-dup-aware split integrity audit: a duplicate CLUSTER whose
      // members straddle the train/test boundary leaks evaluation
      // content into training (the failure mode Lee et al. 2022 §6.2
      // measure — eval examples with training near-dups score inflated
      // perplexity). Exact-match decontamination (q52/q65) misses
      // these; only the near-dup component view catches a paraphrased
      // straddle. Reads the SAME session-cached component labels as
      // q31/q43/q67 (components solve once per session), assigns each
      // doc its SplitPair bucket (the one split hash every
      // split-consumer shares, so this audits the REAL assignment),
      // and aggregates per component — component-cardinality-sized
      // data after one map-side-combined groupBy at any corpus size.
      val (a, b) = SplitPair
      val bucket = ((lit(a) * col("doc_id") + lit(b)) % lit(P)) % 100
      survivorLabels(s, dir)
        .withColumn("split",
          when(bucket < 80, "train")
            .when(bucket >= 90, "test").otherwise("val"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("cluster_size"),
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
        .filter(col("cluster_size") > 1)
        .withColumn("leaks",
          (col("n_test") > 0 && col("n_train") > 0).cast("long"))
        .orderBy(col("component"))
    }),
  )

  /** CTE chain defining `sh` (hashed shingle sets) and `cand` (the
    * band-join candidate pairs) — the pre-verification stage of the
    * LSH oracle pipeline. */
  private[queries] lazy val lshCandCtes: String = {
    val bandSelects = (0 until MinhashBands).map { bnd =>
      s"SELECT doc_id, $bnd AS band, ${bandKeySql("sig", bnd)} AS key FROM sigs"
    }.mkString(" UNION ALL ")
    s"""sh AS ($hashedShinglesSql),
       |sigs AS (SELECT doc_id, ${minhashSignatureSql("hs")} AS sig FROM sh),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** [[lshCandCtes]] plus the Jaccard-verified `pairs` CTE — the full
    * shingles → sigs → bands → candidates → verified-pairs chain shared
    * by the q19/q31/q43/q59 oracles. stripMargin is applied only to the
    * new suffix: lshCandCtes is already stripped, and re-stripping an
    * interpolated string would corrupt any future fragment whose line
    * happens to start with '|'. */
  private[queries] lazy val lshPairsCtes: String =
    lshCandCtes + ",\n" +
      s"""pairs AS (
         |  SELECT c.doc_a, c.doc_b, round(${jaccardSql("a.hs", "b.hs")}, 6) AS jac
         |  FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id
         |  WHERE round(${jaccardSql("a.hs", "b.hs")}, 6) >= $JaccardThreshold)""".stripMargin

  val oracleSql: Map[String, String] = {
    val jacE = jaccardSql("a.hs", "b.hs")
    Map(

      "q66_span_dedup" -> {
        val st = TextQueries.ChunkStride
        val cs = TextQueries.ChunkSize
        val chunkText = s"array_to_string(list_slice(toks, i * $st + 1, i * $st + $cs), ' ')"
        // parallel unnest zips the index and hash lists elementwise
        s"""WITH d AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
           |c AS (SELECT doc_id, toks,
           |    ((len(toks)::BIGINT + ${st - 1}) // $st) AS n_chunks FROM d),
           |e AS (SELECT doc_id, unnest(range(n_chunks)) AS i,
           |    unnest(list_transform(range(n_chunks), i -> ${charHashSql(chunkText)})) AS h
           |  FROM c WHERE n_chunks > 0),
           |r AS (SELECT doc_id, h,
           |    row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn FROM e)
           |SELECT doc_id, COUNT(*)::BIGINT AS n_chunks,
           |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
           |  round(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
           |    AS dup_ratio
           |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },

      "q88_dup_spans" -> {
        val L = DupSpanLen
        val gram = (0 until L).map(j => s"toks[pos + ${j + 1}]").mkString(" || '|' || ")
        s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
           |base AS (SELECT doc_id, lang, toks, len(toks)::BIGINT AS n_tokens FROM dd),
           |an AS (SELECT doc_id, lang, n_tokens, pos, ${charHashSql(s"($gram)")} AS h
           |  FROM (SELECT doc_id, lang, n_tokens, toks,
           |        unnest(range(len(toks) - ${L - 1})) AS pos
           |        FROM base WHERE len(toks) >= $L)),
           |du AS (SELECT h FROM an GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)),
           |dp AS (SELECT an.* FROM an JOIN du USING (h)),
           |fl AS (SELECT doc_id, lang, n_tokens, pos,
           |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
           |           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $L
           |         THEN 1::BIGINT ELSE 0::BIGINT END AS ni
           |  FROM dp),
           |il AS (SELECT doc_id, lang, n_tokens, pos, ni,
           |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM fl),
           |sp AS (SELECT doc_id, lang, n_tokens, isl, MIN(pos)::BIGINT AS s,
           |    (MAX(pos) + ${L - 1})::BIGINT AS e
           |  FROM il GROUP BY doc_id, lang, n_tokens, isl)
           |SELECT doc_id, lang, n_tokens, COUNT(*)::BIGINT AS n_spans,
           |  SUM(e - s + 1)::BIGINT AS dup_tokens,
           |  round(SUM(e - s + 1)::DOUBLE / n_tokens, 6) AS dup_frac
           |FROM sp GROUP BY doc_id, lang, n_tokens ORDER BY doc_id""".stripMargin
      },

      // the q88 chain with the gram test keyed on sides: `sides` flags
      // each anchor hash train(0)/test(1) (val anchors excluded —
      // train-val sharing is not leakage), `lk` keeps hashes present
      // on BOTH sides, and only TRAIN anchors flow into the island
      // merge — op-for-op the leakedSpans plan
      "q102_span_decontam" -> {
        val L = DecontamSpanLen
        val (sa, sb) = SplitPair
        val gram = (0 until L).map(j => s"toks[pos + ${j + 1}]").mkString(" || '|' || ")
        s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
           |base AS (SELECT doc_id, lang, toks, len(toks)::BIGINT AS n_tokens,
           |    (($sa * doc_id + $sb) % $P) % 100 AS bucket FROM dd),
           |an AS (SELECT doc_id, lang, n_tokens, bucket, pos,
           |    ${charHashSql(s"($gram)")} AS h
           |  FROM (SELECT doc_id, lang, n_tokens, bucket, toks,
           |        unnest(range(len(toks) - ${L - 1})) AS pos
           |        FROM base WHERE len(toks) >= $L)),
           |sides AS (SELECT h, CASE WHEN bucket < 80 THEN 0 ELSE 1 END AS side
           |  FROM an WHERE bucket < 80 OR bucket >= 90),
           |lk AS (SELECT h FROM sides GROUP BY h
           |  HAVING MIN(side) = 0 AND MAX(side) = 1),
           |dp AS (SELECT an.* FROM an JOIN lk USING (h) WHERE an.bucket < 80),
           |fl AS (SELECT doc_id, lang, n_tokens, pos,
           |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
           |           OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $L
           |         THEN 1::BIGINT ELSE 0::BIGINT END AS ni
           |  FROM dp),
           |il AS (SELECT doc_id, lang, n_tokens, pos, ni,
           |    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM fl),
           |sp AS (SELECT doc_id, lang, n_tokens, isl, MIN(pos)::BIGINT AS s,
           |    (MAX(pos) + ${L - 1})::BIGINT AS e
           |  FROM il GROUP BY doc_id, lang, n_tokens, isl)
           |SELECT doc_id, lang, n_tokens, COUNT(*)::BIGINT AS n_spans,
           |  SUM(e - s + 1)::BIGINT AS leaked_tokens,
           |  round(SUM(e - s + 1)::DOUBLE / n_tokens, 6) AS leaked_frac
           |FROM sp GROUP BY doc_id, lang, n_tokens ORDER BY doc_id""".stripMargin
      },

      "q17_dedup_exact" ->
        s"""SELECT source, COUNT(*) AS n_docs,
           |  COUNT(DISTINCT ${charHashSql("text")}) AS n_distinct,
           |  COUNT(*) - COUNT(DISTINCT ${charHashSql("text")}) AS n_dupes,
           |  MIN(doc_id) AS first_doc
           |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "q18_jaccard_pairs" ->
        s"""WITH sh AS ($hashedShinglesSql)
           |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  round($jacE, 6) AS jac
           |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
           |  AND len(a.hs)::DOUBLE >= len(b.hs) * $JaccardThreshold
           |  AND len(b.hs)::DOUBLE >= len(a.hs) * $JaccardThreshold
           |WHERE round($jacE, 6) >= $JaccardThreshold
           |ORDER BY doc_a, doc_b""".stripMargin,

      "q19_minhash_lsh" ->
        s"""WITH $lshPairsCtes
           |SELECT doc_a, doc_b, jac FROM pairs ORDER BY doc_a, doc_b""".stripMargin,

      "q122_dup_flows" ->
        s"""WITH $lshPairsCtes,
           |cells AS (
           |  SELECT least(da.source, db.source) AS src_lo,
           |    greatest(da.source, db.source) AS src_hi, p.jac
           |  FROM pairs p JOIN documents da ON p.doc_a = da.doc_id
           |    JOIN documents db ON p.doc_b = db.doc_id),
           |tot AS (SELECT COUNT(*)::BIGINT AS total_pairs FROM cells)
           |SELECT src_lo, src_hi, COUNT(*)::BIGINT AS n_pairs,
           |  round(COUNT(*)::DOUBLE / total_pairs::DOUBLE, 6) AS share,
           |  round(CAST(SUM(CAST(jac AS DECIMAL(28,6))) AS DOUBLE)
           |    / COUNT(*), 6) AS mean_jac
           |FROM cells CROSS JOIN tot
           |GROUP BY src_lo, src_hi, total_pairs
           |ORDER BY src_lo, src_hi""".stripMargin,

      "q64_containment_audit" ->
        s"""WITH $lshCandCtes
           |SELECT c.doc_a, c.doc_b,
           |  round(${jaccardSql("a.hs", "b.hs")}, 6) AS jac,
           |  round(${containmentSql("a.hs", "b.hs")}, 6) AS cont,
           |  round(least(len(a.hs), len(b.hs))::DOUBLE /
           |    greatest(len(a.hs), len(b.hs))::DOUBLE, 6) AS size_ratio
           |FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id
           |WHERE len(a.hs) > 0 AND len(b.hs) > 0
           |ORDER BY c.doc_a, c.doc_b""".stripMargin,

      "q115_winnowing" -> {
        val w = WinnowW
        val sh = shingleSql(tokensSql("text"))
        val hsSeq = s"list_transform($sh, s -> ${charHashSql("s")})"
        s"""WITH hsx AS (
           |  SELECT doc_id, lang, $hsSeq AS hs FROM documents),
           |fpt AS (
           |  SELECT doc_id, lang, unnest(list_distinct(
           |    list_transform(generate_series(1, len(hs) - ${w - 1}), j ->
           |      list_min(list_slice(hs, j, j + ${w - 1}))))) AS fp
           |  FROM hsx WHERE len(hs) >= $w),
           |cnt AS (SELECT doc_id, COUNT(*) AS nfp FROM fpt GROUP BY doc_id),
           |pairs AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
           |  FROM fpt a JOIN fpt b ON a.fp = b.fp AND a.lang = b.lang
           |    AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT p.doc_a, p.doc_b, p.shared, ca.nfp AS nfp_a, cb.nfp AS nfp_b,
           |  round(p.shared::DOUBLE / (ca.nfp + cb.nfp - p.shared)::DOUBLE, 6)
           |    AS fp_jac
           |FROM pairs p JOIN cnt ca ON p.doc_a = ca.doc_id
           |  JOIN cnt cb ON p.doc_b = cb.doc_id
           |WHERE p.shared >= $WinnowMinShared
           |ORDER BY p.doc_a, p.doc_b""".stripMargin
      },

      "q113_edit_verified" ->
        s"""WITH $lshCandCtes,
           |ed AS (
           |  SELECT c.doc_a, c.doc_b,
           |    CAST(length(a.text) AS BIGINT) AS len_a,
           |    CAST(length(b.text) AS BIGINT) AS len_b,
           |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
           |    round(1.0 - levenshtein(a.text, b.text)::DOUBLE /
           |      greatest(length(a.text), length(b.text))::DOUBLE, 6) AS sim
           |  FROM cand c JOIN documents a ON c.doc_a = a.doc_id
           |    JOIN documents b ON c.doc_b = b.doc_id)
           |SELECT doc_a, doc_b, len_a, len_b, lev, sim,
           |  CAST(sim >= $EditSimThreshold AS INT) AS kept
           |FROM ed ORDER BY doc_a, doc_b""".stripMargin,

      "q120_lens_kappa" -> {
        val prod = "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
        val poRaw = "((n11 + n00)::DOUBLE / n_pairs::DOUBLE)"
        val peRaw = s"($prod::DOUBLE / (n_pairs * n_pairs)::DOUBLE)"
        s"""WITH $lshCandCtes,
           |v AS (
           |  SELECT
           |    CAST(round(${jaccardSql("a.hs", "b.hs")}, 6) >= $JaccardThreshold
           |      AS BIGINT) AS ja,
           |    CAST(round(1.0 - levenshtein(da.text, db.text)::DOUBLE /
           |        greatest(length(da.text), length(db.text))::DOUBLE, 6) >=
           |      $EditSimThreshold AS BIGINT) AS ed
           |  FROM cand c JOIN sh a ON c.doc_a = a.doc_id
           |    JOIN sh b ON c.doc_b = b.doc_id
           |    JOIN documents da ON c.doc_a = da.doc_id
           |    JOIN documents db ON c.doc_b = db.doc_id),
           |t AS (SELECT COUNT(*)::BIGINT AS n_pairs,
           |    CAST(COALESCE(SUM(ja * ed), 0) AS BIGINT) AS n11,
           |    CAST(COALESCE(SUM(ja * (1 - ed)), 0) AS BIGINT) AS n10,
           |    CAST(COALESCE(SUM((1 - ja) * ed), 0) AS BIGINT) AS n01,
           |    CAST(COALESCE(SUM((1 - ja) * (1 - ed)), 0) AS BIGINT) AS n00
           |  FROM v)
           |SELECT n_pairs, n11 AS both_dup, n10 AS jaccard_only,
           |  n01 AS edit_only, n00 AS neither,
           |  CASE WHEN n_pairs > 0 THEN round($poRaw, 6) END AS po,
           |  CASE WHEN n_pairs > 0 THEN round($peRaw, 6) END AS pe,
           |  CASE WHEN n_pairs > 0 AND n_pairs * n_pairs > $prod
           |    THEN round(($poRaw - $peRaw) / (1.0 - $peRaw), 6) END AS kappa
           |FROM t""".stripMargin
      },

      "q31_dedup_survivors" ->
        s"""WITH RECURSIVE $lshPairsCtes,
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
           |ORDER BY d.doc_id""".stripMargin,

      "q71_quality_survivors" -> {
        val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
        val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
        s"""WITH RECURSIVE $lshPairsCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM edges
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
           |enriched AS (${TextQueries.enrichedSql}),
           |qual AS (
           |  SELECT doc_id,
           |    ${graft.functions.TextFunctions.qualityScoreSql(
                  "n_tokens", "n_distinct", stopRatio, avgTokLen)} AS quality
           |  FROM enriched),
           |labels AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
           |           FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
           |r AS (SELECT l.doc_id, l.component, q.quality,
           |    ROW_NUMBER() OVER (PARTITION BY l.component
           |      ORDER BY q.quality DESC, l.doc_id ASC) AS rk
           |  FROM labels l JOIN qual q ON l.doc_id = q.doc_id)
           |SELECT doc_id, component, quality, CAST(rk = 1 AS INT) AS is_survivor
           |FROM r ORDER BY doc_id""".stripMargin
      },

      "q83_dup_pagerank" -> {
        val dmp = graft.operators.PageRank.Damping
        val tel = graft.operators.PageRank.Teleport
        // one CTE pair per unrolled round, mirroring the Scala loop
        // op-for-op: the neighbor sum routes through DECIMAL(28,12)
        // and the teleport/damping affine runs on the summed double,
        // with the constants interpolated from the SAME fields so both
        // engines parse identical double literals
        val roundCtes = (1 to PageRankRounds).map { i =>
          s"r${i}m AS (SELECT e.dst AS id, " +
            s"CAST(SUM(CAST(r${i - 1}.rank / deg.degree AS DECIMAL(28,12))) AS DOUBLE) AS m " +
            s"FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.id " +
            s"JOIN deg ON e.src = deg.id GROUP BY e.dst),\n" +
            s"r$i AS (SELECT id, $tel / n_nodes + $dmp * m AS rank " +
            s"FROM r${i}m CROSS JOIN nn)"
        }.mkString(",\n")
        val rf = s"r$PageRankRounds"
        s"""WITH $lshPairsCtes,
           |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |          UNION ALL SELECT doc_b, doc_a FROM pairs),
           |deg AS (SELECT src AS id, COUNT(*) AS degree FROM edges GROUP BY src),
           |nn AS (SELECT COUNT(*)::DOUBLE AS n_nodes FROM deg),
           |r0 AS (SELECT id, 1.0 / n_nodes AS rank FROM deg CROSS JOIN nn),
           |$roundCtes
           |SELECT d.id AS doc_id, d.degree::BIGINT AS degree,
           |  round($rf.rank, 6) AS rank
           |FROM $rf JOIN deg d ON $rf.id = d.id
           |ORDER BY round($rf.rank, 6) DESC, doc_id ASC
           |LIMIT $PageRankTopK""".stripMargin
      },

      "q67_cluster_stats" ->
        s"""WITH RECURSIVE $lshPairsCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM edges
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
           |labels AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
           |           FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
           |clusters AS (SELECT component, COUNT(*) AS cluster_size
           |             FROM labels GROUP BY component)
           |SELECT cluster_size, COUNT(*) AS n_clusters,
           |  CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs,
           |  CAST(COUNT(*) * (cluster_size - 1) AS BIGINT) AS n_removed
           |FROM clusters GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

      "q20_simhash" -> {
        val tokHashes = s"list_transform(${tokensSql("text")}, t -> ${charHashSql("t")})"
        val chunkSelects = (0 until SimhashChunks).map { c =>
          s"SELECT doc_id, sig, $c AS c, (sig >> ${c * SimhashChunkBits}) & ${(1L << SimhashChunkBits) - 1} AS v FROM sigs"
        }.mkString(" UNION ALL ")
        s"""WITH sigs AS (SELECT doc_id, ${simhashSql(tokHashes)} AS sig FROM documents),
           |chunks AS ($chunkSelects),
           |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           |    x.sig AS sig_a, y.sig AS sig_b
           |  FROM chunks x JOIN chunks y
           |  ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id)
           |SELECT doc_a, doc_b, ${hammingSql("sig_a", "sig_b")} AS ham
           |FROM cand WHERE ${hammingSql("sig_a", "sig_b")} <= $HammingMax
           |ORDER BY doc_a, doc_b""".stripMargin
      },

      // q73 probes the PERSISTED artifact but must land on exactly the
      // incremental-dedup answer — same oracle text as q59
      "q73_band_index_probe" -> incrementalDedupOracle,

      "q59_incremental_dedup" -> incrementalDedupOracle,

      "q21_embedding_neardup" ->
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings)
           |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |  round((1.0 +
           |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
           |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
           |    / 2.0, 6) AS score
           |FROM e a JOIN e b ON a.vec_id < b.vec_id
           |ORDER BY score DESC, vec_a ASC, vec_b ASC LIMIT 20""".stripMargin,

      // the same recursive-components construction as q67's oracle,
      // with each doc's split from the shared SplitPair hash
      "q124_component_split" -> {
        val (a, b) = SplitPair
        def bucket(e: String) = s"((($a * $e + $b) % $P) % 100)"
        def splitOf(e: String) =
          s"CASE WHEN ${bucket(e)} < 80 THEN 'train' " +
            s"WHEN ${bucket(e)} >= 90 THEN 'test' ELSE 'val' END"
        s"""WITH RECURSIVE $lshPairsCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM edges
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
           |labels AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
           |           FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
           |sp AS (SELECT doc_id, component,
           |  ${splitOf("doc_id")} AS dsplit,
           |  ${splitOf("component")} AS csplit
           |  FROM labels),
           |pc AS (
           |  SELECT component,
           |    COUNT(DISTINCT dsplit)::BIGINT AS nd,
           |    COUNT(DISTINCT csplit)::BIGINT AS nc,
           |    MAX(CASE WHEN dsplit = 'train' THEN 1 ELSE 0 END) AS dtr,
           |    MAX(CASE WHEN dsplit = 'test' THEN 1 ELSE 0 END) AS dte,
           |    MAX(CASE WHEN csplit = 'train' THEN 1 ELSE 0 END) AS ctr,
           |    MAX(CASE WHEN csplit = 'test' THEN 1 ELSE 0 END) AS cte
           |  FROM sp GROUP BY component),
           |ca AS (SELECT COUNT(*)::BIGINT AS n_components,
           |    CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS straddle_doc,
           |    CAST(SUM(CASE WHEN nc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS straddle_comp,
           |    CAST(SUM(CASE WHEN dtr = 1 AND dte = 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaky_doc,
           |    CAST(SUM(CASE WHEN ctr = 1 AND cte = 1 THEN 1 ELSE 0 END) AS BIGINT) AS leaky_comp
           |  FROM pc),
           |sc AS (SELECT COUNT(*)::BIGINT AS n_docs,
           |    CAST(SUM(CASE WHEN csplit = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           |    CAST(SUM(CASE WHEN csplit = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           |    CAST(SUM(CASE WHEN csplit = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
           |  FROM sp)
           |SELECT n_docs, n_components, n_train, n_val, n_test,
           |  straddle_doc, leaky_doc, straddle_comp, leaky_comp
           |FROM ca CROSS JOIN sc""".stripMargin
      },

      "q100_split_leakage" -> {
        val (a, b) = SplitPair
        val bucket = s"((($a * doc_id + $b) % $P) % 100)"
        s"""WITH RECURSIVE $lshPairsCtes,
           |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           |          UNION SELECT doc_b, doc_a FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM edges
           |  UNION
           |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
           |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
           |labels AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
           |           FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
           |sp AS (SELECT doc_id, component,
           |  CASE WHEN $bucket < 80 THEN 'train'
           |       WHEN $bucket >= 90 THEN 'test' ELSE 'val' END AS split
           |  FROM labels),
           |cl AS (
           |  SELECT component, COUNT(*) AS cluster_size,
           |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           |    CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
           |  FROM sp GROUP BY component)
           |SELECT component, cluster_size, n_train, n_val, n_test,
           |  CAST(n_test > 0 AND n_train > 0 AS BIGINT) AS leaks
           |FROM cl WHERE cluster_size > 1 ORDER BY component""".stripMargin
      },
    )
  }

  private lazy val incrementalDedupOracle: String =
        s"""WITH $lshPairsCtes,
           |tp AS (SELECT doc_a AS doc_id, doc_b AS partner FROM pairs
           |       UNION ALL SELECT doc_b, doc_a FROM pairs),
           |np AS (SELECT doc_id, partner FROM tp WHERE doc_id % 10 = 7),
           |agg AS (
           |  SELECT doc_id,
           |    CAST(SUM(CASE WHEN partner % 10 <> 7 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_dup_old,
           |    CAST(SUM(CASE WHEN partner % 10 = 7 AND partner < doc_id
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_new_prior
           |  FROM np GROUP BY doc_id)
           |SELECT d.doc_id, d.lang,
           |  COALESCE(a.n_dup_old, 0) AS n_dup_old,
           |  COALESCE(a.n_dup_new_prior, 0) AS n_dup_new_prior,
           |  CAST(COALESCE(a.n_dup_old, 0) = 0 AND COALESCE(a.n_dup_new_prior, 0) = 0
           |    AS BIGINT) AS accepted
           |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
           |WHERE d.doc_id % 10 = 7
           |ORDER BY d.doc_id""".stripMargin
}

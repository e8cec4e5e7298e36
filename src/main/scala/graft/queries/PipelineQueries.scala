package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._
import graft.functions.TextFunctions._
import graft.queries.TextQueries.{ChunkSize, ChunkStride, shingleSql, shingleCol}

/** Training-data-pipeline queries (north-star extension surface — the
  * reference, server.py:85-91, reads a prepared corpus; these are the
  * operators that PREPARE one).
  *
  * q41: per-document TF-IDF top terms — the classic relevance weighting
  *      (Spärck Jones idf), the feature a keyword indexer materializes.
  * q42: sequence packing — q39's overlapping chunks packed into
  *      fixed-token-budget bins, the step that turns documents into
  *      dense training batches.
  * q43: end-to-end curation — quality filter × near-dup survivor ×
  *      train/val/test split, composed from the already-verified
  *      operators into the one query a data curator actually ships.
  * q44: stratified sampling — per-language deterministic hash sampling
  *      at per-stratum rates (rebalancing a multilingual corpus).
  * q45: n-gram frequency — top bigrams by count (corpus statistics /
  *      contamination screens run this shape).
  * q46: salted skew join ([[graft.operators.SkewJoin]]) — the skew
  *      tool oracle-checked against the plain join it must equal.
  * q50: repetition filter (Gopher-style screen) — top-token and
  *      duplicate-shingle fractions vs thresholds.
  * q51: weighted sampling — Duffield/Lund/Thorup priority sampling
  *      with the portable hash as the uniform draw.
  *
  * Scale shapes: q41/q45/q50 are explode → map-side-combined groupBy
  * (wordcount); q42 is one window over (pack_group, doc, chunk) — the
  * group key bounds every partition's state; q43 reuses the cached
  * shingle/LSH artifacts and adds only broadcast-sized joins; q44/q51
  * are single scans (q51 ends in TakeOrderedAndProject); q46 trades
  * one replicated dim for straggler-free tasks.
  */
object PipelineQueries {

  /** q41: rank cutoff for per-doc top terms. */
  val TfidfTopK = 3

  /** q42: token budget per packed bin, and the modulus that spreads
    * packing across independent groups (each group packs its own chunk
    * stream — at 100 TB, packing parallelism = number of groups, and a
    * group is processed by one window partition, never the whole
    * corpus in one task). */
  val PackBudget = 256L
  val PackGroups = 8L

  /** q43: curation quality cutoff (median-ish on the fixture corpus, so
    * the filter is non-degenerate — roughly half the docs pass). */
  val QualityThreshold = 0.61

  /** q44: per-language sampling rates in percent (default for unlisted
    * languages deliberately absent — the fixture's five langs are all
    * listed; an unlisted lang samples at 0, i.e. drops). */
  val SampleRates: Seq[(String, Int)] =
    Seq("de" -> 20, "en" -> 80, "es" -> 40, "fr" -> 60, "zh" -> 30)

  /** q45: how many top bigrams to keep. */
  val BigramTopN = 20

  /** Vocabulary entries reported by q70's coverage table. */
  val VocabTopN = 50

  /** q77: BPE merge rounds learned (kept small so the oracle's
    * unrolled round-CTE chain stays readable; the operator itself is
    * O(rounds) with a constant per-round plan). */
  val BpeRounds = 8

  /** Write-once-per-session learned merge table for q78 — the
    * TRAIN-once / ENCODE-many tokenizer lifecycle (the same split as
    * the q73/q75 index artifacts): q77 measures the training loop
    * itself, q78 pays apply cost against the session's fitted merges. */
  private val sessionMerges =
    new graft.SessionMemo[String, Seq[graft.operators.BpeTrain.Merge]]

  private def bpeMerges(s: SparkSession, dir: String): Seq[graft.operators.BpeTrain.Merge] =
    sessionMerges.getOrCompute(s, dir) {
      val words = KeywordQueries.tokenizedDocs(s, dir)
        .select(explode(col("toks")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      graft.operators.BpeTrain.learnMerges(words, "word", "freq", BpeRounds)
    }

  /** q50 repetition-filter cutoffs (Rae et al.'s Gopher rules use the
    * same two signal families): flag a doc when its most frequent token
    * exceeds [[TopTokMax]] of all tokens, or when more than
    * [[DupShingleMax]] of its 3-token shingles are repeats. Values sit
    * at ~p90/p98 of the fixture distribution so the filter is
    * non-degenerate in both directions. */
  val TopTokMax = 0.14
  val DupShingleMax = 0.01

  /** q46: salt fan-out. */
  val SaltParts = 8

  /** q91 slice budget in tokens: ~2k tokens per slice gives ~13 slices
    * at sf0.01 (≈27k corpus tokens) and ~130 at sf0.1 — non-degenerate
    * at every fixture SF. A production run sets this to the tokens one
    * optimizer step (or checkpoint interval) consumes. */
  val SliceBudget = 2048L

  /** q51: how many docs the weighted sample keeps. */
  val PrioritySampleK = 20

  /** q95 spectral-signature geometry: 2 power-iteration rounds keeps
    * the oracle's unrolled CTE tractable while exercising a full
    * y=A·x → x'=Aᵀ·y → normalize → repeat cycle (the q85/q86
    * unrolled-iteration precedent); 20 terms surfaced. */
  val SpectralIters = 2
  val SpectralTopK = 20

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.tbl(s, dir, "documents")

  /** Shared DuckDB twin of the BPE training loop (q77 + q78's oracles):
    * `BpeRounds` rounds unrolled as a CTE chain. Every expression is
    * the literal twin of the Spark side — double-space symbol encoding,
    * adjacent-pair extraction, (count desc, pair asc) argmax, single
    * plain-replace merge application — and each w_r carries the raw
    * `word` alongside its evolving `sym`, so the final round's table is
    * simultaneously the merge history (b_r) and the encoded vocab
    * (w_N). Starts with `dd` (tokenized docs), so consumers can also
    * reuse that. */
  private lazy val bpeOracleCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val prev = s"w${r - 1}"
      s"""p$r AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (
         |    SELECT unnest(list_transform(range(len(ss) - 1),
         |      i -> ss[i+1] || ' ' || ss[i+2])) AS pair, freq
         |    FROM (SELECT list_filter(string_split(sym, '  '), x -> x != '') AS ss,
         |          freq FROM $prev))
         |  GROUP BY pair),
         |b$r AS (SELECT CAST($r AS BIGINT) AS round, pair,
         |    replace(pair, ' ', '') AS merged, n
         |  FROM p$r ORDER BY n DESC, pair ASC LIMIT 1),
         |w$r AS (
         |  SELECT word, replace(sym, ' ' || replace(b.pair, ' ', '  ') || ' ',
         |      ' ' || replace(b.pair, ' ', '') || ' ') AS sym, freq
         |  FROM $prev, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""dd AS (${KeywordQueries.tokenizedDocsSql}),
       |words AS (
       |  SELECT word, COUNT(*)::BIGINT AS freq FROM (
       |    SELECT unnest(toks) AS word FROM dd) GROUP BY word),
       |w0 AS (
       |  SELECT word, '  ' || array_to_string(
       |      list_filter(string_split(word, ''), c -> c != ''), '  ') || '  ' AS sym,
       |    freq FROM words),
       |$rounds""".stripMargin
  }

  /** decimal-routed deterministic sum of a double expression */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 10) =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q41_tfidf_topterms" -> ((s, dir) =>
      // scale/shuffle shape documented on the operator; tfidf rounds to
      // 6 dp BEFORE ranking (engine-wide convention), so rank can't
      // flip on a 1-ulp ln() difference between engines
      graft.operators.TfIdf
        .topTerms(KeywordQueries.tokenizedDocs(s, dir), TfidfTopK)
        .orderBy(col("doc_id"), col("rank"))),

    "q95_spectral_terms" -> ((s, dir) =>
      // corpus topic signature: the dominant LSA component of the
      // doc×term tf-idf matrix by distributed power iteration
      // (operators/Spectral — matvecs as groupBy aggregations, the
      // term vector broadcast, the doc vector shuffle-joined on
      // doc_id). The oracle unrolls both iterations op-for-op, so
      // hash-green certifies the matvec arithmetic, the max-scaling,
      // and the ranking — the q85/q86 unrolled-iteration gate.
      graft.operators.Spectral.topSignature(
        graft.operators.TfIdf.weights(KeywordQueries.tokenizedDocs(s, dir)),
        SpectralIters, SpectralTopK)),

    "q42_packing" -> ((s, dir) => {
      // chunk geometry is q39's (ChunkSize window / ChunkStride step);
      // bin assignment is the running token count before each chunk,
      // integer-divided by the budget — a greedy packer whose only
      // cross-row state is one window sum per pack group
      val st = ChunkStride
      val cs = ChunkSize
      val chunks = KeywordQueries.tokenizedDocs(s, dir)
        .select(col("doc_id"), col("dl").cast("long").as("n_toks"))
        .withColumn("n_chunks", expr(s"(n_toks + ${st - 1}) div $st"))
        .filter(col("n_chunks") > 0)
        .withColumn("i", explode(sequence(lit(0L), col("n_chunks") - 1)))
        .withColumn("chunk_toks",
          least(lit(cs.toLong), col("n_toks") - col("i") * st))
      val assigned = graft.operators.Packing.assignBins(chunks,
        packGroup = pmod(col("doc_id"), lit(PackGroups)),
        orderBy = Seq(col("doc_id"), col("i")),
        tokenCol = col("chunk_toks"), budget = PackBudget)
      graft.operators.Packing.binStats(assigned, "doc_id", col("chunk_toks"))
        .orderBy(col("pack_group"), col("bin"))
    }),

    "q43_curation_pipeline" -> ((s, dir) => {
      // the whole curation funnel in one plan: per-doc quality (row-
      // local math) → near-dup survivor (cached LSH pairs + components)
      // → deterministic split — then the per-(split, lang) manifest a
      // training run consumes
      val enriched = TextQueries.enriched(s, dir)
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      val avgTokLen = col("char_sum").cast("double") / col("n_tokens")
      val qual = enriched
        .withColumn("quality",
          qualityScore(col("n_tokens"), col("n_distinct"), stopRatio, avgTokLen))
        .filter(col("quality") >= QualityThreshold)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
      val surv = DedupQueries.survivorLabels(s, dir)
        .filter(col("is_survivor"))
        .select(col("doc_id"))
      val (a, b) = SplitPair
      qual.join(surv, "doc_id")
        .withColumn("bucket", ((lit(a) * col("doc_id") + lit(b)) % lit(P)) % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(sum(col("quality").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("avg_quality"))
        .orderBy(col("split"), col("lang"))
    }),

    "q69_export_manifest" -> ((s, dir) => {
      // the ship-it plan: everything that actually reaches the trainer,
      // as ONE Catalyst plan composing the full pipeline — quality gate
      // × near-dup survivor × train split (q43's funnel) × benchmark
      // decontamination (drop the train docs that leak the test split).
      // The contamination screen runs in its 100 TB shape: the
      // train-side shingle explode is prefiltered by the broadcast
      // benchmark sketch (q65's memoized artifact) BEFORE its exchange,
      // so the membership join shuffles bloom survivors only; sketch
      // FPs die in the exact hash join, FNs are impossible, so output
      // is identical to the sketch-free formulation (the oracle).
      val enriched = TextQueries.enriched(s, dir)
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      val avgTokLen = col("char_sum").cast("double") / col("n_tokens")
      val (a, b) = SplitPair
      val bucket = ((lit(a) * col("doc_id") + lit(b)) % lit(P)) % 100
      val train = enriched
        .withColumn("quality",
          qualityScore(col("n_tokens"), col("n_distinct"), stopRatio, avgTokLen))
        .filter(col("quality") >= QualityThreshold && bucket < 80)
        .join(DedupQueries.survivorLabels(s, dir)
          .filter(col("is_survivor")).select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"))
      val ws = DedupQueries.hashedShingles(s, dir)
      val testHs = ws.filter(bucket >= 90).select(explode(col("hs")).as("h")).distinct()
      val bloom = CurationQueries.benchmarkBloom(s, dir)
      val nHit = ws.filter(bucket < 80)
        .select(col("doc_id"), explode(col("hs")).as("h"))
        .filter(graft.expressions.BloomExpressions.mightContain(col("h"), bloom))
        .join(testHs, "h")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      val contaminated = nHit
        .join(ws.filter(bucket < 80)
          .select(col("doc_id"), size(col("hs")).cast("long").as("n_sh")), "doc_id")
        .filter(round(col("n_hit").cast("double") / col("n_sh"), 6) >=
          CurationQueries.ContaminationMax)
        .select(col("doc_id"))
      train.join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(sum(col("quality").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("avg_quality"))
        .orderBy(col("lang"))
    }),

    "q44_stratified_sample" -> ((s, dir) => {
      val (a, b) = SamplePair
      val rate = SampleRates.foldRight(lit(0)) { case ((lang, r), other) =>
        when(col("lang") === lang, lit(r)).otherwise(other)
      }
      docs(s, dir)
        .withColumn("bucket", ((lit(a) * col("doc_id") + lit(b)) % lit(P)) % 100)
        .withColumn("rate_pct", rate)
        .withColumn("sampled", col("bucket") < col("rate_pct"))
        .groupBy(col("lang"), col("rate_pct").cast("long").as("rate_pct"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(col("sampled"), 1L).otherwise(0L)).cast("long").as("n_sampled"),
          min(when(col("sampled"), col("doc_id"))).as("min_sampled"),
          max(when(col("sampled"), col("doc_id"))).as("max_sampled"))
        .orderBy(col("lang"))
    }),

    "q45_bigram_top" -> ((s, dir) => {
      // wordcount shape: row-local shingling, explode, map-side-combined
      // count, global top-n via TakeOrderedAndProject. Shingles come off
      // the shared repartitioned token cache: the corpus parquet can
      // arrive as ONE split, and the interpreted higher-order shingling
      // pass must not run single-threaded
      KeywordQueries.tokenizedDocs(s, dir)
        .select(explode(shingleCol(col("toks"), 2)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(BigramTopN)
    }),

    "q70_vocab_coverage" -> ((s, dir) => {
      // the vocabulary-build report (the BPE-prep step): token counts →
      // rank by frequency → running coverage of total token mass — the
      // table that answers "how many vocab entries cover 95% of the
      // corpus". Shape: wordcount (map-side-combined groupBy) collapses
      // the corpus to VOCAB-sized data; the global rank/cumsum then
      // runs as the DISTRIBUTED two-pass cumulative sum
      // ([[graft.operators.RankedCumsum]]): range-partitioned parallel
      // sort, per-partition subtotals prefix-summed on the driver as
      // offsets, no single-partition window anywhere (plan-guarded) —
      // a web-scale BPE vocab is 10⁷–10⁸ distinct tokens, which no one
      // task should sort. Ties broken (count desc, token asc) for
      // total determinism.
      val counts = KeywordQueries.tokenizedDocs(s, dir)
        .select(explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
      graft.operators.RankedCumsum.tokenCoverage(counts, VocabTopN)
        .select(col("rank"), col("token"), col("n"),
          round(col("cum_n").cast("double") / col("total_n"), 6).as("cum_coverage"))
        .orderBy(col("rank"))
    }),

    "q91_epoch_slices" -> ((s, dir) => {
      // the training-loader manifest: documents in deterministic
      // shuffled order (the dedicated ShufflePair hash — uncorrelated
      // with split/sample/mix/shard, so no pipeline decision leaks
      // into batch composition), cut into contiguous fixed-token-
      // budget slices by the running token sum BEFORE each doc — the
      // unit a training run checkpoints at and resumes from ("skip
      // the first k slices" is exact, needs no re-scan of data).
      // Shape: the global order + running sum is the DISTRIBUTED
      // two-pass cumsum (RankedCumsum.epochSlices — range-partitioned
      // parallel sort, driver-prefix offsets, no single-partition
      // window); slice assignment is exact integer division, so the
      // report is all-integer and the window-cumsum oracle is exact.
      val rows = TextQueries.enriched(s, dir)
        .select(affine(ShufflePair, col("doc_id")).as("h"),
          col("doc_id"), col("n_tokens").as("n"))
      graft.operators.RankedCumsum.epochSlices(rows, SliceBudget)
        .groupBy(col("slice"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"),
          min_by(col("doc_id"), col("rank")).as("first_doc"),
          max_by(col("doc_id"), col("rank")).as("last_doc"))
        .orderBy(col("slice"))
    }),

    "q77_bpe_merges" -> ((s, dir) => {
      // the actual BPE merge-learning loop (q70 reports the vocab this
      // prepares): corpus → distinct-word frequencies ONCE (wordcount,
      // map-side-combined), then BpeRounds rounds of pair-count →
      // broadcast best merge → row-local re-pair. Each round is exactly
      // one vocab-sized shuffle + a narrow map — no shuffle growth
      // across rounds (lineage truncated by the operator) — and the
      // driver holds only the merge table. Deterministic tie-break
      // (count desc, pair asc) makes the whole table hash-exact
      // oracle-checkable: the DuckDB twin unrolls the same rounds as a
      // CTE chain over the identical double-space replace encoding
      // (see BpeTrain's scaladoc for why that encoding IS classic
      // greedy BPE).
      val words = KeywordQueries.tokenizedDocs(s, dir)
        .select(explode(col("toks")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      graft.operators.BpeTrain.learnMergesDF(words, "word", "freq", BpeRounds)
        .orderBy(col("round"))
    }),

    "q78_bpe_encode" -> ((s, dir) => {
      // the ENCODE step of the trained tokenizer (q77 learns the
      // merges, this applies them): every DISTINCT word is encoded
      // exactly once — replaying the session's fitted merge table is
      // row-local string work over VOCAB-sized data, never the token
      // stream — and the per-(lang, word) token counts (map-side-
      // combined) join back on the word key to weight the statistics.
      // Output: per-language fertility report (tokens, chars, BPE
      // pieces, pieces per token) — the number a tokenizer team
      // actually tracks. At 100 TB the merge table is a persisted
      // artifact and this plan's only corpus-wide pass is the
      // wordcount; everything after is vocab-sized.
      val merges = bpeMerges(s, dir)
      val lw = KeywordQueries.tokenizedDocs(s, dir)
        .select(col("lang"), explode(col("toks")).as("word"))
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
      val enc = lw.select(col("word")).distinct()
        .withColumn("n_sym",
          graft.operators.BpeTrain.symbolCount(
            graft.operators.BpeTrain.encode(col("word"), merges)).cast("long"))
        .withColumn("n_char", length(col("word")).cast("long"))
      lw.join(enc, "word")
        .groupBy(col("lang"))
        .agg(
          sum(col("n")).cast("long").as("n_tokens"),
          sum(col("n") * col("n_char")).cast("long").as("n_chars"),
          sum(col("n") * col("n_sym")).cast("long").as("n_pieces"))
        .withColumn("pieces_per_token",
          round(col("n_pieces").cast("double") / col("n_tokens"), 6))
        .orderBy(col("lang"))
    }),

    "q50_repetition" -> ((s, dir) => {
      // repetition quality filter (the Gopher-style screen): per-doc
      // top-token fraction (one explode → two map-side-combined aggs)
      // and duplicate-shingle fraction (free from the cached distinct
      // shingle-hash sets: dup_frac = 1 - |distinct|/|total|). Both
      // fractions round to 6 dp before thresholding so flag decisions
      // can't flip on representation noise.
      val enr = TextQueries.enriched(s, dir)
      val topTok = enr
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_tok"))
      val dsh = DedupQueries.hashedShingles(s, dir)
        .select(col("doc_id"), size(col("hs")).cast("double").as("n_distinct_sh"))
      enr.select(col("doc_id"), col("lang"), col("n_tokens"))
        .join(topTok, "doc_id")
        .join(dsh, "doc_id")
        .withColumn("n3", greatest(col("n_tokens") - 2, lit(0L)).cast("double"))
        .withColumn("top_frac",
          round(col("top_tok").cast("double") / col("n_tokens"), 6))
        .withColumn("dup_frac",
          when(col("n3") > 0.0,
            round(lit(1.0) - col("n_distinct_sh") / col("n3"), 6))
            .otherwise(lit(0.0)))
        .withColumn("flagged",
          (col("top_frac") > TopTokMax || col("dup_frac") > DupShingleMax).cast("long"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("flagged")).cast("long").as("n_flagged"),
          round(sum(col("top_frac").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("avg_top_frac"),
          round(sum(col("dup_frac").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("avg_dup_frac"))
        .orderBy(col("lang"))
    }),

    "q51_priority_sample" -> ((s, dir) => {
      // weighted sampling without randomness: priority sampling
      // (Duffield/Lund/Thorup) with the portable affine hash standing in
      // for the uniform draw u = (h+1)/P. The emitted priority is
      // w/(h+1) = (w/u)/P — the textbook w/u scaled down by the
      // constant P, which preserves the ordering (and hence the sample)
      // while keeping the column ONE IEEE division of exact integers —
      // deterministic in both engines with no rounding convention
      // required. Longer documents are proportionally likelier to make
      // the sample, yet the sample is reproducible across runs, engines
      // and repartitions (the property corpus-mixing needs). Plan shape:
      // scan → row-local priority → global top-k (TakeOrderedAndProject).
      val (a, b) = SamplePair
      docs(s, dir)
        .withColumn("h", (lit(a) * col("doc_id") + lit(b)) % lit(P))
        .withColumn("priority",
          col("n_chars").cast("double") / (col("h") + lit(1L)).cast("double"))
        .orderBy(col("priority").desc, col("doc_id").asc)
        .limit(PrioritySampleK)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("priority"))
    }),

    "q46_salted_join" -> ((s, dir) => {
      // the salted join MUST equal the plain join — the oracle runs the
      // plain one, so the rerouting is verified end-to-end
      graft.operators.SkewJoin.saltedEquiJoin(
          graft.SparkEntry.tbl(s, dir, "lineitem"),
          graft.SparkEntry.tbl(s, dir, "orders"),
          "l_orderkey", "o_orderkey", SaltParts)
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy(col("o_year"))
        .agg(
          count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("o_year"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q41_tfidf_topterms" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM dd),
         |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tfc GROUP BY term),
         |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM dd),
         |scored AS (
         |  SELECT doc_id, term,
         |    round(tf::DOUBLE * ln(n_docs / df), 6) AS tfidf
         |  FROM tfc JOIN dfreq USING (term) CROSS JOIN stats),
         |ranked AS (
         |  SELECT doc_id, term, tfidf,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, tfidf FROM ranked
         |WHERE rank <= $TfidfTopK ORDER BY doc_id, rank""".stripMargin,

    // both power-iteration rounds unrolled op-for-op (the q85/q86 gate
    // construction): y=A·x and x'=Aᵀ·y as decimal-routed grouped sums,
    // max-scaling, 6-dp rounding between rounds — hash-green certifies
    // the distributed matvec arithmetic, not just the final ranking
    "q95_spectral_terms" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM dd),
         |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tfc GROUP BY term),
         |stats AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM dd),
         |w AS (
         |  SELECT doc_id, term, round(tf::DOUBLE * ln(n_docs / df), 6) AS tfidf
         |  FROM tfc JOIN dfreq USING (term) CROSS JOIN stats),
         |y1 AS (SELECT doc_id, CAST(SUM(CAST(tfidf AS DECIMAL(28,10))) AS DOUBLE) AS y
         |  FROM w GROUP BY doc_id),
         |x1r AS (SELECT term, CAST(SUM(CAST(w.tfidf * y1.y AS DECIMAL(28,10))) AS DOUBLE) AS xr
         |  FROM w JOIN y1 USING (doc_id) GROUP BY term),
         |m1 AS (SELECT MAX(abs(xr)) AS mx FROM x1r),
         |x1 AS (SELECT term, round(xr / mx, 6) AS score FROM x1r CROSS JOIN m1),
         |y2 AS (SELECT doc_id, CAST(SUM(CAST(w.tfidf * x1.score AS DECIMAL(28,10))) AS DOUBLE) AS y
         |  FROM w JOIN x1 USING (term) GROUP BY doc_id),
         |x2r AS (SELECT term, CAST(SUM(CAST(w.tfidf * y2.y AS DECIMAL(28,10))) AS DOUBLE) AS xr
         |  FROM w JOIN y2 USING (doc_id) GROUP BY term),
         |m2 AS (SELECT MAX(abs(xr)) AS mx FROM x2r),
         |x2 AS (SELECT term, round(xr / mx, 6) AS score FROM x2r CROSS JOIN m2)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, term ASC) AS BIGINT) AS rank,
         |  term, score
         |FROM x2 ORDER BY score DESC, term ASC LIMIT $SpectralTopK""".stripMargin,

    "q42_packing" -> {
      val st = ChunkStride
      val cs = ChunkSize
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |c AS (SELECT doc_id, CAST(dl AS BIGINT) AS n_toks,
         |    ((CAST(dl AS BIGINT) + ${st - 1}) // $st) AS n_chunks FROM dd
         |  WHERE ((CAST(dl AS BIGINT) + ${st - 1}) // $st) > 0),
         |ch AS (SELECT doc_id, n_toks, unnest(range(n_chunks)) AS i FROM c),
         |t AS (SELECT doc_id, i, least($cs, n_toks - i * $st) AS chunk_toks,
         |    doc_id % $PackGroups AS pack_group FROM ch),
         |packed AS (SELECT pack_group, doc_id, chunk_toks,
         |    COALESCE(SUM(chunk_toks) OVER (PARTITION BY pack_group
         |      ORDER BY doc_id, i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM t)
         |SELECT pack_group, CAST(cum_before // $PackBudget AS BIGINT) AS bin,
         |  COUNT(*) AS n_chunks,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(chunk_toks) AS BIGINT) AS total_tokens
         |FROM packed GROUP BY 1, 2 ORDER BY pack_group, bin""".stripMargin
    },

    "q43_curation_pipeline" -> {
      val (a, b) = SplitPair
      val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
      val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
      s"""WITH RECURSIVE ${DedupQueries.lshPairsCtes},
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
         |enriched AS (${TextQueries.enrichedSql}),
         |qual AS (
         |  SELECT doc_id, lang, n_tokens,
         |    ${qualityScoreSql("n_tokens", "n_distinct", stopRatio, avgTokLen)} AS quality
         |  FROM enriched),
         |surv AS (
         |  SELECT d.doc_id FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |  WHERE COALESCE(c.component, d.doc_id) = d.doc_id),
         |sel AS (
         |  SELECT q.doc_id, q.lang, q.n_tokens, q.quality,
         |    (($a * q.doc_id + $b) % $P) % 100 AS bucket
         |  FROM qual q JOIN surv s ON q.doc_id = s.doc_id
         |  WHERE q.quality >= $QualityThreshold)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  round(CAST(SUM(CAST(quality AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_quality
         |FROM sel GROUP BY 1, 2 ORDER BY split, lang""".stripMargin
    },

    "q69_export_manifest" -> {
      val (a, b) = SplitPair
      val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
      val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
      // the sketch-free exact formulation — the bloom prefilter in the
      // Spark plan is a pure physical reduction (FPs die in the exact
      // join, FNs impossible), so both engines compute this
      s"""WITH RECURSIVE ${DedupQueries.lshPairsCtes},
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS id, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
         |enriched AS (${TextQueries.enrichedSql}),
         |surv AS (
         |  SELECT d.doc_id FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         |  WHERE COALESCE(c.component, d.doc_id) = d.doc_id),
         |train AS (
         |  SELECT e.doc_id, e.lang, e.n_tokens,
         |    ${qualityScoreSql("n_tokens", "n_distinct", stopRatio, avgTokLen)} AS quality
         |  FROM enriched e JOIN surv s ON e.doc_id = s.doc_id
         |  WHERE ${qualityScoreSql("n_tokens", "n_distinct", stopRatio, avgTokLen)}
         |      >= $QualityThreshold
         |    AND (($a * e.doc_id + $b) % $P) % 100 < 80),
         |te AS (SELECT DISTINCT unnest(hs) AS h FROM sh
         |       WHERE (($a * doc_id + $b) % $P) % 100 >= 90),
         |tr AS (SELECT doc_id, unnest(hs) AS h FROM sh
         |       WHERE (($a * doc_id + $b) % $P) % 100 < 80),
         |ov AS (
         |  SELECT tr.doc_id, COUNT(*) AS n_sh,
         |    CAST(SUM(CASE WHEN te.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM tr LEFT JOIN te ON tr.h = te.h
         |  GROUP BY tr.doc_id),
         |contam AS (
         |  SELECT doc_id FROM ov
         |  WHERE round(n_hit::DOUBLE / n_sh, 6) >= ${CurationQueries.ContaminationMax})
         |SELECT t.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
         |  round(CAST(SUM(CAST(t.quality AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_quality
         |FROM train t
         |WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = t.doc_id)
         |GROUP BY t.lang ORDER BY t.lang""".stripMargin
    },

    "q44_stratified_sample" -> {
      val (a, b) = SamplePair
      val rateCase = SampleRates
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""WITH d AS (
         |  SELECT doc_id, lang,
         |    (($a * doc_id + $b) % $P) % 100 AS bucket,
         |    $rateCase AS rate_pct
         |  FROM documents)
         |SELECT lang, CAST(rate_pct AS BIGINT) AS rate_pct,
         |  COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  MIN(CASE WHEN bucket < rate_pct THEN doc_id END) AS min_sampled,
         |  MAX(CASE WHEN bucket < rate_pct THEN doc_id END) AS max_sampled
         |FROM d GROUP BY lang, rate_pct ORDER BY lang""".stripMargin
    },

    "q77_bpe_merges" ->
      s"""WITH $bpeOracleCtes
         |SELECT round, pair, merged, n
         |FROM (${(1 to BpeRounds).map(r => s"SELECT * FROM b$r").mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin,

    "q78_bpe_encode" ->
      // the final round's word table w{BpeRounds} IS the encoded vocab:
      // its sym column has every learned merge applied, so symbol
      // counts per distinct word come straight off it, weighted back by
      // the per-(lang, word) token counts
      s"""WITH $bpeOracleCtes,
         |enc AS (
         |  SELECT word,
         |    len(list_filter(string_split(sym, '  '), x -> x != ''))::BIGINT AS n_sym
         |  FROM w$BpeRounds),
         |g AS (
         |  SELECT lang, word, COUNT(*)::BIGINT AS n FROM (
         |    SELECT lang, unnest(toks) AS word FROM dd) GROUP BY lang, word)
         |SELECT lang,
         |  CAST(SUM(n) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n * len(word)) AS BIGINT) AS n_chars,
         |  CAST(SUM(n * n_sym) AS BIGINT) AS n_pieces,
         |  round(CAST(SUM(n * n_sym) AS DOUBLE) / SUM(n), 6) AS pieces_per_token
         |FROM g JOIN enc USING (word)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q70_vocab_coverage" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |tf AS (SELECT unnest(toks) AS token FROM dd),
         |c AS (SELECT token, COUNT(*) AS n FROM tf GROUP BY token),
         |r AS (SELECT token, n,
         |    ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank,
         |    CAST(SUM(n) OVER (ORDER BY n DESC, token ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         |    CAST(SUM(n) OVER () AS BIGINT) AS total_n
         |  FROM c)
         |SELECT rank, token, n, round(cum_n::DOUBLE / total_n, 6) AS cum_coverage
         |FROM r WHERE rank <= $VocabTopN ORDER BY rank""".stripMargin,

    "q91_epoch_slices" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |r AS (SELECT doc_id, ${affineSql(ShufflePair, "doc_id")} AS h,
         |    len(toks)::BIGINT AS n FROM dd),
         |o AS (SELECT doc_id, h, n,
         |    row_number() OVER (ORDER BY h, doc_id) AS rank,
         |    COALESCE(SUM(n) OVER (ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
         |  FROM r),
         |sl AS (SELECT *, cum_before // $SliceBudget AS slice FROM o)
         |SELECT slice, COUNT(*)::BIGINT AS n_docs, SUM(n)::BIGINT AS n_tokens,
         |  arg_min(doc_id, rank) AS first_doc, arg_max(doc_id, rank) AS last_doc
         |FROM sl GROUP BY slice ORDER BY slice""".stripMargin,

    "q45_bigram_top" ->
      s"""WITH sh AS (
         |  SELECT unnest(${shingleSql(tokensSql("text"), 2)}) AS bigram
         |  FROM documents)
         |SELECT bigram, COUNT(*) AS n FROM sh GROUP BY bigram
         |ORDER BY n DESC, bigram ASC LIMIT $BigramTopN""".stripMargin,

    "q50_repetition" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |tf AS (SELECT doc_id, unnest(toks) AS tok FROM dd),
         |tt AS (SELECT doc_id, MAX(c) AS top_tok FROM (
         |    SELECT doc_id, tok, COUNT(*) AS c FROM tf GROUP BY doc_id, tok)
         |  GROUP BY doc_id),
         |sh AS (${DedupQueries.hashedShinglesSql}),
         |base AS (
         |  SELECT d.doc_id, d.lang, len(d.toks)::BIGINT AS n_tokens, t.top_tok,
         |    len(s.hs)::DOUBLE AS n_distinct_sh,
         |    greatest(len(d.toks) - 2, 0)::DOUBLE AS n3
         |  FROM dd d JOIN tt t ON d.doc_id = t.doc_id JOIN sh s ON d.doc_id = s.doc_id),
         |frac AS (
         |  SELECT doc_id, lang,
         |    round(top_tok::DOUBLE / n_tokens, 6) AS top_frac,
         |    CASE WHEN n3 > 0.0 THEN round(1.0 - n_distinct_sh / n3, 6)
         |         ELSE 0.0 END AS dup_frac
         |  FROM base)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN top_frac > $TopTokMax OR dup_frac > $DupShingleMax
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  round(CAST(SUM(CAST(top_frac AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_top_frac,
         |  round(CAST(SUM(CAST(dup_frac AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_dup_frac
         |FROM frac GROUP BY lang ORDER BY lang""".stripMargin,

    "q51_priority_sample" -> {
      val (a, b) = SamplePair
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(n_chars AS DOUBLE) / CAST((($a * doc_id + $b) % $P) + 1 AS DOUBLE) AS priority
         |FROM documents
         |ORDER BY priority DESC, doc_id ASC LIMIT $PrioritySampleK""".stripMargin
    },

    "q46_salted_join" ->
      """SELECT year(o_orderdate)::BIGINT AS o_year,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._
import graft.functions.VectorFunctions._
import graft.SparkEntry.IngestOps

/** Round-5 curation operators — the remaining steps of a large-scale
  * training-data pipeline (north-star extensions; the reference,
  * server.py:85-91, queries a prepared corpus and has none of these).
  *
  * q52: test-set decontamination — for every test-split document, the
  *      fraction of its 3-token shingles that also occur anywhere in
  *      the train split (the screen run before publishing an eval set).
  * q53: domain mixing — largest corpus achieving an exact target
  *      language distribution, with deterministic hash-ranked document
  *      selection per stratum (the "data recipe" step of a pretrain run).
  * q54: inter-percentile length trim — drop each language's shortest
  *      5% and longest 5% by token count, rank-based so it is portable
  *      (no engine-specific quantile interpolation conventions).
  * q55: unigram log-likelihood scoring — average per-token
  *      log-probability under the corpus's own unigram LM; the cheap
  *      statistical anomaly screen (lowest-likelihood docs surface).
  * q56: kNN label vote — majority label of the k nearest train-split
  *      vectors for every test-split vector (auto-labeling /
  *      label-noise audit over the embedding space).
  *
  * Later-round additions: q62 OOV rate, q65 bloom-reduced decontam,
  * q79 boilerplate scrub + q80 PII redaction (operators/Scrub), and
  * q82 DSIR importance weights — hashed bag-of-bigrams log-ratio
  * selection of the most target-like pool documents (Xie et al.,
  * NeurIPS 2023), the data-selection step between quality filtering
  * and domain mixing.
  *
  * Scale shapes: q52 is explode → hash equi-join → two map-side-combined
  * aggregations (the train shingle set is corpus-sized, so it is NEVER
  * broadcast — the join shuffles on the shingle hash, exactly like a
  * 100 TB contamination screen must); q53/q54 are one window pass per
  * stratum plus broadcast-sized per-stratum take counts; q55 is
  * wordcount + a broadcast vocabulary join ending in a global top-k
  * (TakeOrderedAndProject); q56 broadcasts the small test side against
  * the streamed train side and ranks per test vector (WindowGroupLimit
  * keeps k candidates per partition before the full sort).
  */
object CurationQueries {

  /** Session-scoped memo of the q65 benchmark-shingle Bloom sketch,
    * keyed by the context's applicationId + corpus dir and evicted on
    * context end ([[graft.SessionMemo]]): a broadcast is only valid
    * within the SparkContext that created it, and must not outlive
    * it. */
  private[graft] val sessionBloom = new graft.SessionMemo[
    String, org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]]

  /** The broadcast Bloom sketch of the test-split (benchmark) shingle
    * hashes — the decontamination job's offline artifact, built once
    * per session+corpus and shared by every screen that probes it
    * (q65's corpus screen, q69's export funnel). */
  private[queries] def benchmarkBloom(s: SparkSession, dir: String)
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter] =
    sessionBloom.getOrCompute(s, dir) {
      val testHashes = DedupQueries.hashedShingles(s, dir)
        .filter(splitBucket(col("doc_id")) >= 90)
        .select(explode(col("hs")).as("h")).distinct()
      s.sparkContext.broadcast(testHashes.stat.bloomFilter(
        "h", math.max(testHashes.count(), 1000L), 0.01))
    }

  /** q52: a test doc is contaminated when at least this fraction of its
    * distinct 3-token shingles appears in the train split. Background
    * chance overlap on the fixture's word-soup corpus has median ~0.5
    * and p95 ~0.76; planted near-dups straddling the split sit at ~1.0
    * — 0.8 separates the two populations (non-degenerate both ways). */
  val ContaminationMax = 0.8

  /** q53: target mix in percent per language (sums to 100); unlisted
    * languages are excluded from the mix. */
  val MixTargets: Seq[(String, Int)] =
    Seq("de" -> 15, "en" -> 40, "es" -> 15, "fr" -> 15, "zh" -> 15)
  val MixTotal: Int = MixTargets.map(_._2).sum

  /** q54: drop below the p-th and above the (100-p)-th rank percentile. */
  val TrimPct = 5

  /** q55: how many lowest-likelihood docs to surface. */
  val UnigramBottomK = 20

  /** q90: bigram-LM anomaly screen — stupid-backoff discount (Brants
    * et al. 2007 use 0.4; any fixed constant works since scores are
    * only compared) and how many lowest-scoring test docs to surface.
    * The backoff argument is assembled as ONE product before the
    * single `ln`, so each score is one libm call on a bit-identical
    * double in both engines (the q55/q82 portability rule). */
  val StupidBackoffAlpha = "0.4"
  val BigramBottomK = 20

  /** q112: CCNet-style perplexity bucketing (Wenzek et al. 2020) —
    * each language is split into equal terciles by LM score:
    * `head` (most likely / lowest perplexity — CCNet keeps this),
    * `middle`, `tail` (usually dropped). Tercile membership is pure
    * integer rank arithmetic (r·3 vs n, no percentile interpolation
    * convention to match across engines). */
  val CcnetTerciles = 3

  /** q133: token-length histogram bin width for the sketch-cutpoint
    * trim (the q92 machinery applied to q54). 8 tokens keeps the
    * per-lang directory at (length range)/8 bins — bounded by the
    * value range, not the corpus — while the fixture's 10-99-token
    * docs still spread over ~12 bins (non-degenerate cutpoints). */
  val TrimBinW = 8L

  /** q134: LM-score bin width for the sketch-cutpoint terciles is
    * 1/CcnetBinInv = 1/512. The inverse is the stored constant so the
    * binning is `floor(avg_ll * 512)` — scaling a 6-dp double by a
    * power of two is EXACT in IEEE arithmetic, making the bin id
    * bit-identical across engines (dividing by a decimal literal
    * would not be). 1/512 resolves the fixture corpus score spread
    * (bulk of the mass sits in a ~0.03-wide band) into enough bins for
    * non-degenerate terciles; the directory stays
    * value-range-bounded at any corpus size (≈512·|score range| bins
    * per lang). */
  val CcnetBinInv = 512

  /** q143: hedge-style multiplicative-weights domain reweighting
    * (Freund & Schapire 1997 Hedge; the update DoReMi [Xie et al.
    * 2023] runs per minibatch against excess loss — here driven by
    * the corpus unigram-LM per-token NLL as the per-domain loss
    * proxy): w ← w·exp(η·excess), excess = nll − min(nll),
    * renormalized, HedgeRounds times. EXCESS loss (not raw NLL) is
    * both DoReMi's actual form and the numerically-safe one: exp
    * inputs stay in [0, η·spread] regardless of the losses' absolute
    * scale. Every round is emitted as its own column so the oracle
    * certifies each update, not just the fixed point. η is tuned to
    * the loss SPREAD (the fixture's cross-lang NLL spread is ~4e-3;
    * η = 200 makes exp inputs O(1) — the same η·excess ≈ O(1) regime
    * DoReMi reaches with η = 1 on its O(1) per-batch excesses). exp
    * outputs round to 9 dp before the decimal-routed normalizer sum
    * (the q55/q82 one-libm-call portability rule — a 1-ULP exp
    * divergence at these magnitudes is ~1e-15, killed by the rounding
    * except at measure-zero ties). */
  val HedgeRounds = 3
  val HedgeEta = 200.0

  /** q82: hashed-feature space size and how many top-importance docs
    * the selection reports. 4096 buckets keeps the ratio table
    * broadcast-sized at ANY corpus scale (the table is bounded by the
    * feature space, not the data). */
  val DsirBuckets = 4096
  val DsirTopK = 25

  /** q56: neighbors per vote. */
  val KnnVoteK = 5

  /** q86 trained-quality-classifier geometry: 2 full-batch GD
    * iterations keeps the oracle's unrolled CTE tractable while
    * exercising a full margin→residual→gradient→update→margin cycle
    * (the q85 precedent); lr = 0.5 is exactly representable in binary
    * so the literal prints identically into both engines. Feature
    * space = [[DsirBuckets]] — the same hashed-bigram buckets as DSIR,
    * making q82/q86 the two selection methods over one feature
    * pipeline. */
  val QcIters = 2
  val QcLr = 0.5

  /** q103 Moore-Lewis cross-entropy difference selection (Moore &
    * Lewis 2010): in-domain corpus = the documents of ONE source
    * (src0 — the fixture assigns sources round-robin, so it is a
    * 1/20 sample with every language represented), candidate pool =
    * every other source. The classic exact-unigram ancestor of q82's
    * DSIR (hashed-bigram importance ratio): where DSIR buckets the
    * feature space, Moore-Lewis scores each doc by its per-token
    * log-likelihood gap between the in-domain LM (add-1 smoothed over
    * the corpus vocabulary — the candidate pool contains words the
    * tiny in-domain corpus has never seen) and the general LM (MLE;
    * every corpus word is in it by construction). */
  val MlInDomainSource = "src0"
  val MlTopK = 50

  /** q106 epoch-capped token-budget allocation — the feasibility step
    * every published data recipe runs after computing target shares
    * (Llama/PaLM-style "repeat a domain at most E epochs"): the
    * temperature-scaled target mix (q94's α=1/2 recipe, here over
    * TOKEN counts) is infeasible when a low-resource domain's target
    * share exceeds EpochCap× its corpus size, so the allocator gives
    * each domain min(share·remaining, cap) and re-distributes the
    * stranded budget over unsaturated domains — [[AllocRounds]] fixed
    * rounds (the q83 fixed-depth-plan contract; each round at least
    * one domain saturates or the allocation completes, and the
    * fixture geometry completes in 3 at every SF — measured, with a
    * round-2 saturation at sf0.001 exercising the cascade). Budget =
    * 9/5 of corpus tokens (exact integer division) and EpochCap = 2
    * make ≥3 domains saturate and ≥1 not, at all three fixture SFs. */
  val AllocRounds = 3
  val AllocEpochCap = 2L
  val AllocBudgetNum = 9L
  val AllocBudgetDen = 5L

  /** q108 DSIR importance RESAMPLING — the selection step Xie et al.
    * 2023 actually run on their weights (q82 ranks; importance
    * resampling SAMPLES ∝ exp(weight), keeping diversity the
    * deterministic top-K throws away): q107's sampler with w_d =
    * exp(lr_d). Computed entirely in the LOG domain — maximizing the
    * ES key ln(u)/exp(lr) is minimizing ln(−ln u) − lr (the
    * exponential-race form: Exp(1)/w minimized), so no engine ever
    * calls libm exp and the weight's magnitude cannot overflow the
    * key. Draws come from [[graft.functions.PortableHash.DsirSamplePair]]
    * (independent of every other assignment). */
  val DsirSampleK = 50

  /** q107 weighted sampling without replacement (Efraimidis &
    * Spirakis 2006): key_d = ln(u_d)/w_d with u_d a per-doc uniform
    * draw in (0,1] and w_d the q14 quality score (> 0 by the formula's
    * 0.3·diversity floor) — the top-K keys ARE a weighted sample
    * without replacement, turning "sample 50M docs by quality" into
    * ONE distributed top-k (TakeOrderedAndProject — no shuffle of the
    * corpus, no sequential draw dependency). ln is monotone so ranking
    * ln(u)/w descending equals ranking u^(1/w) descending (the paper's
    * key), and u = ((a·id+b) mod P + 1)/(P+1) is never 0 or > 1. */
  val WsTopK = 100

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.tbl(s, dir, "documents")

  /** decimal-routed deterministic sum of a double expression */
  private def dsum(c: Column, scale: Int = 10): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  private def splitBucket(id: Column): Column = {
    val (a, b) = SplitPair
    ((lit(a) * id + lit(b)) % lit(P)) % 100
  }
  private def splitBucketSql(id: String): String = {
    val (a, b) = SplitPair
    s"((($a * $id + $b) % $P) % 100)"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q52_decontamination" -> ((s, dir) => {
      // the split hash MUST be q38/q43's SplitPair — decontamination is
      // only meaningful against the split the curation funnel ships.
      // Shingle sets come off the shared cached view (one hashing pass
      // per session); the membership probe is an EQUI-join on the
      // shingle hash — at 100 TB the train set is corpus-sized and the
      // join shuffles both sides on h, while at test scale Catalyst's
      // size estimate correctly downgrades it to a broadcast; the plan
      // guard asserts the hash-keyed shape, not the exchange choice.
      val ws = DedupQueries.hashedShingles(s, dir)
        .withColumn("bucket", splitBucket(col("doc_id")))
      val train = ws.filter(col("bucket") < 80)
        .select(explode(col("hs")).as("h"))
        .distinct()
        .withColumn("hit", lit(1L))
      val test = ws.filter(col("bucket") >= 90)
        .select(col("doc_id"), col("lang"), explode(col("hs")).as("h"))
      test.join(train, Seq("h"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("overlap",
          round(col("n_hit").cast("double") / col("n_sh"), 6))
        .withColumn("contaminated",
          (col("overlap") >= ContaminationMax).cast("long"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_test_docs"),
          sum(col("contaminated")).cast("long").as("n_contaminated"),
          round(sum(col("overlap").cast("decimal(28,6)")).cast("double") /
            count(lit(1)), 6).as("avg_overlap"))
        .orderBy(col("lang"))
    }),

    "q62_oov_rate" -> ((s, dir) => {
      // out-of-vocabulary rate of the test split against the train
      // split's vocabulary — the token-level twin of q52 (a tokenizer /
      // eval-set sanity metric). Same scalable shape: explode →
      // distinct vocab (shuffle on token) → hash equi-join membership
      // probe → map-side-combined per-lang aggregation.
      val tok = KeywordQueries.tokenizedDocs(s, dir)
        .withColumn("bucket", splitBucket(col("doc_id")))
      val vocab = tok.filter(col("bucket") < 80)
        .select(explode(col("toks")).as("tok")).distinct()
        .withColumn("seen", lit(1L))
      val test = tok.filter(col("bucket") >= 90)
        .select(col("doc_id"), col("lang"), explode(col("toks")).as("tok"))
      test.join(vocab, Seq("tok"), "left")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_test_tokens"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"),
          round(sum(when(col("seen").isNull, 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 6).as("oov_rate"))
        .orderBy(col("lang"))
    }),

    "q53_domain_mix" -> ((s, dir) => {
      // integer-exact throughout: T = min_l floor(count_l*W/w_l) is the
      // largest total size whose exact target allocation floor(T*w_l/W)
      // stays within every stratum; selection is rank-by-(hash, id)
      // inside each stratum — deterministic, uncorrelated with split
      // and sample membership (own affine member). 100 TB note: the
      // per-stratum rank is a sort of that stratum; when exact take
      // counts stop being worth a sort, the scale path selects by hash
      // THRESHOLD instead (keep h < t_l with t_l from a quantile sketch
      // of h) — same determinism, sort-free, approximate counts.
      val (a, b) = MixPair
      val wcase = MixTargets.foldRight(lit(0L)) { case ((l, w), other) =>
        when(col("lang") === l, lit(w.toLong)).otherwise(other)
      }
      val d = docs(s, dir)
        .withColumn("w", wcase).filter(col("w") > 0)
        .withColumn("h", (lit(a) * col("doc_id") + lit(b)) % lit(P))
      val counts = d.groupBy(col("lang"), col("w"))
        .agg(count(lit(1)).as("n_total"))
      val tmin = counts.agg(min(expr(s"n_total * $MixTotal div w")).as("t"))
      val takes = counts.crossJoin(broadcast(tmin))
        .withColumn("n_take", expr(s"t * w div $MixTotal"))
        .select(col("lang"), col("w"), col("n_total"), col("n_take"))
      val ranked = d.withColumn("rk",
        row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("h"), col("doc_id"))))
        .select(col("lang"), col("doc_id"), col("n_chars"), col("rk"))
      ranked.join(broadcast(takes), Seq("lang"))
        .withColumn("sel", col("rk") <= col("n_take"))
        .groupBy(col("lang"), col("w").as("target_pct"),
          col("n_total"), col("n_take"))
        .agg(
          sum(when(col("sel"), col("n_chars")).otherwise(lit(0L)))
            .cast("long").as("n_chars_sel"),
          min(when(col("sel"), col("doc_id"))).as("min_sel"),
          max(when(col("sel"), col("doc_id"))).as("max_sel"))
        .orderBy(col("lang"))
    }),

    "q54_length_trim" -> ((s, dir) => {
      // rank-based trim: keep r iff TrimPct < r*100/n <= 100-TrimPct
      // (strict integer comparisons, no interpolation convention to
      // match between engines). One window pass per language stratum;
      // at 100 TB the same trim runs sort-free by filtering against
      // per-stratum percentile BOUNDS from a quantile sketch — the
      // rank formulation is the exact-auditable variant.
      val tok = KeywordQueries.tokenizedDocs(s, dir)
        .select(col("doc_id"), col("lang"), col("dl").cast("long").as("n_tokens"))
      val ranked = tok
        .withColumn("r", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("n_tokens"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      ranked
        .withColumn("kept",
          col("r") * 100 > col("n") * TrimPct &&
            col("r") * 100 <= col("n") * (100 - TrimPct))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(col("kept").cast("long")).cast("long").as("n_kept"),
          min(when(col("kept"), col("n_tokens"))).as("min_kept_tokens"),
          max(when(col("kept"), col("n_tokens"))).as("max_kept_tokens"),
          round(sum(when(col("kept"), col("n_tokens")).otherwise(lit(0L))
            .cast("decimal(28,6)")).cast("double") /
            sum(col("kept").cast("long")), 6).as("avg_kept_tokens"))
        .orderBy(col("lang"))
    }),

    "q55_unigram_loglik" -> ((s, dir) => {
      // unigram LM scored on the corpus itself: ll(doc) = avg over token
      // instances of ln(c_tok / N). Vocabulary joins broadcast (a unigram
      // vocab stays small even at 100 TB); the per-doc sum routes
      // through decimal so partition order can't move the result; round
      // to 6 dp BEFORE the global bottom-k. The scoring pass is the
      // session-cached [[lmScored]] table shared with q112/q134 — one
      // corpus explode per session, three consumers.
      lmScored(s, dir)
        .orderBy(col("avg_ll").asc, col("doc_id").asc)
        .limit(UnigramBottomK)
        .select(col("doc_id"), col("lang"),
          col("dl").cast("long").as("n_tokens"), col("avg_ll"))
    }),

    "q90_bigram_lm" -> ((s, dir) => {
      // bigram LM with stupid backoff (Brants et al. 2007 — the web-
      // scale LM of choice precisely because its scores need no
      // normalization pass): TRAIN-split counts score TEST-split docs,
      // ll(w2|w1) = ln(c2/c1(w1)) when the bigram was seen, else
      // ln(alpha * (c1(w2)+1)/(N+V)) — add-1 smoothed unigram backoff,
      // so unseen-in-train words still score. q55's screen ranks docs
      // by how odd their WORDS are; this one ranks by how odd their
      // word ORDER is — the sequence-level anomaly surface. Shape:
      // count tables are map-side-combined groupBys bounded by (bigram)
      // vocabulary; the scoring joins are word-keyed equi-joins with
      // no static hint (at 100 TB the bigram table is
      // corpus-vocabulary-sized; the UNIGRAM directories of
      // q55/q103/q138 follow the same rule via AQE's runtime size
      // gate — see lmScored — a bigram directory is strictly bigger,
      // so it lands on the shuffle side of that gate);
      // the 1-row (N+V) scalar broadcasts; the per-doc sum routes
      // through decimal; round 6 dp before the global bottom-k heap.
      val toks = KeywordQueries.tokenizedDocs(s, dir)
        .withColumn("bucket", splitBucket(col("doc_id")))
      def pairs(df: DataFrame): DataFrame = df
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(transform(sequence(lit(0), size(col("toks")) - 2), i =>
            struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2")))).as("bg"))
        .select(col("doc_id"), col("lang"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val train = toks.filter(col("bucket") < 80)
      // localCheckpoint (r18, the RankedCumsum lineage rule): c1 feeds
      // the (N+V) scalar AND both unigram backoff joins — left lazy,
      // the train-split explode + count ran three times per
      // evaluation. Vocabulary-bounded rows; values untouched.
      val c1 = train.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c1"))
        .localCheckpoint()
      val stats = c1.agg((sum(col("c1")) + count(lit(1))).as("nv"))
      val c2 = pairs(train).groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
      pairs(toks.filter(col("bucket") >= 90))
        .join(c2, Seq("w1", "w2"), "left")
        .join(c1.select(col("w").as("w1"), col("c1").as("cw1")), Seq("w1"), "left")
        .join(c1.select(col("w").as("w2"), col("c1").as("cw2")), Seq("w2"), "left")
        .crossJoin(broadcast(stats))
        .withColumn("ll",
          when(col("c2").isNotNull,
            log(col("c2").cast("double") / col("cw1")))
          .otherwise(log(
            lit(StupidBackoffAlpha.toDouble) *
              ((coalesce(col("cw2"), lit(0L)) + 1).cast("double") / col("nv")))))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("ll").cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 6).as("avg_ll"))
        .orderBy(col("avg_ll").asc, col("doc_id").asc)
        .limit(BigramBottomK)
    }),

    "q112_ccnet_buckets" -> ((s, dir) => {
      // CCNet perplexity bucketing (Wenzek et al. 2020): score every
      // doc with the corpus unigram LM (q55's scoring pass — shares
      // the session-cached tokenization), split each LANGUAGE into
      // head/middle/tail terciles by score rank, and report the
      // per-bucket corpus profile a curation pipeline keys its
      // keep/drop policy on. Shape: the LM join broadcasts (unigram
      // vocab, the q55 argument); the tercile is a per-lang window —
      // same caveat as q54: exact-auditable rank formulation here;
      // q134 is the sketch-cutpoint variant that replaces the per-lang
      // sort at 100 TB; the final rollup is one map-side-combined
      // groupBy to ≤ langs×3 rows.
      val scored = lmScored(s, dir)
      val t = CcnetTerciles
      scored
        .withColumn("r", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("avg_ll").desc, col("doc_id").asc)))
        .withColumn("n_lang",
          count(lit(1)).over(Window.partitionBy(col("lang"))))
        .withColumn("bucket",
          when(col("r") * t <= col("n_lang"), "head")
            .when(col("r") * t <= col("n_lang") * 2, "middle")
            .otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("dl").cast("long")).cast("long").as("n_tokens"),
          min(col("avg_ll")).as("min_ll"),
          max(col("avg_ll")).as("max_ll"),
          round(sum(col("avg_ll").cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 6).as("mean_ll"))
        .orderBy(col("lang"), col("bucket"))
    }),

    "q143_hedge_mix" -> ((s, dir) => {
      // Hedge / multiplicative-weights domain reweighting (see
      // HedgeRounds scaladoc): per-language per-token NLL from the
      // session-cached LM scoring pass (lmScored — the third consumer)
      // is the loss; hard domains get UPWEIGHTED round by round
      // (DoReMi's excess-loss direction), the counter-pull to q94's
      // temperature smoothing. Shape: after the shared scoring pass,
      // ONE directory aggregation to ≤|langs| rows; every round's
      // normalizer is a whole-frame window aggregate over that bounded
      // table — zero corpus-sized work per round at any scale. Each
      // round's weights are output columns, so hash-green certifies
      // every multiplicative update.
      val d0 = lmScored(s, dir)
        .groupBy(col("lang"))
        .agg(sum(col("dl").cast("long")).as("n_toks"),
          sum(col("sum_ll").cast("decimal(28,12)")).cast("double").as("sll"))
        .withColumn("nll",
          round(-col("sll") / col("n_toks").cast("double"), 6))
        .drop("sll")
      // Each round's normalizer is a WHOLE-FRAME window over the
      // ≤|langs| domain table, not a crossJoin(broadcast(agg)) (the
      // pre-r18 shape): the fold's agg-of-prev + crossJoin-prev
      // embedded the previous round TWICE per round, so the physical
      // plan (and the executed work — no exchange reuse across the
      // agg/bare faces) doubled every round. One linear plan, one
      // domain aggregation, zero broadcast jobs. Safe at any corpus
      // size because the frame is domain-bounded (the q143 scale
      // argument is unchanged: corpus-sized work ends at d0's
      // groupBy); the non-foldable constant partition key is the
      // established single-partition-window trick (layoutFileStats).
      // The decimal window sums are the same associative decimal
      // arithmetic as the old 1-row aggregates — bit-identical.
      val wAll = Window.partitionBy(pmod(col("n_toks"), lit(1)))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val init = d0
        .withColumn("w",
          round(lit(1.0) / count(lit(1)).over(wAll).cast("double"), 6))
        .withColumn("excess",
          round(col("nll") - min(col("nll")).over(wAll), 6))
      val fin = (1 to HedgeRounds).foldLeft(init) { (prev, t) =>
        prev.withColumn("f",
            round(col("w") * exp(lit(HedgeEta) * col("excess")), 9))
          .withColumn("tf",
            sum(col("f").cast("decimal(28,12)")).over(wAll).cast("double"))
          .withColumn(s"w$t", round(col("f") / col("tf"), 6))
          .withColumn("w", col(s"w$t"))
          .drop("f", "tf")
      }
      fin.select(col("lang") +: col("n_toks") +: col("nll") +:
          col("excess") +: (1 to HedgeRounds).map(t => col(s"w$t")): _*)
        .orderBy(col("lang"))
    }),

    "q133_trim_sketch" -> ((s, dir) => {
      // Sketch-cutpoint variant of q54's length trim — the plan a
      // 100 TB pipeline actually runs (SURVEY §2.3 names this exact
      // substitution). q54 pays a per-stratum corpus SORT for its rank;
      // here the corpus collapses row-locally into a per-lang
      // fixed-width token-length histogram (q92's machinery) —
      // a directory bounded by langs × length-range/TrimBinW, NOT by
      // the corpus — and the cut bins are read off its cumulative
      // counts with the same integer rank arithmetic q54 trims at:
      // lo = bin containing rank (n·p) div 100 + 1, hi = bin containing
      // rank (n·(100−p)) div 100. The ≤|langs|-row cutpoint table joins
      // back BROADCAST and the keep decision is row-local. Convention
      // is conservative-INCLUSIVE (a straddling cut bin is kept whole),
      // so the sketch keeps a SUPERSET of q54's kept set, overshooting
      // by at most one bin width per end — proven against q54 in
      // CurationQueriesSpec. Shape: two corpus scans (histogram build,
      // final rollup), both map-side-combined to bounded tables; ZERO
      // corpus sorts at any scale.
      val w = TrimBinW
      val tok = KeywordQueries.tokenizedDocs(s, dir)
        .select(col("doc_id"), col("lang"), col("dl").cast("long").as("n_tokens"))
        .withColumn("bin", expr(s"n_tokens div $w"))
      val hist = tok.groupBy(col("lang"), col("bin")).agg(count(lit(1)).as("n"))
      val wAsc = Window.partitionBy(col("lang")).orderBy(col("bin"))
      val cum = hist
        .withColumn("cum", sum(col("n"))
          .over(wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n")).over(Window.partitionBy(col("lang"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val cuts = cum.groupBy(col("lang")).agg(
        min(when(col("cum") >= expr(s"(total * $TrimPct) div 100") + 1,
          col("bin"))).as("lo_bin"),
        min(when(col("cum") >= expr(s"(total * ${100 - TrimPct}) div 100"),
          col("bin"))).as("hi_bin"),
        max(col("total")).as("n_total"))
      tok.join(broadcast(cuts), Seq("lang"))
        .withColumn("kept", col("bin") >= col("lo_bin") && col("bin") <= col("hi_bin"))
        .groupBy(col("lang"))
        .agg(max(col("n_total")).as("n_total"),
          max(col("lo_bin") * w).cast("long").as("lo_cut"),
          max((col("hi_bin") + 1) * w).cast("long").as("hi_cut"),
          sum(col("kept").cast("long")).cast("long").as("n_kept"),
          min(when(col("kept"), col("n_tokens"))).as("min_kept_tokens"),
          max(when(col("kept"), col("n_tokens"))).as("max_kept_tokens"),
          round(sum(when(col("kept"), col("n_tokens")).otherwise(lit(0L))
            .cast("decimal(28,6)")).cast("double") /
            sum(col("kept").cast("long")), 6).as("avg_kept_tokens"))
        .orderBy(col("lang"))
    }),

    "q134_ccnet_sketch" -> ((s, dir) => {
      // Sketch-cutpoint variant of q112's CCNet terciles — per-lang
      // sort replaced by per-lang bounds lookup. The scored corpus bins
      // row-locally by floor(avg_ll·CcnetBinInv) (scaling a 6-dp double
      // by a power of two is IEEE-exact, so bin ids are bit-identical
      // across engines) into a per-lang score histogram; scanning the
      // directory from the HEAD end (bin desc), b1 = first bin whose
      // cumulative count covers n/3 and b2 = the 2n/3 twin. Assignment
      // is row-local off the broadcast ≤|langs|-row cut table:
      // bin ≥ b1 head, b2 ≤ bin < b1 middle, bin < b2 tail —
      // a doc OUTSIDE the two cut bins provably receives its exact q112
      // bucket (the cut ranks' scores live inside b1/b2), so the carve
      // deviates only within one bin width at each boundary (law proven
      // in CurationQueriesSpec). Same output profile as q112.
      val scored = lmScored(s, dir)
        .withColumn("bin", floor(col("avg_ll") * CcnetBinInv))
      val hist = scored.groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n"))
      val wDesc = Window.partitionBy(col("lang")).orderBy(col("bin").desc)
      val cum = hist
        .withColumn("cum", sum(col("n"))
          .over(wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("n")).over(Window.partitionBy(col("lang"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val t = CcnetTerciles
      val cuts = cum.groupBy(col("lang")).agg(
        max(when(col("cum") * t >= col("total"), col("bin"))).as("b1"),
        max(when(col("cum") * t >= col("total") * 2, col("bin"))).as("b2"))
      scored.join(broadcast(cuts), Seq("lang"))
        .withColumn("bucket",
          when(col("bin") >= col("b1"), "head")
            .when(col("bin") >= col("b2"), "middle")
            .otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("dl").cast("long")).cast("long").as("n_tokens"),
          min(col("avg_ll")).as("min_ll"),
          max(col("avg_ll")).as("max_ll"),
          round(sum(col("avg_ll").cast("decimal(28,12)")).cast("double") /
            count(lit(1)), 6).as("mean_ll"))
        .orderBy(col("lang"), col("bucket"))
    }),

    "q56_knn_vote" -> ((s, dir) => {
      // the auto-labeling shape: broadcast the small test side, stream
      // the train side, rank per test vector (row_number <= k plans as
      // WindowGroupLimit: every partition keeps k candidates before the
      // window sort), then majority vote with deterministic tie-breaks
      // (votes desc, label asc).
      val e = graft.SparkEntry.tbl(s, dir, "embeddings")
        .filter(hasDim(col("embedding"), 64))
        .withColumn("bucket", splitBucket(col("vec_id")))
      val test = e.filter(col("bucket") >= 90)
        .select(col("vec_id"), col("label").cast("long").as("true_label"),
          col("embedding").as("qe"))
      val train = e.filter(col("bucket") < 80)
        .select(col("vec_id").as("tid"), col("label").cast("long").as("tl"),
          col("embedding").as("te"))
      val scored = train.join(broadcast(test))
        .withColumn("score", round(neo4jScore(col("te"), col("qe")), 6))
        .withColumn("rk",
          row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("score").desc, col("tid").asc)))
        .filter(col("rk") <= KnnVoteK)
      scored.groupBy(col("vec_id"), col("true_label"), col("tl"))
        .agg(count(lit(1)).as("n_votes"))
        .withColumn("vrk",
          row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("n_votes").desc, col("tl").asc)))
        .filter(col("vrk") === 1)
        .select(col("vec_id"), col("true_label"),
          col("tl").as("pred_label"), col("n_votes"),
          (col("true_label") === col("tl")).cast("long").as("correct"))
        .orderBy(col("vec_id"))
    }),

    "q121_knn_confusion" -> ((s, dir) => {
      // Per-class evaluation of the q56 kNN auto-labeler — the
      // multiclass companion to q117's binary AUC: support / predicted
      // count / true positives per label, with precision, recall and
      // F1 = 2·tp/(support + n_pred) (the harmonic form reduced to ONE
      // division over integers — no P·R intermediate to diverge on a
      // ULP). Classes are the UNION of observed true labels and
      // observed predicted labels: a class never predicted reports
      // NULL precision, a class predicted but never true-labeled
      // reports support 0 / NULL recall — nothing an eval consumer
      // could misread as "zero predictions". The union is realized as
      // a distinct label directory LEFT-joined to both count
      // directories (not a FULL OUTER join, which Spark cannot
      // broadcast — left joins onto the ≤ #classes-row directory keep
      // the whole eval broadcast-shaped). Shape: q56's plan plus three
      // label-directory aggregations and two broadcast joins — the
      // eval table costs nothing beyond the predictions.
      // ONE pass over the predictions (r18): the label directory, the
      // support/tp table and the predicted-count table all derive from
      // the ≤ #classes²-row confusion directory — the previous form
      // consumed the full q56 prediction subtree once per derivation
      // (4 evaluations of the kNN vote per report). Same counts: sums
      // of confusion-cell counts == counts of prediction rows.
      // localCheckpoint (the RankedCumsum lineage rule): the directory
      // feeds four derivations; materialized it is ≤ #classes² rows
      // and the kNN vote runs exactly once per evaluation
      val conf = queries("q56_knn_vote")(s, dir)
        .groupBy(col("true_label"), col("pred_label"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val labels = conf.select(col("true_label").as("label"))
        .unionByName(conf.select(col("pred_label").as("label")))
        .distinct()
      val t = conf.groupBy(col("true_label").as("label")).agg(
        sum(col("cnt")).as("support"),
        coalesce(sum(when(col("pred_label") === col("true_label"), col("cnt"))
          .otherwise(0L)), lit(0L)).as("tp"))
      val p = conf.groupBy(col("pred_label").as("label")).agg(
        sum(col("cnt")).as("n_pred"))
      labels.join(broadcast(t), Seq("label"), "left")
        .join(broadcast(p), Seq("label"), "left")
        .na.fill(0L, Seq("support", "n_pred", "tp"))
        .select(col("label"),
          col("support"), col("n_pred"), col("tp"),
          when(col("n_pred") > 0,
            round(col("tp").cast("double") / col("n_pred").cast("double"), 6))
            .otherwise(lit(null).cast("double")).as("prec"),
          when(col("support") > 0,
            round(col("tp").cast("double") / col("support").cast("double"), 6))
            .otherwise(lit(null).cast("double")).as("recall"),
          round(lit(2.0) * col("tp").cast("double") /
            (col("support") + col("n_pred")).cast("double"), 6).as("f1"))
        .orderBy(col("label"))
    }),

    "q65_bloom_decontam" -> ((s, dir) => {
      // q52's contamination screen re-shaped for the asymmetric 100 TB
      // case: the benchmark (test) shingle set is small, the train side
      // is the corpus. A Bloom sketch of the test hashes is built
      // distributed (stat.bloomFilter = treeAggregate of partial
      // sketches; only the OR-merged bits reach the driver), broadcast,
      // and probed on the train side BEFORE its distinct+join exchange —
      // the corpus rows that cannot match die where they were read and
      // the shuffle carries candidates only. Bloom false positives are
      // killed by the exact hash equi-join that follows; false negatives
      // cannot occur, so the output is provably identical to the
      // sketch-free plan (asserted by CurationQueriesSpec). Reports the
      // contaminated documents themselves (q52 reports per-lang rates).
      val ws = DedupQueries.hashedShingles(s, dir)
        .withColumn("bucket", splitBucket(col("doc_id")))
      val test = ws.filter(col("bucket") >= 90)
        .select(col("doc_id"), col("lang"), explode(col("hs")).as("h"))
      // the sketch is the decontamination job's offline artifact — one
      // benchmark set screens every corpus batch — so it is built once
      // per session+corpus (same split as AnnIndex.sessionBrp: probes
      // pay probe cost, never the build)
      val bloom = benchmarkBloom(s, dir)
      val train = ws.filter(col("bucket") < 80)
        .select(explode(col("hs")).as("h"))
        .filter(graft.expressions.BloomExpressions.mightContain(col("h"), bloom))
        .distinct()
        .withColumn("hit", lit(1L))
      test.join(train, Seq("h"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_sh"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("overlap",
          round(col("n_hit").cast("double") / col("n_sh"), 6))
        .filter(col("overlap") >= ContaminationMax)
        .select(col("doc_id"), col("lang"), col("n_sh"), col("n_hit"), col("overlap"))
        .orderBy(col("doc_id"))
    }),

    "q82_dsir_weights" -> ((s, dir) => {
      // DSIR-style data selection (Xie et al., NeurIPS 2023 — public
      // literature): importance weight of a raw-pool document under a
      // hashed bag-of-bigrams model is the sum over its bigram
      // instances of ln p_target(b) − ln p_pool(b) (add-1 smoothed),
      // i.e. how much more target-like than pool-like its n-grams are;
      // the top-weight docs are what importance resampling keeps. The
      // target split is the benchmark bucket (>= 90), the pool the
      // train bucket (< 80) — the same SplitPair geometry as q52/q62.
      // Scale shape: bigram hashing is row-local; BOTH count tables
      // collapse to <= DsirBuckets rows under map-side combine, so the
      // log-ratio table broadcasts at any corpus size; the pool pays
      // one explode + one per-doc rollup (decimal-routed so partition
      // order cannot move the double sum) into global top-k heaps.
      val bg = hashedBigrams(s, dir)
      dsirWeightReport(bg.filter(col("bucket") >= 90),
          bg.filter(col("bucket") < 80))
        .orderBy(col("weight").desc, col("doc_id").asc)
        .limit(DsirTopK)
    }),

    "q86_quality_classifier" -> ((s, dir) => {
      // CCNet/GPT-3-style learned quality filter: train a linear
      // classifier to tell target-split docs from pool docs over the
      // SAME hashed-bigram feature space DSIR weighs (q82), then score
      // EVERY doc — including the 80-89 holdout bucket neither split
      // touches, whose unseen features contribute 0 through the
      // left-join coalesce. The oracle unrolls both GD iterations
      // op-for-op, so hash-green certifies the training arithmetic
      // (margins, residuals, gradients, updates) AND the scoring pass,
      // not just the final ranking.
      import graft.operators.QualityClassifier
      val fb = classifierFeatures(s, dir)
      def train = fb.filter(col("bucket") >= 90 || col("bucket") < 80)
        .select(col("doc_id"),
          when(col("bucket") >= 90, 1.0).otherwise(0.0).as("y"),
          col("b"))
      val w = QualityClassifier.sessionFit(s, dir, "bucket-bigram", train, QcIters, QcLr)
      QualityClassifier.score(
          fb.withColumn("split",
            when(col("bucket") >= 90, "target")
              .when(col("bucket") < 80, "pool")
              .otherwise("holdout")),
          w, keyCols = Seq("lang", "split"))
        .orderBy(col("doc_id"))
    }),

    "q117_classifier_auc" -> ((s, dir) => {
      // ROC-AUC of the q86 trained quality classifier against its own
      // training labels (target vs pool) — the evaluation step every
      // published learned-quality-filter recipe runs before trusting
      // the filter's threshold. Computed as Mann-Whitney U in midrank
      // form over the distinct-score directory
      // ([[graft.operators.RankedCumsum.auc]]): ONE parallel sort of
      // the narrow (doc, score) table, exact-integer numerator — never
      // the P·N pairwise definition. The oracle re-runs the unrolled
      // GD to the same scores, then the identical rank algebra, so
      // hash-green certifies training, scoring AND the statistic.
      import graft.operators.QualityClassifier
      val fb = classifierFeatures(s, dir)
      val labeled = fb.filter(col("bucket") >= 90 || col("bucket") < 80)
      def train = labeled.select(col("doc_id"),
        when(col("bucket") >= 90, 1.0).otherwise(0.0).as("y"),
        col("b"))
      val w = QualityClassifier.sessionFit(s, dir, "bucket-bigram", train, QcIters, QcLr)
      val scored = QualityClassifier.score(
        labeled.withColumn("pos", (col("bucket") >= 90).cast("long")),
        w, keyCols = Seq("pos"))
      graft.operators.RankedCumsum.auc(
        scored.select(col("doc_id"), col("pos"), col("score")))
    }),

    "q79_boilerplate_scrub" -> ((s, dir) => {
      // C4/RefinedWeb-style boilerplate removal at q66's chunk grain:
      // a chunk occurring in >= BoilerplateMinDf distinct documents is
      // removed from EVERY document (q66's span dedup keeps the first
      // occurrence — a scrub keeps none). Shape: chunk+hash row-local;
      // ONE corpus shuffle computes chunk document frequency with
      // map-side combine; the boilerplate set is small by construction
      // (distinct chunks x DF tail), so the flag-back join broadcasts
      // and only the per-doc rollup shuffles again.
      graft.operators.Scrub.boilerplateReport(
          chunkTable(s, dir), BoilerplateMinDf)
        .orderBy(col("doc_id"))
    }),

    "q80_pii_scrub" -> ((s, dir) => {
      // PII redaction audit. The fixture corpus is synthetic words, so
      // the PII is INJECTED deterministically from doc_id (identically
      // in the oracle SQL) — docs pick up an email, a phone, an IPv4
      // literal, or any combination, by residue class; the operator
      // under test is the portable-regex scrub itself. Entirely
      // row-local codegen'd string work: zero shuffle at any scale.
      import graft.operators.Scrub
      val (ne, np, ni) = Scrub.piiCounts(col("text"))
      docs(s, dir)
        .spreadIfNarrow(s)
        .select(col("doc_id"), injectPii(col("doc_id"), col("text")).as("text"))
        .select(col("doc_id"),
          ne.as("n_email"), np.as("n_phone"), ni.as("n_ip"),
          length(Scrub.redact(col("text"))).cast("long").as("clean_len"),
          charHash(Scrub.redact(col("text"))).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    "q98_rank_ensemble" -> ((s, dir) => {
      // quality-signal ensemble by rank aggregation (Borda count — the
      // standard way curation pipelines combine incommensurable
      // signals: raw scores live on different scales, ranks don't).
      // Three existing per-doc signals — q14's heuristic quality,
      // q55's unigram log-likelihood, within-doc shingle diversity
      // (q50's repetition complement) — each globally ranked by
      // RankedCumsum.scoreRank (two-pass distributed rank, NO
      // single-partition window), averaged, re-ranked, and cut into
      // keep/review/drop terciles by integer math on the final rank.
      // Scale shape: 4 range-partitioned sorts of narrow (id, score)
      // tables + vocabulary-bounded broadcast joins from the signal
      // builds; every rank is partition-count-independent (total order,
      // doc_id tie-break).
      import graft.operators.RankedCumsum.scoreRank
      val (q, ll, dv) = qualitySignals(s, dir)
      val r1 = scoreRank(q).withColumnRenamed("rank", "r_quality")
      val r2 = scoreRank(ll).withColumnRenamed("rank", "r_loglik")
      val r3 = scoreRank(dv).withColumnRenamed("rank", "r_diversity")
      // localCheckpoint (r18, RankedCumsum's own lineage rule — auc's
      // `labeled` precedent): borda feeds the final-rank sort AND the
      // output join — left lazy, the three-way rank join executed
      // twice. Narrow (doc_id + 4 numerics), corpus-bounded like the
      // rank sorts themselves; values untouched.
      val borda = r1.join(r2, "doc_id").join(r3, "doc_id")
        .withColumn("borda",
          round((col("r_quality") + col("r_loglik") + col("r_diversity")) / 3.0, 6))
        .localCheckpoint()
      // rank by borda ASC (lower mean rank = better): negate the
      // already-rounded score so scoreRank's desc order applies
      val fin = scoreRank(borda.select(col("doc_id"), (-col("borda")).as("score")))
        .withColumnRenamed("rank", "final_rank")
      borda.join(fin, "doc_id")
        .crossJoin(broadcast(borda.agg(count(lit(1)).as("n_docs"))))
        .withColumn("bucket", expr("(final_rank - 1) * 3 div n_docs + 1"))
        .select(col("doc_id"), col("r_quality"), col("r_loglik"),
          col("r_diversity"), col("borda"), col("final_rank"), col("bucket"))
        .orderBy(col("doc_id"))
    }),

    "q123_signal_corr" -> ((s, dir) => {
      // Signal-redundancy audit for the q98 ensemble: the Pearson
      // correlation matrix of the three quality signals. Before
      // paying for a signal at 100 TB, check it adds information —
      // |r| near 1 between two signals means one is redundant; near 0
      // means the ensemble genuinely diversifies. Shape: the three
      // signal builds share q98's session caches, the 3-way join is
      // doc_id-keyed, and the whole matrix collapses in ONE
      // map-side-combined aggregate — 6-dp scores sum as exact
      // decimals (products exact at 12 dp, the q109 argument), so
      // every r is computed from partition-order-free sums; a
      // zero-variance signal yields NULL (not NaN) identically in
      // both engines.
      val (q, ll, dv) = qualitySignals(s, dir)
      val j = q.select(col("doc_id"), col("score").as("xq"))
        .join(ll.select(col("doc_id"), col("score").as("xl")), "doc_id")
        .join(dv.select(col("doc_id"), col("score").as("xd")), "doc_id")
      def d6(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
      def d12(c: Column) = sum(c.cast("decimal(28,12)")).cast("double")
      val t = j.agg(count(lit(1)).as("n"),
        d6(col("xq")).as("sq"), d6(col("xl")).as("sl"), d6(col("xd")).as("sd"),
        d12(col("xq") * col("xq")).as("sqq"),
        d12(col("xl") * col("xl")).as("sll"),
        d12(col("xd") * col("xd")).as("sdd"),
        d12(col("xq") * col("xl")).as("sql_"),
        d12(col("xq") * col("xd")).as("sqd"),
        d12(col("xl") * col("xd")).as("sld"))
      val nD = col("n").cast("double")
      def r(sxy: Column, sx: Column, sy: Column, sxx: Column, syy: Column) = {
        val vx = nD * sxx - sx * sx
        val vy = nD * syy - sy * sy
        when(vx > 0 && vy > 0,
          round((nD * sxy - sx * sy) / sqrt(vx * vy), 6))
          .otherwise(lit(null).cast("double"))
      }
      t.select(col("n"),
        r(col("sql_"), col("sq"), col("sl"), col("sqq"), col("sll"))
          .as("r_quality_loglik"),
        r(col("sqd"), col("sq"), col("sd"), col("sqq"), col("sdd"))
          .as("r_quality_diversity"),
        r(col("sld"), col("sl"), col("sd"), col("sll"), col("sdd"))
          .as("r_loglik_diversity"))
    }),

    "q94_temperature_mix" -> ((s, dir) => {
      // temperature-scaled sampling weights (public literature: the
      // multilingual-LM recipe of Conneau & Lample 2019 / XLM-R, also
      // the Llama data-mix computation): sampling probability
      // p_l ∝ n_l^α with α = 1/2 UPWEIGHTS low-resource domains
      // relative to their raw share (α=1 is proportional, α=0 uniform).
      // α is fixed at 1/2 so the power is sqrt — the ONE fractional
      // power both engines compute correctly rounded per IEEE-754
      // (pow(x, 0.3) carries no such guarantee; the q55/q82 libm
      // portability rule). sqrt values round to 6 dp and sum as exact
      // decimals, so the normalizer is partition-order-independent.
      // Scale shape: one map-side-combined groupBy(lang) collapses the
      // corpus to a domain-bounded table; everything after — the
      // normalizing totals and shares — is arithmetic over that tiny
      // table (crossJoin of ONE broadcast row). At 100 TB the only
      // corpus-sized work is the first aggregation.
      val counts = docs(s, dir).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("sqrt_n",
          round(sqrt(col("n_docs").cast("double")), 6).cast("decimal(28,6)"))
      val tots = counts.agg(
        sum(col("n_docs")).as("n_total"),
        sum(col("sqrt_n")).as("s_total"))
      counts.crossJoin(broadcast(tots))
        .withColumn("raw_share",
          round(col("n_docs").cast("double") / col("n_total").cast("double"), 6))
        .withColumn("temp_share",
          round(col("sqrt_n").cast("double") / col("s_total").cast("double"), 6))
        // boost from the UNROUNDED shares — the rounded raw_share is
        // 0.0 for any domain with corpus share < 5e-7, which would make
        // the ratio Infinity here and NULL in DuckDB. sqrt_n (6-dp
        // decimal) and the decimal totals are bit-identical inputs in
        // both engines, and double mul/div are correctly rounded, so
        // the same expression shape yields the same bits.
        .withColumn("boost",
          round((col("sqrt_n").cast("double") * col("n_total").cast("double")) /
            (col("s_total").cast("double") * col("n_docs").cast("double")), 6))
        .select(col("lang"), col("n_docs"), col("raw_share"),
          col("temp_share"), col("boost"))
        .orderBy(col("lang"))
    }),

    "q103_moore_lewis" -> ((s, dir) => {
      // Moore-Lewis cross-entropy difference selection (see
      // MlInDomainSource scaladoc). Shape: token counts are two
      // map-side-combined groupBy(tok) aggregations bounded by the
      // vocabulary (joined back with NO static hint — the count
      // directories are corpus-vocabulary-sized, so AQE size-gates
      // the strategy at runtime: lmScored's reconciled q90 rule); the
      // in-domain membership join is a doc_id equi-join (shuffles at
      // scale, AQE-broadcast here); per-doc sums route through decimal and
      // round once; the selection is ONE global top-k.
      // localCheckpoints (r18, the RankedCumsum lineage rule): gc/ic
      // each feed a totals aggregate AND a scoring join — left lazy,
      // the vocab aggregation behind each re-executed per consumer.
      // Both vocabulary-bounded; values untouched. tf itself is
      // token-stream-sized and stays LAZY (checkpointing it measured
      // slower than the cache re-scan it saves, and a corpus-sized
      // checkpoint breaks the bounded-table rule).
      val tf = KeywordQueries.tokenizedDocs(s, dir)
        .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("dl"),
          explode(col("toks")).as("tok"))
      val gc = tf.groupBy(col("tok")).agg(count(lit(1)).as("cg"))
        .localCheckpoint()
      val gn = gc.agg(sum(col("cg")).as("n_gen"),
        count(lit(1)).as("v"))
      val ic = tf.filter(col("source") === MlInDomainSource)
        .groupBy(col("tok")).agg(count(lit(1)).as("ci"))
        .localCheckpoint()
      val in = ic.agg(sum(col("ci")).as("n_in"))
      tf.filter(col("source") =!= MlInDomainSource)
        .join(gc, Seq("tok"))
        .join(ic, Seq("tok"), "left")
        .crossJoin(broadcast(gn)).crossJoin(broadcast(in))
        .withColumn("ll",
          log((coalesce(col("ci"), lit(0L)) + lit(1L)).cast("double")) -
            log((col("n_in") + col("v")).cast("double")) -
            log(col("cg").cast("double")) +
            log(col("n_gen").cast("double")))
        .groupBy(col("doc_id"), col("lang"), col("source"), col("dl"))
        .agg(dsum(col("ll"), 12).as("sum_ll"))
        .withColumn("celd", round(col("sum_ll") / col("dl"), 6))
        .orderBy(col("celd").desc, col("doc_id").asc)
        .limit(MlTopK)
        .select(col("doc_id"), col("lang"), col("source"),
          col("dl").cast("long").as("n_tokens"), col("celd"))
    }),

    "q106_epoch_alloc" -> ((s, dir) => {
      // epoch-capped token-budget allocation (see AllocRounds
      // scaladoc). ONE corpus aggregation collapses everything to the
      // 5-row domain table; each of the 3 unrolled rounds reads its
      // totals as whole-frame window aggregates over that bounded
      // table — zero corpus-sized work after the first groupBy at any
      // scale. All allocation arithmetic is decimal(28,6) with each
      // increment rounded once, so the final table is bit-identical
      // regardless of partitioning.
      val toks = TextQueries.enriched(s, dir)
        .groupBy(col("lang")).agg(sum(col("n_tokens")).as("n_tok"))
        .withColumn("sqrt_n",
          round(sqrt(col("n_tok").cast("double")), 6).cast("decimal(28,6)"))
        .withColumn("cap",
          (col("n_tok") * lit(AllocEpochCap)).cast("decimal(28,6)"))
      // Whole-frame windows over the ≤|langs| domain table replace the
      // pre-r18 crossJoin(broadcast(agg)) rounds: the fold embedded the
      // previous round's subtree twice per round (once under the 1-row
      // aggregate, once as the main side), so the plan — and the
      // executed aggregates — doubled every round. The windows keep the
      // identical decimal arithmetic (associative sums, same widenings,
      // same single rounding per increment) in ONE linear plan over the
      // domain-bounded frame; corpus-sized work still ends at the first
      // groupBy. Non-foldable constant partition key: the established
      // single-partition-window trick (layoutFileStats).
      val wAll = Window.partitionBy(pmod(col("n_tok"), lit(1)))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // round 1: every domain asks for its temperature share of the
      // full budget, capped at EpochCap epochs of its own corpus
      val r1 = toks
        .withColumn("t_tok", sum(col("n_tok")).over(wAll))
        .withColumn("s_tot", sum(col("sqrt_n")).over(wAll))
        .withColumn("budget",  // exact integer division in both engines
          expr(s"t_tok * $AllocBudgetNum div $AllocBudgetDen")
            .cast("decimal(28,6)"))
        .drop("t_tok")
        .withColumn("alloc", least(
          round((col("sqrt_n").cast("double") / col("s_tot").cast("double")) *
            col("budget").cast("double"), 6).cast("decimal(28,6)"),
          col("cap")))
      // rounds 2..AllocRounds: stranded budget re-distributes over the
      // still-unsaturated domains by their renormalized shares
      val rN = (2 to AllocRounds).foldLeft(r1) { (prev, _) =>
        prev
          .withColumn("rem", max(col("budget")).over(wAll) -
            sum(col("alloc")).over(wAll))
          .withColumn("s_act",
            sum(when(col("alloc") < col("cap"), col("sqrt_n"))
              .otherwise(lit(0))).over(wAll).cast("decimal(28,6)"))
          .withColumn("alloc",
            when(col("alloc") < col("cap") && col("s_act") > 0,
              least(col("alloc") +
                round((col("sqrt_n").cast("double") / col("s_act").cast("double")) *
                  col("rem").cast("double"), 6).cast("decimal(28,6)"),
                col("cap")))
              .otherwise(col("alloc"))
              // re-pin the round's widened sum type so every round —
              // and the final output column — is DECIMAL(28,6) in both
              // engines (decimal + decimal widens per round otherwise)
              .cast("decimal(28,6)"))
          .drop("rem", "s_act")
      }
      val fin = rN.withColumn("leftover",
        (max(col("budget")).over(wAll) - sum(col("alloc")).over(wAll))
          .cast("decimal(28,6)"))
      // Output alloc/leftover as DOUBLE, not DECIMAL(28,6): these were
      // the suite's only decimal-typed output columns, and engine-side
      // decimal rendering differs (e.g. 0E-6 vs 0.000000) even when the
      // values are identical. The internal arithmetic stays decimal for
      // partitioning-invariant exactness; only the final projection
      // casts. Both engines cast the same decimal to the same IEEE
      // double, so the hash contract holds.
      fin
        .select(col("lang"), col("n_tok"),
          col("cap").cast("long").as("cap_tok"),
          col("alloc").cast("double").as("alloc"),
          round(col("alloc").cast("double") / col("n_tok").cast("double"), 6)
            .as("epochs"),
          when(col("alloc") === col("cap"), 1L).otherwise(0L).as("saturated"),
          col("leftover").cast("double").as("leftover"))
        .orderBy(col("lang"))
    }),

    "q107_weighted_sample" -> ((s, dir) => {
      // Efraimidis-Spirakis quality-weighted sampling without
      // replacement (see WsTopK scaladoc): row-local key computation
      // off the shared enrichment cache, then ONE TakeOrderedAndProject
      // — the corpus is scanned once and never shuffled, at any scale.
      val (a, b) = WeightedSamplePair
      val e = TextQueries.enriched(s, dir)
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      val avgTokLen = col("char_sum").cast("double") / col("n_tokens")
      e.withColumn("w", graft.functions.TextFunctions.qualityScore(
          col("n_tokens"), col("n_distinct"), stopRatio, avgTokLen))
        .withColumn("u",
          (((lit(a) * col("doc_id") + lit(b)) % lit(P)) + lit(1L))
            .cast("double") / lit((P + 1).toDouble))
        .withColumn("key", round(log(col("u")) / col("w"), 6))
        .orderBy(col("key").desc, col("doc_id").asc)
        .limit(WsTopK)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("w").as("weight"), col("key"))
    }),

    "q108_dsir_resample" -> ((s, dir) => {
      // DSIR importance resampling (see DsirSampleK scaladoc): the
      // pool's per-doc log importance weights (q82's exact broadcast-
      // ratio machinery) drive an exponential race in the log domain —
      // race_key = ln(−ln u) − lr, the K SMALLEST keys win. Shape: the
      // weight rollup is q82's plan (vocab/feature-bounded broadcasts,
      // decimal-routed per-doc sums); the race key is one row-local
      // expression; the selection is per-partition bottom-k heaps.
      val (a, b) = graft.functions.PortableHash.DsirSamplePair
      val bg = hashedBigrams(s, dir)
      val weights = dsirWeightReport(bg.filter(col("bucket") >= 90),
        bg.filter(col("bucket") < 80))
      weights
        .withColumn("u",
          (((lit(a) * col("doc_id") + lit(b)) % lit(P)) + lit(1L))
            .cast("double") / lit((P + 1).toDouble))
        .withColumn("race_key", round(log(-log(col("u"))) - col("weight"), 6))
        .orderBy(col("race_key").asc, col("doc_id").asc)
        .limit(DsirSampleK)
        .select(col("doc_id"), col("lang"), col("n_grams"),
          col("weight"), col("race_key"))
    }),
  )

  /** q79 boilerplate threshold: a chunk in >= 2 distinct docs is
    * boilerplate. Low because the fixture's clone density is low; a
    * production corpus would set this to O(10). */
  val BoilerplateMinDf = 2L

  /** q82 feature extraction: (doc_id, lang, bucket, b) — one row per
    * token-bigram instance, b = charHash of the bigram mod
    * [[DsirBuckets]]. Row-local off the shared tokenized cache. */
  private def hashedBigrams(s: SparkSession, dir: String): DataFrame =
    // NOT session-cached (measured, r18): the columnar cache scan of
    // the instance table lost to the codegen'd explode fused onto the
    // tokenized cache (q82/q108 1.12-1.15× slower cached); only the
    // post-distinct feature table (classifierFeatures) caches well
    KeywordQueries.tokenizedDocs(s, dir)
      .withColumn("bucket", splitBucket(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("bucket"),
        explode(TextQueries.shingleCol(col("toks"), 2)).as("s"))
      .withColumn("b", charHash(col("s")) % lit(DsirBuckets.toLong))
      .drop("s")

  /** One unrolled q86 GD iteration: margin (decimal-routed weight sum
    * over the doc's features — inner join, `wPrev` covers every
    * training feature by construction), residual (fast-sigmoid minus
    * label, rounded once), gradient (decimal-routed residual sum per
    * feature), update (`w − lr·g/N`, one round(…, 6)) — each step the
    * same operation [[graft.operators.QualityClassifier.fit]] runs. */
  private def qcIterSql(wPrev: String, i: Int): String = {
    val sig = graft.operators.QualityClassifier.fastSigmoidSql("z")
    s"""z$i AS (
       |  SELECT t.doc_id, t.y, CAST(SUM(CAST(w AS DECIMAL(27,10))) AS DOUBLE) AS z
       |  FROM train t JOIN $wPrev USING (b) GROUP BY t.doc_id, t.y),
       |r$i AS (SELECT doc_id, round($sig - y, 6) AS r FROM z$i),
       |g$i AS (
       |  SELECT b, CAST(SUM(CAST(r AS DECIMAL(27,10))) AS DOUBLE) AS g
       |  FROM train JOIN r$i USING (doc_id) GROUP BY b),
       |w$i AS (
       |  SELECT $wPrev.b, round($wPrev.w - $QcLr * g / n, 6) AS w
       |  FROM $wPrev JOIN g$i USING (b) CROSS JOIN n)""".stripMargin
  }

  /** Per-doc unigram-LM score table shared by q112 and q134 (q55's
    * scoring pass): (doc_id, lang, dl, sum_ll, avg_ll) with avg_ll
    * rounded once to 6 dp. The vocabulary join carries NO static
    * broadcast hint (the q90 rule, reconciled round 12): the count
    * directory is corpus-VOCABULARY-sized — closed on this fixture,
    * 10^8+ types on a web crawl, where an unconditional broadcast
    * OOMs the driver — so the strategy is size-gated at RUNTIME by
    * AQE (broadcast below the measured threshold, shuffle equi-join
    * above; the fixture plan finalizes as a broadcast,
    * PlanSpec-pinned on the adaptive final plan). Known tradeoff: on
    * a corpus whose vocab IS broadcastable, AQE still pays the probe
    * side's shuffle WRITE before converting — the price of never
    * guessing wrong on an unbounded directory. Tables bounded BY
    * CONSTRUCTION (1-row totals, lang rollups, DsirBuckets spaces)
    * keep their static hints. The per-doc sum is decimal-routed so
    * partition order cannot move the score.
    * Session-cached ([[graft.SparkEntry.cachedView]], the
    * tokenizedDocs pattern): the scoring pass — the expensive part, a
    * corpus explode + per-doc rollup — runs once per (session, dir)
    * and every consumer reads the narrow cached table. */
  private[graft] def lmScored(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s,
      "graft_cache_lmscored_" + graft.SparkEntry.pathSlug(dir)) {
      val tf = KeywordQueries.tokenizedDocs(s, dir)
        .select(col("doc_id"), col("lang"), col("dl"),
          explode(col("toks")).as("tok"))
      val gc = tf.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val n = gc.agg(sum(col("c")).as("n_tok_total"))
      tf.join(gc, Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("ll",
          log(col("c").cast("double")) - log(col("n_tok_total").cast("double")))
        .groupBy(col("doc_id"), col("lang"), col("dl"))
        .agg(sum(col("ll").cast("decimal(28,12)")).cast("double").as("sum_ll"))
        .withColumn("avg_ll", round(col("sum_ll") / col("dl"), 6))
    }

  /** SQL twin of [[lmScored]]: CTE chain ending in `av(doc_id, lang,
    * dl, avg_ll)`, to be spliced after WITH. */
  private[graft] def lmScoredSql: String =
    s"""dd AS (${KeywordQueries.tokenizedDocsSql}),
       |tf AS (SELECT doc_id, lang, dl, unnest(toks) AS tok FROM dd),
       |gc AS (SELECT tok, COUNT(*) AS c FROM tf GROUP BY tok),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok_total FROM gc),
       |sc AS (
       |  SELECT tf.doc_id, tf.lang, tf.dl,
       |    CAST(SUM(CAST(ln(c::DOUBLE) - ln(n_tok_total::DOUBLE)
       |      AS DECIMAL(28,12))) AS DOUBLE) AS sum_ll
       |  FROM tf JOIN gc USING (tok) CROSS JOIN n
       |  GROUP BY tf.doc_id, tf.lang, tf.dl),
       |av AS (SELECT doc_id, lang, dl, round(sum_ll / dl, 6) AS avg_ll
       |  FROM sc)""".stripMargin

  /** q86 feature table: one row per (doc, DISTINCT hashed-bigram
    * bucket) — binary bag-of-buckets — plus one always-on
    * [[graft.operators.QualityClassifier.BiasFeature]] row per doc.
    * Columns (doc_id, lang, bucket, b); bucket is the split hash. */
  private def classifierFeatures(s: SparkSession, dir: String): DataFrame =
    // session-cached (r18): q86 and q117 each reference the feature
    // table twice per evaluation (train filter + scoring pass), so
    // uncached the two distincts re-ran up to four times per query
    graft.SparkEntry.cachedView(s,
      "graft_cache_qcfeatures_" + graft.SparkEntry.pathSlug(dir)) {
      val base = hashedBigrams(s, dir)
        .select(col("doc_id"), col("lang"), col("bucket"), col("b"))
        .distinct()
      base.select(col("doc_id"), col("lang"), col("bucket")).distinct()
        .withColumn("b", lit(graft.operators.QualityClassifier.BiasFeature))
        .unionByName(base)
    }

  /** Per-document DSIR log importance weights of `pool` docs against
    * the `target` feature distribution. Both inputs carry one row per
    * hashed-bigram instance (column `b`); both count aggregates are
    * bounded by the feature-space size, so the ratio table broadcasts
    * regardless of corpus size. Returns (doc_id, lang, n_grams,
    * weight), weight = Σ ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)) over
    * the doc's bigram instances, decimal-routed and rounded to 6 dp. */
  private[graft] def dsirWeightReport(target: DataFrame,
                                      pool: DataFrame): DataFrame = {
    val bLit = lit(DsirBuckets.toLong)
    // localCheckpoints (r18, the RankedCumsum lineage rule): ct/cr each
    // feed a totals aggregate (nt/nr) AND the ratio join — left lazy,
    // the hashed-bigram explode behind target/pool re-executed once per
    // consumer. Both ≤ DsirBuckets rows by construction; values
    // untouched.
    val ct = target.groupBy(col("b")).agg(count(lit(1)).as("ct"))
      .localCheckpoint()
    val cr = pool.groupBy(col("b")).agg(count(lit(1)).as("cr"))
      .localCheckpoint()
    val nt = ct.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    val nr = cr.agg(coalesce(sum(col("cr")), lit(0L)).as("nr"))
    val ratio = cr.join(ct, Seq("b"), "left").na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        (log((col("ct") + 1).cast("double")) -
          log((col("nt") + bLit).cast("double")) -
          log((col("cr") + 1).cast("double")) +
          log((col("nr") + bLit).cast("double"))).as("lr"))
    pool.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("lr").cast("decimal(28,12)")).cast("double").as("sw"))
      .select(col("doc_id"), col("lang"), col("n_grams"),
        round(col("sw"), 6).as("weight"))
  }

  /** The (doc_id, idx, h) chunk table at q66's geometry (32-token
    * windows every 24 tokens, charHash fingerprints). */
  private def chunkTable(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val st = TextQueries.ChunkStride
    val cs = TextQueries.ChunkSize
    docs(s, dir)
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
  }

  /** q80's deterministic PII injection — text plus an email / phone /
    * IPv4 literal by doc_id residue class (doc 0 gets all three). The
    * oracle twin is [[injectPiiSql]]; both must track exactly. */
  private def injectPii(docId: Column, text: Column): Column = concat(
    text,
    when(pmod(docId, lit(3L)) === 0,
      concat(lit(" contact u"), docId, lit("@ex-mail.org"))).otherwise(lit("")),
    when(pmod(docId, lit(4L)) === 0,
      concat(lit(" call +1-555-"),
        lpad(pmod(docId, lit(10000L)).cast("string"), 4, "0"))).otherwise(lit("")),
    when(pmod(docId, lit(5L)) === 0,
      concat(lit(" from 10.0."), pmod(docId, lit(256L)),
        lit("."), pmod(docId * 7, lit(256L)))).otherwise(lit("")))

  private def injectPiiSql(id: String, e: String): String =
    s"($e || " +
      s"(CASE WHEN $id % 3 = 0 THEN ' contact u' || $id || '@ex-mail.org' ELSE '' END) || " +
      s"(CASE WHEN $id % 4 = 0 THEN ' call +1-555-' || lpad(($id % 10000)::VARCHAR, 4, '0') ELSE '' END) || " +
      s"(CASE WHEN $id % 5 = 0 THEN ' from 10.0.' || ($id % 256) || '.' || (($id * 7) % 256) ELSE '' END))"

  /** The three per-doc quality signals of the q98 ensemble — q14's
    * heuristic quality, q55's per-token unigram log-likelihood, and
    * within-doc shingle diversity — as (doc_id, score) tables, every
    * score 6-dp rounded. Shared by q98 (rank ensemble) and q123
    * (redundancy correlation matrix) so both audit the SAME signals. */
  private[graft] def qualitySignals(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val enr = TextQueries.enriched(s, dir)
    val q = enr.select(col("doc_id"),
      graft.functions.TextFunctions.qualityScore(
        col("n_tokens"), col("n_distinct"),
        col("n_stop").cast("double") / col("n_tokens"),
        col("char_sum").cast("double") / col("n_tokens")).as("score"))
    // the unigram log-likelihood signal IS lmScored's avg_ll: same
    // tokenized corpus, same unigram counts gc and total nt, the same
    // decimal(28,12)-routed per-doc sum of log(c) − log(nt) (grouping
    // additionally by the doc-functionally-dependent lang cannot move
    // an associative sum), the same round(·/dl, 6) — so read the
    // SESSION-CACHED scoring pass (lmScored — q55/q112/q143's table)
    // instead of re-running the corpus explode + join + rollup per
    // consumer per evaluation. Bit-identical by construction; the
    // q98/q123 oracles' own `ll` CTE is unchanged and still matches.
    val ll = lmScored(s, dir)
      .select(col("doc_id"), col("avg_ll").as("score"))
    val dv = DedupQueries.hashedShingles(s, dir)
      .join(enr.select(col("doc_id"), col("n_tokens")), "doc_id")
      .select(col("doc_id"),
        round(size(col("hs")).cast("double") /
          greatest(col("n_tokens") - 2, lit(1L)).cast("double"), 6).as("score"))
    (q, ll, dv)
  }

  /** The oracle twin of [[qualitySignals]]: CTEs defining `q`, `ll`
    * and `dv` (plus their intermediates) — shared verbatim by the q98
    * and q123 oracles. */
  private def signalCtes: String = {
    val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
    val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
    s"""enriched AS (${TextQueries.enrichedSql}),
       |q AS (SELECT doc_id,
       |    ${graft.functions.TextFunctions.qualityScoreSql(
             "n_tokens", "n_distinct", stopRatio, avgTokLen)} AS score
       |  FROM enriched),
       |dd AS (${KeywordQueries.tokenizedDocsSql}),
       |tf AS (SELECT doc_id, dl, unnest(toks) AS tok FROM dd),
       |gc AS (SELECT tok, COUNT(*) AS c FROM tf GROUP BY tok),
       |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM gc),
       |llg AS (
       |  SELECT tf.doc_id, tf.dl,
       |    CAST(SUM(CAST(ln(c::DOUBLE) - ln(nt::DOUBLE)
       |      AS DECIMAL(28,12))) AS DOUBLE) AS sl
       |  FROM tf JOIN gc USING (tok) CROSS JOIN n
       |  GROUP BY tf.doc_id, tf.dl),
       |ll AS (SELECT doc_id, round(sl / dl, 6) AS score FROM llg),
       |sh AS (${DedupQueries.hashedShinglesSql}),
       |dv AS (
       |  SELECT sh.doc_id,
       |    round(len(sh.hs)::DOUBLE
       |      / greatest(e.n_tokens - 2, 1), 6) AS score
       |  FROM sh JOIN enriched e ON sh.doc_id = e.doc_id)""".stripMargin
  }

  /** q56's oracle chain through `win` (the per-test-vector vote
    * ranking) — shared verbatim by q56 and q121 so the eval table is
    * checked against the SAME prediction SQL it audits. */
  private def knnVoteCtes: String = {
    val cos = AnnQueries.cosSql("t.embedding", "q.embedding")
    s"""e AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
       |    ${splitBucketSql("vec_id")} AS bucket
       |  FROM embeddings WHERE len(embedding) = 64),
       |q AS (SELECT vec_id, label AS true_label, embedding FROM e WHERE bucket >= 90),
       |t AS (SELECT vec_id AS tid, label AS tl, embedding FROM e WHERE bucket < 80),
       |scored AS (
       |  SELECT q.vec_id, q.true_label, t.tid, t.tl,
       |    round($cos, 6) AS score
       |  FROM t CROSS JOIN q),
       |ranked AS (
       |  SELECT vec_id, true_label, tl,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, tid ASC) AS rk
       |  FROM scored),
       |votes AS (
       |  SELECT vec_id, true_label, tl, COUNT(*) AS n_votes
       |  FROM ranked WHERE rk <= $KnnVoteK
       |  GROUP BY vec_id, true_label, tl),
       |win AS (
       |  SELECT vec_id, true_label, tl AS pred_label, n_votes,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY n_votes DESC, tl ASC) AS vrk
       |  FROM votes)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q52_decontamination" ->
      s"""WITH sh AS (${DedupQueries.hashedShinglesSql}),
         |ws AS (SELECT doc_id, lang, hs, ${splitBucketSql("doc_id")} AS bucket FROM sh),
         |tr AS (SELECT DISTINCT unnest(hs) AS h FROM ws WHERE bucket < 80),
         |te AS (SELECT doc_id, lang, unnest(hs) AS h FROM ws WHERE bucket >= 90),
         |ov AS (
         |  SELECT te.doc_id, te.lang, COUNT(*) AS n_sh,
         |    CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM te LEFT JOIN tr ON te.h = tr.h
         |  GROUP BY te.doc_id, te.lang),
         |fr AS (
         |  SELECT doc_id, lang,
         |    round(n_hit::DOUBLE / n_sh, 6) AS overlap
         |  FROM ov)
         |SELECT lang, COUNT(*) AS n_test_docs,
         |  CAST(SUM(CASE WHEN overlap >= $ContaminationMax THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  round(CAST(SUM(CAST(overlap AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_overlap
         |FROM fr GROUP BY lang ORDER BY lang""".stripMargin,

    // the Bloom sketch is a pure physical-plan reduction: false
    // positives are removed by the exact join, false negatives cannot
    // occur — so the oracle is the sketch-free exact computation
    "q65_bloom_decontam" ->
      s"""WITH sh AS (${DedupQueries.hashedShinglesSql}),
         |ws AS (SELECT doc_id, lang, hs, ${splitBucketSql("doc_id")} AS bucket FROM sh),
         |tr AS (SELECT DISTINCT unnest(hs) AS h FROM ws WHERE bucket < 80),
         |te AS (SELECT doc_id, lang, unnest(hs) AS h FROM ws WHERE bucket >= 90),
         |ov AS (
         |  SELECT te.doc_id, te.lang, COUNT(*) AS n_sh,
         |    CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM te LEFT JOIN tr ON te.h = tr.h
         |  GROUP BY te.doc_id, te.lang)
         |SELECT doc_id, lang, n_sh, n_hit,
         |  round(n_hit::DOUBLE / n_sh, 6) AS overlap
         |FROM ov WHERE round(n_hit::DOUBLE / n_sh, 6) >= $ContaminationMax
         |ORDER BY doc_id""".stripMargin,

    "q62_oov_rate" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |t AS (SELECT doc_id, lang, toks, ${splitBucketSql("doc_id")} AS bucket FROM dd),
         |vocab AS (SELECT DISTINCT unnest(toks) AS tok FROM t WHERE bucket < 80),
         |test AS (SELECT doc_id, lang, unnest(toks) AS tok FROM t WHERE bucket >= 90),
         |j AS (
         |  SELECT test.lang, CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM test LEFT JOIN vocab ON test.tok = vocab.tok)
         |SELECT lang, COUNT(*) AS n_test_tokens,
         |  CAST(SUM(oov) AS BIGINT) AS n_oov,
         |  round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,

    "q53_domain_mix" -> {
      val (a, b) = MixPair
      val wcase = MixTargets
        .map { case (l, w) => s"WHEN lang = '$l' THEN $w" }
        .mkString("CASE ", " ", " ELSE 0 END")
      s"""WITH d AS (
         |  SELECT doc_id, lang, n_chars, $wcase AS w,
         |    (($a * doc_id + $b) % $P) AS h
         |  FROM documents WHERE ($wcase) > 0),
         |counts AS (SELECT lang, w, COUNT(*) AS n_total FROM d GROUP BY lang, w),
         |tmin AS (SELECT MIN(n_total * $MixTotal // w) AS t FROM counts),
         |takes AS (SELECT lang, w, n_total, t * w // $MixTotal AS n_take
         |          FROM counts CROSS JOIN tmin),
         |ranked AS (
         |  SELECT doc_id, lang, n_chars,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
         |  FROM d)
         |SELECT r.lang, CAST(k.w AS BIGINT) AS target_pct,
         |  k.n_total, k.n_take,
         |  CAST(SUM(CASE WHEN r.rk <= k.n_take THEN r.n_chars ELSE 0 END) AS BIGINT)
         |    AS n_chars_sel,
         |  MIN(CASE WHEN r.rk <= k.n_take THEN r.doc_id END) AS min_sel,
         |  MAX(CASE WHEN r.rk <= k.n_take THEN r.doc_id END) AS max_sel
         |FROM ranked r JOIN takes k ON r.lang = k.lang
         |GROUP BY r.lang, k.w, k.n_total, k.n_take
         |ORDER BY r.lang""".stripMargin
    },

    "q54_length_trim" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |t AS (SELECT doc_id, lang, CAST(dl AS BIGINT) AS n_tokens FROM dd),
         |ranked AS (
         |  SELECT doc_id, lang, n_tokens,
         |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS r,
         |    COUNT(*) OVER (PARTITION BY lang) AS n
         |  FROM t),
         |k AS (
         |  SELECT lang, n_tokens,
         |    (r * 100 > n * $TrimPct AND r * 100 <= n * ${100 - TrimPct}) AS kept
         |  FROM ranked)
         |SELECT lang, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  MIN(CASE WHEN kept THEN n_tokens END) AS min_kept_tokens,
         |  MAX(CASE WHEN kept THEN n_tokens END) AS max_kept_tokens,
         |  round(CAST(SUM(CAST(CASE WHEN kept THEN n_tokens ELSE 0 END
         |    AS DECIMAL(28,6))) AS DOUBLE)
         |    / SUM(CASE WHEN kept THEN 1 ELSE 0 END), 6) AS avg_kept_tokens
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q55_unigram_loglik" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |tf AS (SELECT doc_id, lang, dl, unnest(toks) AS tok FROM dd),
         |gc AS (SELECT tok, COUNT(*) AS c FROM tf GROUP BY tok),
         |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok_total FROM gc),
         |ll AS (
         |  SELECT tf.doc_id, tf.lang, tf.dl,
         |    CAST(SUM(CAST(ln(c::DOUBLE) - ln(n_tok_total::DOUBLE)
         |      AS DECIMAL(28,12))) AS DOUBLE) AS sum_ll
         |  FROM tf JOIN gc USING (tok) CROSS JOIN n
         |  GROUP BY tf.doc_id, tf.lang, tf.dl)
         |SELECT doc_id, lang, CAST(dl AS BIGINT) AS n_tokens,
         |  round(sum_ll / dl, 6) AS avg_ll
         |FROM ll
         |ORDER BY avg_ll ASC, doc_id ASC LIMIT $UnigramBottomK""".stripMargin,

    "q90_bigram_lm" -> {
      val a = StupidBackoffAlpha
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |ws AS (SELECT doc_id, lang, toks, ${splitBucketSql("doc_id")} AS bucket FROM dd),
         |c1 AS (SELECT w, COUNT(*)::BIGINT AS c1 FROM
         |  (SELECT unnest(toks) AS w FROM ws WHERE bucket < 80) GROUP BY w),
         |st AS (SELECT (CAST(SUM(c1) AS BIGINT) + COUNT(*)::BIGINT) AS nv FROM c1),
         |c2 AS (SELECT w1, w2, COUNT(*)::BIGINT AS c2 FROM
         |  (SELECT toks[i+1] AS w1, toks[i+2] AS w2 FROM
         |    (SELECT toks, unnest(range(len(toks) - 1)) AS i
         |     FROM ws WHERE bucket < 80 AND len(toks) >= 2))
         |  GROUP BY w1, w2),
         |ti AS (SELECT doc_id, lang, toks[i+1] AS w1, toks[i+2] AS w2 FROM
         |  (SELECT doc_id, lang, toks, unnest(range(len(toks) - 1)) AS i
         |   FROM ws WHERE bucket >= 90 AND len(toks) >= 2)),
         |sc AS (SELECT t.doc_id, t.lang,
         |    CASE WHEN c2.c2 IS NOT NULL THEN ln(c2.c2::DOUBLE / u1.c1)
         |         ELSE ln($a * ((COALESCE(u2.c1, 0) + 1)::DOUBLE / nv)) END AS ll
         |  FROM ti t LEFT JOIN c2 ON t.w1 = c2.w1 AND t.w2 = c2.w2
         |  LEFT JOIN c1 u1 ON t.w1 = u1.w
         |  LEFT JOIN c1 u2 ON t.w2 = u2.w
         |  CROSS JOIN st)
         |SELECT doc_id, lang, COUNT(*)::BIGINT AS n_bigrams,
         |  round(CAST(SUM(CAST(ll AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_ll
         |FROM sc GROUP BY doc_id, lang
         |ORDER BY avg_ll ASC, doc_id ASC LIMIT $BigramBottomK""".stripMargin
    },

    "q112_ccnet_buckets" -> {
      val t = CcnetTerciles
      s"""WITH $lmScoredSql,
         |rk AS (SELECT *,
         |  ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY avg_ll DESC, doc_id ASC) AS r,
         |  COUNT(*) OVER (PARTITION BY lang) AS n_lang FROM av),
         |bk AS (SELECT lang, dl, avg_ll,
         |  CASE WHEN r * $t <= n_lang THEN 'head'
         |    WHEN r * $t <= n_lang * 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket FROM rk)
         |SELECT lang, bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS n_tokens,
         |  MIN(avg_ll) AS min_ll, MAX(avg_ll) AS max_ll,
         |  round(CAST(SUM(CAST(avg_ll AS DECIMAL(28,12))) AS DOUBLE)
         |    / COUNT(*), 6) AS mean_ll
         |FROM bk GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin
    },

    "q143_hedge_mix" -> {
      val eta = s"CAST($HedgeEta AS DOUBLE)"
      val rounds = (1 to HedgeRounds).map { t =>
        val prev = if (t == 1) "r0" else s"r${t - 1}"
        val prevW = if (t == 1) "w0" else s"w${t - 1}"
        val keep = ("lang" +: "n_toks" +: "nll" +: "excess" +:
          (1 until t).map(i => s"w$i")).mkString(", ")
        s"""f$t AS (SELECT *, round($prevW * exp($eta * excess), 9) AS f
           |  FROM $prev),
           |t$t AS (SELECT CAST(SUM(CAST(f AS DECIMAL(28,12))) AS DOUBLE)
           |  AS tf FROM f$t),
           |r$t AS (SELECT $keep, round(f / tf, 6) AS w$t
           |  FROM f$t CROSS JOIN t$t)""".stripMargin
      }.mkString(",\n")
      val outW = (1 to HedgeRounds).map(t => s"w$t").mkString(", ")
      s"""WITH $lmScoredSql,
         |d0 AS (SELECT lang, CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS n_toks,
         |    CAST(SUM(CAST(sum_ll AS DECIMAL(28,12))) AS DOUBLE) AS sll
         |  FROM sc GROUP BY lang),
         |kk AS (SELECT COUNT(*)::BIGINT AS k,
         |    MIN(round(-sll / n_toks::DOUBLE, 6)) AS mn FROM d0),
         |r0 AS (SELECT lang, n_toks, round(-sll / n_toks::DOUBLE, 6) AS nll,
         |    round(round(-sll / n_toks::DOUBLE, 6) - mn, 6) AS excess,
         |    round(1.0 / k::DOUBLE, 6) AS w0
         |  FROM d0 CROSS JOIN kk),
         |$rounds
         |SELECT lang, n_toks, nll, excess, $outW
         |FROM r$HedgeRounds ORDER BY lang""".stripMargin
    },

    "q133_trim_sketch" -> {
      val w = TrimBinW
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |t AS (SELECT doc_id, lang, CAST(dl AS BIGINT) AS n_tokens,
         |  CAST(dl AS BIGINT) // $w AS bin FROM dd),
         |hist AS (SELECT lang, bin, COUNT(*)::BIGINT AS n
         |  FROM t GROUP BY lang, bin),
         |cum AS (SELECT lang, bin,
         |    SUM(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
         |    SUM(n) OVER (PARTITION BY lang) AS total
         |  FROM hist),
         |cuts AS (SELECT lang,
         |    MIN(CASE WHEN cum >= (total * $TrimPct) // 100 + 1 THEN bin END)
         |      AS lo_bin,
         |    MIN(CASE WHEN cum >= (total * ${100 - TrimPct}) // 100 THEN bin END)
         |      AS hi_bin,
         |    MAX(total) AS n_total
         |  FROM cum GROUP BY lang),
         |k AS (SELECT t.lang, n_tokens, lo_bin, hi_bin, n_total,
         |    (bin >= lo_bin AND bin <= hi_bin) AS kept
         |  FROM t JOIN cuts USING (lang))
         |SELECT lang, CAST(MAX(n_total) AS BIGINT) AS n_total,
         |  CAST(MAX(lo_bin * $w) AS BIGINT) AS lo_cut,
         |  CAST(MAX((hi_bin + 1) * $w) AS BIGINT) AS hi_cut,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  MIN(CASE WHEN kept THEN n_tokens END) AS min_kept_tokens,
         |  MAX(CASE WHEN kept THEN n_tokens END) AS max_kept_tokens,
         |  round(CAST(SUM(CAST(CASE WHEN kept THEN n_tokens ELSE 0 END
         |    AS DECIMAL(28,6))) AS DOUBLE)
         |    / SUM(CASE WHEN kept THEN 1 ELSE 0 END), 6) AS avg_kept_tokens
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q134_ccnet_sketch" -> {
      val t = CcnetTerciles
      s"""WITH $lmScoredSql,
         |bn AS (SELECT doc_id, lang, dl, avg_ll,
         |  CAST(floor(avg_ll * $CcnetBinInv) AS BIGINT) AS bin FROM av),
         |hist AS (SELECT lang, bin, COUNT(*)::BIGINT AS n
         |  FROM bn GROUP BY lang, bin),
         |cum AS (SELECT lang, bin,
         |    SUM(n) OVER (PARTITION BY lang ORDER BY bin DESC) AS cum,
         |    SUM(n) OVER (PARTITION BY lang) AS total
         |  FROM hist),
         |cuts AS (SELECT lang,
         |    MAX(CASE WHEN cum * $t >= total THEN bin END) AS b1,
         |    MAX(CASE WHEN cum * $t >= total * 2 THEN bin END) AS b2
         |  FROM cum GROUP BY lang),
         |bk AS (SELECT bn.lang, dl, avg_ll,
         |    CASE WHEN bin >= b1 THEN 'head'
         |      WHEN bin >= b2 THEN 'middle'
         |      ELSE 'tail' END AS bucket
         |  FROM bn JOIN cuts USING (lang))
         |SELECT lang, bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(dl AS BIGINT)) AS BIGINT) AS n_tokens,
         |  MIN(avg_ll) AS min_ll, MAX(avg_ll) AS max_ll,
         |  round(CAST(SUM(CAST(avg_ll AS DECIMAL(28,12))) AS DOUBLE)
         |    / COUNT(*), 6) AS mean_ll
         |FROM bk GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin
    },

    "q56_knn_vote" ->
      s"""WITH $knnVoteCtes
         |SELECT vec_id, true_label, pred_label, n_votes,
         |  CAST(true_label = pred_label AS BIGINT) AS correct
         |FROM win WHERE vrk = 1 ORDER BY vec_id""".stripMargin,

    "q121_knn_confusion" ->
      s"""WITH $knnVoteCtes,
         |preds AS (SELECT true_label, pred_label FROM win WHERE vrk = 1),
         |tc AS (SELECT true_label AS label, COUNT(*)::BIGINT AS support,
         |    CAST(COALESCE(SUM(CASE WHEN pred_label = true_label THEN 1 END), 0)
         |      AS BIGINT) AS tp
         |  FROM preds GROUP BY true_label),
         |pc AS (SELECT pred_label AS label, COUNT(*)::BIGINT AS n_pred
         |  FROM preds GROUP BY pred_label),
         |lbl AS (SELECT true_label AS label FROM preds
         |  UNION SELECT pred_label FROM preds)
         |SELECT lbl.label,
         |  CAST(COALESCE(tc.support, 0) AS BIGINT) AS support,
         |  CAST(COALESCE(pc.n_pred, 0) AS BIGINT) AS n_pred,
         |  CAST(COALESCE(tc.tp, 0) AS BIGINT) AS tp,
         |  CASE WHEN COALESCE(pc.n_pred, 0) > 0
         |    THEN round(COALESCE(tc.tp, 0)::DOUBLE / pc.n_pred::DOUBLE, 6) END AS prec,
         |  CASE WHEN COALESCE(tc.support, 0) > 0
         |    THEN round(tc.tp::DOUBLE / tc.support::DOUBLE, 6) END AS recall,
         |  round(2.0 * COALESCE(tc.tp, 0)::DOUBLE /
         |    (COALESCE(tc.support, 0) + COALESCE(pc.n_pred, 0))::DOUBLE, 6) AS f1
         |FROM lbl LEFT JOIN tc ON lbl.label = tc.label
         |LEFT JOIN pc ON lbl.label = pc.label
         |ORDER BY lbl.label""".stripMargin,

    "q82_dsir_weights" -> {
      val bN = DsirBuckets
      val sh2 = TextQueries.shingleSql("toks", 2)
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |ws AS (SELECT doc_id, lang, toks, ${splitBucketSql("doc_id")} AS bucket FROM dd),
         |bg AS (SELECT doc_id, lang, bucket, ${charHashSql("s")} % $bN AS b
         |  FROM (SELECT doc_id, lang, bucket, unnest($sh2) AS s FROM ws)),
         |ct AS (SELECT b, COUNT(*) AS ct FROM bg WHERE bucket >= 90 GROUP BY b),
         |cr AS (SELECT b, COUNT(*) AS cr FROM bg WHERE bucket < 80 GROUP BY b),
         |nt AS (SELECT COALESCE(SUM(ct), 0)::BIGINT AS nt FROM ct),
         |nr AS (SELECT COALESCE(SUM(cr), 0)::BIGINT AS nr FROM cr),
         |ratio AS (
         |  SELECT cr.b,
         |    ln((COALESCE(ct.ct, 0) + 1)::DOUBLE) - ln((nt + $bN)::DOUBLE)
         |    - ln((cr.cr + 1)::DOUBLE) + ln((nr + $bN)::DOUBLE) AS lr
         |  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN nt CROSS JOIN nr),
         |w AS (
         |  SELECT bg.doc_id, bg.lang, COUNT(*)::BIGINT AS n_grams,
         |    round(CAST(SUM(CAST(lr AS DECIMAL(28,12))) AS DOUBLE), 6) AS weight
         |  FROM bg JOIN ratio ON bg.b = ratio.b WHERE bg.bucket < 80
         |  GROUP BY bg.doc_id, bg.lang)
         |SELECT doc_id, lang, n_grams, weight FROM w
         |ORDER BY weight DESC, doc_id ASC LIMIT $DsirTopK""".stripMargin
    },

    // both GD iterations unrolled op-for-op: hash-green certifies the
    // training arithmetic AND the scoring pass (see qcIterSql)
    "q86_quality_classifier" -> {
      val bN = DsirBuckets
      val sh2 = TextQueries.shingleSql("toks", 2)
      val sig = graft.operators.QualityClassifier.fastSigmoidSql("z")
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |ws AS (SELECT doc_id, lang, toks, ${splitBucketSql("doc_id")} AS bucket FROM dd),
         |bgi AS (SELECT doc_id, lang, bucket, ${charHashSql("s")} % $bN AS b
         |  FROM (SELECT doc_id, lang, bucket, unnest($sh2) AS s FROM ws)),
         |fb0 AS (SELECT DISTINCT doc_id, lang, bucket, b FROM bgi),
         |feats AS (SELECT * FROM fb0
         |  UNION ALL SELECT DISTINCT doc_id, lang, bucket, -1::BIGINT AS b FROM fb0),
         |train AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket >= 90 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y, b
         |  FROM feats WHERE bucket >= 90 OR bucket < 80),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM train),
         |w0 AS (SELECT DISTINCT b, 0.0::DOUBLE AS w FROM train),
         |${qcIterSql("w0", 1)},
         |${qcIterSql("w1", 2)},
         |sc AS (
         |  SELECT f.doc_id, f.lang,
         |    CASE WHEN f.bucket >= 90 THEN 'target'
         |         WHEN f.bucket < 80 THEN 'pool' ELSE 'holdout' END AS split,
         |    COUNT(*)::BIGINT AS n_feats,
         |    CAST(SUM(CAST(COALESCE(w2.w, 0.0) AS DECIMAL(27,10))) AS DOUBLE) AS z
         |  FROM feats f LEFT JOIN w2 ON f.b = w2.b
         |  GROUP BY f.doc_id, f.lang, f.bucket)
         |SELECT doc_id, lang, split, n_feats,
         |  round($sig, 6) AS score,
         |  CAST(round($sig, 6) >= 0.5 AS INT) AS pred
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q117_classifier_auc" -> {
      val bN = DsirBuckets
      val sh2 = TextQueries.shingleSql("toks", 2)
      val sig = graft.operators.QualityClassifier.fastSigmoidSql("z")
      // same unrolled-GD chain as q86, scores restricted to the labeled
      // (target/pool) docs, then the identical midrank algebra: ordinal
      // ranks ascending by (score, doc_id), midrank per tie group from
      // min/max, exact-integer u2 before the one final division
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |ws AS (SELECT doc_id, lang, toks, ${splitBucketSql("doc_id")} AS bucket FROM dd),
         |bgi AS (SELECT doc_id, lang, bucket, ${charHashSql("s")} % $bN AS b
         |  FROM (SELECT doc_id, lang, bucket, unnest($sh2) AS s FROM ws)),
         |fb0 AS (SELECT DISTINCT doc_id, lang, bucket, b FROM bgi),
         |feats AS (SELECT * FROM fb0
         |  UNION ALL SELECT DISTINCT doc_id, lang, bucket, -1::BIGINT AS b FROM fb0),
         |train AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket >= 90 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS y, b
         |  FROM feats WHERE bucket >= 90 OR bucket < 80),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM train),
         |w0 AS (SELECT DISTINCT b, 0.0::DOUBLE AS w FROM train),
         |${qcIterSql("w0", 1)},
         |${qcIterSql("w1", 2)},
         |sc AS (
         |  SELECT f.doc_id,
         |    CAST(CASE WHEN f.bucket >= 90 THEN 1 ELSE 0 END AS BIGINT) AS pos,
         |    CAST(SUM(CAST(COALESCE(w2.w, 0.0) AS DECIMAL(27,10))) AS DOUBLE) AS z
         |  FROM feats f LEFT JOIN w2 ON f.b = w2.b
         |  WHERE f.bucket >= 90 OR f.bucket < 80
         |  GROUP BY f.doc_id, f.bucket),
         |sr AS (SELECT doc_id, pos, round($sig, 6) AS score FROM sc),
         |rk AS (SELECT doc_id, pos, score,
         |  row_number() OVER (ORDER BY score ASC, doc_id ASC) AS rn FROM sr),
         |bs AS (SELECT score, MIN(rn) AS minr, MAX(rn) AS maxr,
         |    CAST(SUM(pos) AS BIGINT) AS pos_at,
         |    CAST(COUNT(*) - SUM(pos) AS BIGINT) AS neg_at
         |  FROM rk GROUP BY score),
         |t AS (SELECT CAST(SUM(pos_at) AS BIGINT) AS n_pos,
         |    CAST(SUM(neg_at) AS BIGINT) AS n_neg,
         |    CAST(SUM(pos_at * (minr + maxr)) AS BIGINT) AS s2r FROM bs)
         |SELECT n_pos, n_neg,
         |  CAST(s2r - n_pos * (n_pos + 1) AS BIGINT) AS u2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    round((s2r - n_pos * (n_pos + 1))::DOUBLE
         |      / (2.0 * (n_pos * n_neg)::DOUBLE), 6) END AS auc,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    round((s2r - n_pos * (n_pos + 1))::DOUBLE
         |      / (n_pos * n_neg)::DOUBLE - 1.0, 6) END AS gini
         |FROM t""".stripMargin
    },

    "q79_boilerplate_scrub" -> {
      val stn = TextQueries.ChunkStride
      val csn = TextQueries.ChunkSize
      val chunkText = s"array_to_string(list_slice(toks, i * $stn + 1, i * $stn + $csn), ' ')"
      s"""WITH d AS (SELECT doc_id, ${graft.functions.TextFunctions.tokensSql("text")} AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |    ((len(toks)::BIGINT + ${stn - 1}) // $stn) AS n_chunks FROM d),
         |chunks AS (SELECT doc_id,
         |    unnest(list_transform(range(n_chunks), i -> ${charHashSql(chunkText)})) AS h
         |  FROM c WHERE n_chunks > 0),
         |bp AS (SELECT h FROM chunks GROUP BY h
         |       HAVING COUNT(DISTINCT doc_id) >= $BoilerplateMinDf)
         |SELECT chunks.doc_id, COUNT(*)::BIGINT AS n_chunks,
         |  CAST(SUM(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bp,
         |  CAST(SUM(CASE WHEN bp.h IS NULL THEN chunks.h ELSE 0 END) AS BIGINT)
         |    AS kept_checksum,
         |  round((COUNT(*) - SUM(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END))::DOUBLE
         |    / COUNT(*), 6) AS kept_ratio
         |FROM chunks LEFT JOIN bp ON chunks.h = bp.h
         |GROUP BY chunks.doc_id ORDER BY chunks.doc_id""".stripMargin
    },

    "q80_pii_scrub" -> {
      import graft.operators.Scrub
      s"""WITH p AS (SELECT doc_id, ${injectPiiSql("doc_id", "text")} AS text FROM documents)
         |SELECT doc_id,
         |  ${Scrub.piiCountSql("text", Scrub.EmailPattern)} AS n_email,
         |  ${Scrub.piiCountSql("text", Scrub.PhonePattern)} AS n_phone,
         |  ${Scrub.piiCountSql("text", Scrub.Ipv4Pattern)} AS n_ip,
         |  length(${Scrub.redactSql("text")})::BIGINT AS clean_len,
         |  ${charHashSql(Scrub.redactSql("text"))} AS clean_fp
         |FROM p ORDER BY doc_id""".stripMargin
    },

    // all four global ranks expressed as row_number windows (fine at
    // oracle scale; the Spark side uses the two-pass distributed rank)
    "q123_signal_corr" -> {
      def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) = {
        val vx = s"(n::DOUBLE * $sxx - $sx * $sx)"
        val vy = s"(n::DOUBLE * $syy - $sy * $sy)"
        s"CASE WHEN $vx > 0 AND $vy > 0 THEN " +
          s"round((n::DOUBLE * $sxy - $sx * $sy) / sqrt($vx * $vy), 6) END"
      }
      s"""WITH $signalCtes,
         |j AS (SELECT q.doc_id, q.score AS xq, ll.score AS xl, dv.score AS xd
         |  FROM q JOIN ll USING (doc_id) JOIN dv USING (doc_id)),
         |t AS (SELECT COUNT(*)::BIGINT AS n,
         |    CAST(SUM(CAST(xq AS DECIMAL(28,6))) AS DOUBLE) AS sq,
         |    CAST(SUM(CAST(xl AS DECIMAL(28,6))) AS DOUBLE) AS sl,
         |    CAST(SUM(CAST(xd AS DECIMAL(28,6))) AS DOUBLE) AS sd,
         |    CAST(SUM(CAST(xq * xq AS DECIMAL(28,12))) AS DOUBLE) AS sqq,
         |    CAST(SUM(CAST(xl * xl AS DECIMAL(28,12))) AS DOUBLE) AS sll,
         |    CAST(SUM(CAST(xd * xd AS DECIMAL(28,12))) AS DOUBLE) AS sdd,
         |    CAST(SUM(CAST(xq * xl AS DECIMAL(28,12))) AS DOUBLE) AS sql_,
         |    CAST(SUM(CAST(xq * xd AS DECIMAL(28,12))) AS DOUBLE) AS sqd,
         |    CAST(SUM(CAST(xl * xd AS DECIMAL(28,12))) AS DOUBLE) AS sld
         |  FROM j)
         |SELECT n,
         |  ${r("sql_", "sq", "sl", "sqq", "sll")} AS r_quality_loglik,
         |  ${r("sqd", "sq", "sd", "sqq", "sdd")} AS r_quality_diversity,
         |  ${r("sld", "sl", "sd", "sll", "sdd")} AS r_loglik_diversity
         |FROM t""".stripMargin
    },

    "q98_rank_ensemble" -> {
      s"""WITH $signalCtes,
         |r1 AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r_quality FROM q),
         |r2 AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r_loglik FROM ll),
         |r3 AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS r_diversity FROM dv),
         |b AS (
         |  SELECT r1.doc_id, r_quality, r_loglik, r_diversity,
         |    round((r_quality + r_loglik + r_diversity) / 3.0, 6) AS borda
         |  FROM r1 JOIN r2 USING (doc_id) JOIN r3 USING (doc_id)),
         |f AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY borda ASC, doc_id ASC) AS BIGINT) AS final_rank FROM b),
         |nn AS (SELECT COUNT(*) AS n_docs FROM b)
         |SELECT b.doc_id, r_quality, r_loglik, r_diversity, borda, final_rank,
         |  (final_rank - 1) * 3 // n_docs + 1 AS bucket
         |FROM b JOIN f USING (doc_id) CROSS JOIN nn ORDER BY b.doc_id""".stripMargin
    },

    "q94_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(round(sqrt(COUNT(*)::DOUBLE), 6) AS DECIMAL(28,6)) AS sqrt_n
        |  FROM documents GROUP BY lang),
        |t AS (SELECT SUM(n_docs) AS n_total, SUM(sqrt_n) AS s_total FROM c),
        |sh AS (
        |  SELECT lang, n_docs,
        |    round(n_docs::DOUBLE / CAST(n_total AS DOUBLE), 6) AS raw_share,
        |    round(CAST(sqrt_n AS DOUBLE) / CAST(s_total AS DOUBLE), 6) AS temp_share,
        |    round((CAST(sqrt_n AS DOUBLE) * CAST(n_total AS DOUBLE)) /
        |          (CAST(s_total AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6) AS boost
        |  FROM c CROSS JOIN t)
        |SELECT lang, n_docs, raw_share, temp_share, boost
        |FROM sh ORDER BY lang""".stripMargin,

    "q103_moore_lewis" ->
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |tf AS (
         |  SELECT dd.doc_id, dd.lang, d.source, dd.dl, unnest(dd.toks) AS tok
         |  FROM dd JOIN documents d ON dd.doc_id = d.doc_id),
         |gc AS (SELECT tok, COUNT(*) AS cg FROM tf GROUP BY tok),
         |gn AS (SELECT CAST(SUM(cg) AS BIGINT) AS n_gen,
         |  COUNT(*)::BIGINT AS v FROM gc),
         |ic AS (SELECT tok, COUNT(*) AS ci FROM tf
         |  WHERE source = '$MlInDomainSource' GROUP BY tok),
         |inn AS (SELECT CAST(SUM(ci) AS BIGINT) AS n_in FROM ic),
         |sc AS (
         |  SELECT tf.doc_id, tf.lang, tf.source, tf.dl,
         |    CAST(SUM(CAST(
         |      ln((COALESCE(ci, 0) + 1)::DOUBLE) - ln((n_in + v)::DOUBLE)
         |      - ln(cg::DOUBLE) + ln(n_gen::DOUBLE)
         |    AS DECIMAL(28,12))) AS DOUBLE) AS sum_ll
         |  FROM tf JOIN gc USING (tok) LEFT JOIN ic USING (tok)
         |  CROSS JOIN gn CROSS JOIN inn
         |  WHERE tf.source <> '$MlInDomainSource'
         |  GROUP BY tf.doc_id, tf.lang, tf.source, tf.dl)
         |SELECT doc_id, lang, source, CAST(dl AS BIGINT) AS n_tokens,
         |  round(sum_ll / dl, 6) AS celd
         |FROM sc ORDER BY celd DESC, doc_id ASC LIMIT $MlTopK""".stripMargin,

    "q106_epoch_alloc" -> {
      // one unrolled re-distribution round: rounds 2..AllocRounds all
      // apply the same operation CurationQueries' foldLeft runs
      def allocRound(prev: String, i: Int): String =
        s"""a$i AS (
           |  SELECT CAST(MAX(budget) - SUM(alloc) AS DECIMAL(28,6)) AS rem,
           |    CAST(SUM(CASE WHEN alloc < cap THEN sqrt_n ELSE 0 END)
           |      AS DECIMAL(28,6)) AS s_act FROM $prev),
           |r$i AS (
           |  SELECT lang, n_tok, sqrt_n, cap, budget, CAST(
           |    CASE WHEN alloc < cap AND s_act > 0 THEN
           |      least(alloc + CAST(round(
           |        (CAST(sqrt_n AS DOUBLE) / CAST(s_act AS DOUBLE)) *
           |          CAST(rem AS DOUBLE), 6) AS DECIMAL(28,6)), cap)
           |    ELSE alloc END AS DECIMAL(28,6)) AS alloc
           |  FROM $prev CROSS JOIN a$i)""".stripMargin
      val rounds = (2 to AllocRounds)
        .map(i => allocRound(s"r${i - 1}", i)).mkString(",\n")
      s"""WITH e AS (${TextQueries.enrichedSql}),
         |c AS (
         |  SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS n_tok,
         |    CAST(round(sqrt(CAST(SUM(n_tokens) AS DOUBLE)), 6)
         |      AS DECIMAL(28,6)) AS sqrt_n,
         |    CAST(SUM(n_tokens) * $AllocEpochCap AS DECIMAL(28,6)) AS cap
         |  FROM e GROUP BY lang),
         |t AS (
         |  SELECT CAST(SUM(n_tok) * $AllocBudgetNum // $AllocBudgetDen
         |      AS DECIMAL(28,6)) AS budget,
         |    CAST(SUM(sqrt_n) AS DECIMAL(28,6)) AS s_tot FROM c),
         |r1 AS (
         |  SELECT lang, n_tok, sqrt_n, cap, budget,
         |    least(CAST(round(
         |      (CAST(sqrt_n AS DOUBLE) / CAST(s_tot AS DOUBLE)) *
         |        CAST(budget AS DOUBLE), 6) AS DECIMAL(28,6)), cap) AS alloc
         |  FROM c CROSS JOIN t),
         |$rounds,
         |lv AS (SELECT CAST(MAX(budget) - SUM(alloc) AS DECIMAL(28,6))
         |  AS leftover FROM r$AllocRounds)
         |SELECT lang, n_tok, CAST(cap AS BIGINT) AS cap_tok,
         |  CAST(alloc AS DOUBLE) AS alloc,
         |  round(CAST(alloc AS DOUBLE) / n_tok::DOUBLE, 6) AS epochs,
         |  CAST(CASE WHEN alloc = cap THEN 1 ELSE 0 END AS BIGINT) AS saturated,
         |  CAST(leftover AS DOUBLE) AS leftover
         |FROM r$AllocRounds CROSS JOIN lv ORDER BY lang""".stripMargin
    },

    "q107_weighted_sample" -> {
      val (a, b) = WeightedSamplePair
      val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
      val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
      val w = graft.functions.TextFunctions.qualityScoreSql(
        "n_tokens", "n_distinct", stopRatio, avgTokLen)
      s"""WITH e AS (${TextQueries.enrichedSql}),
         |k AS (
         |  SELECT doc_id, lang, n_tokens, $w AS w,
         |    ((($a * doc_id + $b) % $P) + 1)::DOUBLE / ${(P + 1).toDouble} AS u
         |  FROM e)
         |SELECT doc_id, lang, n_tokens, w AS weight,
         |  round(ln(u) / w, 6) AS key
         |FROM k ORDER BY key DESC, doc_id ASC LIMIT $WsTopK""".stripMargin
    },

    "q108_dsir_resample" -> {
      val (a, b) = graft.functions.PortableHash.DsirSamplePair
      val bN = DsirBuckets
      val sh2 = TextQueries.shingleSql("toks", 2)
      s"""WITH dd AS (${KeywordQueries.tokenizedDocsSql}),
         |ws AS (SELECT doc_id, lang, toks, ${splitBucketSql("doc_id")} AS bucket FROM dd),
         |bg AS (SELECT doc_id, lang, bucket, ${charHashSql("s")} % $bN AS b
         |  FROM (SELECT doc_id, lang, bucket, unnest($sh2) AS s FROM ws)),
         |ct AS (SELECT b, COUNT(*) AS ct FROM bg WHERE bucket >= 90 GROUP BY b),
         |cr AS (SELECT b, COUNT(*) AS cr FROM bg WHERE bucket < 80 GROUP BY b),
         |nt AS (SELECT COALESCE(SUM(ct), 0)::BIGINT AS nt FROM ct),
         |nr AS (SELECT COALESCE(SUM(cr), 0)::BIGINT AS nr FROM cr),
         |ratio AS (
         |  SELECT cr.b,
         |    ln((COALESCE(ct.ct, 0) + 1)::DOUBLE) - ln((nt + $bN)::DOUBLE)
         |    - ln((cr.cr + 1)::DOUBLE) + ln((nr + $bN)::DOUBLE) AS lr
         |  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN nt CROSS JOIN nr),
         |w AS (
         |  SELECT bg.doc_id, bg.lang, COUNT(*)::BIGINT AS n_grams,
         |    round(CAST(SUM(CAST(lr AS DECIMAL(28,12))) AS DOUBLE), 6) AS weight
         |  FROM bg JOIN ratio ON bg.b = ratio.b WHERE bg.bucket < 80
         |  GROUP BY bg.doc_id, bg.lang),
         |k AS (
         |  SELECT doc_id, lang, n_grams, weight,
         |    ((($a * doc_id + $b) % $P) + 1)::DOUBLE / ${(P + 1).toDouble} AS u
         |  FROM w)
         |SELECT doc_id, lang, n_grams, weight,
         |  round(ln(-ln(u)) - weight, 6) AS race_key
         |FROM k ORDER BY race_key ASC, doc_id ASC LIMIT $DsirSampleK""".stripMargin
    },
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed global rank + running sum over a totally-ordered frame —
  * the scale-safe replacement for a single-partition window
  * (`Window.partitionBy(<constant>)`), whose one task must sort and
  * scan the whole input. A BPE-prep vocabulary at web scale is 10⁷–10⁸
  * distinct tokens; one executor thread sorting that is the kind of
  * plan that works at test SF and stalls at 100 TB.
  *
  * Classic two-pass shape:
  *  1. range-partition by the order (n desc, token asc) and sort within
  *     partitions — a normal parallel sort, every partition holds a
  *     contiguous rank range;
  *  2. per-partition (row count, sum) — #partitions tiny rows — are
  *     collected and prefix-summed on the driver into per-partition
  *     (rank, sum) offsets;
  *  3. a second pass over the SAME shuffle output (Spark reuses the
  *     map stage; only the reduce-side sort re-runs) emits each row's
  *     global rank and running sum as offset + local scan. Partitions
  *     whose rank offset is already past `topN` emit nothing — the
  *     at-scale pruning that makes the report O(topN) after the sort.
  *
  * Output is deterministic at any parallelism: the order key is total
  * (token is unique per row), so every row's rank and prefix sum are
  * independent of partition boundaries.
  */
object RankedCumsum {

  /** The vocabulary-coverage frame: input (token STRING, n LONG — one
    * row per distinct token), output the `topN` most frequent tokens as
    * (rank, token, n, cum_n, total_n), ranked by (n desc, token asc)
    * with cum_n the running sum of n and total_n the grand total. */
  def tokenCoverage(counts: DataFrame, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val spark = counts.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = counts
      .select(col("token").cast("string"), col("n").cast("long"))
      .repartitionByRange(parts, col("n").desc, col("token").asc)
      .sortWithinPartitions(col("n").desc, col("token").asc)
    // localCheckpoint: pass 1 (stats) materializes and PERSISTS the
    // sorted partitions, so pass 2 reads them back instead of re-running
    // the reduce-side sort — one sort total, not two (the map stage was
    // always shared; the sort was not). Same lineage-truncation tool
    // starContract uses; blocks are freed when the RDD is GC'd.
    val rdd = sorted.rdd.localCheckpoint()
    // pass 1: per-partition row/sum totals (#partitions rows collected)
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L
      var s = 0L
      it.foreach { r => rows += 1; s += r.getLong(1) }
      Iterator((i, rows, s))
    }.collect().sortBy(_._1)
    val total = stats.map(_._3).sum
    val offsets = stats
      .scanLeft((0L, 0L)) { case ((r, s), (_, pr, ps)) => (r + pr, s + ps) }
      .dropRight(1)
    // pass 2: offset + local running scan; rank-exhausted partitions
    // emit nothing (and their tasks do no per-row work)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val (rankOff, sumOff) = offsets(i)
      if (rankOff >= topN) Iterator.empty
      else new Iterator[(Long, String, Long, Long)] {
        private var rank = rankOff
        private var cum = sumOff
        def hasNext: Boolean = rank < topN && it.hasNext
        def next(): (Long, String, Long, Long) = {
          val r = it.next()
          rank += 1
          cum += r.getLong(1)
          (rank, r.getString(0), r.getLong(1), cum)
        }
      }
    }
    out.toDF("rank", "token", "n", "cum_n").withColumn("total_n", lit(total))
  }

  /** The training-loader frame (q91): input one row per document —
    * (h LONG: the shuffle-order key, doc_id LONG: unique tie-break,
    * n LONG: token count) — output every row with its global 1-based
    * rank in (h asc, doc_id asc) order, the running token sum BEFORE
    * it, and its slice id `cum_before div budget`: contiguous
    * fixed-token-budget slices of the shuffled corpus, the unit a
    * training run checkpoints and resumes at. Same two-pass shape as
    * [[tokenCoverage]] (range-partitioned parallel sort, one sort via
    * localCheckpoint, driver prefix of #partitions subtotals) — NO
    * single-partition window at any corpus size; all-integer, so the
    * DuckDB window-cumsum twin is exact. */
  def epochSlices(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = docs
      .select(col("h").cast("long"), col("doc_id").cast("long"), col("n").cast("long"))
      .repartitionByRange(parts, col("h").asc, col("doc_id").asc)
      .sortWithinPartitions(col("h").asc, col("doc_id").asc)
    val rdd = sorted.rdd.localCheckpoint()
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L
      var s = 0L
      it.foreach { r => rows += 1; s += r.getLong(2) }
      Iterator((i, rows, s))
    }.collect().sortBy(_._1)
    val offsets = stats
      .scanLeft((0L, 0L)) { case ((r, s), (_, pr, ps)) => (r + pr, s + ps) }
      .dropRight(1)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var (rank, cum) = offsets(i)
      it.map { r =>
        rank += 1
        val before = cum
        cum += r.getLong(2)
        (r.getLong(1), r.getLong(0), r.getLong(2), rank, before)
      }
    }
    out.toDF("doc_id", "h", "n", "rank", "cum_before")
      .withColumn("slice", expr(s"cum_before div $budget"))
  }

  /** The score-ranking frame (q98's per-signal primitive): input one
    * row per document — (doc_id LONG unique, score DOUBLE; the sort key
    * is defensively `round(score, 6)` here, idempotent for callers that
    * already rounded, so an unrounded caller cannot produce
    * Spark-vs-oracle rank flips on a ULP) — output
    * (doc_id, rank) with rank the global 1-based position in
    * (score desc, doc_id asc) order. Same two-pass shape as
    * [[tokenCoverage]]: range-partitioned parallel sort (one sort via
    * localCheckpoint), driver prefix of #partitions row counts, second
    * pass emits offset + local position. NO single-partition window at
    * any corpus size; the order key is total (doc_id unique) so the
    * result is independent of partitioning. */
  def scoreRank(scores: DataFrame): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = scores
      .select(col("doc_id").cast("long"),
        round(col("score").cast("double"), 6).as("score"))
      .repartitionByRange(parts, col("score").desc, col("doc_id").asc)
      .sortWithinPartitions(col("score").desc, col("doc_id").asc)
    val rdd = sorted.rdd.localCheckpoint()
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      var rows = 0L
      it.foreach(_ => rows += 1)
      Iterator((i, rows))
    }.collect().sortBy(_._1)
    val offsets = counts.scanLeft(0L) { case (acc, (_, n)) => acc + n }.dropRight(1)
    rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = offsets(i)
      it.map { r => rank += 1; (r.getLong(0), rank) }
    }.toDF("doc_id", "rank")
  }

  /** Distributed tie-aware ROC-AUC — Mann-Whitney U in midrank form,
    * with an EXACT-INTEGER numerator so the statistic is engine- and
    * partitioning-portable (no pair sampling, no trapezoid sweep over
    * float thresholds). Input: one row per scored item
    * (doc_id LONG unique, pos 0/1, score DOUBLE — defensively rounded
    * to 6 dp here, idempotent for compliant callers). Output ONE row:
    * (n_pos, n_neg, u2, auc, gini) where
    * `u2 = 2·Σ_pos midrank_asc − 2·P(P+1)/2` counts each (pos, neg)
    * pair twice (ties once each way), so `auc = u2 / (2·P·N)` and
    * `gini = u2/(P·N) − 1` — u2 stays a LONG until the single final
    * division, and both ratios are NULL when either class is empty
    * (identically in the SQL twin — no 0/0 NaN divergence).
    *
    * Shape at scale: ONE range-partitioned parallel sort of the narrow
    * (doc_id, score) table ([[scoreRank]] — no single-partition window
    * at any corpus size), one doc_id-keyed join back to the labels, one
    * map-side-combined groupBy(score) into the distinct-score directory
    * (midranks per tie group are just min+max of ordinal ranks), and a
    * final all-to-one aggregate of three LONG sums. Nothing quadratic
    * anywhere — the naive definition is P·N pair comparisons.
    *
    * Range bound: the numerator s2r = Σ pos_at·(minr+maxr) ≤ 2·P·T is
    * LONG arithmetic, so exactness holds only while 2·P·T < 2^63 —
    * i.e. P·T < ~4.6e18 (e.g. 1e9 positives in a ≤4.6e9-row corpus).
    * Beyond that, route s2r/u2 through DECIMAL(38,0) in BOTH engines;
    * kept LONG here because a decimal-typed output column would hit
    * the driver's decimal-rendering hash trap (see q106's history). */
  def auc(scored: DataFrame): DataFrame = {
    // localCheckpoint (the module's lineage rule): `labeled` feeds the
    // rank pass AND the midrank join — left lazy, the caller's scoring
    // subtree (for q117 a full classifier scoring pass) executes
    // twice. Narrow (id, score, pos) rows, corpus-bounded like the
    // sort itself; values untouched.
    val labeled = scored.select(col("doc_id").cast("long"),
      round(col("score").cast("double"), 6).as("score"),
      col("pos").cast("long").as("pos"))
      .localCheckpoint()
    // ascending-score ordinal ranks: scoreRank orders (score desc,
    // doc_id asc), so rank the NEGATED score (exact — already 6 dp)
    val ranks = scoreRank(labeled.select(col("doc_id"),
      (-col("score")).as("score")))
    val byScore = labeled.join(ranks, Seq("doc_id"))
      .groupBy(col("score"))
      .agg(min(col("rank")).as("minr"), max(col("rank")).as("maxr"),
        sum(col("pos")).as("pos_at"),
        (count(lit(1)) - sum(col("pos"))).as("neg_at"))
    // Σ_pos midrank = Σ_s pos(s)·(minr+maxr)/2 — keep the doubled form
    // so every intermediate is a LONG
    val tot = byScore.agg(
      sum(col("pos_at")).as("n_pos"),
      sum(col("neg_at")).as("n_neg"),
      sum(col("pos_at") * (col("minr") + col("maxr"))).as("s2r"))
    val u2 = col("s2r") - col("n_pos") * (col("n_pos") + 1)
    val pn = (col("n_pos") * col("n_neg")).cast("double")
    val ok = col("n_pos") > 0 && col("n_neg") > 0
    tot.select(col("n_pos"), col("n_neg"), u2.as("u2"),
      when(ok, round(u2.cast("double") / (lit(2.0) * pn), 6))
        .otherwise(lit(null).cast("double")).as("auc"),
      when(ok, round(u2.cast("double") / pn - lit(1.0), 6))
        .otherwise(lit(null).cast("double")).as("gini"))
  }
}

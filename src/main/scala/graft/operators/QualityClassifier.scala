package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the CCNet / GPT-3-style "does this raw
  * document look like the curated corpus?" linear filter (Wenzek et al.
  * 2020 "CCNet"; Brown et al. 2020 §A used a logistic classifier over
  * hashed features to select WebText-like Common Crawl — public
  * literature). The reference has no filtering of any kind
  * (server.py:78 passes text through verbatim); this is the
  * LLM-pipeline extension surface, the learned sibling of the static
  * rule battery ([[Gopher]]) and the importance-weighting alternative
  * to DSIR (q82 — same target-vs-pool geometry, same hashed-bigram
  * feature space).
  *
  * Model: binary bag of hashed token-bigram features (one feature per
  * DISTINCT bucket per doc) plus an always-on bias feature
  * [[BiasFeature]], trained by full-batch gradient descent on
  * target(y=1)-vs-pool(y=0) labels. The squashing function is the
  * rational "fast sigmoid" `σ(z) = 0.5·(1 + z/(1+|z|))` rather than the
  * logistic `1/(1+e^-z)`: both are monotone maps ℝ→(0,1) with σ(0)=0.5
  * and the same (p−y) pseudo-gradient shape, but the rational form is
  * built from IEEE ops (`/`, `+`, `abs`) that are bit-identical across
  * engines, where `exp` may differ in ULPs — the same portability rule
  * that keeps every other operator hash-exact against the oracle.
  *
  * Determinism contract (mirrors [[SemDedup.fit]]): per-doc margins and
  * per-feature gradients are DECIMAL(27,10)-routed sums (partition
  * order cannot move a double), residuals are rounded once to 6 dp
  * before the gradient sum, and each weight update
  * `w − lr·g/N` is computed IN Spark with one `round(…, 6)` — the
  * driver never does arithmetic, it only repackages the ≤(buckets+1)-row
  * weight table into the next iteration's broadcast.
  *
  * Scale shape: the weight table is bounded by the feature space
  * (buckets+1 rows) so it BROADCASTS at any corpus size — the same
  * argument as q82's log-ratio table. [[fit]] caches the feature table
  * hash-partitioned by doc_id once; each iteration's margin aggregate
  * group-bys on doc_id (no exchange — partitioning satisfied) and the
  * gradient joins residuals back on doc_id (no exchange, both sides
  * co-partitioned), then combines map-side down to the feature space.
  * Net per-iteration shuffle: ONE bucket-sized exchange, zero
  * corpus-sized ones.
  */
object QualityClassifier {

  /** The always-on bias feature id. Safe as a sentinel: real features
    * are `charHash % buckets` with charHash ∈ [0, P) — never negative. */
  val BiasFeature = -1L

  /** `σ(z) = 0.5·(1 + z/(1+|z|))` — rational squashing, engine-portable
    * (see class doc). Monotone, σ(0) = 0.5, so `score ≥ 0.5 ⇔ z ≥ 0`. */
  def fastSigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** SQL twin of [[fastSigmoid]] over expression `zE`. */
  def fastSigmoidSql(zE: String): String =
    s"0.5 * (1 + $zE / (1 + abs($zE)))"

  /** Full-batch GD fit. `train` carries one row per (doc, feature):
    * (doc_id, y ∈ {0.0, 1.0}, b) — DISTINCT features, bias row
    * included. Returns the final (b, w) weight rows, ascending by b.
    *
    * Iteration i: margin `z = Σ_dec w_b` per doc (inner join — w covers
    * every training feature by construction), residual
    * `r = round(σ(z) − y, 6)`, gradient `g_b = Σ_dec r` over docs
    * containing b, update `w' = round(w − lr·g/N, 6)` where N = number
    * of training docs. Weights start at 0 (first pass: σ(0)=0.5, so
    * r = ±0.5 exactly). */
  def fit(train: DataFrame, iters: Int, lr: Double): Seq[(Long, Double)] = {
    val spark = train.sparkSession
    import spark.implicits._
    val f = train.repartition(col("doc_id")).cache()
    try {
      val nDocs = f.select(col("doc_id")).distinct().count()
      val w0 = f.select(col("b")).distinct().as[Long].collect()
        .sorted.map(_ -> 0.0).toSeq
      (1 to iters).foldLeft(w0) { (w, _) =>
        val wDf = w.toDF("b", "w")
        val resid = f.join(broadcast(wDf), Seq("b"))
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("w").cast("decimal(27,10)")).cast("double").as("z"))
          .select(col("doc_id"),
            round(fastSigmoid(col("z")) - col("y"), 6).as("r"))
        val grad = f.join(resid, Seq("doc_id"))
          .groupBy(col("b"))
          .agg(sum(col("r").cast("decimal(27,10)")).cast("double").as("g"))
        wDf.join(broadcast(grad), Seq("b"))
          .select(col("b"),
            round(col("w") - lit(lr) * col("g") / lit(nDocs.toDouble), 6).as("w"))
          .as[(Long, Double)].collect().sortBy(_._1).toSeq
      }
    } finally f.unpersist()
  }

  /** Session-scoped memo of fitted weight tables — the TRAIN-once /
    * SCORE-many lifecycle the persisted artifacts already follow
    * (q73 band index, q75 IVF, q78 BPE merges). q86 and q117 fit the
    * SAME classifier on the SAME training table; without the memo each
    * pays the full multi-iteration GD. Keyed by (corpus dir, iters,
    * lr) under the owning context's applicationId
    * ([[graft.SessionMemo]]); the memoized value is the final
    * weight Seq — a plain, context-free table, safe to share across
    * queries of one session and dropped with the context. The key also
    * carries a caller-supplied `trainTag` naming the training-table
    * DEFINITION: dir + hyperparams alone cannot distinguish two
    * different training tables over the same corpus, and a second
    * caller would silently receive weights fitted on the first one's
    * table. */
  private[graft] val sessionFits =
    new graft.SessionMemo[(String, String, Int, Double), Seq[(Long, Double)]]

  /** Compute-once-per-(session, dir, trainTag, hyperparams) [[fit]].
    * `train` is by-name: on a memo hit the training table is never even
    * built. `trainTag` must uniquely name the train-table definition
    * among this session's callers (q86/q117 share one fit by passing
    * the same tag for the same table). */
  def sessionFit(s: org.apache.spark.sql.SparkSession, dir: String, trainTag: String,
                 train: => DataFrame, iters: Int, lr: Double): Seq[(Long, Double)] =
    sessionFits.getOrCompute(s, (dir, trainTag, iters, lr))(fit(train, iters, lr))

  /** Score every document against fitted weights. `feats` carries one
    * row per (doc, feature) with any functionally-dependent key columns
    * in `keyCols` (e.g. lang, split) — unseen features contribute 0
    * (LEFT join + coalesce: the holdout case). Returns one row per doc:
    * keyCols..., n_feats, score = round(σ(z), 6), pred = score ≥ 0.5. */
  def score(feats: DataFrame, weights: Seq[(Long, Double)],
            keyCols: Seq[String]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val wDf = broadcast(weights.toDF("b", "w"))
    feats.join(wDf, Seq("b"), "left")
      .groupBy(col("doc_id") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w"), lit(0.0)).cast("decimal(27,10)"))
          .cast("double").as("z"))
      .select(col("doc_id") +: keyCols.map(col) :+
        col("n_feats") :+
        round(fastSigmoid(col("z")), 6).as("score"): _*)
      .withColumn("pred", (col("score") >= 0.5).cast("int"))
  }
}

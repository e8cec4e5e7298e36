package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword scoring (Robertson/Spärck Jones) — the text arm
  * a search engine pairs with the reference's vector arm (reference
  * server.py:85-91 is vector-only; extension surface).
  *
  * Scale shape: tf comes from ONE explode+filter pass over the token
  * stream (codegen'd generate; only query-term occurrences survive
  * into the shuffle, map-side combined to one row per (doc, term));
  * document frequency and corpus stats are tiny broadcast sides. No
  * inverted index is built — at 100 TB this is a scan plus one partial
  * aggregation, re-runnable per query set.
  *
  * Determinism contract (oracle-comparable): per-term contributions
  * are summed through decimal(28,12) — associative, partition-order
  * independent — and the shared constants are computed once here and
  * interpolated into both engines' plans.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75
  // derived ONCE: `1.2 + 1` re-derived independently in each engine
  // could land on a different double ulp; Double.toString round-trips
  val K1p1: Double = K1 + 1.0
  val OneMinusB: Double = 1.0 - B

  /** BM25 scores of `terms` over a tokenized corpus.
    *
    * @param tokenized (idCol, toks ARRAY<STRING>, dl DOUBLE) — one row
    *                  per document; `dl` is the document length.
    * @return (idCol, n_terms, score) — docs with no matching term absent;
    *         score rounded to 6 dp (rank with ties broken by id). */
  def scores(tokenized: DataFrame, terms: Seq[String], idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "terms must not be empty")
    val stats = tokenized.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl").cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val tf = tokenized
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contribution(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl")))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        round(sum(col("contrib").cast("decimal(28,12)")).cast("double"), 6).as("score"))
  }

  /** One (doc, term) BM25 contribution:
    * `idf(df) * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))` with
    * `idf = ln(1 + (N-df+0.5)/(df+0.5))`. */
  def contribution(tf: Column, df: Column, dl: Column, nDocs: Column, avgdl: Column): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5))) *
      tf * lit(K1p1) /
      (tf + lit(K1) * (lit(OneMinusB) + lit(B) * dl / avgdl))

  /** Reciprocal Rank Fusion (Cormack et al.) of two ranked arms:
    * `rrf(d) = Σ 1/(rrfK + rank_arm(d))`, absent arm contributes 0.
    *
    * @param a (id, rank) — ranks 1-based, one row per id.
    * @param b (id, rank) likewise.
    * @return (id, rank_a, rank_b, rrf) — missing ranks as -1; rrf
    *         rounded to 6 dp. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String = "doc_id",
              rrfK: Double = 60.0): DataFrame = {
    val av = a.select(col(idCol).as("__ida"), col("rank").as("rank_a"))
    val bv = b.select(col(idCol).as("__idb"), col("rank").as("rank_b"))
    av.join(bv, col("__ida") === col("__idb"), "full_outer")
      .select(
        coalesce(col("__ida"), col("__idb")).as(idCol),
        coalesce(col("rank_a"), lit(-1)).cast("long").as("rank_a"),
        coalesce(col("rank_b"), lit(-1)).cast("long").as("rank_b"),
        round(
          when(col("rank_a").isNotNull, lit(1.0) / (lit(rrfK) + col("rank_a")))
            .otherwise(lit(0.0)) +
            when(col("rank_b").isNotNull, lit(1.0) / (lit(rrfK) + col("rank_b")))
              .otherwise(lit(0.0)),
          6).as("rrf"))
  }
}

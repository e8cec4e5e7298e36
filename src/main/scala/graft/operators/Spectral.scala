package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spectral term signature — power iteration toward the dominant right
  * singular vector of the doc×term TF-IDF matrix (the one-component LSA
  * of Deerwester et al. 1990, computed as relational algebra). The
  * dominant component weights each term by how strongly it co-occurs
  * with other globally-heavy terms — a corpus-level "topic signature"
  * a curation pipeline uses to spot topical drift between snapshots or
  * between a pool and a target set (the reference, server.py:85-91,
  * ranks by a stored embedding and has no corpus-spectral view;
  * extension surface).
  *
  * Formulation: with A the (doc, term, tfidf) matrix and x₀ = 1 (the
  * all-ones term vector, so the first document pass is just row sums),
  * each iteration computes y = A·x then x' = Aᵀ·y, i.e. one
  * `groupBy(doc)` matvec and one `groupBy(term)` matvec; x' is then
  * scaled by 1/max|x'| (power iteration is scale-free, so any positive
  * scalar works — max is chosen because it is exactly
  * partition-order-independent, unlike an FP norm) and rounded to 6 dp
  * so both engines carry bit-identical vectors into the next round.
  * All matvec sums are decimal-routed (the engine-wide dsum rule), so
  * no result depends on partition order.
  *
  * Scale shape: the term vector x is vocabulary-bounded — it BROADCASTS
  * at any corpus size (same argument as TfIdf's dfreq). The doc vector
  * y is corpus-sized and joins back to the weight table on the doc id —
  * a co-partitioned shuffle join, never a broadcast. Per iteration:
  * ONE shuffle for the doc matvec, ONE for the term matvec — constant
  * plan per round, like BpeTrain's loop. The weight table itself is
  * computed once and reused across iterations (cache upstream when
  * iterating more than twice).
  */
object Spectral {

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(28,10)")).cast("double")

  /** The normalized term vector after `iters` power-iteration rounds
    * over `weights` = (idCol, term, tfidf): (term, score) with
    * score ∈ [-1, 1] and max|score| = 1.
    *
    * First-pass magnitude note: the un-normalized first x' grows with
    * corpus size (y is a raw row sum); decimal(28,10) holds it to
    * ~10^17, beyond which the first y pass would scale by 1/N — a
    * constant the iteration is free to absorb. Every later pass is
    * bounded by |x| <= 1.
    */
  def termSignature(weights: DataFrame, iters: Int,
                    idCol: String = "doc_id"): DataFrame = {
    require(iters > 0, "iters must be positive")
    // every iteration references the weight table twice (y's build and
    // x's build); localCheckpoint materializes it ONCE and truncates
    // lineage (the RankedCumsum rule), so 2·iters matvecs read a
    // narrow checkpointed table instead of re-running the tf-idf
    // explode + joins 2·iters times — measured 10.4 s → materialize
    // once at sf0.1
    val w = weights.select(col(idCol), col("term"), col("tfidf"))
      .localCheckpoint()
    // y = A·x; x₀ = 1 makes the first pass a plain row sum
    var y = w.groupBy(col(idCol)).agg(dsum(col("tfidf")).as("y"))
    var x: DataFrame = null
    for (i <- 1 to iters) {
      // localCheckpoint INTERMEDIATE rounds (the same lineage-
      // truncation rule as `w` above): xRaw feeds BOTH the normalizer
      // aggregate and the scaled vector, and the scaled vector feeds
      // the next round's y — left lazy, each round's matvec subtree is
      // embedded (and EXECUTED) once under the mx aggregate and once
      // under the main branch, compounding per round. Materializing
      // the vocabulary-bounded xRaw keeps earlier matvecs computed
      // exactly once and the final plan linear in `iters`. The LAST
      // round stays lazy so the returned plan still carries the
      // broadcast matvec join shape (PlanSpec pins it — the scale
      // property must stay visible in the declared plan). Values are
      // untouched — the checkpoint stores the same rows the lazy plan
      // would produce.
      val xRawLazy = w.join(y, idCol)
        .groupBy(col("term"))
        .agg(dsum(col("tfidf") * col("y")).as("xr"))
      val xRaw = if (i < iters) xRawLazy.localCheckpoint() else xRawLazy
      val mx = xRaw.agg(max(abs(col("xr"))).as("mx"))
      // degenerate-normalizer guard: a weight table whose matvec is
      // all-zero (every tfidf 0) would make mx 0 and silently turn
      // every score into NaN in BOTH engines — fail loudly instead.
      // (Empty input needs no guard: empty xRaw × 1 mx row = empty.)
      x = xRaw.crossJoin(broadcast(mx))
        .select(col("term"),
          when(col("mx").isNull || col("mx") <= 0, raise_error(lit(
            "Spectral.termSignature: degenerate weight table (max|x'| <= 0)")))
            .otherwise(round(col("xr") / col("mx"), 6)).as("score"))
      if (i < iters)
        y = w.join(broadcast(x), "term")
          .groupBy(col(idCol))
          .agg(dsum(col("tfidf") * col("score")).as("y"))
    }
    x
  }

  /** Top-`k` terms of the signature, ranked by score desc then term
    * asc (rank ties cannot flip: scores are 6-dp rounded). */
  def topSignature(weights: DataFrame, iters: Int, k: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    termSignature(weights, iters, idCol)
      .orderBy(col("score").desc, col("term").asc)
      .limit(k)
      .withColumn("rank",
        // ≤ k rows post-limit; the constant-valued but NON-FOLDABLE
        // partition key (hash(term) % 1 ≡ 0) keeps WindowExec off its
        // warn-and-single-partition path (the SearchEngine trick)
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(hash(col("term")), lit(1)))
          .orderBy(col("score").desc, col("term").asc)).cast("long"))
      .select(col("rank"), col("term"), col("score"))
  }
}

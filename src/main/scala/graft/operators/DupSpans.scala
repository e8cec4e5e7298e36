package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-span detection — the exact-substring face
  * of dedup (Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better": duplicated token runs, not duplicated
  * documents, are what a trained model memorizes). The reference has no
  * notion of sub-document duplication (its unit is the Neo4j Document
  * node, reference server.py:85-91); this is a north-star extension
  * next to [[Dedup]]'s document-grain families and the chunk-grain
  * q66/q79 scrubs — those operate on FIXED chunk boundaries, this one
  * finds duplicated runs at ARBITRARY token offsets and merges them
  * into maximal spans, the suffix-array result computed with joins.
  *
  * Shape (the full-corpus suffix array of the paper is replaced by the
  * equivalent anchor-gram formulation, which is pure Spark relational
  * algebra):
  *  1. every position contributes an L-token anchor gram (row-local
  *     shingling, done by the caller);
  *  2. a gram duplicated ACROSS documents is one whose hash occurs
  *     under ≥ 2 distinct doc_ids: `groupBy(h).agg(min(doc_id),
  *     max(doc_id))` — map-side combine collapses each partition to
  *     its distinct grams, so the exchange carries vocabulary, not
  *     corpus; `min ≠ max` is the ≥-2-docs test with no distinct count;
  *  3. anchors equi-join the duplicated-gram set on `h` (the
  *     contamination-screen shape of q52/q65: corpus side streams, the
  *     dup-gram side is duplicated-vocabulary-sized — AQE broadcasts
  *     it when small, and a hot boilerplate gram is a plain equi-join
  *     skew AQE splits, never a single-task window partition);
  *  4. per document, surviving anchor positions merge gaps-and-islands
  *     style: position p starts a new span iff p > prev + L (interval
  *     [p, p+L-1] neither overlaps nor touches [prev, prev+L-1]); the
  *     island id is a running sum of start flags — windows partitioned
  *     by doc_id, bounded by document length at any corpus size.
  *
  * Every value is integer arithmetic until the single final rounded
  * division, so the DuckDB twin is exact.
  */
object DupSpans {

  /** Input `anchors`: one row per token position carrying an L-gram —
    * (doc_id LONG, lang STRING, n_tokens LONG, pos LONG — 0-based,
    * h LONG — portable hash of the gram at pos). Output: one row per
    * document that contains at least one cross-document duplicated
    * span — (doc_id, lang, n_tokens, n_spans, dup_tokens, dup_frac),
    * where dup_tokens counts tokens covered by the union of maximal
    * spans and dup_frac = dup_tokens / n_tokens rounded to 6 dp. */
  def report(anchors: DataFrame, spanLen: Int): DataFrame = {
    require(spanLen >= 1, "spanLen must be >= 1")
    val dupGrams = anchors
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("h"))
    spanReport(anchors.join(dupGrams, "h"), spanLen)
  }

  /** Spans of `target` documents duplicated in an OTHER corpus — the
    * cross-corpus face of [[report]] (q102: the GPT-3 appendix-C /
    * Lee et al. 13-gram decontamination rule at span grain — flag
    * train docs sharing a ≥spanLen-token run with the test split,
    * which shingle-overlap and exact-hash decontamination both miss).
    * The duplicated-gram test changes from "≥ 2 distinct docs" to
    * "present on BOTH sides": the two anchor sets union under a side
    * flag and one map-side-combined `groupBy(h)` keeps grams whose
    * min/max side differ — same vocabulary-sized exchange as
    * [[report]], no distinct(). Only `target` anchors join back;
    * islands merge per target doc as in [[report]].
    *
    * Inputs both carry (doc_id, lang, n_tokens, pos, h). Output: one
    * row per target doc with ≥ 1 leaked span — (doc_id, lang,
    * n_tokens, n_spans, leaked_tokens, leaked_frac). */
  def leakedSpans(target: DataFrame, other: DataFrame, spanLen: Int): DataFrame = {
    require(spanLen >= 1, "spanLen must be >= 1")
    val sides = target.select(col("h")).withColumn("side", lit(0))
      .unionByName(other.select(col("h")).withColumn("side", lit(1)))
    val leaked = sides.groupBy(col("h"))
      .agg(min(col("side")).as("mn"), max(col("side")).as("mx"))
      .filter(col("mn") === 0 && col("mx") === 1)
      .select(col("h"))
    spanReport(target.join(leaked, "h"), spanLen)
      .withColumnRenamed("dup_tokens", "leaked_tokens")
      .withColumnRenamed("dup_frac", "leaked_frac")
  }

  /** Steps 3-4 shared by [[report]] and [[leakedSpans]]: gaps-and-
    * islands span merging over the surviving anchor positions, then
    * the per-document rollup. `dup` = (doc_id, lang, n_tokens, pos)
    * rows whose gram passed the duplication test. */
  private def spanReport(dup: DataFrame, spanLen: Int): DataFrame = {
    val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = dup
      .withColumn("prev", lag(col("pos"), 1).over(wD))
      .withColumn("ni",
        when(col("prev").isNull || col("pos") > col("prev") + spanLen, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("ni")).over(wD))
    islands
      .groupBy(col("doc_id"), col("lang"), col("n_tokens"), col("isl"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (spanLen - 1)).as("e"))
      .groupBy(col("doc_id"), col("lang"), col("n_tokens"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
  }
}

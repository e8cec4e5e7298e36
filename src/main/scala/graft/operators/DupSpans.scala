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
    val dup = anchors.join(dupGrams, "h")
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

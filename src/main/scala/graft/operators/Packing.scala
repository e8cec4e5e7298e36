package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches (extension surface — the
  * reference serves search results, reference server.py:89; training
  * pipelines additionally need chunks packed into fixed token budgets).
  *
  * Greedy packer: within each pack group, walk the chunk stream in a
  * deterministic order keeping a running token count; a chunk's bin is
  * `floor(tokens_before_it / budget)`. Properties:
  *  - every bin's total ≤ budget + max_chunk_tokens - 1 (one chunk of
  *    overshoot, the classic greedy bound);
  *  - bins are contiguous from 0 within a group; nothing is dropped.
  *
  * Scale shape: ONE window sum per pack group — state per partition is
  * bounded by a group, and packing parallelism equals the number of
  * groups, so the operator scales by choosing groups ∝ cluster size
  * (e.g. `pmod(doc_id, nGroups)`). No shuffle beyond the group keying.
  */
object Packing {

  /** Assign each chunk row a (pack_group, bin).
    *
    * @param chunks    one row per chunk.
    * @param packGroup grouping expression (parallelism unit).
    * @param orderBy   deterministic intra-group order of the stream.
    * @param tokenCol  chunk token count (positive).
    * @param budget    bin token budget.
    * @return input + pack_group, cum_before, bin. */
  def assignBins(chunks: DataFrame, packGroup: Column, orderBy: Seq[Column],
                 tokenCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("pack_group")).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("pack_group", packGroup)
      .withColumn("cum_before", coalesce(sum(tokenCol).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budget"))
  }

  /** Per-bin manifest: chunk/doc counts and token totals. */
  def binStats(assigned: DataFrame, docIdCol: String, tokenCol: Column): DataFrame =
    assigned
      .groupBy(col("pack_group"), col("bin"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col(docIdCol)).as("n_docs"),
        sum(tokenCol).cast("long").as("total_tokens"))
}

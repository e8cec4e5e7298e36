package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Grouped top-k as a typed [[Aggregator]] — the scale path for batch KNN
  * (SURVEY.md §2.2 aggregations row, §4 partitioning row).
  *
  * Why not a window: `row_number().over(partitionBy(query))` must shuffle
  * *every* scored row. An Aggregator participates in Spark's partial
  * aggregation (map-side combine), so each partition reduces to ≤ k rows
  * per group *before* the shuffle — O(k · partitions · groups) shuffled
  * bytes instead of O(|corpus| · |queries|). At 100 TB that is the
  * difference between a broadcast-sized shuffle and an untenable one.
  *
  * Determinism: the buffer keeps a *total* order (score desc, id asc), so
  * the retained set is independent of partition count and merge order —
  * required for hash-exact oracle comparison (SURVEY.md §7 hard part (e)).
  */
object TopKAggregator {

  /** One scored candidate within a group. */
  case class Scored(id: Long, score: Double)

  /** Total order: better = higher score, ties broken by smaller id.
    * java.lang.Double.compare keeps the order total over NaN (ranks
    * greatest, matching Spark's `orderBy(desc)` NaN-first) — a naive
    * `>` would return false for every NaN comparison and corrupt the
    * sorted-merge invariant. */
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Merge two `better`-sorted lists keeping the k best. */
  private[operators] def mergeSorted(k: Int, a: List[Scored], b: List[Scored]): List[Scored] = {
    val out = List.newBuilder[Scored]
    var n = 0
    var (x, y) = (a, b)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else {
        out += y.head; y = y.tail
      }
      n += 1
    }
    out.result()
  }

  /** Aggregator keeping the top-k [[Scored]] of a group, sorted best-first. */
  def topK(k: Int): Aggregator[Scored, List[Scored], List[Scored]] =
    new Aggregator[Scored, List[Scored], List[Scored]] {
      override def zero: List[Scored] = Nil
      override def reduce(buf: List[Scored], s: Scored): List[Scored] =
        mergeSorted(k, buf, s :: Nil)
      override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
        mergeSorted(k, a, b)
      override def finish(buf: List[Scored]): List[Scored] = buf
      override def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder()
      override def outputEncoder: Encoder[List[Scored]] = ExpressionEncoder()
    }

  /** Sorted-distinct merge keeping the k SMALLEST values — the KMV
    * sketch state (q142): duplicates collapse without consuming
    * capacity, so the result is the k smallest DISTINCT values of the
    * union, independent of merge order. */
  private[operators] def kMinMerge(k: Int, a: List[Long], b: List[Long]): List[Long] = {
    val out = List.newBuilder[Long]
    var n = 0
    var (x, y) = (a, b)
    var last = Long.MinValue
    var first = true
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      val v =
        if (y.isEmpty || (x.nonEmpty && x.head <= y.head)) { val h = x.head; x = x.tail; h }
        else { val h = y.head; y = y.tail; h }
      if (first || v != last) { out += v; last = v; first = false; n += 1 }
    }
    out.result()
  }

  /** k smallest DISTINCT Longs of a stream, as a typed Aggregator —
    * the bounded-state KMV path: each partition reduces to ≤ k values
    * BEFORE the shuffle (the same partial-aggregation argument as
    * [[topK]]; a distinct()+window formulation must first materialize
    * the full distinct directory, which for a key-like column is the
    * table itself). The buffer's ascending distinct order makes the
    * merged sketch independent of partition count and merge order. */
  def kMinDistinct[I](k: Int)(f: I => Long): Aggregator[I, List[Long], List[Long]] =
    new Aggregator[I, List[Long], List[Long]] {
      override def zero: List[Long] = Nil
      override def reduce(buf: List[Long], i: I): List[Long] = {
        val v = f(i)
        // a full buffer whose k-th (largest) min is <= v cannot change:
        // v > last is dropped, v == last dedups to the same list — so
        // skip the O(k) list rebuild + singleton allocation entirely
        // (the common case once a partition saturates: high-duplicate
        // or sorted-ish input reduces to one allocation-free traversal
        // per row). One pass finds (length, last) together.
        var n = 0; var x = buf; var last = Long.MinValue
        while (x.nonEmpty) { last = x.head; x = x.tail; n += 1 }
        if (n == k && v >= last) buf
        else kMinMerge(k, buf, v :: Nil)
      }
      override def merge(a: List[Long], b: List[Long]): List[Long] =
        kMinMerge(k, a, b)
      override def finish(buf: List[Long]): List[Long] = buf
      override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
      override def outputEncoder: Encoder[List[Long]] = ExpressionEncoder()
    }

  /** Batch KNN join with map-side partial top-k.
    *
    * queries: (vec_id, embedding) — broadcast (the small side).
    * corpus:  (doc_id|vec_id, embedding).
    * Output: (query_id, doc_id, score, rank) — identical rows and
    * ordering to [[graft.search.SearchEngine.knnJoinWindow]].
    */
  def knnJoin(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
    val idCol = if (corpus.columns.contains("doc_id")) "doc_id" else "vec_id"
    val scored = corpus.crossJoin(broadcast(q))
      .select(
        col("query_id"),
        col(idCol).cast("long").as("id"),
        neo4jScore(col("embedding"), col("query_embedding")).as("score"))
      .as[(Long, Long, Double)]

    scored
      .groupByKey(_._1)
      .agg(topK(k).contramap[(Long, Long, Double)](r => Scored(r._2, r._3)).toColumn)
      .flatMap { case (qid, hits) =>
        hits.zipWithIndex.map { case (h, i) => (qid, h.id, h.score, i + 1) }
      }
      .toDF("query_id", "doc_id", "score", "rank")
      .orderBy("query_id", "rank")
  }

  /** Batch KNN join on the binary-buffer TypedImperativeAggregate
    * ([[graft.expressions.TopKAgg]]) — identical rows/ordering to
    * [[knnJoin]] (same total order), with raw-bytes partial buffers
    * instead of encoder round-trips. */
  def knnJoinNative(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("query_embedding"))
    val idCol = if (corpus.columns.contains("doc_id")) "doc_id" else "vec_id"
    corpus.crossJoin(broadcast(q))
      .select(
        col("query_id"),
        col(idCol).cast("long").as("id"),
        neo4jScore(col("embedding"), col("query_embedding")).as("score"))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKAggExpr.topK(col("id"), col("score"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.id").as("doc_id"), col("hit.score").as("score"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Adapt the aggregator's input type. */
  implicit final class AggOps(private val agg: Aggregator[Scored, List[Scored], List[Scored]]) extends AnyVal {
    def contramap[I](f: I => Scored): Aggregator[I, List[Scored], List[Scored]] =
      new Aggregator[I, List[Scored], List[Scored]] {
        override def zero: List[Scored] = agg.zero
        override def reduce(b: List[Scored], i: I): List[Scored] = agg.reduce(b, f(i))
        override def merge(a: List[Scored], b: List[Scored]): List[Scored] = agg.merge(a, b)
        override def finish(b: List[Scored]): List[Scored] = agg.finish(b)
        override def bufferEncoder: Encoder[List[Scored]] = agg.bufferEncoder
        override def outputEncoder: Encoder[List[Scored]] = agg.outputEncoder
      }
  }
}

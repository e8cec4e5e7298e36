package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center (farthest-point) coreset selection — Gonzalez's
  * 2-approximation (1985), the diversity-sampling recipe coreset
  * selection for training data uses (Sener & Savarese, ICLR 2018,
  * "Active Learning for Convolutional Neural Networks: A Core-Set
  * Approach" — public literature). Picks the k embeddings that best
  * COVER the corpus: each round adds the point farthest from every
  * already-chosen center, so the selection spreads across modes
  * instead of oversampling the densest one (the complement of
  * SemDeDup's prune-the-dense step).
  *
  * Determinism: the seed is the smallest vec_id; every pairwise
  * distance is squared L2 rounded to 6 dp (the codegen'd
  * [[graft.expressions.ArraySqDist]], SemDedup's compare key); the
  * per-round argmax breaks ties to the smallest vec_id. Center
  * components are rounded to 6 dp when they become literals, so the
  * oracle can replay every round bit-for-bit.
  *
  * Scale shape (the BpeTrain loop contract): each round is ONE corpus
  * scan — row-local distance mins against <= k inlined center literals
  * (pure codegen, no join), a global top-1 as TakeOrderedAndProject
  * (per-partition heaps), and exactly ONE row collected to the driver.
  * The plan is CONSTANT per round (no growing lineage: each round is a
  * fresh query over the source; the chosen set lives in literals, k×dim
  * driver-held doubles — the SemDedup centroid-table size class). At
  * 100 TB, k rounds = k scans; production k-center runs batch variants
  * (pick the top-B per round) to amortize scans — same plan shape, B
  * rows collected instead of 1.
  */
object KCenter {

  private def sqDist(emb: Column, center: Seq[Double]): Column =
    round(graft.expressions.VectorExpressions.sqDist(emb, typedLit(center)), 6)

  /** Guarded projection shared by [[select]] and [[selectBatch]]:
    * rounds embeddings to the 6-dp compare key and fails with an
    * actionable message on an empty corpus or k > corpus size (one
    * cheap count scan up front; without the guard, later rounds would
    * argmax over min-distance 0 and silently emit duplicate centers). */
  private def guardedSrc(corpus: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val src = corpus.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double"), 6)).as("emb"))
    val n = src.count()
    require(n > 0, "KCenter: empty corpus — nothing to select from")
    require(k <= n, s"KCenter: k=$k exceeds corpus size $n — every point " +
      "would be chosen and further rounds would emit duplicate centers")
    src
  }

  private def minDistTo(chosen: Seq[Seq[Double]]): Column =
    chosen.map(c => sqDist(col("emb"), c)) match {
      case Seq(one) => one
      case many => least(many: _*)
    }

  /** Selection trace: (round, vec_id, radius, embedding) per chosen
    * center. `radius` is the chosen point's distance to the previous
    * centers — i.e. the k-center coverage radius of rounds 1..r-1
    * (the seed's radius is 0). */
  def select(corpus: DataFrame, k: Int): Seq[(Long, Long, Double, Seq[Double])] = {
    val src = guardedSrc(corpus, k)
    val seedRow = src.orderBy(col("vec_id")).limit(1).collect().head
    val seed = (1L, seedRow.getLong(0), 0.0, seedRow.getSeq[Double](1).toSeq)
    (2 to k).foldLeft(Vector(seed)) { (chosen, r) =>
      val pick = src.select(col("vec_id"), col("emb"),
          minDistTo(chosen.map(_._4)).as("d"))
        .orderBy(col("d").desc, col("vec_id").asc)
        .limit(1).collect().head
      chosen :+ ((r.toLong, pick.getLong(0), pick.getDouble(2),
        pick.getSeq[Double](1).toSeq))
    }
  }

  /** Batch-B greedy k-center — the production variant that amortizes
    * corpus scans: each scan takes the top-`b` farthest points (by
    * (d desc, vec_id asc), distances to the PRE-round centers only —
    * the whole batch is chosen against the same center set, so one
    * scan serves b picks), giving ⌈(k-1)/b⌉ + 1 scans instead of k.
    * Batch picks 2..b of a round sit closer to each other than true
    * sequential greedy would allow — the standard trade (the radius
    * column still records each pick's distance to the pre-round
    * centers), and `b = 1` reproduces [[select]] exactly (spec law).
    *
    * Trace rows: (round = scan index, pick = global 1-based pick
    * number in (d desc, vec_id) order, vec_id, radius, embedding). */
  def selectBatch(corpus: DataFrame, k: Int, b: Int): Seq[(Long, Long, Long, Double, Seq[Double])] = {
    require(b > 0, "batch size b must be positive")
    val src = guardedSrc(corpus, k)
    val seedRow = src.orderBy(col("vec_id")).limit(1).collect().head
    var chosen = Vector((1L, 1L, seedRow.getLong(0), 0.0,
      seedRow.getSeq[Double](1).toSeq))
    var round = 1L
    while (chosen.size < k) {
      round += 1
      val take = math.min(b, k - chosen.size)
      val picks = src.select(col("vec_id"), col("emb"),
          minDistTo(chosen.map(_._5)).as("d"))
        .orderBy(col("d").desc, col("vec_id").asc)
        .limit(take).collect()
      val offset = chosen.size.toLong
      chosen ++= picks.zipWithIndex.map { case (r, i) =>
        (round, offset + i + 1, r.getLong(0), r.getDouble(2),
          r.getSeq[Double](1).toSeq)
      }
    }
    chosen
  }

  /** The batch trace as a DataFrame (round, pick, vec_id, radius) —
    * q101's surface; ordered by pick (the global selection order). */
  def selectBatchReport(corpus: DataFrame, k: Int, b: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    selectBatch(corpus, k, b).map(t => (t._1, t._2, t._3, t._4))
      .toDF("round", "pick", "vec_id", "radius")
      .orderBy(col("pick"))
  }

  /** The trace as a DataFrame (round, vec_id, radius) — the query
    * surface; radii are non-increasing (each pick shrinks coverage). */
  def selectReport(corpus: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    select(corpus, k).map(t => (t._1, t._2, t._3))
      .toDF("round", "vec_id", "radius")
      .orderBy(col("round"))
  }
}

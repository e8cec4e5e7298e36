package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over an edge list, unrolled for a FIXED number of
  * rounds — the iterative-graph-centrality operator the dedup pipeline
  * uses to rank hub documents inside near-duplicate clusters (the
  * reference's store is a graph database; this is the graph-analytics
  * face of the engine, next to the connected components in [[Dedup]]).
  *
  * Contract: `edges` is (src, dst) and must be SYMMETRIC (every edge
  * present in both directions — the near-dup graph is undirected), so
  * every node has both in- and out-edges and no dangling-mass or
  * lost-node handling is needed: rank mass is conserved exactly.
  *
  * Determinism (the property the DuckDB oracle twin rests on): all
  * per-element arithmetic is identical at any parallelism, and the one
  * cross-row reduction per round — summing neighbor contributions —
  * routes through decimal(28,12), so partition order cannot move the
  * double. Constants are interpolated into the oracle SQL from the
  * same fields, so both engines parse the identical double literals.
  *
  * Scale shape: each round is ONE shuffle of the contribution table
  * keyed on the destination node (map-side combined); degrees and
  * ranks are node-sized, edges are scanned once per round. A fixed
  * round count means a fixed-depth plan — no driver-side convergence
  * loop. (At extreme scale the same loop runs on GraphX/Pregel; this
  * formulation keeps the operator inside Catalyst with the rest of
  * the engine.)
  */
object PageRank {

  val Damping = 0.85
  val Teleport = 0.15

  /** (id, degree, rank) after `rounds` damped iterations from the
    * uniform start 1/N. */
  def ranks(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds > 0, "rounds must be positive")
    // localCheckpoint the loop-invariant tables (the RankedCumsum /
    // Spectral lineage-truncation rule): deg feeds every round's nDf
    // normalizer plus the contribution join, and out is re-joined each
    // round — left lazy, each reference re-embeds (and re-executes)
    // the edge aggregation per round. Node- and edge-sized
    // materializations, the same bound the loop's shuffles already
    // carry; values untouched.
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))
      .localCheckpoint()
    val nDf = deg.agg(count(lit(1)).cast("double").as("n_nodes"))
    val out = edges.join(deg, edges("src") === deg("id"))
      .select(col("src"), col("dst"), col("degree"))
      .localCheckpoint()
    var r = deg.crossJoin(broadcast(nDf))
      .select(col("id"), (lit(1.0) / col("n_nodes")).as("rank"))
    var round = 0
    while (round < rounds) {
      val contrib = out.join(r, out("src") === r("id"))
        .select(col("dst").as("id"),
          (col("rank") / col("degree")).as("c"))
      r = contrib.groupBy(col("id"))
        .agg(sum(col("c").cast("decimal(28,12)")).cast("double").as("m"))
        .crossJoin(broadcast(nDf))
        .select(col("id"),
          (lit(Teleport) / col("n_nodes") + lit(Damping) * col("m")).as("rank"))
      round += 1
    }
    r.join(deg.select(col("id"), col("degree")), Seq("id"))
      .select(col("id"), col("degree"), col("rank"))
  }
}

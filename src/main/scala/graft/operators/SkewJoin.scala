package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 partitioning row;
  * the "salting for skew" tool in the 100 TB kit).
  *
  * A shuffle join hashes rows by key: one hot key ⇒ one straggler task.
  * Salting appends a uniform `salt ∈ [0, parts)` to the *fact* side's
  * key and replicates the other side `parts`× (one copy per salt), so a
  * hot key's rows spread over `parts` tasks. The join result is
  * *provably identical* to the unsalted join — salt only reroutes rows
  * — which the spec asserts. Prefer AQE's runtime skew-join split when
  * it fires; salting is the static fallback when the skew is known
  * up front or the build side is a medium (non-broadcastable) table.
  */
object SkewJoin {

  /** @param parts salt fan-out: hot-key rows spread over this many
    *              tasks; the dim side is replicated this many times. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     parts: Int = 16): DataFrame = {
    require(parts > 0, "parts must be positive")
    // any per-row salt works — the salt never reaches join semantics,
    // it only spreads rows; monotonic id gives variety within hot keys
    val salted = fact.withColumn("__salt", pmod(monotonically_increasing_id(), lit(parts.toLong)))
    val dimExp = dim.withColumn("__salt", explode(array((0 until parts).map(i => lit(i.toLong)): _*)))
    salted.join(dimExp, salted(factKey) === dimExp(dimKey) && salted("__salt") === dimExp("__salt"))
      .drop("__salt")
  }
}

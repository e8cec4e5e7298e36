package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the declared query surface,
  * its oracle coverage, and the flagship smoke-check. A typo in a
  * query name or a missing oracle entry would otherwise only surface
  * as a silently weaker correctness gate. */
class EntryContractSpec extends AnyFunSuite with SparkSpec {

  test("every declared query has an oracle, and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("the verify-only set names real queries and leaves a full bench") {
    assert(SparkEntry.verifyOnly.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.benchQueries.keySet ===
      SparkEntry.queries.keySet -- SparkEntry.verifyOnly)
    assert(SparkEntry.benchQueries.size >= 60)
  }

  test("the flagship entry returns ranked rows (the driver's smoke check)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "entry results must arrive score-descending")
    assert(scores.forall(s => s >= 0.0 && s <= 1.0),
      "scores follow the reference's (1+cos)/2 convention")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("uniform is the fixed point on a regular graph") {
    // every node of a triangle has degree 2: the uniform start must be
    // stationary at any depth
    val r = PageRank.ranks(sym((1L, 2L), (2L, 3L), (1L, 3L)), rounds = 4)
      .select($"rank").as[Double].collect()
    assert(r.length === 3)
    r.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, v))
  }

  test("path graph matches a driver-side reference loop; mass is conserved") {
    val got = PageRank.ranks(sym((1L, 2L), (2L, 3L)), rounds = 3)
      .select($"id", $"degree", $"rank")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // independent reference: same formula, plain driver-side doubles
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 1.0)
    val inNbrs = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    var ref = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 3)
      ref = ref.keys.map { v =>
        v -> (PageRank.Teleport / 3 +
          PageRank.Damping * inNbrs(v).map(u => ref(u) / deg(u)).sum)
      }.toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (id, (d, r)) =>
      assert(d === deg(id).toLong)
      assert(math.abs(r - ref(id)) < 1e-9, s"node $id: $r vs ${ref(id)}")
    }
    // symmetric graph, no sinks: rank mass conserved exactly
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
    // the middle node is the hub
    assert(got(2L)._2 > got(1L)._2 && got(2L)._2 > got(3L)._2)
  }

  test("star graph concentrates rank on the center") {
    val got = PageRank.ranks(sym((1L, 2L), (1L, 3L), (1L, 4L)), rounds = 3)
      .select($"id", $"rank").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L) && got(2L) === got(3L) && got(3L) === got(4L))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("pointInInterval equals brute-force inequality join on fixtures") {
    val ev = graft.sources.Sources
      .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
    val win = 30L * 60 * 1000000L
    val pts = ev.filter($"event_type" =!= "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("t"))
    val wins = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("win_id"), $"user_id".as("win_user"),
        unix_micros($"ts").as("win_start"))
      .withColumn("win_end", $"win_start" + lit(win))
    val fast = RangeJoin.pointInInterval(pts, $"user_id", $"t",
        wins, $"win_user", $"win_start", $"win_end", win)
      .select($"event_id", $"win_id")
    val brute = pts.join(wins,
        $"user_id" === $"win_user" && $"win_start" <= $"t" && $"t" < $"win_end")
      .select($"event_id", $"win_id")
    assert(fast.count() === brute.count())
    assert(fast.except(brute).count() === 0)
    assert(brute.except(fast).count() === 0)
    assert(fast.count() > 0) // non-degenerate
  }

  test("interval spanning many buckets matches each point exactly once") {
    val points = Seq((1L, 0L, 10L), (1L, 55L, 11L), (1L, 99L, 12L), (1L, 100L, 13L))
      .toDF("k", "t", "pid")
    val intervals = Seq((1L, 0L, 100L, 77L)).toDF("ik", "s", "e", "iid")
    val out = RangeJoin.pointInInterval(points, $"k", $"t",
        intervals, $"ik", $"s", $"e", bucketWidth = 7)
      .select($"pid").as[Long].collect().sorted
    assert(out.toSeq === Seq(10L, 11L, 12L)) // 100 excluded (end-exclusive)
  }

  test("inverted and empty intervals match nothing; key mismatch matches nothing") {
    val points = Seq((1L, 5L, 1L)).toDF("k", "t", "pid")
    val intervals = Seq(
      (1L, 10L, 10L, 1L), // empty
      (1L, 10L, 3L, 2L),  // inverted
      (2L, 0L, 100L, 3L)  // wrong key
    ).toDF("ik", "s", "e", "iid")
    assert(RangeJoin.pointInInterval(points, $"k", $"t",
      intervals, $"ik", $"s", $"e", 7).count() === 0)
  }

  test("column-name clashes are rejected") {
    val a = Seq((1L, 2L)).toDF("k", "t")
    val b = Seq((1L, 2L, 3L)).toDF("ik", "s", "t")
    val e = intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(a, $"k", $"t", b, $"ik", $"s", $"t", 7))
    assert(e.getMessage.contains("t"))
  }
}

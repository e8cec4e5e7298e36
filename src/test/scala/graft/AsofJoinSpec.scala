package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("asof matches latest right row at or before left time, per key") {
    val left = Seq(
      (1L, 100L, 10L), // key 1, t=100
      (1L, 50L, 11L),
      (1L, 5L, 12L),   // before any order
      (2L, 100L, 13L)  // key 2 has no right rows
    ).toDF("k", "t", "eid")
    val right = Seq(
      (1L, 10L, 900L, 1.5),
      (1L, 100L, 901L, 2.5), // exactly at left t=100 → matches (<=)
      (3L, 1L, 902L, 3.5)
    ).toDF("k", "t", "oid", "price")
    val out = AsofJoin.asof(left, right, "k", "k",
        col("t"), col("t"), "eid", "oid", Seq("oid", "price"))
      .select($"eid", $"oid", $"price").orderBy($"eid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq((10L, 901L), (11L, 900L), (12L, -1L), (13L, -1L)))
  }

  test("asof ties within equal (key, time) resolve to the larger right id") {
    val left = Seq((1L, 100L, 1L)).toDF("k", "t", "eid")
    val right = Seq((1L, 100L, 7L, 1.0), (1L, 100L, 9L, 2.0)).toDF("k", "t", "oid", "price")
    val r = AsofJoin.asof(left, right, "k", "k", col("t"), col("t"), "eid", "oid",
      Seq("oid", "price")).select($"oid").head()
    assert(r.getLong(0) === 9L)
  }

  test("asof rejects payload names that collide with left columns") {
    val left = Seq((1L, 100L, 10L, 9.9)).toDF("k", "t", "eid", "price")
    val right = Seq((1L, 10L, 900L, 1.5)).toDF("k", "t", "oid", "price")
    val e = intercept[IllegalArgumentException](
      AsofJoin.asof(left, right, "k", "k", col("t"), col("t"), "eid", "oid",
        Seq("oid", "price")))
    assert(e.getMessage.contains("price"))
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.asof(left.drop("price"), right, "k", "k", col("t"), col("t"), "eid", "oid",
        Seq("nope")))
    assert(e2.getMessage.contains("nope"))
  }

  test("asof on fixtures equals a brute-force per-event maximum") {
    val ev = graft.sources.Sources
      .normalizeEventTs(spark.read.parquet(s"$sf0001/events.parquet"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("t"))
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_custkey", $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("ot"))
    val fast = AsofJoin.asof(
        ev, orders.withColumnRenamed("ot", "t2"), "user_id", "o_custkey",
        col("t"), col("t2"), "event_id", "o_orderkey", Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
    val brute = ev.join(orders, $"user_id" === $"o_custkey" && $"ot" <= $"t", "left")
      .groupBy($"event_id")
      .agg(max(struct($"ot", $"o_orderkey")).getField("o_orderkey").as("o_orderkey"))
    val diff = fast.alias("f").join(brute.alias("b"), "event_id")
      .filter(coalesce($"f.o_orderkey", lit(-1L)) =!= coalesce($"b.o_orderkey", lit(-1L)))
    assert(diff.count() === 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join result is identical to the plain equi-join") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    val plain = orders.join(customer, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name")
      .orderBy($"o_orderkey").collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedEquiJoin(orders, customer, "o_custkey", "c_custkey", parts = 8)
      .select($"o_orderkey", $"c_custkey", $"c_name")
      .orderBy($"o_orderkey").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("salted join spreads a hot key over multiple shuffle partitions") {
    // one hot key: all fact rows share it
    val fact = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "v")
    val dim = Seq((42L, "hot")).toDF("dk", "name")
    val joined = SkewJoin.saltedEquiJoin(fact, dim, "k", "dk", parts = 8)
    assert(joined.count() === 1000)
    // salt column spreads the key: >1 distinct salt value observed pre-drop
    val salts = fact.withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .select(countDistinct($"__salt")).head().getLong(0)
    assert(salts > 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** At 100 TB the production default for UNKNOWN skew is AQE's runtime
  * skew-join split (`SkewJoin.scala`'s scaladoc says so; this spec
  * proves the claim holds in this Spark build): a hot key detected at
  * shuffle time is split into multiple reducer tasks with the matching
  * dim partition replicated, no salting or plan rewrite required.
  * Explicit salting (q46) stays the tool for KNOWN-hot keys where the
  * replication factor should be pinned ahead of time.
  */
class AqeSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits a runtime-skewed sort-merge join; result matches the salted plan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // thresholds sized to the fixture: the hot key's partition is a few
    // MB, the rest are bytes — factor 2 over median flags it
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // force the shuffle join AQE rewrites (broadcast would hide the skew)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    import s.implicits._

    // one pathological key (0) carrying 200k rows vs 50 cold keys
    val fact = ((1 to 200000).map(i => (0L, i.toLong))
      ++ (1 to 1000).map(i => (i.toLong % 50 + 1, i.toLong)))
      .toDF("k", "v").repartition(4)
    val dim = (0L to 50L).map(k => (k, s"name$k")).toDF("dk", "name")

    val joined = fact.join(dim, $"k" === $"dk").select($"k", $"v", $"name")
    val total = joined.count()
    assert(total === 201000L)

    // materialize the row plan so the adaptive final plan is available
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"expected a final adaptive plan:\n$plan")
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed join (skew=true) in:\n$plan")

    // same rows as the explicit-salting operator on the same input
    val aqeSum = joined.agg(sum($"v")).head().getLong(0)
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", "dk", parts = 8)
    assert(salted.count() === total)
    assert(salted.agg(sum($"v")).head().getLong(0) === aqeSum)
  }
}

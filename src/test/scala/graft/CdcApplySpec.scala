package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtraQueries

class CdcApplySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("q114 snapshot: one row per user, agree everywhere, tombstones flagged") {
    val rows = ExtraQueries.queries("q114_cdc_apply")(spark, sf001).collect()
    val users = spark.read.parquet(s"$sf001/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.length === users, "every user has exactly one final state")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // the compaction contract: merged(base, delta) == direct everywhere
    assert(rows.forall(_.getInt(5) === 1), "base+delta must equal direct")
    val del = rows.filter(_.getInt(4) === 1)
    assert(del.nonEmpty, "fixture has tombstoned users")
    assert(del.forall(_.getString(2) === ExtraQueries.CdcTombstoneType))
  }

  test("q114 semantics match a driver-side changelog replay") {
    val ev = graft.sources.Sources.normalizeEventTs(
        spark.read.parquet(s"$sf001/events.parquet"))
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
        $"event_type", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    // latest-wins on the total order (t, event_id)
    val want = ev.groupBy(_._1).view.mapValues(_.maxBy(e => (e._2, e._3))).toMap
    val got = ExtraQueries.queries("q114_cdc_apply")(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (u, e) =>
      assert(got(u) === ((e._2, e._4)), s"user $u")
    }
  }

  test("q114 split instant sits mid-fixture: base and delta both non-trivial") {
    val ev = graft.sources.Sources.normalizeEventTs(
      spark.read.parquet(s"$sf001/events.parquet"))
      .select(unix_micros($"ts").as("t"))
    val n = ev.count()
    val before = ev.filter($"t" < ExtraQueries.CdcSplitUs).count()
    assert(before > n / 10 && before < n * 9 / 10,
      s"split leaves $before of $n events in base — not a real split")
  }
}

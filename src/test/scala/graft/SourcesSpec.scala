package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("jsonl round-trip preserves documents exactly") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Sources.writeJsonl(docs, s"$dir/docs")
    val back = Sources.readJsonl(spark, s"$dir/docs", Sources.DocumentSchema)
    // file sources force nullable=true; compare names/types
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Sources.DocumentSchema.map(f => (f.name, f.dataType)))
    val a = docs.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = back.select(docs.columns.map(col): _*).orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("csv round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    // csv cannot carry arrays; use the scalar document columns
    docs.write.option("header", "true").csv(s"$dir/docs")
    val back = Sources.readCsv(spark, s"$dir/docs", Sources.DocumentSchema)
    assert(back.count() === docs.count())
    assert(back.schema("doc_id").dataType.typeName === "long")
  }

  test("orc round-trip preserves embeddings exactly and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
    Sources.writeOrc(embs, s"$dir/embs")
    val back = Sources.readOrc(spark, s"$dir/embs")
    val a = embs.orderBy($"vec_id").collect().map(_.toSeq).toSeq
    val b = back.select(embs.columns.map(col): _*).orderBy($"vec_id").collect().map(_.toSeq).toSeq
    assert(a === b)
    // ORC scans must carry pushed filters like parquet ones do
    val plan = back.filter($"label" === 3).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"expected pushed filter on the ORC scan:\n$plan")
  }

  test("bucketed tables join with no exchange and no sort") {
    // corpus + derived per-doc artifact bucketed on the join key: the
    // join must be a zip of same-numbered buckets — any
    // ShuffleExchange here would re-shuffle 100 TB on every join
    Sources.writeBucketed(docs, "graft_bucket_docs", "doc_id", 4)
    Sources.writeBucketed(
      docs.select($"doc_id", length($"text").as("n")), "graft_bucket_sigs", "doc_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast: at test scale both sides fit in a
      // broadcast, which is what the planner would (correctly) pick —
      // the bucketed layout is for the tier where neither side does
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_docs")
        .join(spark.table("graft_bucket_sigs"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() === docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_docs")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_sigs")
    }
  }

  test("events fixture normalizes to TimestampType in every sf dir (encoding tripwire)") {
    // The early-warning the repo lacked in round 8: the driver has
    // re-encoded events.ts across fixture regenerations (TIMESTAMP(NANOS)
    // → long under nanosAsLong; timestamp[us] → TIMESTAMP_NTZ). Whatever
    // physical type ships, the ONE normalizer must yield a plain
    // TimestampType column with sane epoch values, in all three dirs.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val ev = Sources.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
      assert(ev.schema("ts").dataType === org.apache.spark.sql.types.TimestampType,
        s"$dir: normalized ts must be TimestampType")
      val r = ev.agg(
        min(unix_micros($"ts")).as("lo"),
        max(unix_micros($"ts")).as("hi"),
        count(when($"ts".isNull, 1)).as("nulls")).head()
      assert(r.getLong(2) === 0L, s"$dir: normalization must not null any ts")
      // fixture events span recent years; a unit slip (ns↔us↔ms↔s) moves
      // the epoch by 1000x and lands far outside [2000, 2100)
      val (y2000, y2100) = (946684800000000L, 4102444800000000L)
      assert(r.getLong(0) >= y2000 && r.getLong(1) < y2100,
        s"$dir: epoch micros out of range [${r.getLong(0)}, ${r.getLong(1)}] — unit slip?")
    }
  }

  test("normalizeEventTs maps long-nanos and NTZ encodings to identical timestamps") {
    import org.apache.spark.sql.types._
    val micros = Seq(1700000000000000L, 1700000123456789L, 1712345678901234L)
    val asNanos = micros.map(_ * 1000L).toDF("ts")
    val ntz = spark.createDataFrame(
      spark.sparkContext.parallelize(micros.map(u =>
        org.apache.spark.sql.Row(java.time.LocalDateTime.ofEpochSecond(
          u / 1000000L, ((u % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    val a = Sources.normalizeEventTs(asNanos)
      .select(unix_micros($"ts")).as[Long].collect().sorted.toSeq
    val b = Sources.normalizeEventTs(ntz)
      .select(unix_micros($"ts")).as[Long].collect().sorted.toSeq
    assert(a === micros && b === micros)
    // already-normalized input passes through unchanged
    val again = Sources.normalizeEventTs(Sources.normalizeEventTs(asNanos))
    assert(again.schema("ts").dataType === TimestampType)
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = Files.createTempDirectory("graft-part").toString
    Sources.writeParquet(docs, s"$dir/docs", partitionByCols = Seq("lang"))
    val back = Sources.readParquet(spark, s"$dir/docs").filter($"lang" === "es")
    // physical plan must carry a partition filter on lang, not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    assert(back.count() === docs.filter($"lang" === "es").count())
  }
}

package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SegmentStore

/** The LSM store's write/read invariants in isolation: the live-segment
  * commit protocol (temp + rename + `_SUCCESS`; uncommitted partials
  * invisible; committed replays no-op) and the compaction's
  * deterministic last-writer-wins fold. The streaming/graduation faces
  * of the same store are covered end-to-end in SearchEngineSpec and
  * EventStreamsSpec. */
class SegmentStoreSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def tmpStore(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_segstore_$tag").toString

  private def batchDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "payload").withColumn("part", pmod($"doc_id", lit(2)))

  test("a half-written live segment is invisible; only the rename commits it") {
    val store = tmpStore("commit")
    SegmentStore.appendBatch(spark, store, batchDf(1L -> "a"), batchId = 0L,
      compactEvery = 0, partitionCol = "part", dedupKeys = Seq("doc_id"))
    assert(SegmentStore.liveBatchDirs(fs, store).map(_._1) === Seq(0L))
    // simulate a crash mid-write: a partial dir with data but no
    // _SUCCESS marker must not surface as a segment...
    val partial = new Path(s"$store/live/b7")
    fs.mkdirs(partial)
    batchDf(9L -> "junk").write.mode("overwrite").parquet(s"$store/live/b7/part=1")
    fs.delete(new Path(s"$store/live/b7/part=1/_SUCCESS"), false)
    assert(SegmentStore.liveBatchDirs(fs, store).map(_._1) === Seq(0L),
      "a success-markerless partial must be invisible to readers")
    // ...and neither must an in-flight temp dir
    fs.mkdirs(new Path(s"$store/live/.b8_tmp"))
    assert(SegmentStore.segments(fs, store).size === 1)
    assert(SegmentStore.read(spark, store)
      .select($"doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("replaying a committed batch id is a no-op (idempotence without a delete window)") {
    val store = tmpStore("replay")
    SegmentStore.appendBatch(spark, store, batchDf(1L -> "original"), batchId = 0L,
      compactEvery = 0, partitionCol = "part", dedupKeys = Seq("doc_id"))
    // an at-least-once replay re-offers the batch; the committed dir
    // must not be recycled under a concurrent reader — the append
    // no-ops (deterministic callers make the offered rows identical,
    // so skipping the rewrite loses nothing)
    SegmentStore.appendBatch(spark, store, batchDf(1L -> "replayed"), batchId = 0L,
      compactEvery = 0, partitionCol = "part", dedupKeys = Seq("doc_id"))
    assert(SegmentStore.read(spark, store)
      .select($"payload").as[String].collect().toSeq === Seq("original"),
      "a committed batch id must not be rewritten")
  }

  test("compaction keeps the newest batch's row per key (last-writer-wins)") {
    val store = tmpStore("lww")
    SegmentStore.appendBatch(spark, store,
      batchDf(1L -> "b0 one", 2L -> "b0 two"), batchId = 0L,
      compactEvery = 0, partitionCol = "part", dedupKeys = Seq("doc_id"))
    // batch 1 re-ingests doc 1 with changed content; compactEvery=2
    // folds both batches at this append
    SegmentStore.appendBatch(spark, store,
      batchDf(1L -> "b1 one CORRECTED", 3L -> "b1 three"), batchId = 1L,
      compactEvery = 2, partitionCol = "part", dedupKeys = Seq("doc_id"))
    assert(SegmentStore.latestManifest(fs, store).map(_._1) === Some(0L))
    val folded = SegmentStore.read(spark, store)
      .select($"doc_id", $"payload", col(SegmentStore.BatchCol))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(folded.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, "b1 one CORRECTED"), (2L, "b0 two"), (3L, "b1 three")),
      s"the fold must keep the newest writer per key: ${folded.toSeq}")
    // the surviving rows keep their ORIGINAL batch stamps, so the rule
    // composes across future generations
    assert(folded.map(_._3).toSeq === Seq(1L, 0L, 1L))
  }

  test("format stamping: stamp once, verify forever, fail loudly on a family mismatch") {
    val store = tmpStore("format")
    // stamp at creation (no committed rows yet), idempotent re-ensure
    SegmentStore.ensureFormat(fs, store, "image-bands/dhash-v1")
    SegmentStore.ensureFormat(fs, store, "image-bands/dhash-v1")
    assert(SegmentStore.readFormat(fs, store) === Some("image-bands/dhash-v1"))
    SegmentStore.appendBatch(spark, store, batchDf(1L -> "a"), batchId = 0L,
      compactEvery = 0, partitionCol = "part", dedupKeys = Seq("doc_id"))
    // the resumed-across-a-migration scenario: a writer of ANOTHER
    // family must fail before one row lands
    val eW = intercept[IllegalStateException] {
      SegmentStore.ensureFormat(fs, store, "image-bands/ahash-v1")
    }
    assert(eW.getMessage.contains("dhash-v1") && eW.getMessage.contains("ahash-v1"))
    // reader side: matching family passes, mismatch fails loudly
    SegmentStore.requireFormat(fs, store, "image-bands/dhash-v1")
    val eR = intercept[IllegalStateException] {
      SegmentStore.requireFormat(fs, store, "image-bands/ahash-v1")
    }
    assert(eR.getMessage.contains("dhash-v1"))
    // the marker survives a compaction (it lives outside the segment
    // and manifest namespaces)
    SegmentStore.appendBatch(spark, store, batchDf(2L -> "b"), batchId = 1L,
      compactEvery = 2, partitionCol = "part", dedupKeys = Seq("doc_id"))
    assert(SegmentStore.latestManifest(fs, store).isDefined)
    assert(SegmentStore.readFormat(fs, store) === Some("image-bands/dhash-v1"))
  }

  test("format stamping: an UNSTAMPED store with committed rows is rejected by writers and readers alike") {
    val store = tmpStore("legacy")
    SegmentStore.appendBatch(spark, store, batchDf(1L -> "a"), batchId = 0L,
      compactEvery = 0, partitionCol = "part", dedupKeys = Seq("doc_id"))
    // a legacy (pre-stamping) store's rows are of UNKNOWN family:
    // neither side may silently adopt it
    intercept[IllegalStateException] {
      SegmentStore.ensureFormat(fs, store, "image-bands/dhash-v1")
    }
    intercept[IllegalStateException] {
      SegmentStore.requireFormat(fs, store, "image-bands/dhash-v1")
    }
    // an EMPTY store passes the reader check (nothing to misinterpret)
    val empty = tmpStore("legacy_empty")
    SegmentStore.requireFormat(fs, empty, "image-bands/dhash-v1")
  }
}

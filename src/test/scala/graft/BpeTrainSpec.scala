package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BpeTrain vs an INDEPENDENT driver-side implementation of classic
  * greedy BPE (Sennrich-style: count adjacent pairs weighted by word
  * frequency, merge the argmax left-to-right non-overlapping, repeat).
  * The distributed operator must reproduce it merge-for-merge — the
  * double-space replace encoding is claimed to BE classic BPE, and this
  * spec is that claim's proof on both hand-built edge cases and the
  * fixture corpus. */
class BpeTrainSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- reference implementation (lists of symbols, no strings-with-
  // spaces anywhere, so it cannot share a bug with the encoding) ----

  private def refApply(w: Vector[String], x: String, y: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == x && w(i + 1) == y) { out += x + y; i += 2 }
      else { out += w(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(words: Seq[(String, Long)], rounds: Int): Seq[(Long, String, String, Long)] = {
    var ws = words.map { case (w, f) => (w.split("").toVector, f) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, f) <- ws; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) += f
      assert(counts.nonEmpty, s"reference ran out of pairs at round $r")
      val ((x, y), n) = counts.minBy { case ((a, b), c) => (-c, a + " " + b) }
      ws = ws.map { case (w, f) => (refApply(w, x, y), f) }
      (r.toLong, s"$x $y", x + y, n)
    }
  }

  private def learned(words: Seq[(String, Long)], rounds: Int,
                      checkpointEvery: Int = 8): Seq[(Long, String, String, Long)] =
    BpeTrain.learnMerges(words.toDF("word", "freq"), "word", "freq",
        rounds, checkpointEvery)
      .map(m => (m.round, m.pair, m.merged, m.n))

  test("odd and even runs of a repeated pair merge exactly like classic BPE") {
    // 'aaa' -> (aa, a), 'aaaa' -> (aa, aa), 'aaaaaa' -> (aa, aa, aa):
    // the left-to-right non-overlapping subtlety the encoding must get
    // right (a doubled-run miss here is the classic replace-trick bug)
    val words = Seq("aaa" -> 10L, "aaaa" -> 5L, "aaaaaa" -> 1L)
    assert(learned(words, 2) === refBpe(words, 2))
    // round 1 merges (a,a) -> 'aa'; verify the re-pair produced the
    // classic segmentations via the apply step
    val m1 = BpeTrain.learnMerges(words.toDF("word", "freq"), "word", "freq", 1)
    val applied = BpeTrain.padded(words.toDF("word", "freq"), "word", "freq")
      .select(BpeTrain.applyMerges(col("sym"), m1).as("sym"))
      .as[String].collect().toSet
    assert(applied === Set("  aa  a  ", "  aa  aa  ", "  aa  aa  aa  "))
  }

  test("interleaved and boundary-adjacent pairs stay whole-symbol anchored") {
    // 'xyxy': after (x,y)->'xy', the word is (xy, xy) and the next
    // round must merge the PAIR (xy, xy), never a substring of it;
    // 'zxy' checks a match cannot start inside another symbol
    val words = Seq("xyxy" -> 4L, "zxy" -> 3L, "xyz" -> 2L)
    assert(learned(words, 3) === refBpe(words, 3))
  }

  test("merge table on the fixture corpus equals the reference, merge for merge") {
    val words = graft.queries.KeywordQueries.tokenizedDocs(spark, sf0001)
      .select(explode($"toks").as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    val driverWords = words.as[(String, Long)].collect().toSeq
    // checkpointEvery=3 exercises the mid-run lineage truncation
    val got = learned(driverWords, rounds = 8, checkpointEvery = 3)
    val want = refBpe(driverWords, rounds = 8)
    assert(got === want)
    // the learned table is non-degenerate: counts non-increasing is NOT
    // guaranteed by BPE, but every count is positive and pairs distinct
    assert(got.map(_._4).forall(_ > 0))
    assert(got.map(_._2).distinct.size === got.size)
  }

  test("encode segments raw words exactly like the reference's merge replay") {
    val words = Seq("aaaaa" -> 7L, "banana" -> 3L, "aabaa" -> 2L, "nab" -> 1L)
    val df = words.toDF("word", "freq")
    val merges = BpeTrain.learnMerges(df, "word", "freq", rounds = 4)
    val got = df
      .select($"word",
        BpeTrain.encode($"word", merges).as("sym"),
        BpeTrain.symbolCount(BpeTrain.encode($"word", merges)).as("k"))
      .as[(String, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // reference: replay the same merges over symbol vectors
    for ((w, _) <- words) {
      val refSyms = merges.foldLeft(w.split("").toVector) { (v, m) =>
        val Array(x, y) = m.pair.split(" ", 2)
        refApply(v, x, y)
      }
      val (sym, k) = got(w)
      assert(k === refSyms.size, s"symbol count of '$w'")
      assert(sym === refSyms.mkString("  ", "  ", "  "), s"encoding of '$w'")
    }
  }

  test("merge table round-trips through save/load in learned order") {
    val words = Seq("aaaaa" -> 7L, "banana" -> 3L).toDF("word", "freq")
    val merges = BpeTrain.learnMerges(words, "word", "freq", rounds = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    BpeTrain.saveMerges(spark, merges, dir)
    assert(BpeTrain.loadMerges(spark, dir) === merges)
    // a stale-format artifact fails with the rebuild message
    spark.read.parquet(dir).drop("merged").write.parquet(s"$dir/stale")
    val e = intercept[IllegalArgumentException] {
      BpeTrain.loadMerges(spark, s"$dir/stale")
    }
    assert(e.getMessage.contains("merged") && e.getMessage.contains("saveMerges"))
  }

  test("a learned merge never survives its own round's re-pair") {
    // after round r applies (x, y), no word may still contain the
    // adjacent pair (x, y) — the single replace pass must be exhaustive
    // (the property the one-space encoding famously violates)
    val words = Seq("aaaaa" -> 7L, "banana" -> 3L, "aabaa" -> 2L)
    val df = words.toDF("word", "freq")
    val merges = BpeTrain.learnMerges(df, "word", "freq", rounds = 4)
    for (r <- 1 to merges.size) {
      val applied = BpeTrain.padded(df, "word", "freq")
        .select(BpeTrain.applyMerges(col("sym"), merges.take(r)).as("sym"))
      val remaining = applied
        .select(explode(BpeTrain.pairsOf(col("sym"))).as("pair"))
        .filter($"pair" === merges(r - 1).pair).count()
      assert(remaining === 0L, s"round $r left its own pair behind")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupSpans

class DupSpansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val L = 4

  private def run(anchors: Seq[(Long, String, Long, Long, Long)])
      : Seq[(Long, Long, Long, Double)] =
    DupSpans.report(
        anchors.toDF("doc_id", "lang", "n_tokens", "pos", "h"), L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_spans", $"dup_tokens", $"dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("a gram shared by two docs yields one L-token span in each") {
    val r = run(Seq(
      (1L, "en", 10L, 2L, 77L),
      (2L, "en", 20L, 5L, 77L)))
    assert(r === Seq((1L, 1L, 4L, 0.4), (2L, 1L, 4L, 0.2)))
  }

  test("overlapping and touching anchors merge into one maximal span") {
    // doc 1 positions 0,2,4: each interval [p, p+3]; 2 <= 0+4 and
    // 4 <= 2+4 so all three merge into [0, 7] = 8 tokens
    val r = run(Seq(
      (1L, "en", 10L, 0L, 1L), (1L, "en", 10L, 2L, 2L), (1L, "en", 10L, 4L, 3L),
      (2L, "en", 10L, 0L, 1L), (2L, "en", 10L, 2L, 2L), (2L, "en", 10L, 4L, 3L)))
    assert(r === Seq((1L, 1L, 8L, 0.8), (2L, 1L, 8L, 0.8)))
  }

  test("adjacency boundary: pos = prev + L merges, pos = prev + L + 1 splits") {
    // [0,3] and [4,7] touch (merge); [0,3] and [5,8] leave token 4 out
    val merged = run(Seq(
      (1L, "en", 20L, 0L, 1L), (1L, "en", 20L, 4L, 2L),
      (2L, "en", 20L, 0L, 1L), (2L, "en", 20L, 4L, 2L)))
    assert(merged === Seq((1L, 1L, 8L, 0.4), (2L, 1L, 8L, 0.4)))
    val split = run(Seq(
      (1L, "en", 20L, 0L, 1L), (1L, "en", 20L, 5L, 2L),
      (2L, "en", 20L, 0L, 1L), (2L, "en", 20L, 5L, 2L)))
    assert(split === Seq((1L, 2L, 8L, 0.4), (2L, 2L, 8L, 0.4)))
  }

  test("a gram repeated only WITHIN one doc is not a duplicated span") {
    // h=9 occurs three times in doc 1 and nowhere else: min = max doc
    // — self-repetition is q50's business, not cross-doc duplication
    val r = run(Seq(
      (1L, "en", 10L, 0L, 9L), (1L, "en", 10L, 3L, 9L), (1L, "en", 10L, 6L, 9L)))
    assert(r.isEmpty)
  }

  test("within-doc repeats of a cross-doc gram all count toward spans") {
    // h=9 is cross-doc (docs 1 and 2); doc 1 carries it at 0 and 9 —
    // two separate islands
    val r = run(Seq(
      (1L, "en", 13L, 0L, 9L), (1L, "en", 13L, 9L, 9L),
      (2L, "en", 10L, 1L, 9L)))
    assert(r === Seq((1L, 2L, 8L, round6(8.0 / 13)), (2L, 1L, 4L, 0.4)))
  }

  private def runLeaked(target: Seq[(Long, String, Long, Long, Long)],
                        other: Seq[(Long, String, Long, Long, Long)])
      : Seq[(Long, Long, Long, Double)] =
    DupSpans.leakedSpans(
        target.toDF("doc_id", "lang", "n_tokens", "pos", "h"),
        other.toDF("doc_id", "lang", "n_tokens", "pos", "h"), L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_spans", $"leaked_tokens", $"leaked_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("leakedSpans: a hand-built leaked span is flagged on the train side only") {
    // train doc 1 copies a test doc's run: anchors at 3,4,5 share
    // hashes with test doc 100 — they merge into [3, 8] = 6 tokens.
    // h=50 is train-only (docs 1 and 2 both have it): cross-TRAIN
    // duplication, which report() would flag but leakedSpans must NOT.
    val train = Seq(
      (1L, "en", 12L, 3L, 10L), (1L, "en", 12L, 4L, 11L), (1L, "en", 12L, 5L, 12L),
      (1L, "en", 12L, 9L, 50L),
      (2L, "en", 10L, 0L, 50L))
    val test = Seq(
      (100L, "en", 8L, 0L, 10L), (100L, "en", 8L, 1L, 11L), (100L, "en", 8L, 2L, 12L))
    val r = runLeaked(train, test)
    assert(r === Seq((1L, 1L, 6L, 0.5)))
  }

  test("leakedSpans: grams only on the other side never flag, and B=target==other flags everything shared") {
    // nothing shared: no rows
    assert(runLeaked(
      Seq((1L, "en", 10L, 0L, 1L)), Seq((9L, "en", 10L, 0L, 2L))).isEmpty)
    // the leaked-frac arithmetic matches report's span arithmetic:
    // one shared gram -> one L-token span on the target side
    val r = runLeaked(
      Seq((1L, "en", 10L, 2L, 7L)), Seq((9L, "en", 10L, 6L, 7L)))
    assert(r === Seq((1L, 1L, 4L, 0.4)))
  }

  test("report is invariant to input partitioning") {
    val anchors = (0L until 40L).flatMap { d =>
      (0L until 12L).map(p => (d, "en", 30L, p * 2, (d % 5) * 100 + p))
    }
    val a = run(anchors)
    val df = anchors.toDF("doc_id", "lang", "n_tokens", "pos", "h")
    val b = DupSpans.report(df.repartition(7), L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_spans", $"dup_tokens", $"dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}

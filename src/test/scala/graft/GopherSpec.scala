package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gopher

class GopherSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def report(texts: Seq[String]) =
    texts.toDF("text")
      .withColumn("ls", Gopher.lines($"text"))
      .withColumn("ws", Gopher.words($"text"))
      .select(
        size($"ws").cast("long").as("n_words"),
        Gopher.meanWordLen($"ws").as("mwl"),
        Gopher.symbolRatio($"text", $"ws").as("sym"),
        Gopher.bulletFrac($"ls").as("bul"),
        Gopher.ellipsisFrac($"ls").as("ell"),
        Gopher.alphaFrac($"ws").as("alp"),
        Gopher.requiredHits($"ws", Seq("the", "a")).as("req"))
      .as[(Long, Double, Double, Double, Double, Double, Long)]
      .collect().toSeq

  test("rule columns measure exactly what they claim") {
    val Seq(r) = report(Seq("- the cat sat\nrun 42 ...\n- a dog #tag ..."))
    // words: -,the,cat,sat | run,42,... | -,a,dog,#tag,...
    assert(r._1 === 12L)                       // n_words
    assert(r._2 === 2.5)                       // mean word len: 30 chars / 12 words
    assert(r._3 === math.rint(3.0 / 12 * 1e6) / 1e6)  // 1 '#' + 2 '...' over 12 words
    assert(r._4 === math.rint(2.0 / 3 * 1e6) / 1e6)   // 2 of 3 lines bulleted
    assert(r._5 === math.rint(2.0 / 3 * 1e6) / 1e6)   // 2 of 3 lines end '...'
    assert(r._6 === math.rint(7.0 / 12 * 1e6) / 1e6)  // '-'x2, '...'x2, 42 are non-alpha
    assert(r._7 === 2L)                        // both required words present
  }

  test("required-word hits count DISTINCT words, not instances") {
    val Seq(r) = report(Seq("the the the the"))
    assert(r._7 === 1L)
  }

  test("empty document yields zero ratios, not nulls or divide errors") {
    val Seq(r) = report(Seq(""))
    assert(r._1 === 0L && r._2 === 0.0 && r._3 === 0.0 && r._6 === 0.0)
  }

  test("symbol count is non-overlapping: four dots are ONE ellipsis") {
    val Seq(r) = report(Seq("a ....")) // '....' -> one non-overlapping '...' match
    assert(r._3 === 0.5)
  }

  test("keep is the strict conjunction of all seven thresholds") {
    // 60 words of mean length 4, no symbols/bullets/ellipses, all
    // alphabetic, both required words present -> keep
    val good = (Seq.fill(58)("word") ++ Seq("the", "alpha")).mkString(" ")
    val df = Seq(good, "too short").toDF("text")
      .withColumn("ls", Gopher.lines($"text"))
      .withColumn("ws", Gopher.words($"text"))
      .select(Gopher.keep(
        size($"ws").cast("long"),
        Gopher.meanWordLen($"ws"),
        Gopher.symbolRatio($"text", $"ws"),
        Gopher.bulletFrac($"ls"),
        Gopher.ellipsisFrac($"ls"),
        Gopher.alphaFrac($"ws"),
        Gopher.requiredHits($"ws", Seq("the", "alpha"))).as("keep"))
      .as[Boolean].collect().toSeq
    assert(df === Seq(true, false))
  }
}

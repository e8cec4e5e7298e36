package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scrub

class ScrubSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("boilerplate scrub removes EVERY occurrence of a high-DF chunk") {
    // h1 occurs in three docs (twice in d3): all four occurrences go —
    // the property that distinguishes a scrub from q66's span dedup,
    // which keeps the first occurrence
    val chunks = Seq(
      (1L, 0, 101L), (1L, 1, 202L),
      (2L, 0, 101L),
      (3L, 0, 101L), (3L, 1, 101L), (3L, 2, 303L)
    ).toDF("doc_id", "idx", "h")
    val r = Scrub.boilerplateReport(chunks, minDf = 2)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_chunks", $"n_bp", $"kept_checksum", $"kept_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq(
      (1L, 2L, 1L, 202L, 0.5),
      (2L, 1L, 1L, 0L, 0.0),
      (3L, 3L, 2L, 303L, round(1.0 / 3, 6))))
  }

  test("boilerplate scrub is identity when no chunk reaches the DF threshold") {
    val chunks = Seq((1L, 0, 7L), (1L, 1, 8L), (2L, 0, 9L)).toDF("doc_id", "idx", "h")
    val r = Scrub.boilerplateReport(chunks, minDf = 2)
      .select($"n_bp", $"kept_ratio").as[(Long, Double)].collect()
    assert(r.forall { case (bp, ratio) => bp == 0L && ratio == 1.0 })
  }

  test("within-doc repeats alone do not make a chunk boilerplate (DF is per-doc)") {
    // h repeats 3 times inside ONE doc: document frequency is 1, so at
    // minDf=2 nothing is removed — DF must countDistinct docs, not rows
    val chunks = Seq((1L, 0, 7L), (1L, 1, 7L), (1L, 2, 7L)).toDF("doc_id", "idx", "h")
    val r = Scrub.boilerplateReport(chunks, minDf = 2)
      .select($"n_bp").as[Long].head()
    assert(r === 0L)
  }

  test("pii redaction replaces all classes and counts match") {
    val df = Seq(
      ("a@b.org writes to c.d@e-f.io", 2L, 0L, 0L),
      ("call +1-555-0042 or +1-555-9999", 0L, 2L, 0L),
      ("host 10.0.42.38 and 192.168.1.1", 0L, 0L, 2L),
      ("u0@ex-mail.org +1-555-0000 10.0.0.0", 1L, 1L, 1L),
      ("no pii here", 0L, 0L, 0L)
    ).toDF("text", "we", "wp", "wi")
    val (ne, np, ni) = Scrub.piiCounts($"text")
    val got = df.select(ne.as("ne"), np.as("np"), ni.as("ni"),
      Scrub.redact($"text").as("clean"), $"we", $"wp", $"wi").collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(4), s"email count in ${r.getString(3)}")
      assert(r.getLong(1) === r.getLong(5), s"phone count in ${r.getString(3)}")
      assert(r.getLong(2) === r.getLong(6), s"ip count in ${r.getString(3)}")
      val clean = r.getString(3)
      // nothing PII-shaped survives the scrub
      assert(!clean.matches(s".*${Scrub.EmailPattern}.*"), clean)
      assert(!clean.matches(s".*${Scrub.PhonePattern}.*"), clean)
      assert(!clean.matches(s".*${Scrub.Ipv4Pattern}.*"), clean)
    }
  }

  test("pii redaction is idempotent (tags are not PII-shaped)") {
    val df = Seq("u0@ex-mail.org +1-555-0000 from 10.0.0.0 done").toDF("text")
    val once = df.select(Scrub.redact($"text").as("t"))
    val twice = once.select(Scrub.redact($"t").as("t"))
    assert(once.head().getString(0) === twice.head().getString(0))
  }

  private def round(x: Double, n: Int): Double = {
    val m = math.pow(10, n); math.rint(x * m) / m
  }
}

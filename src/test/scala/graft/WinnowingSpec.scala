package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.HashExpressions
import graft.functions.PortableHash
import graft.queries.DedupQueries

class WinnowingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("positional shingle hashes equal polyHash of the materialized shingle strings") {
    val txt = "the quick brown fox jumps over the lazy dog"
    val got = Seq(txt).toDF("text")
      .select(HashExpressions.shingleHashSeq($"text", 3).as("hs"))
      .collect().head.getSeq[Long](0)
    val toks = txt.split(" ")
    val want = toks.sliding(3).map { w =>
      w.mkString("|").foldLeft(0L)((acc, c) => (acc * 31 + c) % PortableHash.P)
    }.toSeq
    assert(got === want)
    // positional: duplicates preserved, document order, NOT sorted
    val dup = "a b c a b c a b c"
    val hs = Seq(dup).toDF("text")
      .select(HashExpressions.shingleHashSeq($"text", 3).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(hs.length === 7)
    assert(hs(0) === hs(3) && hs(3) === hs(6))
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    // doc B embeds a 6-token verbatim run of doc A inside unrelated
    // text; with k=3, w=4 the guarantee promises >= 1 shared
    // fingerprint. Computed via the same plan fragment q115 uses.
    val w = DedupQueries.WinnowW
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 unique2 unique3 unique4"),
      (2L, "other words here alpha beta gamma delta epsilon zeta trailing tail words")
    ).toDF("doc_id", "text")
    val fp = docs
      .select($"doc_id", HashExpressions.shingleHashSeq($"text", 3).as("hs"))
      .filter(size($"hs") >= w)
      .select($"doc_id", explode(array_distinct(
        transform(sequence(lit(0), size($"hs") - w), j =>
          array_min(slice($"hs", j + 1, lit(w)))))).as("fp"))
    val shared = fp.filter($"doc_id" === 1L).select("fp").intersect(
      fp.filter($"doc_id" === 2L).select("fp")).count()
    assert(shared >= 1L, "guarantee violated")
  }

  test("q115 pairs are verbatim clones: high fp_jac, subset of LSH-verified pairs") {
    val rows = DedupQueries.queries("q115_winnowing")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val lsh = DedupQueries.queries("q19_minhash_lsh")(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (a, b, shared, nfpA, nfpB, jac) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b)
      assert(shared >= DedupQueries.WinnowMinShared)
      assert(shared <= math.min(nfpA, nfpB))
      assert(jac > 0.0 && jac <= 1.0)
      assert(lsh.contains((a, b)),
        s"($a,$b) surfaced by winnowing but not LSH-verified — " +
          "fixture clones must be caught by both lenses")
    }
  }

  test("q120 kappa matches a driver recompute from the per-pair lens verdicts") {
    // independent path: q64 carries the exact Jaccard per candidate
    // pair, q113 the edit verdict — join them in the driver, build the
    // confusion matrix and Cohen's kappa from the textbook formula
    val jac = DedupQueries.queries("q64_containment_audit")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val edit = DedupQueries.queries("q113_edit_verified")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(6)).toMap
    assert(jac.keySet === edit.keySet)
    val verdicts = jac.toSeq.map { case (k, j) =>
      (if (j >= DedupQueries.JaccardThreshold) 1L else 0L, edit(k).toLong) }
    val n = verdicts.size.toLong
    val n11 = verdicts.count(v => v._1 == 1 && v._2 == 1).toLong
    val n10 = verdicts.count(v => v._1 == 1 && v._2 == 0).toLong
    val n01 = verdicts.count(v => v._1 == 0 && v._2 == 1).toLong
    val n00 = verdicts.count(v => v._1 == 0 && v._2 == 0).toLong
    val row = DedupQueries.queries("q120_lens_kappa")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) === n)
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) ===
      ((n11, n10, n01, n00)))
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)).toDouble / (n * n)
    assert(math.abs(row.getDouble(5) - po) < 1e-6)
    assert(math.abs(row.getDouble(6) - pe) < 1e-6)
    if (pe < 1.0) {
      val kappa = (po - pe) / (1.0 - pe)
      assert(math.abs(row.getDouble(7) - kappa) < 1e-6)
      assert(row.getDouble(7) >= -1.0 - 1e-9 && row.getDouble(7) <= 1.0 + 1e-9)
    } else assert(row.isNullAt(7))
  }

  test("q113 edit verification: sim bounds, kept iff threshold, identical pair set as q64 candidates") {
    val rows = DedupQueries.queries("q113_edit_verified")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val tau = DedupQueries.EditSimThreshold.toDouble
    rows.foreach { r =>
      val (lenA, lenB, lev, sim, kept) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getInt(6))
      assert(lev >= math.abs(lenA - lenB), "lev lower bound")
      assert(lev <= math.max(lenA, lenB), "lev upper bound")
      assert(sim >= 0.0 && sim <= 1.0)
      assert((kept == 1) === (sim >= tau))
    }
  }
}

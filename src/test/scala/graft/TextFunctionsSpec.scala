package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash._
import graft.functions.TextFunctions._
import graft.queries.TextQueries

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).head().get(0).asInstanceOf[T]

  test("charHash matches a reference fold") {
    def ref(s: String): Long = s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % P)
    for (s <- Seq("a", "abc", "hello world", "the quick brown fox")) {
      val got = Seq(s).toDF("t").select(charHash($"t")).head().getLong(0)
      assert(got === ref(s), s"for '$s'")
    }
  }

  test("charHash of empty string is 0") {
    assert(Seq("").toDF("t").select(charHash($"t")).head().getLong(0) === 0L)
  }

  test("tokens drops empties") {
    val got = Seq("a  b c ").toDF("t").select(tokens($"t")).head().getSeq[String](0)
    assert(got === Seq("a", "b", "c"))
  }

  test("bpe tokens split letter runs, digit runs, marks") {
    val got = Seq("ab12,cd!").toDF("t").select(bpeTokens($"t")).head().getSeq[String](0)
    assert(got === Seq("ab", "12", ",", "cd", "!"))
  }

  test("stopword count") {
    val got = Seq("the cat is on a mat").toDF("t")
      .select(stopwordCount(tokens($"t"))).head().getLong(0)
    assert(got === 3L) // the, is, a
  }

  test("langPredict picks en for english function words, und for none") {
    val en = Seq("the cat and the dog of war").toDF("t")
      .select(langPredict(tokens($"t"))).head().getString(0)
    assert(en === "en")
    val und = Seq("zzz qqq www").toDF("t")
      .select(langPredict(tokens($"t"))).head().getString(0)
    assert(und === "und")
  }

  test("shingles: n-1 fewer than tokens, empty when too short") {
    val got = Seq("a b c d").toDF("t")
      .select(TextQueries.shingleCol(tokens($"t"))).head().getSeq[String](0)
    assert(got === Seq("a|b|c", "b|c|d"))
    val short = Seq("a b").toDF("t")
      .select(TextQueries.shingleCol(tokens($"t"))).head().getSeq[String](0)
    assert(short === Seq.empty)
  }

  test("affine hash stays in [0, P)") {
    for (c <- MinhashFamily ++ SimhashFamily) {
      val h = Seq(123456789L).toDF("x").select(affine(c, $"x")).head().getLong(0)
      assert(h >= 0 && h < P)
    }
  }

  test("lsh bucket is deterministic and in [0, 256)") {
    val v = Array.tabulate(64)(i => (math.sin(i) * 0.5).toFloat)
    val b1 = Seq(v.toSeq).toDF("v").select(lshBucket($"v")).head().getLong(0)
    val b2 = Seq(v.toSeq).toDF("v").select(lshBucket($"v")).head().getLong(0)
    assert(b1 === b2)
    assert(b1 >= 0 && b1 < 256)
  }

  test("quality score bounded in [0,1]") {
    val q = TextQueries.queries("q14_quality")(spark, "/root/testdata/sf0.001")
    val stats = q.agg(min($"quality"), max($"quality")).head()
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }
}

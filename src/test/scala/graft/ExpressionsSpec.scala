package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash
import graft.functions.TextFunctions.tokens
import graft.functions.VectorFunctions
import graft.operators.Dedup

/** The codegen'd expressions must be *bit-identical* to their
  * higher-order-function reference formulations — that equality is what
  * lets the hot paths switch implementation without touching the DuckDB
  * oracle contracts. */
class ExpressionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("ArrayFloatCosine == HOF cosine on all fixture pairs vs vec 0") {
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val diff = embs.select(
      VectorFunctions.cosineSimilarity($"embedding", typedLit(q)).as("fast"),
      VectorFunctions.cosineSimilarityHof($"embedding", typedLit(q)).as("ref"))
      .filter($"fast" =!= $"ref") // exact double equality
    assert(diff.count() === 0)
  }

  test("ArraySqDist == HOF zip_with fold on all fixture pairs vs vec 0, float and double sides") {
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(a, b, (x, c) => { val d = x.cast("double") - c.cast("double"); d * d }),
        lit(0.0), (acc, v) => acc + v)
    // float vs float literal, and float vs double literal (the k-means
    // centroid case) — both must be bit-equal to the interpreted fold
    val qd = q.map(_.toDouble)
    val diff = embs.select(
      graft.expressions.VectorExpressions.sqDist($"embedding", typedLit(q)).as("ff"),
      hof($"embedding", typedLit(q)).as("ffRef"),
      graft.expressions.VectorExpressions.sqDist($"embedding", typedLit(qd)).as("fd"),
      hof($"embedding", typedLit(qd)).as("fdRef"))
      .filter($"ff" =!= $"ffRef" || $"fd" =!= $"fdRef")
    assert(diff.count() === 0)
  }

  test("ArraySqDist: length mismatch gives null, null gives null") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))),
      (Some(Seq(1f, 2f)), None)).toDF("a", "b")
    val r = df.select(graft.expressions.VectorExpressions.sqDist($"a", $"b")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("cosine null semantics: zero vector gives null, null gives null") {
    val df = Seq(
      (Seq(0f, 0f), Some(Seq(1f, 2f))),
      (Seq(1f, 2f), None)).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSimilarity($"a", $"b")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("PolyHashExpr == HOF charHash on every fixture text and token") {
    val diff = docs.select(
      PortableHash.charHash($"text").as("fast"),
      PortableHash.charHashHof($"text").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() === 0)
    val tokDiff = docs.select(explode(tokens($"text")).as("t"))
      .select(PortableHash.charHash($"t").as("fast"), PortableHash.charHashHof($"t").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(tokDiff.count() === 0)
  }

  test("MinHashSigExpr == HOF minhash, including empty-array sentinel") {
    val hs = docs.select(sort_array(array_distinct(transform(
      graft.queries.TextQueries.shingleCol(tokens($"text")), x => PortableHash.charHash(x)))).as("hs"))
    val diff = hs.select(
      Dedup.minhashSignature($"hs").as("fast"),
      Dedup.minhashSignatureHof($"hs").as("ref"))
      .filter(to_json($"fast") =!= to_json($"ref"))
    assert(diff.count() === 0)
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .select(Dedup.minhashSignature($"hs")).head().getSeq[Long](0)
    assert(empty.forall(_ === PortableHash.P))
  }

  test("SimHash48Expr == HOF simhash on fixture docs") {
    val th = docs.select(transform(tokens($"text"), x => PortableHash.charHash(x)).as("th"))
    val diff = th.select(
      Dedup.simhash($"th").as("fast"),
      Dedup.simhashHof($"th").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() === 0)
  }

  test("SortedLongIntersectSize == array_intersect size on distinct sorted arrays") {
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(2L, 4L), Seq(2L, 4L)),
      (Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    val diff = pairs.select(
      graft.expressions.VectorExpressions.sortedIntersectSize($"a", $"b").as("fast"),
      size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() === 0)
  }

  test("jaccard (two-pointer) == jaccardHof on fixture shingle sets") {
    val hs = docs.select($"doc_id",
      sort_array(array_distinct(transform(
        graft.queries.TextQueries.shingleCol(tokens($"text")), x => PortableHash.charHash(x)))).as("hs"))
    val a = hs.select($"doc_id".as("ia"), $"hs".as("ha"))
    val b = hs.select($"doc_id".as("ib"), $"hs".as("hb"))
    val diff = a.join(b, $"ia" < $"ib").limit(20000)
      .select(Dedup.jaccard($"ha", $"hb").as("fast"), Dedup.jaccardHof($"ha", $"hb").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() === 0)
  }

  test("ShingleHashSetExpr == composed HOF shingle hashing on fixtures") {
    val fast = docs.select($"doc_id",
      graft.expressions.HashExpressions.shingleHashSet($"text", 3).as("hs"))
    val ref = docs.select($"doc_id",
      sort_array(array_distinct(transform(
        graft.queries.TextQueries.shingleCol(tokens($"text")),
        x => PortableHash.charHash(x)))).as("hs"))
    val diff = fast.alias("f").join(ref.alias("r"), "doc_id")
      .filter(to_json($"f.hs") =!= to_json($"r.hs"))
    assert(diff.count() === 0)
    // degenerate inputs
    val deg = Seq("", "a", "a b", "a b c", " a  b c ").toDF("text")
      .select(graft.expressions.HashExpressions.shingleHashSet($"text", 3).as("hs"))
      .collect().map(_.getSeq[Long](0).length)
    assert(deg.toSeq === Seq(0, 0, 0, 1, 1))
  }

  test("SortedLongJaccard: null on two empties, matches composed formula") {
    val r = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(graft.expressions.VectorExpressions.sortedJaccard($"a", $"b")).head()
    assert(r.isNullAt(0))
    val v = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
      .select(graft.expressions.VectorExpressions.sortedJaccard($"a", $"b")).head().getDouble(0)
    assert(v === 0.5)
  }

  test("LangPredictExpr == HOF langPredict on fixtures and edge inputs") {
    val diff = docs.select(
      graft.expressions.HashExpressions.langPredict($"text").as("fast"),
      graft.functions.TextFunctions.langPredict(tokens($"text")).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() === 0)
    val edge = Seq("", "der la", "the el la de", "zzz").toDF("text")
      .select(graft.expressions.HashExpressions.langPredict($"text").as("fast"),
        graft.functions.TextFunctions.langPredict(tokens($"text")).as("ref"))
      .collect()
    edge.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("expressions are registered as SQL functions via GraftExtensions") {
    docs.createOrReplaceTempView("docs_sql_test")
    val r = spark.sql(
      "SELECT graft_poly_hash(text) AS h FROM docs_sql_test ORDER BY doc_id LIMIT 1").head()
    val want = docs.orderBy($"doc_id").select(PortableHash.charHash($"text")).head().getLong(0)
    assert(r.getLong(0) === want)
    val cos = spark.sql("SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f))").head()
    assert(math.abs(cos.getDouble(0) - 1.0) < 1e-12)
    val lang = spark.sql("SELECT graft_lang_predict('the cat and the dog')").head()
    assert(lang.getString(0) === "en")
    val topk = spark.sql(
      """SELECT graft_topk(id, score, 2) FROM VALUES
        |  (1L, 0.5d), (2L, 0.9d), (3L, 0.7d) AS t(id, score)""".stripMargin).head()
    val hits = topk.getSeq[org.apache.spark.sql.Row](0)
    assert(hits.map(_.getLong(0)) === Seq(2L, 3L))
  }

  test("TopKAgg: NaN scores cannot poison the buffer (total order, NaN first)") {
    // NaN rows rank greatest (Spark's orderBy(desc) puts NaN first) and
    // every non-NaN candidate after them is still retained — the old
    // `>` comparison let one NaN at the tail reject all later rows
    val df = Seq(
      (1L, Double.NaN), (2L, 0.3), (3L, 0.9), (4L, Double.NaN),
      (5L, 0.7), (6L, 0.5)).toDF("id", "score")
    val hits = df.agg(graft.expressions.TopKAggExpr.topK($"id", $"score", 4).as("h"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(hits.map(_.getLong(0)) === Seq(1L, 4L, 3L, 5L))
    // all-NaN tail: valid rows inserted after k NaNs must displace nothing,
    // but valid rows better than the worst retained must still enter
    val df2 = Seq((9L, Double.NaN), (2L, 0.1), (3L, 0.8)).toDF("id", "score")
    val hits2 = df2.agg(graft.expressions.TopKAggExpr.topK($"id", $"score", 2).as("h"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(hits2.map(_.getLong(0)) === Seq(9L, 3L))
  }

  test("typed TopKAggregator matches native TopKAgg under NaN input") {
    import graft.operators.TopKAggregator
    val rows = Seq((1L, Double.NaN), (2L, 0.3), (3L, 0.9), (4L, 0.7))
    val typed = rows.foldLeft(List.empty[TopKAggregator.Scored]) { (buf, r) =>
      TopKAggregator.topK(3).reduce(buf, TopKAggregator.Scored(r._1, r._2))
    }.map(_.id)
    val native = rows.toDF("id", "score")
      .agg(graft.expressions.TopKAggExpr.topK($"id", $"score", 3).as("h"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0))
    assert(typed === native.toList)
    assert(typed === List(1L, 3L, 4L))
  }

  test("KMinAgg matches the typed kMinDistinct aggregator; partition-invariant") {
    import graft.operators.TopKAggregator
    // deterministic pseudo-random longs with heavy duplication, split
    // across grouping keys — the q142/q147 shape
    val rows = (0 until 5000).map { i =>
      (s"c${i % 3}", (i * 2654435761L) % 97L + (i % 7))
    }
    val typed = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.foldLeft(List.empty[Long]) { (buf, r) =>
        TopKAggregator.kMinDistinct[Long](16)(identity).reduce(buf, r._2)
      }
    }
    for (parts <- Seq(1, 7)) {
      val native = rows.toDF("k", "h").repartition(parts)
        .groupBy($"k")
        .agg(graft.expressions.KMinAggExpr.kMinDistinct($"h", 16).as("hs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      assert(native === typed, s"parts=$parts")
    }
    // ascending, distinct, bounded
    typed.values.foreach { l =>
      assert(l === l.distinct.sorted && l.size <= 16)
    }
  }

  test("BloomMightContainExpr: no false negatives, codegen == driver-side probe") {
    val members = (0L until 1000L).map(i => i * 2654435761L % 1000000007L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(members.size.toLong, 0.01)
    members.foreach(bf.putLong)
    val bcast = spark.sparkContext.broadcast(bf)
    val probe = (members ++ (0L until 2000L).map(i => -1L - i)).toDF("h")
      .withColumn("got", graft.expressions.BloomExpressions.mightContain($"h", bcast))
    // every inserted key must probe true (Bloom guarantees no false
    // negatives), and the codegen'd path must agree with the driver-side
    // sketch object on every input, hits and misses alike
    val rows = probe.collect().map(r => (r.getLong(0), r.getBoolean(1)))
    rows.foreach { case (h, got) =>
      assert(got === bf.mightContainLong(h), s"codegen disagrees at $h")
    }
    val asSet = members.toSet
    rows.filter(r => asSet.contains(r._1)).foreach { case (h, got) =>
      assert(got, s"false negative at $h")
    }
    // null flows through as null (nullIntolerant)
    val withNull = Seq[java.lang.Long](1L, null).toDF("h")
      .select(graft.expressions.BloomExpressions.mightContain($"h", bcast).as("g"))
      .collect()
    assert(withNull(1).isNullAt(0))
  }

  test("graft_topk rejects non-literal, null, and non-positive k at analysis time") {
    docs.createOrReplaceTempView("docs_sql_test")
    def bad(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException]
        || e.getMessage.contains("graft_topk"), s"unexpected: $e")
    }
    bad("SELECT graft_topk(doc_id, 1.0d, doc_id) FROM docs_sql_test")     // non-literal
    bad("SELECT graft_topk(doc_id, 1.0d, NULL) FROM docs_sql_test")       // null literal
    bad("SELECT graft_topk(doc_id, 1.0d, 0) FROM docs_sql_test")          // non-positive
  }
}

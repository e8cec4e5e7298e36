package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL entry point: session views + spark.sql, including
  * named-parameter binding — the Spark analogue of the reference's
  * Cypher parameter binding (`$prompt_embeddings`, reference
  * server.py:86,95 / SURVEY.md §2.1 O4): values travel as bound
  * parameters, never string-spliced into query text. */
class SqlFrontDoorSpec extends AnyFunSuite with SparkSpec {

  test("named parameters bind into spark.sql like the reference's Cypher params") {
    spark.read.parquet(s"$sf001/orders.parquet")
      .createOrReplaceTempView("orders_param_test")
    val bound = spark.sql(
      "SELECT count(*) AS n FROM orders_param_test WHERE o_totalprice > :minPrice",
      Map("minPrice" -> 300000))
      .head().getLong(0)
    val direct = spark.table("orders_param_test")
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 300000)
      .count()
    assert(bound === direct && bound > 0)
  }

  test("an array parameter carries a query vector, as the reference binds embeddings") {
    import graft.functions.VectorFunctions._
    spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(hasDim(org.apache.spark.sql.functions.col("embedding"), 64))
      .createOrReplaceTempView("emb_param_test")
    val qv = spark.table("emb_param_test")
      .filter("vec_id = 0").select("embedding")
      .head().getSeq[Float](0)
    val top = spark.sql(
      """SELECT vec_id, round(graft_cosine(embedding, :qv), 6) AS cos
        |FROM emb_param_test ORDER BY cos DESC, vec_id ASC LIMIT 3""".stripMargin,
      Map("qv" -> qv.toArray))
      .collect()
    assert(top.length === 3)
    assert(top.head.getLong(0) === 0L && top.head.getDouble(1) === 1.0) // self-match first
  }
}

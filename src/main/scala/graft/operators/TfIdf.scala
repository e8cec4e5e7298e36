package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting (Spärck Jones idf) over a tokenized corpus —
  * the relevance weighting a keyword indexer materializes next to the
  * reference's vector index (reference server.py:87 is vector-only;
  * extension surface).
  *
  * Scale shape: tf is one explode → map-side-combined count per
  * (doc, term); document frequency and the corpus size are broadcast
  * back (vocabulary ≪ corpus at any scale — if it ever outgrew
  * broadcast the join key is `term` and the shape stays an equi-join);
  * the per-doc ranking window partitions by doc id, so window state is
  * bounded per document.
  */
object TfIdf {

  /** (idCol, term, tf, tfidf) for every (doc, term) pair;
    * tfidf = tf · ln(N / df), rounded to 6 dp (rank-stable). */
  def weights(tokenized: DataFrame, idCol: String = "doc_id",
              toksCol: String = "toks"): DataFrame = {
    val tf = tokenized.select(col(idCol), explode(col(toksCol)).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val nDocs = tokenized.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf").cast("double") * log(col("n_docs") / col("df")), 6))
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }

  /** Top-`k` terms per document by tfidf (ties broken by term asc). */
  def topTerms(tokenized: DataFrame, k: Int, idCol: String = "doc_id",
               toksCol: String = "toks"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    weights(tokenized, idCol, toksCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"),
        col("term"), col("tfidf"))
  }
}

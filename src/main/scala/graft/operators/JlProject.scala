package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.{JlDim, JlPlanes}
import graft.functions.VectorFunctions.dotProduct

/** Johnson–Lindenstrauss random projection — embedding compression for
  * the storage/compute tier below exact search (the JL lemma: a random
  * k-dim projection preserves pairwise distances of n points to
  * 1 ± O(sqrt(ln n / k)); Achlioptas 2003 for the database-friendly
  * form — public literature). A curation pipeline projects 64-d (or
  * 1536-d) embeddings to 16-d for cheap clustering/dedup prefilters,
  * then verifies survivors at full precision — this operator is the
  * projection plus the audit that MEASURES the distortion the lemma
  * promises, instead of assuming it.
  *
  * Determinism: the plane family is seeded and rounded to 6 dp
  * ([[graft.functions.PortableHash.JlPlanes]] — literal-identical in
  * both engines); each coordinate is a sequential-fold dot product
  * (the VectorFunctions contract) scaled by 1/sqrt(16) = 0.25 (exactly
  * representable) and rounded to 6 dp.
  *
  * Scale shape: projection is pure row-local expression work (16
  * fold-dots per row, no shuffle, no state — the 100 TB cost is one
  * map pass); the distortion audit bounds its pair volume by a
  * deterministic id-prefix sample (sample² pairs, sample ≪ corpus),
  * so audit cost is corpus-independent.
  */
object JlProject {

  /** The 16-d projection of a 64-d embedding column, as ARRAY<DOUBLE>:
    * y_j = round(0.25 · <x, plane_j>, 6). */
  def project(emb: Column): Column =
    array(JlPlanes.map(p =>
      round(dotProduct(emb, typedLit(p)) * 0.25, 6)): _*)

  /** DuckDB SQL computing exactly [[project]] of embedding expr `v`. */
  def projectSql(v: String): String =
    JlPlanes.map { p =>
      val lits = p.mkString("[", ",", "]")
      s"round(0.25 * list_sum(list_transform(list_zip($v, $lits), " +
        s"p -> CAST(p[1] AS DOUBLE) * p[2])), 6)"
    }.mkString("[", ", ", "]")

  /** Distortion audit over the deterministic sample `vec_id < sampleN`:
    * one row — (k, n_pairs, mean_ratio, min_ratio, max_ratio) where
    * ratio = ||proj(a)-proj(b)|| / ||a-b|| per sampled pair (zero-
    * distance pairs excluded; both engines exclude identically). */
  def distortionAudit(corpus: DataFrame, sampleN: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val s = corpus.filter(col("vec_id") < sampleN)
      .select(col("vec_id"), col("embedding"), project(col("embedding")).as("proj"))
    val a = s.select(col("vec_id").as("va"), col("embedding").as("ea"), col("proj").as("pa"))
    val b = s.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("proj").as("pb"))
    val d = graft.expressions.VectorExpressions.sqDist _
    a.join(b, col("va") < col("vb"))
      .select(
        round(sqrt(d(col("pa"), col("pb"))) / sqrt(d(col("ea"), col("eb"))), 6)
          .as("ratio"),
        d(col("ea"), col("eb")).as("d2"))
      .filter(col("d2") > 0.0)
      .agg(
        lit(JlDim.toLong).as("k"),
        count(lit(1)).as("n_pairs"),
        round(sum(col("ratio").cast("decimal(28,10)")).cast("double") /
          count(lit(1)), 6).as("mean_ratio"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
  }
}

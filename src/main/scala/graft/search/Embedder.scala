package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Text → fixed-dimension embedding vector.
  *
  * The reference defines two embedding "UDFs": a local
  * sentence-transformers model (reference server.py:28-38) and a remote
  * OpenAI call (reference server.py:40-58). Both are non-deterministic
  * external services, so the engine models embedding as a pluggable seam
  * (SURVEY.md §7 step 2): the *default* implementation must be
  * deterministic and offline (this environment is zero-egress), while a
  * remote HTTP embedder would slot in behind the same trait.
  *
  * Scale posture: `embedCorpus` runs as `mapPartitions` — one embedder
  * instantiation per partition, never per row (the per-row-model-init
  * anti-pattern the reference's `udf`-equivalent would hit;
  * SURVEY.md §2.2 UDF row).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Stable identity of the vector space this embedder produces —
    * stamped into serving roots at init
    * ([[graft.search.AnnIndex.ServingRoot.init]]) and verified on
    * every root-served request: two embedders with EQUAL dims but
    * different token hashing (or a remote model behind the seam
    * swapped for another) produce vectors in incomparable spaces, and
    * a root built for one, served by another, degrades every route
    * SILENTLY — the dim guard cannot see it, and even the exact-scan
    * fallback compares the mis-embedded prompt against the corpus
    * vectors. Implementations must change this string whenever the
    * text → vector function changes. */
  def signature: String = s"${getClass.getSimpleName}/dim=$dim"

  /** Embed one text (driver-side, for the single-prompt query path —
    * the reference embeds exactly one prompt per call, server.py:78). */
  def embed(text: String): Array[Float]

  /** Embed a corpus column distributed. Adds `outputCol` ARRAY<FLOAT>. */
  def embedCorpus(df: DataFrame, textCol: String, outputCol: String): DataFrame = {
    val d = dim
    val self = this
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(outputCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // one embedder per partition; a model-backed impl would load here
      rows.map { r =>
        val v = self.embed(r.getString(idx))
        require(v.length == d, s"embedder produced ${v.length}-d vector, expected $d")
        Row.fromSeq(r.toSeq :+ v.toSeq)
      }
    }(enc)
  }
}

/** Deterministic offline embedder: token-hashing term frequencies
  * (HashingTF-style, murmur3 of the token picks the bucket) followed by
  * L2 normalization. Same text → same vector, on any machine, no I/O —
  * the seeded/deterministic default SURVEY.md §7 requires so tests can be
  * golden. Dimension defaults to 64 to match the fixture corpus
  * (FIXTURES.md: embeddings are 64-d).
  */
final class HashingEmbedder(override val dim: Int = 64) extends Embedder {
  /** Names the hash family AND its seed — the two knobs that move
    * every vector without moving `dim`. */
  override def signature: String = s"HashingEmbedder/dim=$dim/murmur3=42"

  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      var i = 0
      val toks = text.split(" ")
      while (i < toks.length) {
        val t = toks(i)
        if (t.nonEmpty) {
          val h = scala.util.hashing.MurmurHash3.stringHash(t, 42)
          val b = ((h % dim) + dim) % dim
          v(b) += 1.0f
        }
        i += 1
      }
      var ss = 0.0
      i = 0
      while (i < dim) { ss += v(i).toDouble * v(i); i += 1 }
      if (ss > 0) {
        val inv = 1.0 / math.sqrt(ss)
        i = 0
        while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
      }
    }
    v
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash.P
import graft.multimodal.Multimodal

/** Oracle-checked slice of the multimodal plumbing: q24 runs the real
  * binary path (encode → blob + metadata struct → batched mapPartitions
  * feature extraction) and the oracle recomputes the same byte
  * statistics in SQL (the corpus is ASCII, so UTF-8 bytes == code
  * points and the byte fold is expressible portably).
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q24_blob_features" -> ((s, dir) => {
      val docs = graft.SparkEntry.tbl(s, dir, "documents")
      val blobs = Multimodal.ingestAsBlobs(docs)
      Multimodal.extractFeatures(blobs)
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("n_chunks"), col("byte_sum"))
        .orderBy(col("doc_id"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q24_blob_features" ->
      s"""SELECT doc_id,
         |  octet_length(encode(text))::BIGINT AS n_bytes,
         |  CAST(ceil(octet_length(encode(text)) / ${Multimodal.DefaultChunkBytes}.0) AS BIGINT) AS n_chunks,
         |  list_reduce(list_prepend(0::BIGINT, list_transform(
         |    list_filter(string_split(text, ''), c -> c != ''),
         |    c -> unicode(c)::BIGINT)), (a, b) -> (a + b) % $P) AS byte_sum
         |FROM documents ORDER BY doc_id""".stripMargin,
  )
}

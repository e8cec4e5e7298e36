package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Sources and sinks (SURVEY.md §2.2 scans/sinks rows). The reference
  * reads exactly one store — Neo4j nodes through a vector index
  * (reference server.py:87) — and writes JSON text to the MCP response
  * (server.py:64). The engine generalizes both sides: schema'd readers
  * for the ingest formats a curation pipeline meets (Parquet, JSONL,
  * CSV) and partitioned Parquet writers for derived artifacts (bucket
  * tables, survivor sets).
  *
  * Posture: every reader takes an *explicit* StructType — schema-on-read
  * with no inference pass (inference scans the data twice and can flip
  * types between runs; at 100 TB both are unacceptable). Writers default
  * to snappy Parquet; `partitionByCols` turns a column into a directory
  * key so downstream filters prune whole directories (partition pruning,
  * the coarsest pushdown).
  */
object Sources {

  /** The canonical document schema (FIXTURES.md `documents`). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** The canonical embedding schema (FIXTURES.md `embeddings`). */
  val EmbeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("label", IntegerType, nullable = true)))

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Normalize the events fixture's `ts` column to session-local
    * TimestampType, whatever physical encoding the fixture was written
    * with. The fixture has shipped three encodings across regenerations:
    *   - TIMESTAMP(NANOS) parquet, which Spark 4 reads only as epoch
    *     nanos long (`spark.sql.legacy.parquet.nanosAsLong`, set in
    *     Verify/Bench/tests) — integer floor division to micros (epoch
    *     nanos exceed Double's 2^53 exact range, so `/`, which promotes
    *     to Double, could shift by ~256 ns);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    *     TIMESTAMP_NTZ — every session here pins UTC, so `cast` to
    *     TimestampType is an epoch-preserving relabel (no wall-clock
    *     shift), and time functions (`unix_micros`, `window`,
    *     watermarks) accept it;
    *   - plain TIMESTAMP — already what downstream wants.
    * Every reader of the events table — main queries, streaming twins,
    * and specs — MUST go through this one helper so the next fixture
    * re-encoding is a one-line fix here, not a hunt across modules. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; extend Sources.normalizeEventTs")
    }

  /** JSON-lines with a required schema (no inference). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Headered CSV with a required schema (no inference). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC reader — the other columnar format large Hive-era estates hold
    * their corpora in; Spark's native vectorized ORC reader supports the
    * same predicate/column pushdown as Parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Parquet sink; `partitionByCols` become directory keys for
    * partition pruning. `numFiles` forces a multi-file layout (per
    * partition directory when partitioned) — the knob ScaleProbe's
    * `--multifile` mode and fixture regenerations use to produce
    * realistic many-file datasets instead of one row group. */
  def writeParquet(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite,
                   numFiles: Option[Int] = None): Unit = {
    val d = numFiles.map(df.repartition(_)).getOrElse(df)
    val w = d.write.mode(mode)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w).parquet(path)
  }

  /** JSONL sink (one JSON object per line — the wire shape of the
    * reference's response, server.py:64, as a file). */
  def writeJsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** ORC sink; same partition-pruning contract as [[writeParquet]]. */
  def writeOrc(df: DataFrame, path: String, partitionByCols: Seq[String] = Nil,
               mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w).orc(path)
  }

  /** Bucketed + sorted table sink — the co-located-join layout for the
    * 100 TB tier. Two tables bucketed (and sorted) on their join key
    * with the same bucket count join with NO shuffle and NO sort: each
    * task zips bucket i of both sides. This is how a corpus and its
    * derived artifacts (signatures, embeddings, survivor sets) should
    * be laid out so every downstream join is exchange-free.
    * Bucketing requires the table catalog (`saveAsTable`), not a bare
    * path — the bucket spec lives in table metadata. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** Corpus-hygiene scrubbers — the two cleaning passes a training-data
  * pipeline runs BEFORE dedup/decontamination (the reference,
  * server.py:85-91, queries an already-clean corpus and has neither):
  *
  *  - '''boilerplate scrub''' (C4/RefinedWeb-style): a span that occurs
  *    in ≥ `minDf` distinct documents is boilerplate (headers, nav
  *    bars, license blocks) and is removed from EVERY document — unlike
  *    span dedup (q66 / [[Dedup]]), which keeps the first occurrence.
  *    Scale shape: chunk+hash are row-local; one corpus-wide shuffle
  *    on the chunk hash computes document frequency with map-side
  *    partial aggregation; the surviving boilerplate set is ORDERS OF
  *    MAGNITUDE smaller than the corpus (it is capped by
  *    distinct-chunks × the DF tail), so the flag-back join broadcasts
  *    and the per-doc rollup is the only other shuffle. At 100 TB the
  *    DF table is the small side by construction — no corpus-vs-corpus
  *    join ever happens.
  *
  *  - '''PII redaction''': regex scrub of emails, North-American phone
  *    numbers, and IPv4 literals, each replaced by a typed tag, with
  *    per-class match counts for the audit report. Entirely row-local
  *    codegen'd string work — zero shuffle, linear scale-out. Patterns
  *    are restricted to the Java-regex ∩ RE2 common subset (no
  *    lookbehind/lookahead) so the DuckDB oracle twin is exact.
  */
object Scrub {

  // ---------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------

  /** Portable (Java regex ∩ RE2) PII patterns. Order of application is
    * part of the contract: email first (its local part may contain
    * digits), then phone, then IPv4. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+1-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val Ipv4Tag = "<IP>"

  /** Text with all three PII classes replaced by their tags, in the
    * contract order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailTag),
        PhonePattern, PhoneTag),
      Ipv4Pattern, Ipv4Tag)

  /** Per-class match count (the audit metric shipped with a scrub). */
  def piiCounts(text: Column): (Column, Column, Column) = (
    regexp_count(text, lit(EmailPattern)).cast("long"),
    regexp_count(text, lit(PhonePattern)).cast("long"),
    regexp_count(text, lit(Ipv4Pattern)).cast("long"))

  /** DuckDB twins (regexp_replace needs the 'g' flag — DuckDB replaces
    * only the first match by default, Java all). */
  def redactSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, " +
      s"'$EmailPattern', '$EmailTag', 'g'), " +
      s"'$PhonePattern', '$PhoneTag', 'g'), " +
      s"'$Ipv4Pattern', '$Ipv4Tag', 'g')"
  def piiCountSql(e: String, pattern: String): String =
    s"len(regexp_extract_all($e, '$pattern'))::BIGINT"

  // ---------------------------------------------------------------
  // Boilerplate scrub
  // ---------------------------------------------------------------

  /** Per-document boilerplate-removal report over a chunk table
    * (doc_id, idx, h) — the q66 chunk grain. A hash is boilerplate iff
    * it occurs in ≥ `minDf` distinct documents; every occurrence is
    * dropped. `kept_checksum` (sum of surviving chunk hashes, exact —
    * hashes < P so even 10⁹ chunks stay within Long) proves WHICH
    * chunks survived, not just how many.
    *
    * The document-frequency aggregate is corpus-wide but its output is
    * small; `broadcast` pins the flag-back join to the replicated side
    * so the chunk table is never shuffled a second time for the join. */
  def boilerplateReport(chunks: DataFrame, minDf: Long): DataFrame = {
    val bp = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"), lit(true).as("is_bp"))
    chunks.join(broadcast(bp), Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_bp"), 1L).otherwise(0L)).cast("long").as("n_bp"),
        sum(when(col("is_bp"), 0L).otherwise(col("h"))).cast("long")
          .as("kept_checksum"))
      .withColumn("kept_ratio",
        round((col("n_chunks") - col("n_bp")).cast("double") / col("n_chunks"), 6))
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A — public literature): the canonical rule battery a
  * training-data pipeline runs between scrubbing ([[Scrub]]) and dedup.
  * The reference (server.py:78) passes text through verbatim and
  * filters nothing — this whole surface is extension.
  *
  * A document is kept iff ALL rules pass:
  *  - word count within [[MinWords]]..[[MaxWords]]
  *  - mean word length within [[MinMeanWordLen]]..[[MaxMeanWordLen]]
  *  - symbol-to-word ratio ('#' or '...') below [[MaxSymbolRatio]]
  *  - fraction of lines starting with a bullet below [[MaxBulletFrac]]
  *  - fraction of lines ending with an ellipsis below [[MaxEllipsisFrac]]
  *  - fraction of words containing an alphabetic char above [[MinAlphaFrac]]
  *  - at least [[MinRequiredHits]] DISTINCT words from a required-word
  *    list present (Gopher's own list is English stopwords; the list is
  *    a parameter because it is corpus/language specific)
  *
  * Scale shape: every rule is row-local codegen'd string/array math over
  * the document's own lines and words — zero shuffle at any corpus
  * size; at 100 TB each task filters its own partition and only the
  * report rows move. Each Column combinator has a `...Sql` twin emitting
  * the same operation tree for the DuckDB oracle (counts are exact
  * integers; every ratio is rounded once, identically, at the end).
  */
object Gopher {

  // Canonical Gopher thresholds (Rae et al. 2021, Appendix A).
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MaxBulletFrac = 0.9
  val MaxEllipsisFrac = 0.3
  val MinAlphaFrac = 0.8
  val MinRequiredHits = 2L

  /** Newline-split lines of a (possibly multi-line) text column. */
  def lines(text: Column): Column = split(text, "\n")
  def linesSql(e: String): String = s"string_split($e, chr(10))"

  /** Whitespace words across all lines, empties dropped. */
  def words(text: Column): Column =
    filter(split(translate(text, "\n", " "), " "), w => w =!= "")
  def wordsSql(e: String): String =
    s"list_filter(string_split(replace($e, chr(10), ' '), ' '), w -> w != '')"

  /** Mean word length (rounded to 6 dp); 0.0 for an empty document. */
  def meanWordLen(ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(round(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .cast("double") / size(ws), 6))
  def meanWordLenSql(wsE: String): String =
    s"(CASE WHEN len($wsE) = 0 THEN 0.0 ELSE round(" +
      s"list_reduce(list_prepend(0::BIGINT, list_transform($wsE, w -> length(w)::BIGINT)), (a, b) -> a + b)::DOUBLE" +
      s" / len($wsE), 6) END)"

  /** Symbol-to-word ratio: non-overlapping '#' and '...' matches over
    * the raw text, per word (rounded to 6 dp); 0.0 when no words. */
  def symbolRatio(text: Column, ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(round(
      (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
        .cast("double") / size(ws), 6))
  def symbolRatioSql(e: String, wsE: String): String =
    s"(CASE WHEN len($wsE) = 0 THEN 0.0 ELSE round(" +
      s"(len(regexp_extract_all($e, '#')) + len(regexp_extract_all($e, '\\.\\.\\.')))::DOUBLE" +
      s" / len($wsE), 6) END)"

  /** Fraction of lines starting with the '- ' bullet (rounded, 6 dp). */
  def bulletFrac(ls: Column): Column =
    round(size(filter(ls, l => l.startsWith("- "))).cast("double") / size(ls), 6)
  def bulletFracSql(lsE: String): String =
    s"round(len(list_filter($lsE, l -> starts_with(l, '- ')))::DOUBLE / len($lsE), 6)"

  /** Fraction of lines ending with '...' (rounded, 6 dp). */
  def ellipsisFrac(ls: Column): Column =
    round(size(filter(ls, l => l.endsWith("..."))).cast("double") / size(ls), 6)
  def ellipsisFracSql(lsE: String): String =
    s"round(len(list_filter($lsE, l -> ends_with(l, '...')))::DOUBLE / len($lsE), 6)"

  /** Fraction of words containing at least one alphabetic character
    * (rounded to 6 dp); 0.0 when no words. */
  def alphaFrac(ws: Column): Column =
    when(size(ws) === 0, lit(0.0)).otherwise(round(
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / size(ws), 6))
  def alphaFracSql(wsE: String): String =
    s"(CASE WHEN len($wsE) = 0 THEN 0.0 ELSE round(" +
      s"len(list_filter($wsE, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len($wsE), 6) END)"

  /** Number of DISTINCT required words present in the document. */
  def requiredHits(ws: Column, required: Seq[String]): Column =
    size(filter(typedLit(required), sw => array_contains(ws, sw))).cast("long")
  def requiredHitsSql(wsE: String, required: Seq[String]): String =
    s"len(list_filter(${required.mkString("['", "','", "']")}, sw -> list_contains($wsE, sw)))::BIGINT"

  /** The conjunction of all seven rules over the report columns. */
  def keep(nWords: Column, mwl: Column, symR: Column, bulF: Column,
           ellF: Column, alpF: Column, reqHits: Column): Column =
    nWords.between(MinWords, MaxWords) &&
      mwl.between(MinMeanWordLen, MaxMeanWordLen) &&
      symR < MaxSymbolRatio && bulF < MaxBulletFrac &&
      ellF < MaxEllipsisFrac && alpF > MinAlphaFrac &&
      reqHits >= MinRequiredHits
  def keepSql(nWords: String, mwl: String, symR: String, bulF: String,
              ellF: String, alpF: String, reqHits: String): String =
    s"(($nWords BETWEEN $MinWords AND $MaxWords) AND " +
      s"($mwl BETWEEN $MinMeanWordLen AND $MaxMeanWordLen) AND " +
      s"$symR < $MaxSymbolRatio AND $bulF < $MaxBulletFrac AND " +
      s"$ellF < $MaxEllipsisFrac AND $alpF > $MinAlphaFrac AND " +
      s"$reqHits >= $MinRequiredHits)"
}

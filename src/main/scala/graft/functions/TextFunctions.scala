package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data curation (BASELINE.json
  * north star; the reference itself never inspects text — the prompt is
  * passed through verbatim, reference server.py:78 — so this whole
  * surface is extension): token counting, quality scoring, language ID,
  * fingerprinting. Everything is built from codegen'd built-ins
  * (higher-order functions + regex), no UDFs, and each Column combinator
  * has a `...Sql` twin generating the DuckDB oracle expression with the
  * *same* operation tree, so results are hash-exact comparable.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped (split on single space — the
    * fixture corpus is single-space word soup, FIXTURES.md). */
  def tokens(c: Column): Column = filter(split(c, " "), t => t =!= "")
  def tokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t != '')"

  /** BPE-ish subword pre-tokenizer: letter runs, digit runs, and single
    * non-alphanumeric marks — the GPT-2-style pre-tokenization shape,
    * portable (no lookbehind) so Java regex and DuckDB RE2 agree. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(BpePattern), lit(0))
  def bpeTokensSql(e: String): String = s"regexp_extract_all($e, '$BpePattern')"

  /** English function words used for the stopword-ratio quality signal. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  private def stopLit: Column = typedLit(Stopwords)
  private def stopSqlList: String = Stopwords.mkString("['", "','", "']")

  /** Count of stopword tokens in a token-array column. */
  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => array_contains(stopLit, t))).cast("long")
  def stopwordCountSql(toksE: String): String =
    s"len(list_filter($toksE, t -> list_contains($stopSqlList, t)))::BIGINT"

  /** Punctuation/symbol characters (anything outside [A-Za-z0-9 ]). */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[A-Za-z0-9 ]", "")).cast("long")
  def punctCountSql(e: String): String =
    s"length(regexp_replace($e, '[A-Za-z0-9 ]', '', 'g'))::BIGINT"

  /** Heuristic document quality in [0,1] from length, lexical diversity,
    * stopword load, and mean token length. The exact formula is the
    * contract: both engines must evaluate this operation tree verbatim
    * (same order, Double arithmetic, rounded once at the end). */
  def qualityScore(nTokens: Column, nDistinct: Column, stopRatio: Column, avgTokLen: Column): Column =
    round(
      lit(0.3) * least(lit(1.0), nTokens.cast("double") / 100.0) +
      lit(0.3) * (nDistinct.cast("double") / nTokens.cast("double")) +
      lit(0.2) * (lit(1.0) - stopRatio) +
      lit(0.2) * least(lit(1.0), avgTokLen / 8.0), 6)
  def qualityScoreSql(nTokens: String, nDistinct: String, stopRatio: String, avgTokLen: String): String =
    s"round(0.3 * least(1.0, CAST($nTokens AS DOUBLE) / 100.0) + " +
      s"0.3 * (CAST($nDistinct AS DOUBLE) / CAST($nTokens AS DOUBLE)) + " +
      s"0.2 * (1.0 - $stopRatio) + " +
      s"0.2 * least(1.0, $avgTokLen / 8.0), 6)"

  /** Tiny per-language function-word profiles for n-gram-free language
    * ID (a stopword-hit heuristic — the standard cheap LangID baseline).
    * Order of the map is the deterministic argmax priority. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de0", "shi4", "le0", "zai4", "wo3", "you3", "he2"))

  /** Per-language stopword-hit score columns, in profile order. */
  def langScores(toks: Column): Seq[(String, Column)] =
    LangProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => array_contains(typedLit(words), t))).cast("long")
    }

  /** Deterministic argmax over [[langScores]]: first language (in
    * profile order) whose score is >= all others; all-zero → "und". */
  def langPredict(toks: Column): Column = {
    val scores = langScores(toks)
    val anyHit = scores.map(_._2).reduce(_ + _) > 0L
    val argmax = scores.zipWithIndex.foldRight(lit("und")) { case (((lang, s), i), elseCol) =>
      val isMax = scores.filter(_._1 != lang).map { case (_, o) => s >= o }.reduce(_ && _)
      when(isMax, lit(lang)).otherwise(elseCol)
    }
    when(anyHit, argmax).otherwise(lit("und"))
  }
  def langPredictSql(toksE: String): String = {
    def score(words: Seq[String]): String =
      s"len(list_filter($toksE, t -> list_contains(${words.mkString("['", "','", "']")}, t)))"
    val scores = LangProfiles.map { case (lang, words) => lang -> score(words) }
    val anyHit = scores.map(_._2).mkString("(", " + ", ") > 0")
    val chain = scores.map { case (lang, s) =>
      val isMax = scores.filter(_._1 != lang).map { case (_, o) => s"$s >= $o" }.mkString(" AND ")
      s"WHEN $isMax THEN '$lang'"
    }.mkString(" ")
    s"(CASE WHEN NOT ($anyHit) THEN 'und' $chain ELSE 'und' END)"
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._
import graft.functions.TextFunctions._
import graft.SparkEntry.IngestOps

/** Text-analysis queries over the `documents` table (BASELINE.json north
  * star: token counting, quality scoring, language ID, fingerprinting).
  * Per-document work is all *row-local* higher-order-function math — no
  * shuffle except the final small group-by/order — so the shape scales
  * linearly: at 100 TB each task fingerprints its own partition and only
  * aggregate rows move.
  *
  * Every query has a DuckDB oracle built from the same `...Sql` twins
  * (graft.functions.TextFunctions / PortableHash), so the driver's
  * hash compare is exact.
  */
object TextQueries {

  /** q39 chunking geometry: 32-token windows every 24 tokens (8-token
    * overlap) — the context-window packing step of an LLM data
    * pipeline. Chunk starts are 0, 24, 48, … while start < n_tokens. */
  val ChunkSize = 32
  val ChunkStride = 24

  /** q84 rendering geometry: the fixture corpus is single-line word
    * soup, so the Gopher line-level rules need documents WITH structure.
    * Like q80's PII injection, structure is injected deterministically
    * from doc_id (identically in the oracle SQL): tokens are wrapped
    * into [[RenderLineLen]]-token lines; residue classes of (doc_id, i)
    * add bullets / '#' symbol spam / trailing ellipses, including whole
    * "listy" (doc_id % 8 == 6), "symbol-spam" (% 9 == 4) and
    * "ellipsis-heavy" (% 10 == 7) document classes so every line rule
    * has real failures. The operator under test is [[graft.operators.Gopher]]
    * itself — the rendering is fixture enrichment, not the operator. */
  val RenderLineLen = 8

  /** q84 required-word list: the fixture-adapted stand-in for Gopher's
    * English stopword-presence rule (the list is corpus-specific by
    * design — [[graft.operators.Gopher.requiredHits]]). */
  val GopherRequired: Seq[String] = Seq("the", "a", "data", "key")

  /** Deterministic multi-line rendering of a token array (twin:
    * [[renderedSql]]). */
  private def renderedCol(docId: Column, toks: Column): Column = {
    val L = RenderLineLen
    // exact integer ceil-div; Column./ is double division (Spark sequence
    // with start > stop would silently count DOWN for an empty doc, so
    // the empty case is guarded out explicitly, matching range(0) = [])
    val nLines = floor((size(toks).cast("long") + (L - 1)) / lit(L.toLong)).cast("long")
    when(size(toks) === 0, lit("")).otherwise(array_join(
      transform(sequence(lit(0L), nLines - 1), i =>
        concat(
          when(pmod(docId, lit(8L)) === 6 || pmod(docId * 31 + i, lit(5L)) === 0,
            lit("- ")).otherwise(lit("")),
          concat_ws(" ", slice(toks, (i * L + 1).cast("int"), lit(L))),
          when(pmod(docId, lit(9L)) === 4, lit(" # # #"))
            .when(pmod(docId * 13 + i, lit(11L)) === 5, lit(" #tag"))
            .otherwise(lit("")),
          when((pmod(docId, lit(10L)) === 7 && pmod(i, lit(2L)) === 0) ||
              pmod(docId * 17 + i, lit(7L)) === 3,
            lit(" ...")).otherwise(lit("")))),
      "\n"))
  }
  private def renderedSql(id: String, toksE: String): String = {
    val L = RenderLineLen
    s"""array_to_string(list_transform(range((len($toksE)::BIGINT + ${L - 1}) // $L), i ->
       |      (CASE WHEN ($id % 8 = 6) OR (($id*31 + i) % 5 = 0) THEN '- ' ELSE '' END) ||
       |      array_to_string(list_slice($toksE, i*$L + 1, i*$L + $L), ' ') ||
       |      (CASE WHEN $id % 9 = 4 THEN ' # # #'
       |            WHEN ($id*13 + i) % 11 = 5 THEN ' #tag' ELSE '' END) ||
       |      (CASE WHEN ($id % 10 = 7 AND i % 2 = 0) OR (($id*17 + i) % 7 = 3) THEN ' ...' ELSE '' END)
       |    ), chr(10))""".stripMargin
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.tbl(s, dir, "documents")

  /** n-token shingles joined with '|'; fewer than n tokens → empty. */
  def shingleCol(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        (1 until n).foldLeft(element_at(toks, i + 1)) { (acc, j) =>
          concat(acc, lit("|"), element_at(toks, i + j + 1))
        }))
      .otherwise(typedLit(Seq.empty[String]))

  def shingleSql(toksE: String, n: Int = 3): String = {
    val body = (0 until n).map(j => s"$toksE[i + ${j + 1}]").mkString(" || '|' || ")
    s"(CASE WHEN len($toksE) >= $n THEN list_transform(range(len($toksE) - ${n - 1}), i -> $body) ELSE [] END)"
  }

  /** Sum of token lengths (character mass of the token stream). */
  private def tokCharSum(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
  private def tokCharSumSql(toksE: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform($toksE, t -> length(t)::BIGINT)), (a, b) -> a + b)"

  /** Per-document base columns shared by the text queries — session-
    * cached (q13, q14 and q43's curation funnel all consume it; the
    * interpreted higher-order token math runs once), repartitioned
    * first so the one-split corpus parquet doesn't serialize the pass
    * onto a single task. */
  private[queries] def enriched(s: SparkSession, dir: String): DataFrame =
    graft.SparkEntry.cachedView(s,
      "graft_cache_enriched_" + graft.SparkEntry.pathSlug(dir)) {
      val t = tokens(col("text"))
      docs(s, dir).spreadIfNarrow(s)
        .withColumn("toks", t)
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
        .withColumn("n_stop", stopwordCount(col("toks")))
        .withColumn("char_sum", tokCharSum(col("toks")))
    }
  // DuckDB twin of `enriched` as a CTE body
  private[queries] val enrichedSql: String = {
    val t = tokensSql("text")
    s"""SELECT doc_id, lang, source, text, $t AS toks,
       |  len($t)::BIGINT AS n_tokens,
       |  len(list_distinct($t))::BIGINT AS n_distinct,
       |  ${stopwordCountSql(t)} AS n_stop,
       |  ${tokCharSumSql(t)} AS char_sum
       |FROM documents""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q109_source_anova" -> ((s, dir) => {
      // one-way ANOVA decomposition of the q14 quality score by SOURCE
      // (Fisher's F, textbook computational form) — the bad-feed
      // detector: a crawl source whose quality mean drifts from the
      // corpus shows up as between-source variance, and F spikes long
      // before eyeballing per-doc scores would catch it. Determinism:
      // quality is 6-dp rounded, so Σq (decimal 28,6) and Σq²
      // (decimal 28,12 — a 6-dp square is exactly 12 dp) are EXACT
      // integers-in-decimal in both engines; the only doubles are the
      // final divisions, mirrored expression-for-expression. Shape:
      // ONE map-side-combined groupBy(source) collapses the corpus to
      // the source directory; the variance decomposition is arithmetic
      // over that k-row table with one-row totals broadcast back
      // (q94's shape). Per-source rows carry the F/eta2 verdict.
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      val avgTokLen = col("char_sum").cast("double") / col("n_tokens")
      val q = enriched(s, dir).withColumn("q",
        qualityScore(col("n_tokens"), col("n_distinct"), stopRatio, avgTokLen))
      val per = q.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("q").cast("decimal(28,6)")).as("s_q"),
        sum((col("q") * col("q")).cast("decimal(28,12)")).as("s_qq"))
      val tot = per.agg(
        count(lit(1)).as("k"),
        sum(col("n_docs")).as("n_total"),
        sum(col("s_q")).as("s_all"),
        sum(col("s_qq")).as("q_all"),
        // Σ_j S_j²/n_j — the between-group raw term, decimal-routed so
        // source order cannot move the double sum
        sum(((col("s_q").cast("double") * col("s_q").cast("double")) /
          col("n_docs").cast("double")).cast("decimal(28,12)"))
          .cast("double").as("sb_raw"))
      val grand = col("s_all").cast("double") / col("n_total").cast("double")
      val ssb = col("sb_raw") -
        (col("s_all").cast("double") * col("s_all").cast("double")) /
          col("n_total").cast("double")
      val sst = col("q_all").cast("double") -
        (col("s_all").cast("double") * col("s_all").cast("double")) /
          col("n_total").cast("double")
      val ssw = col("q_all").cast("double") - col("sb_raw")
      val f = (ssb / (col("k") - 1).cast("double")) /
        (ssw / (col("n_total") - col("k")).cast("double"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          round(col("s_q").cast("double") / col("n_docs").cast("double"), 6)
            .as("mean_q"),
          round(col("s_q").cast("double") / col("n_docs").cast("double") -
            grand, 6).as("dev"),
          round(f, 6).as("f_stat"),
          round(ssb / sst, 6).as("eta2"))
        .orderBy(col("source"))
    }),

    "q138_source_kl" -> ((s, dir) => {
      // per-source unigram KL divergence vs the whole corpus — the
      // distribution-drift face of q109's mean-drift ANOVA: a feed
      // whose WORD MIX shifts (topic drift, language bleed, template
      // spam) lights up in KL(source‖corpus) even when its q14 mean
      // quality stays flat. EXACT, no smoothing: every source token
      // also occurs in the corpus (the corpus contains the source), so
      // p_corpus(w) > 0 wherever p_source(w) > 0 by construction.
      // Identity computed: KL_s = S_s/N_s + ln N − ln N_s with
      // S_s = Σ_w c_sw·(ln c_sw − ln C_w) — one libm ln per DIRECTORY
      // row, decimal-routed sum so partition order cannot move it.
      // Shape: ONE corpus shuffle (map-side-combined groupBy(source,
      // tok) to the sources×vocab directory); the global counts C_w
      // DERIVE from that directory (no second corpus pass) and join
      // back with NO static broadcast hint — the directory is
      // corpus-VOCABULARY-sized, so the strategy is AQE's runtime
      // size gate (the reconciled q90 rule; see
      // CurationQueries.lmScored). The join's probe side here is the
      // sources×vocab directory, not the corpus, so even the
      // worst-case shuffle is directory-bounded. Totals broadcast
      // one-row (bounded by construction).
      val tf = graft.SparkEntry.tbl(s, dir, "documents")
        .spreadIfNarrow(s)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
      val sc = tf.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c_sw"))
      val gc = sc.groupBy(col("tok")).agg(sum(col("c_sw")).as("c_w"))
      val n = gc.agg(sum(col("c_w")).as("n_total"))
      sc.join(gc, Seq("tok"))
        .withColumn("t",
          col("c_sw").cast("double") *
            (log(col("c_sw").cast("double")) - log(col("c_w").cast("double"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_vocab"),
          sum(col("c_sw")).as("n_toks"),
          sum(col("t").cast("decimal(28,12)")).cast("double").as("s_s"))
        .crossJoin(broadcast(n))
        .select(col("source"), col("n_toks"), col("n_vocab"),
          round(col("s_s") / col("n_toks").cast("double") +
            log(col("n_total").cast("double")) -
            log(col("n_toks").cast("double")), 6).as("kl"))
        .orderBy(col("source"))
    }),

    "q139_distinct_ngrams" -> ((s, dir) => {
      // distinct-1 / distinct-2 corpus diversity per language (Li et
      // al. 2016's generation-diversity metrics applied to corpus
      // slices): the fraction of unigram and bigram INSTANCES that are
      // distinct types — a template-spam/boilerplate slice collapses
      // toward 0 while organic text stays high; the corpus-health
      // sibling of q50's within-doc repetition screen. Shape: two
      // map-side-combined (lang, gram) counts — both directories are
      // VOCABULARY-bounded, never corpus-bounded — rolled up to ≤
      // |langs| rows each and joined broadcast; no distinct() on raw
      // instances anywhere.
      val tok = KeywordQueries.tokenizedDocs(s, dir)
      val uni = tok.select(col("lang"), explode(col("toks")).as("g"))
        .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("n_unigrams"), count(lit(1)).as("d1"))
      val bi = tok
        .select(col("lang"), explode(shingleCol(col("toks"), 2)).as("g"))
        .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("n_bigrams"), count(lit(1)).as("d2"))
      uni.join(broadcast(bi), Seq("lang"))
        .select(col("lang"), col("n_unigrams"), col("d1"),
          col("n_bigrams"), col("d2"),
          round(col("d1").cast("double") / col("n_unigrams").cast("double"), 6)
            .as("distinct1"),
          round(col("d2").cast("double") / col("n_bigrams").cast("double"), 6)
            .as("distinct2"))
        .orderBy(col("lang"))
    }),

    "q13_text_stats" -> ((s, dir) => {
      enriched(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_distinct")).as("total_distinct"),
          sum(col("char_sum")).as("total_tok_chars"))
        .withColumn("avg_tok_len",
          round(col("total_tok_chars").cast("double") / col("total_tokens"), 6))
        .orderBy(col("lang"))
    }),

    "q14_quality" -> ((s, dir) => {
      val stopRatio = col("n_stop").cast("double") / col("n_tokens")
      val avgTokLen = col("char_sum").cast("double") / col("n_tokens")
      enriched(s, dir)
        .withColumn("n_bpe", size(bpeTokens(col("text"))).cast("long"))
        .withColumn("stop_ratio", round(stopRatio, 6))
        .withColumn("quality",
          qualityScore(col("n_tokens"), col("n_distinct"), stopRatio, avgTokLen))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_bpe"),
          col("stop_ratio"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    "q15_lang_id" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("predicted", graft.expressions.HashExpressions.langPredict(col("text")))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    "q16_fingerprint" -> ((s, dir) => {
      // whole-doc + shingle-grain fingerprints in ONE codegen'd pass:
      // charHash is the content fingerprint; the min shingle hash comes
      // off the same single-pass distinct shingle-hash-set expression
      // the dedup path uses (min is distinct-invariant), and the
      // shingle COUNT is pure arithmetic (n_toks - 2) — no shingle
      // strings ever materialize. The previous formulation built the
      // string array and hashed it interpreted, once per consumer, on
      // one input split: 9.8 s at sf0.1 (hidden by the count() bench
      // action until round 7); this shape is ~0.3 s.
      docs(s, dir)
        .spreadIfNarrow(s)
        .withColumn("fp", charHash(col("text")))
        .withColumn("n_shingles",
          greatest(size(tokens(col("text"))) - 2, lit(0)).cast("long"))
        .withColumn("min_shingle_fp",
          array_min(graft.expressions.HashExpressions.shingleHashSet(col("text"), 3)))
        .select(col("doc_id"), col("fp"), col("n_shingles"), col("min_shingle_fp"))
        .orderBy(col("doc_id"))
    }),

    "q39_chunking" -> ((s, dir) => {
      // overlapping token-window chunking, verified by a portable
      // per-chunk hash checksum. All row-local (sequence/transform/
      // slice inside whole-stage codegen): at 100 TB each task chunks
      // its own partition, nothing shuffles but the tiny output rows.
      val st = ChunkStride
      val cs = ChunkSize
      docs(s, dir)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("n_chunks", expr(s"(n_toks + ${st - 1}) div $st"))
        .withColumn("chunk_hashes",
          when(col("n_chunks") > 0,
            transform(sequence(lit(0L), col("n_chunks") - 1), i =>
              charHash(concat_ws(" ", slice(col("toks"), (i * st + 1).cast("int"), lit(cs))))))
            .otherwise(typedLit(Seq.empty[Long])))
        // hashes are < P < 2^30, so a plain BIGINT sum is an exact,
        // order-independent checksum of every chunk's content
        .withColumn("chunk_checksum",
          aggregate(col("chunk_hashes"), lit(0L), (acc, x) => acc + x))
        .withColumn("last_chunk_len",
          when(col("n_chunks") > 0,
            least(lit(cs.toLong), col("n_toks") - (col("n_chunks") - 1) * st))
            .otherwise(lit(0L)))
        .select(col("doc_id"), col("n_toks"), col("n_chunks"),
          col("last_chunk_len"), col("chunk_checksum"))
        .orderBy(col("doc_id"))
    }),

    "q84_gopher_rules" -> ((s, dir) => {
      // Gopher quality-rule battery (Rae et al. 2021) over the
      // deterministically rendered multi-line fixture docs. Entirely
      // row-local codegen'd string/array math — zero shuffle at any
      // scale; each task filters its own partition.
      import graft.operators.Gopher
      docs(s, dir)
        .spreadIfNarrow(s)
        .withColumn("rtext", renderedCol(col("doc_id"), tokens(col("text"))))
        .withColumn("ls", Gopher.lines(col("rtext")))
        .withColumn("ws", Gopher.words(col("rtext")))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(col("ls")).cast("long").as("n_lines"),
          Gopher.meanWordLen(col("ws")).as("mean_word_len"),
          Gopher.symbolRatio(col("rtext"), col("ws")).as("symbol_ratio"),
          Gopher.bulletFrac(col("ls")).as("bullet_frac"),
          Gopher.ellipsisFrac(col("ls")).as("ellipsis_frac"),
          Gopher.alphaFrac(col("ws")).as("alpha_frac"),
          Gopher.requiredHits(col("ws"), GopherRequired).as("n_req_hits"))
        .withColumn("keep",
          Gopher.keep(col("n_words"), col("mean_word_len"), col("symbol_ratio"),
            col("bullet_frac"), col("ellipsis_frac"), col("alpha_frac"),
            col("n_req_hits")).cast("int"))
        .orderBy(col("doc_id"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q109_source_anova" -> {
      val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
      val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
      val qs = qualityScoreSql("n_tokens", "n_distinct", stopRatio, avgTokLen)
      s"""WITH e AS ($enrichedSql),
         |qd AS (SELECT source, $qs AS q FROM e),
         |per AS (
         |  SELECT source, COUNT(*)::BIGINT AS n_docs,
         |    CAST(SUM(CAST(q AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS s_q,
         |    CAST(SUM(CAST(q * q AS DECIMAL(28,12))) AS DECIMAL(38,12)) AS s_qq
         |  FROM qd GROUP BY source),
         |tot AS (
         |  SELECT COUNT(*)::BIGINT AS k,
         |    CAST(SUM(n_docs) AS BIGINT) AS n_total,
         |    SUM(s_q) AS s_all, SUM(s_qq) AS q_all,
         |    CAST(SUM(CAST(
         |      (CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE)) / CAST(n_docs AS DOUBLE)
         |      AS DECIMAL(28,12))) AS DOUBLE) AS sb_raw
         |  FROM per)
         |SELECT source, n_docs,
         |  round(CAST(s_q AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_q,
         |  round(CAST(s_q AS DOUBLE) / CAST(n_docs AS DOUBLE) -
         |    CAST(s_all AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS dev,
         |  round(
         |    ((sb_raw - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
         |        / CAST(n_total AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
         |    ((CAST(q_all AS DOUBLE) - sb_raw) / CAST(n_total - k AS DOUBLE)),
         |    6) AS f_stat,
         |  round(
         |    (sb_raw - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
         |       / CAST(n_total AS DOUBLE)) /
         |    (CAST(q_all AS DOUBLE) - (CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE))
         |       / CAST(n_total AS DOUBLE)), 6) AS eta2
         |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
    },

    "q138_source_kl" -> {
      val toks = tokensSql("text")
      s"""WITH tf AS (SELECT source, unnest($toks) AS tok FROM documents),
         |sc AS (SELECT source, tok, COUNT(*)::BIGINT AS c_sw
         |  FROM tf GROUP BY source, tok),
         |gc AS (SELECT tok, CAST(SUM(c_sw) AS BIGINT) AS c_w
         |  FROM sc GROUP BY tok),
         |n AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_total FROM gc),
         |agg AS (
         |  SELECT source, COUNT(*)::BIGINT AS n_vocab,
         |    CAST(SUM(c_sw) AS BIGINT) AS n_toks,
         |    CAST(SUM(CAST(c_sw::DOUBLE * (ln(c_sw::DOUBLE) - ln(c_w::DOUBLE))
         |      AS DECIMAL(28,12))) AS DOUBLE) AS s_s
         |  FROM sc JOIN gc USING (tok) GROUP BY source)
         |SELECT source, n_toks, n_vocab,
         |  round(s_s / n_toks::DOUBLE + ln(n_total::DOUBLE)
         |    - ln(n_toks::DOUBLE), 6) AS kl
         |FROM agg CROSS JOIN n ORDER BY source""".stripMargin
    },

    "q139_distinct_ngrams" -> {
      val toks = tokensSql("text")
      val sh2 = shingleSql(toks, 2)
      s"""WITH uni AS (
         |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_unigrams,
         |    COUNT(*)::BIGINT AS d1
         |  FROM (SELECT lang, g, COUNT(*) AS c FROM
         |    (SELECT lang, unnest($toks) AS g FROM documents)
         |    GROUP BY lang, g) GROUP BY lang),
         |bi AS (
         |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         |    COUNT(*)::BIGINT AS d2
         |  FROM (SELECT lang, g, COUNT(*) AS c FROM
         |    (SELECT lang, unnest($sh2) AS g FROM documents)
         |    GROUP BY lang, g) GROUP BY lang)
         |SELECT lang, n_unigrams, d1, n_bigrams, d2,
         |  round(d1::DOUBLE / n_unigrams::DOUBLE, 6) AS distinct1,
         |  round(d2::DOUBLE / n_bigrams::DOUBLE, 6) AS distinct2
         |FROM uni JOIN bi USING (lang) ORDER BY lang""".stripMargin
    },

    "q13_text_stats" ->
      s"""WITH enriched AS ($enrichedSql)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(n_distinct) AS BIGINT) AS total_distinct,
         |  CAST(SUM(char_sum) AS BIGINT) AS total_tok_chars,
         |  round(CAST(SUM(char_sum) AS DOUBLE) / CAST(SUM(n_tokens) AS BIGINT), 6) AS avg_tok_len
         |FROM enriched GROUP BY lang ORDER BY lang""".stripMargin,

    "q14_quality" -> {
      val stopRatio = "(CAST(n_stop AS DOUBLE) / n_tokens)"
      val avgTokLen = "(CAST(char_sum AS DOUBLE) / n_tokens)"
      s"""WITH enriched AS ($enrichedSql)
         |SELECT doc_id, n_tokens, n_distinct,
         |  len(${bpeTokensSql("text")})::BIGINT AS n_bpe,
         |  round($stopRatio, 6) AS stop_ratio,
         |  ${qualityScoreSql("n_tokens", "n_distinct", stopRatio, avgTokLen)} AS quality
         |FROM enriched ORDER BY doc_id""".stripMargin
    },

    "q15_lang_id" ->
      s"""SELECT lang, ${langPredictSql(tokensSql("text"))} AS predicted, COUNT(*) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,

    "q16_fingerprint" -> {
      val toks = tokensSql("text")
      val sh = shingleSql(toks)
      s"""SELECT doc_id, ${charHashSql("text")} AS fp,
         |  len($sh)::BIGINT AS n_shingles,
         |  list_min(list_transform($sh, s -> ${charHashSql("s")})) AS min_shingle_fp
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q39_chunking" -> {
      val st = ChunkStride
      val cs = ChunkSize
      val chunkText = s"array_to_string(list_slice(toks, i * $st + 1, i * $st + $cs), ' ')"
      s"""WITH d AS (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
         |c AS (SELECT doc_id, toks, len(toks)::BIGINT AS n_toks,
         |    ((len(toks)::BIGINT + ${st - 1}) // $st) AS n_chunks FROM d),
         |h AS (SELECT doc_id, n_toks, n_chunks,
         |    CASE WHEN n_chunks > 0 THEN
         |      list_transform(range(n_chunks), i -> ${charHashSql(chunkText)})
         |    ELSE [] END AS chunk_hashes,
         |    CASE WHEN n_chunks > 0 THEN least($cs, n_toks - (n_chunks - 1) * $st)
         |         ELSE 0 END::BIGINT AS last_chunk_len
         |  FROM c)
         |SELECT doc_id, n_toks, n_chunks, last_chunk_len,
         |  CAST(list_reduce(list_prepend(0::BIGINT, chunk_hashes), (a, b) -> a + b) AS BIGINT)
         |    AS chunk_checksum
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "q84_gopher_rules" -> {
      import graft.operators.Gopher._
      s"""WITH d AS (SELECT doc_id, ${renderedSql("doc_id", tokensSql("text"))} AS rtext FROM documents),
         |s AS (SELECT doc_id, rtext, ${linesSql("rtext")} AS ls, ${wordsSql("rtext")} AS ws FROM d),
         |m AS (SELECT doc_id,
         |    len(ws)::BIGINT AS n_words,
         |    len(ls)::BIGINT AS n_lines,
         |    ${meanWordLenSql("ws")} AS mean_word_len,
         |    ${symbolRatioSql("rtext", "ws")} AS symbol_ratio,
         |    ${bulletFracSql("ls")} AS bullet_frac,
         |    ${ellipsisFracSql("ls")} AS ellipsis_frac,
         |    ${alphaFracSql("ws")} AS alpha_frac,
         |    ${requiredHitsSql("ws", graft.queries.TextQueries.GopherRequired)} AS n_req_hits
         |  FROM s)
         |SELECT doc_id, n_words, n_lines, mean_word_len, symbol_ratio, bullet_frac,
         |  ellipsis_frac, alpha_frac, n_req_hits,
         |  CAST(${keepSql("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
                "ellipsis_frac", "alpha_frac", "n_req_hits")} AS INT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },
  )
}

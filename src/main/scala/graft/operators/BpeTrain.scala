package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer-training (merge-learning) — the canonical LLM-pipeline
  * operator the coverage report q70 prepares for (extension surface,
  * BASELINE.json north star; the reference, server.py:26-38, consumes a
  * finished embedding model and never trains one): N rounds of
  *
  *   1. count adjacent symbol pairs over the distinct-word table,
  *      weighted by word frequency — a map-side-combined groupBy over
  *      VOCAB-sized data (the corpus collapsed to distinct words once,
  *      up front: the classic Sennrich formulation);
  *   2. pick the globally most frequent pair, ties broken (count desc,
  *      pair asc) for total determinism — `orderBy.limit(1)`, i.e.
  *      per-partition top-1 heaps, ONE row to the driver (the
  *      "broadcast best merge" step: the merge table is the only
  *      driver-resident state and is bounded by the vocab budget);
  *   3. apply the merge to every word — one row-local string replace,
  *      no shuffle.
  *
  * Per-round plan shape is CONSTANT: each round is exactly one
  * shuffle (the pair-count exchange) over vocab-sized data plus a
  * narrow map; lineage is truncated every `checkpointEvery` rounds
  * (localCheckpoint — starContract's tool), so analysis cost and
  * recompute depth stay O(1) per round at any N.
  *
  * '''Why the double-space encoding is exact classic BPE.''' Words are
  * kept as symbol strings `"␣␣s1␣␣s2␣␣...␣␣"` — two spaces between
  * symbols and at both ends; symbols themselves never contain spaces.
  * The merge of pair (x, y) is then the plain substring replacement
  *
  *   `"␣x␣␣y␣"` → `"␣xy␣"`
  *
  * which (a) anchors to whole symbols only — a match needs a space
  * immediately before x and after y, impossible inside a symbol — and
  * (b) consumes ONE space of each double boundary, leaving one behind,
  * so consecutive matches `x y x y` merge in a single left-to-right
  * pass exactly like the reference regex `(?<!\S)x y(?!\S)` (which
  * DuckDB's RE2 cannot express — no lookbehind): overlapping runs
  * (`a a a` → `aa a`) resolve identically because plain replace also
  * scans left-to-right without revisiting replaced output. Both
  * engines' `replace` share these semantics, so the learned merge
  * table is hash-exact oracle-checkable.
  *
  * Caveat (documented, fixture-safe): Spark splits characters by UTF-16
  * code unit, DuckDB by code point — identical for BMP text (all
  * fixture languages); astral-plane input would need a codepoint
  * splitter on the Spark side.
  */
object BpeTrain {

  /** One learned merge: `pair` = "x y", `merged` = "xy", `n` = the
    * pair's weighted count when it won its round. */
  final case class Merge(round: Long, pair: String, merged: String, n: Long)

  /** Character-split a raw word into the double-space encoding — the
    * load-bearing invariant of the operator (train and encode MUST
    * agree on it, so both go through this one helper). */
  private def pad(word: Column): Column =
    concat(lit("  "),
      array_join(filter(split(word, ""), c => c =!= ""), "  "),
      lit("  "))

  /** (word, freq) → (sym, freq) in the double-space encoding. */
  def padded(words: DataFrame, wordCol: String, freqCol: String): DataFrame =
    words.select(pad(col(wordCol)).as("sym"),
      col(freqCol).cast("long").as("freq"))

  /** Adjacent symbol pairs of one encoded word, as "x y" strings. */
  private[graft] def pairsOf(sym: Column): Column = {
    val ss = filter(split(sym, "  "), x => x =!= "")
    // guard: sequence(0, -1) throws; single-symbol words have no pairs
    when(size(ss) >= 2,
      transform(sequence(lit(0), size(ss) - 2),
        i => concat(element_at(ss, i + 1), lit(" "), element_at(ss, i + 2))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** The replace pattern/replacement pair of one merge. */
  private def mergePattern(pair: String): (String, String) = {
    val Array(x, y) = pair.split(" ", 2)
    (s" $x  $y ", s" $x$y ")
  }

  /** Apply an ordered merge table to an encoded-symbol column — the
    * ENCODE step of a trained tokenizer: replaying the merges in
    * learned order segments any text with the learned vocab. Row-local
    * (one replace per merge), no shuffle. */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym) { (c, m) =>
      val (pat, rep) = mergePattern(m.pair)
      replace(c, lit(pat), lit(rep))
    }

  /** Encode a raw word column under a merge table: character-split into
    * the double-space encoding, then replay the merges. */
  def encode(word: Column, merges: Seq[Merge]): Column =
    applyMerges(pad(word), merges)

  /** Number of symbols in an encoded-symbol string. */
  def symbolCount(sym: Column): Column =
    size(filter(split(sym, "  "), x => x =!= ""))

  /** Learn `rounds` merges over a (word, freq) table. Deterministic:
    * same counts in, same merge table out, at any parallelism. */
  def learnMerges(words: DataFrame, wordCol: String, freqCol: String,
                  rounds: Int, checkpointEvery: Int = 8): Seq[Merge] = {
    require(rounds > 0, "rounds must be positive")
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val out = Seq.newBuilder[Merge]
    // non-eager localCheckpoint: round 1's count materializes and
    // PERSISTS the encoded base table; later rounds read it back
    // instead of re-running the upstream wordcount
    var cur = padded(words, wordCol, freqCol).localCheckpoint(false)
    var r = 1
    while (r <= rounds) {
      val best = cur
        .select(explode(pairsOf(col("sym"))).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      require(best.nonEmpty,
        s"pair space exhausted after ${r - 1} merges — every word is one symbol;" +
          " ask for fewer rounds")
      val pair = best(0).getString(0)
      val n = best(0).getLong(1)
      val (pat, rep) = mergePattern(pair)
      out += Merge(r.toLong, pair, pair.replace(" ", ""), n)
      cur = cur.withColumn("sym", replace(col("sym"), lit(pat), lit(rep)))
      // truncate lineage periodically so round r never re-applies all
      // r-1 earlier replaces from scratch (O(N) per round, not O(N^2))
      if (r % checkpointEvery == 0 && r < rounds)
        cur = cur.localCheckpoint(false)
      r += 1
    }
    out.result()
  }

  /** [[learnMerges]] as a DataFrame (round, pair, merged, n) — the
    * merge-table artifact a tokenizer ships. */
  def learnMergesDF(words: DataFrame, wordCol: String, freqCol: String,
                    rounds: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    learnMerges(words, wordCol, freqCol, rounds)
      .toDF("round", "pair", "merged", "n")
  }

  /** Persist a merge table — the tokenizer's TRAIN-once artifact (the
    * same lifecycle split as the ANN/dedup index artifacts: one
    * training job writes it, every encode job replays it). Tiny by
    * construction (vocab-budget rows), so readers broadcast it. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], dir: String): Unit = {
    import spark.implicits._
    merges.toDF("round", "pair", "merged", "n")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a persisted merge table in learned order, validating the
    * schema with an actionable message (the dedup-index convention). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Merge] = {
    val df = spark.read.parquet(dir)
    val missing = Seq("round", "pair", "merged", "n").filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"merge table at $dir is missing column(s) ${missing.mkString(", ")} — " +
        "written by an older release? Rebuild it with BpeTrain.saveMerges.")
    df.select(col("round").cast("long"), col("pair"), col("merged"),
        col("n").cast("long"))
      .collect()
      .map(r => Merge(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.round).toSeq
  }
}

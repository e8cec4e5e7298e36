package graft

import org.apache.spark.sql.SparkSession

import graft.search.{HashingEmbedder, SearchEngine}

/** The engine's front door — the Spark-native rendition of the
  * reference's runnable entry point (reference server.py:108-127 wires
  * driver + config and serves one tool; reference __init__.py:10-25
  * resolves each setting as `flag or env or default`): a prompt goes
  * in, the tool-call JSON comes out on stdout.
  *
  * {{{ sbt "runMain graft.Search /root/testdata/sf0.001 'fast hash join' --k 5" }}}
  *
  * With `--serve`, it instead runs the reference's service shape
  * (server.py:127 `mcp.run(transport="stdio")`): a long-lived stdio
  * loop over the one tool. Lines that are JSON objects speak actual
  * MCP — JSON-RPC 2.0 `initialize` / `tools/list` / `tools/call`
  * framing ([[Mcp]]), the same protocol FastMCP runs for the reference
  * (server.py:67,104,127) — so an MCP client's message stream works
  * against this loop. Bare non-JSON lines keep the raw dialect (one
  * prompt per line, one JSON result line back). The session, engine,
  * and corpus caches live across requests, so only the first prompt
  * pays Spark startup (SURVEY.md §2.1 O11).
  */
object Search {

  /** Resolved settings, each via the reference's precedence chain
    * `flag > env > default` (reference __init__.py:19-24). */
  final case class Config(
      sfDir: String, prompt: String, k: Int, cpus: String, serve: Boolean,
      index: Boolean = true, delta: Option[String] = None,
      filter: Seq[(String, Any)] = Nil, root: Option[String] = None,
      maintainEvery: Int = 0, promptsFile: Option[String] = None)

  /** Flags that take no value: a bare `--serve` means serve=true and
    * the next token stays a positional (prompt word) — EXCEPT a literal
    * `true`/`false`, which is consumed as the flag's value so the
    * legacy explicit spelling `--serve false` still turns serve OFF
    * instead of binding serve=true and leaking "false" into the prompt.
    * `--serve=false` also works. */
  private val BooleanFlags = Set("serve", "ivf-tune", "ivfpq-tune", "tune-split",
    "ivfpq-multi-tune", "ivfpq-filter-tune", "ivfpq-compact-tune", "ivfpq-res-tune",
    "served-tune", "index", "para-probe", "distinct", "cc-probe", "ingest-probe",
    "lsm-soak", "fold-soak", "band-cand-probe", "refit-probe", "tombstone-probe",
    "takedown-probe", "media-soak", "media-ops-soak", "lost-pairs-probe", "maintain-probe",
    "rebuild-probe", "batch-probe", "dhash-probe", "vdhash-probe")

  /** Split `--name value` / `--name=value` flags from positionals —
    * shared by every runnable main (Search/Verify/Bench) so they all
    * speak the same `flag > env > default` dialect. */
  private[graft] def splitArgs(args: Seq[String]): (Map[String, String], List[String]) = {
    var fs = Map.empty[String, String]
    var ps = List.empty[String]
    var rest = args.toList
    while (rest.nonEmpty) rest = rest match {
      case f :: t if f.startsWith("--") && !f.contains("=") &&
          BooleanFlags(f.drop(2)) =>
        t match {
          case v :: rest if v == "true" || v == "false" =>
            fs += (f.drop(2) -> v); rest
          case _ => fs += (f.drop(2) -> "true"); t
        }
      case f :: v :: t if f.startsWith("--") && !f.contains("=") =>
        fs += (f.drop(2) -> v); t
      case f :: t if f.startsWith("--") && f.contains("=") =>
        val Array(name, v) = f.drop(2).split("=", 2)
        fs += (name -> v); t
      case p :: t => ps = p :: ps; t
      case Nil => Nil
    }
    (fs, ps.reverse)
  }

  /** Pure flag parsing so the precedence chain is spec-testable.
    * Positionals: `<sfDir> <prompt words...>`; flags: `--k N`
    * (`--k=N` also accepted). sfDir/k/cpus fall back to env then
    * default; the prompt is the one input with no env fallback — the
    * reference's tool argument, not server config. */
  def parseConfig(args: Seq[String], env: Map[String, String]): Config = {
    val (flags, positionals) = splitArgs(args)
    // the first positional is sfDir ONLY when --sf-dir doesn't already
    // name it; with the flag present every positional is a prompt word
    val sfDir = flags.get("sf-dir")
      .orElse(positionals.headOption)
      .orElse(env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val promptWords =
      if (flags.contains("sf-dir")) positionals else positionals.drop(1)
    val prompt = flags.get("prompt").getOrElse(promptWords.mkString(" "))
    val k = flags.get("k").orElse(env.get("SPARK_GRAFT_K"))
      .map(_.toInt).getOrElse(10)
    val cpus = flags.get("cpus").orElse(env.get("SPARK_GRAFT_CPUS"))
      .getOrElse("4")
    val serve = flags.get("serve").exists(_ != "false")
    // --serve defaults to the INDEX route (the reference's tool call is
    // an index probe, server.py:87, and a long-lived service amortizes
    // the build across requests); a ONE-SHOT prompt defaults to the
    // exact scan — building the whole IVF-PQ artifact costs several
    // corpus passes, strictly more than the single scan it would
    // replace in a process that answers once and exits. `--index` /
    // `--index false` / SPARK_GRAFT_INDEX override either default.
    // --prompts-file is parsed below but participates in this
    // default: a batch one-shot serves from the index (the batch
    // exists for the one-plan probe)
    val index = flags.get("index").orElse(env.get("SPARK_GRAFT_INDEX"))
      .map(_ != "false").getOrElse(serve || flags.contains("prompts-file"))
    // --delta <dir> / SPARK_GRAFT_DELTA: serve from the EVOLVING corpus
    // (∪ the LSM delta a streamingDocIngest maintains) — honored on
    // EVERY route: the index probe, the exact scan, and the fallback,
    // so a streamed-in document is never silently dropped
    val delta = flags.get("delta").orElse(env.get("SPARK_GRAFT_DELTA"))
    // --root <dir> / SPARK_GRAFT_ROOT: serve from a SERVING ROOT
    // (graft.search.AnnIndex.ServingRoot) — the pointer is resolved
    // PER REQUEST, so a concurrent major fold or refit swaps the
    // serving (artifact, delta) pair between two requests with no
    // restart. Overrides --delta (the root's own epoch delta is the
    // delta) and forces the index route.
    val root = flags.get("root").orElse(env.get("SPARK_GRAFT_ROOT"))
    // --maintain-every N (root mode only): every N TOOL INVOCATIONS
    // the serve loop ENQUEUES the TombstoneFoldRows check to its one
    // background sequencer thread, which folds-and-publishes the next
    // epoch when due (AnnIndex.foldIfTombstonesDue) while requests
    // keep serving from the current pointer. Requires this server to
    // be the root's single fold sequencer.
    val maintainEvery = flags.get("maintain-every")
      .orElse(env.get("SPARK_GRAFT_MAINTAIN_EVERY")).map(_.toInt).getOrElse(0)
    // --prompts-file <path>: one-shot BATCH mode — the file's
    // non-blank lines are the prompts, answered by ONE batched probe
    // plan (searchJsonBatch), one JSON array out
    val promptsFile = flags.get("prompts-file")
    // --filter col=value: the one-shot CLI face of the tool's metadata
    // filter (numeric values compare numerically, anything else as a
    // string — the same scalar-equality semantics the MCP argument has)
    val filter = flags.get("filter").toSeq.map { f =>
      f.split("=", 2) match {
        case Array(c, v) =>
          c -> (scala.util.Try(v.toLong).toOption
            .orElse(scala.util.Try(v.toDouble).toOption)
            .getOrElse(v): Any)
        case _ => throw new IllegalArgumentException(
          s"--filter expects col=value, got '$f'")
      }
    }
    require(prompt.nonEmpty || serve || promptsFile.nonEmpty,
      "usage: graft.Search <sfDir> <prompt words...> [--k N] [--cpus N] [--serve] [--index true|false] [--delta dir] [--root dir] [--maintain-every N] [--filter col=value] [--prompts-file path]")
    // --maintain-every folds A SERVING ROOT; without --root there is
    // nothing to fold and silently ignoring the flag would leave an
    // operator believing maintenance is on — loud contradiction, the
    // same policy as --prompts-file --index false
    require(maintainEvery == 0 || root.nonEmpty,
      "--maintain-every requires --root (the fold maintains a serving root)")
    Config(sfDir, prompt, k, cpus, serve, index, delta, filter, root,
      maintainEvery, promptsFile)
  }

  /** The stdio request loop: blank lines skipped, EOF ends the
    * service. A line that parses as a JSON object is handled as an MCP
    * JSON-RPC message ([[Mcp.handle]]); any other line is a raw prompt
    * answered with one JSON result line. Factored over abstract
    * reader/writer so the loop itself is spec-testable without a
    * subprocess. Returns the number of lines answered (JSON-RPC
    * notifications are consumed but, per the protocol, not answered —
    * they don't count).
    *
    * MAINTENANCE (root mode, opt-in via `maintainEvery`) runs on ONE
    * BACKGROUND SEQUENCER THREAD, never the request thread: the serve
    * loop only ENQUEUES the check when the cadence fires — requests
    * keep serving from the current pointer while the fold runs, and
    * the publish swaps atomically exactly as a fold driven by an
    * external sequencer would (the pointer already protects readers;
    * at scale a major fold is the engine's most expensive operation
    * and queueing every request behind it would stall the one surface
    * whose point is no-restart serving). The single-writer contract is
    * unchanged — the one sequencer thread owns all folds for this
    * root, and at most one check is in flight (a cadence crossing
    * while one runs is SKIPPED, not queued; the next crossing
    * re-checks — the trigger is a mass threshold, so a skipped check
    * only delays the fold by one cadence). The cadence counts TOOL
    * INVOCATIONS (raw prompts and tools/call, single or batch), not
    * protocol traffic — an MCP client's initialize/tools/list/ping
    * chatter answers requests without touching the corpus and must
    * not drive maintenance checks. EOF drains the sequencer (a
    * mid-flight fold completes; its publish is crash-idempotent
    * anyway). `maintainAction` overrides the default
    * fold-if-tombstones-due body (spec seam — a delay-injected action
    * proves responses flow DURING a fold). */
  def serve(engine: SearchEngine, sfDir: String, k: Int,
      in: java.io.BufferedReader, out: java.io.PrintStream,
      index: Boolean = true, delta: Option[String] = None,
      baseFilter: Seq[(String, Any)] = Nil,
      root: Option[String] = None, maintainEvery: Int = 0,
      maintainAction: Option[() => Unit] = None): Int = {
    // the one tool closure every protocol dialect routes through.
    // Route precedence: a serving ROOT (pointer resolved per request —
    // a concurrent majorFoldPublish/refit swaps what this serves
    // between two requests, no restart, no resurrection window), else
    // indexed (artifact probe — ∪ the LSM delta when --delta names
    // one — exact fallback inside searchJsonIndexed), else the forced
    // exact scan. `baseFilter` is the server-level metadata filter
    // (`--serve --filter col=value`): it constrains EVERY request —
    // raw-prompt lines (which have no filter syntax of their own) and
    // MCP calls alike, conjoined with any per-request MCP filter. A
    // dropped server filter would silently serve a BROADER search
    // than the operator configured — the worst default the filter
    // parser's own contract names.
    val toolCalls = new java.util.concurrent.atomic.AtomicLong
    def counted(f: Mcp.Search): Mcp.Search = (p, fl) => {
      toolCalls.incrementAndGet(); f(p, fl)
    }
    def countedBatch(f: Mcp.SearchBatch): Mcp.SearchBatch = (ps, fl) => {
      toolCalls.incrementAndGet(); f(ps, fl)
    }
    val tool: Mcp.Search = counted(root match {
      case Some(r) => (prompt, filter) =>
        engine.searchJsonRoot(sfDir, r, prompt, k, baseFilter ++ filter)
      case None if index => (prompt, filter) =>
        engine.searchJsonIndexed(sfDir, prompt, k, delta, baseFilter ++ filter)
      case None => (prompt, filter) =>
        engine.searchJson(sfDir, prompt, k, delta, baseFilter ++ filter)
    })
    // the batch tool serves from the index (it EXISTS for the one-plan
    // batched probe; a caller wanting exact scans issues single-tool
    // calls) — so an operator who forced `--index false` because the
    // index is known-bad gets a LOUD isError result from the batch
    // tool (the one-shot CLI's contradiction policy), never a silent
    // index read behind the override
    val toolBatch: Mcp.SearchBatch = countedBatch(root match {
      case Some(r) => (prompts, filter) =>
        engine.searchJsonBatchRoot(sfDir, r, prompts, k, baseFilter ++ filter)
      case None if index => (prompts, filter) =>
        engine.searchJsonBatch(sfDir, prompts, k, delta, baseFilter ++ filter)
      case None => (_, _) => throw new IllegalStateException(
        s"${Mcp.BatchToolName} serves from the index; this server was " +
          "started with --index false — issue single vector_search calls " +
          "for exact scans")
    })
    // background maintenance sequencer (see scaladoc): one daemon
    // thread, at most one check in flight, failures logged never fatal
    val action: Option[() => Unit] =
      if (maintainEvery <= 0) None
      else maintainAction.orElse(root.map { rt => () =>
        graft.search.AnnIndex.foldIfTombstonesDue(engine.spark, rt,
          graft.queries.AnnQueries.TombstoneFoldRows)
          .foreach(e => System.err.println(
            s"graft: maintenance folded $rt to epoch $e"))
      })
    val sequencer = action.map(_ => java.util.concurrent.Executors
      .newSingleThreadExecutor { r =>
        val t = new Thread(r, "graft-maintenance"); t.setDaemon(true); t
      })
    val inFlight = new java.util.concurrent.atomic.AtomicBoolean(false)
    var crossings = 0L
    def maybeEnqueueMaintenance(): Unit = action.foreach { act =>
      val c = toolCalls.get() / maintainEvery
      if (c > crossings) {
        // consume the crossing BEFORE the in-flight gate: a crossing
        // that arrives while a check is running is SKIPPED (the next
        // CROSSING re-checks, not the next request) — the documented
        // cadence semantics; advancing only on a won CAS made every
        // post-skip request retry immediately
        crossings = c
        if (inFlight.compareAndSet(false, true))
          sequencer.get.execute { () =>
            try act()
            catch {
              case scala.util.control.NonFatal(e) => System.err.println(
                s"graft: maintenance fold failed (${e.getClass.getSimpleName}: ${e.getMessage})")
            } finally inFlight.set(false)
          }
      }
    }
    var served = 0
    var line = in.readLine()
    while (line != null) {
      val req = line.trim
      if (req.nonEmpty) {
        // JSON lines (object or batch) are protocol traffic; anything
        // else — including {/[-prefixed text that does NOT parse as
        // JSON — is a raw prompt
        val response =
          Mcp.tryHandle(req, tool, toolBatch).getOrElse(Some(tool(req, Nil)))
        response.foreach { r => out.println(r); served += 1 }
        maybeEnqueueMaintenance()
      }
      line = in.readLine()
    }
    // drain: a mid-flight fold completes before the service returns
    sequencer.foreach { ex =>
      ex.shutdown()
      ex.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
    }
    served
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseConfig(args.toSeq, sys.env)
    val spark = SparkSession.builder()
      .master(s"local[${cfg.cpus}]")
      .config("spark.sql.shuffle.partitions", cfg.cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val engine = new SearchEngine(spark, new HashingEmbedder(64))
    if (cfg.serve)
      serve(engine, cfg.sfDir, cfg.k,
        new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
        System.out, cfg.index, cfg.delta, cfg.filter, cfg.root,
        cfg.maintainEvery)
    else cfg.promptsFile match {
      case Some(pf) =>
        // one-shot batch: the file's non-blank lines are the prompts,
        // ONE batched probe plan answers them all. The batch route is
        // index-only BY DESIGN (it exists for the one-plan probe) —
        // an explicit --index false is a contradiction answered
        // loudly, not ignored.
        require(cfg.index,
          "--prompts-file serves from the index (one batched plan); --index false is not supported with a batch")
        val src = scala.io.Source.fromFile(pf, "UTF-8")
        val prompts = try src.getLines().map(_.trim).filter(_.nonEmpty).toList
          finally src.close()
        require(prompts.nonEmpty,
          s"--prompts-file $pf contains no non-blank prompts")
        println(cfg.root match {
          case Some(r) =>
            engine.searchJsonBatchRoot(cfg.sfDir, r, prompts, cfg.k, cfg.filter)
          case None =>
            engine.searchJsonBatch(cfg.sfDir, prompts, cfg.k, cfg.delta,
              cfg.filter)
        })
      case None => cfg.root match {
        case Some(r) =>
          println(engine.searchJsonRoot(cfg.sfDir, r, cfg.prompt, cfg.k,
            cfg.filter))
        case None if cfg.index =>
          println(engine.searchJsonIndexed(cfg.sfDir, cfg.prompt, cfg.k,
            cfg.delta, cfg.filter))
        case None =>
          println(engine.searchJson(cfg.sfDir, cfg.prompt, cfg.k, cfg.delta,
            cfg.filter))
      }
    }
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The runnable front door (graft.Search): config precedence mirrors
  * the reference's `flag or env or default` chain (reference
  * __init__.py:19-24), and the search body is the same q33-shaped
  * JSON path spec'd in SearchEngineSpec. */
class SearchMainSpec extends AnyFunSuite with SparkSpec {

  test("flags beat env beats default, positionals fill sfDir + prompt") {
    val env = Map("SPARK_GRAFT_SF_DIR" -> "/env/sf", "SPARK_GRAFT_K" -> "7",
      "SPARK_GRAFT_CPUS" -> "2")
    // flag wins over env
    val c1 = Search.parseConfig(
      Seq("--sf-dir", "/flag/sf", "--k=3", "hello", "world"), env)
    assert(c1.sfDir === "/flag/sf" && c1.k === 3 && c1.cpus === "2")
    assert(c1.prompt === "hello world")
    // positional sfDir wins over env; env k applies when no flag
    val c2 = Search.parseConfig(Seq("/pos/sf", "a", "prompt"), env)
    assert(c2.sfDir === "/pos/sf" && c2.k === 7 && c2.prompt === "a prompt")
    // defaults when neither flag nor env
    val c3 = Search.parseConfig(Seq("--prompt", "p"), Map.empty)
    assert(c3.sfDir === "/root/testdata/sf0.001" && c3.k === 10 && c3.cpus === "4")
  }

  test("an empty prompt is rejected with usage") {
    val e = intercept[IllegalArgumentException] {
      Search.parseConfig(Seq("/some/sf"), Map.empty)
    }
    assert(e.getMessage.contains("usage"))
  }

  test("--maintain-every without --root is a loud contradiction") {
    val e = intercept[IllegalArgumentException] {
      Search.parseConfig(
        Seq("--sf-dir", "/x", "--serve", "--maintain-every", "3"), Map.empty)
    }
    assert(e.getMessage.contains("--root"))
    // with a root it parses fine
    val c = Search.parseConfig(
      Seq("--sf-dir", "/x", "--serve", "--maintain-every", "3",
        "--root", "/r"), Map.empty)
    assert(c.maintainEvery === 3 && c.root === Some("/r"))
  }

  test("--serve loops prompts from stdin to one JSON line each until EOF") {
    val eng = new graft.search.SearchEngine(spark)
    val in = new java.io.BufferedReader(new java.io.StringReader(
      "fast hash join\n\n   \nsorted merge of batches\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf001, k = 2,
      in, new java.io.PrintStream(buf, true, "UTF-8"))
    assert(served === 2) // blank lines are skipped, EOF ends the loop
    val lines = buf.toString("UTF-8").trim.split("\n").toSeq
    assert(lines.size === 2)
    lines.foreach { l =>
      assert(l.startsWith("[") && l.endsWith("]"), s"not a JSON array line: $l")
      assert(l.contains("\"doc_id\"") && l.contains("\"score\""))
    }
    // serve mode is the one config where an empty prompt is legal;
    // --serve is a bare boolean flag — it must not eat the next token
    val c = Search.parseConfig(Seq("--serve", "--sf-dir", "/x"), Map.empty)
    assert(c.serve && c.prompt.isEmpty)
    val c2 = Search.parseConfig(Seq("--serve", "find", "things", "--sf-dir", "/x"), Map.empty)
    assert(c2.serve && c2.prompt === "find things")
    val c3 = Search.parseConfig(Seq("--serve=false", "--sf-dir", "/x", "p"), Map.empty)
    assert(!c3.serve && c3.prompt === "p")
    // index-route default follows the process shape: a service
    // amortizes the artifact build, a one-shot prompt must not pay it
    assert(c.index && c2.index, "--serve defaults to the index route")
    assert(!c3.index, "a one-shot prompt defaults to the exact scan")
    val c4 = Search.parseConfig(Seq("--index", "--sf-dir", "/x", "p"), Map.empty)
    assert(c4.index && !c4.serve, "--index opts a one-shot into the probe")
    val c5 = Search.parseConfig(
      Seq("--serve", "--delta", "/lsm", "--sf-dir", "/x"), Map.empty)
    assert(c5.delta === Some("/lsm"), "--delta routes the evolving-index serve")
    assert(c.delta.isEmpty, "no --delta means the static artifact alone")
  }

  test("--serve speaks MCP: initialize -> initialized -> tools/list -> tools/call") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val in = new java.io.BufferedReader(new java.io.StringReader(Seq(
      """{"jsonrpc":"2.0","id":0,"method":"initialize","params":{"protocolVersion":"2025-03-26","capabilities":{},"clientInfo":{"name":"spec","version":"0"}}}""",
      """{"jsonrpc":"2.0","method":"notifications/initialized"}""",
      """{"jsonrpc":"2.0","id":1,"method":"tools/list"}""",
      s"""{"jsonrpc":"2.0","id":2,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"fast hash join"}}}""",
    ).mkString("\n") + "\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf001, k = 2,
      in, new java.io.PrintStream(buf, true, "UTF-8"))
    // the notification is consumed but, per JSON-RPC, not answered
    assert(served === 3)
    val lines = buf.toString("UTF-8").trim.split("\n").toSeq
    assert(lines.size === 3)
    val Seq(init, list, call) = lines.map(parse(_))
    assert(init \ "jsonrpc" === JString("2.0") && init \ "id" === JInt(0))
    assert(init \ "result" \ "protocolVersion" === JString(Mcp.ProtocolVersion))
    assert(init \ "result" \ "serverInfo" \ "name" === JString(Mcp.ServerName))
    val JArray(tools) = (list \ "result" \ "tools"): @unchecked
    assert(tools.size === 2)
    assert(tools.head \ "name" === JString(Mcp.ToolName))
    assert(tools.head \ "inputSchema" \ "required" === JArray(List(JString("prompt"))))
    assert(tools(1) \ "name" === JString(Mcp.BatchToolName))
    assert(tools(1) \ "inputSchema" \ "required" === JArray(List(JString("prompts"))))
    // the tool result wraps the engine's q33-shaped JSON in one MCP
    // text content block (the reference's tool returns the same JSON
    // string, server.py:102)
    assert(call \ "id" === JInt(2))
    assert(call \ "result" \ "isError" === JBool(false))
    val JString(text) = (call \ "result" \ "content")(0) \ "text": @unchecked
    assert(text.startsWith("[") && text.contains("\"doc_id\"") && text.contains("\"score\""))
  }

  test("indexed service route equals the exact path, end to end through MCP") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val prompt = graft.queries.AnnQueries.ServedPrompt
    // the engine API: index-served hits must EQUAL the exact scan's
    // (ServedShortlist's tune covers this prompt's vector at every SF)
    assert(eng.searchJsonIndexed(sf001, prompt, 10) ===
      eng.searchJson(sf001, prompt, 10))
    // and through the serve loop's MCP dialect with index=true (the
    // default): the tool call's text block carries the indexed result
    val in = new java.io.BufferedReader(new java.io.StringReader(
      s"""{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":${org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(JString(prompt)))}}}}""" + "\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf001, k = 10,
      in, new java.io.PrintStream(buf, true, "UTF-8"), index = true)
    assert(served === 1)
    val call = parse(buf.toString("UTF-8").trim)
    assert(call \ "result" \ "isError" === JBool(false))
    val JString(text) = (call \ "result" \ "content")(0) \ "text": @unchecked
    assert(text === eng.searchJson(sf001, prompt, 10))
  }

  test("filtered search round-trips through MCP and equals the exact filtered scan") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val prompt = graft.queries.AnnQueries.ServedPrompt
    val label = graft.queries.AnnQueries.FilterLabel
    // engine API: the indexed filtered route equals the exact filtered
    // scan, and every hit matches the filter (no leak)
    val filt = Seq("label" -> (label: Any))
    assert(eng.searchJsonIndexed(sf001, prompt, 10, filter = filt) ===
      eng.searchJson(sf001, prompt, 10, filter = filt))
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hits = eng.searchIndexed(sf001, prompt, 10, filter = filt)
      .select(col("doc_id")).as[Long].collect().toSeq
    val labels = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id").isin(hits: _*))
      .select(col("label")).as[Int].collect().toSet
    assert(labels === Set(label), s"filter leak: labels $labels")
    // and through the MCP dialect: the filter argument narrows the call
    val in = new java.io.BufferedReader(new java.io.StringReader(
      s"""{"jsonrpc":"2.0","id":6,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"$prompt","filter":{"label":$label}}}}""" + "\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf001, k = 10,
      in, new java.io.PrintStream(buf, true, "UTF-8"), index = true)
    assert(served === 1)
    val call = parse(buf.toString("UTF-8").trim)
    assert(call \ "result" \ "isError" === JBool(false))
    val JString(text) = (call \ "result" \ "content")(0) \ "text": @unchecked
    assert(text === eng.searchJson(sf001, prompt, 10, filter = filt))
    // a malformed filter is a protocol-level bad argument, not a
    // silently-broadened search
    val bad = parse(Mcp.handle(
      s"""{"jsonrpc":"2.0","id":7,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"x","filter":{"label":{"nested":1}}}}}""",
      (_, _) => "unused").get)
    assert((bad \ "error" \ "code") === JInt(-32602))
    val bad2 = parse(Mcp.handle(
      s"""{"jsonrpc":"2.0","id":8,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"x","filter":[1,2]}}}""",
      (_, _) => "unused").get)
    assert((bad2 \ "error" \ "code") === JInt(-32602))
    // the advertised schema carries the filter property
    val tl = parse(Mcp.handle(
      """{"jsonrpc":"2.0","id":9,"method":"tools/list"}""",
      (_, _) => "unused").get)
    val props = (tl \ "result" \ "tools")(0) \ "inputSchema" \ "properties"
    assert((props \ "filter" \ "type") === JString("object"))
  }

  test("--serve --filter constrains raw prompts AND MCP calls (never silently broadened)") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val prompt = graft.queries.AnnQueries.ServedPrompt
    val label = graft.queries.AnnQueries.FilterLabel
    val filt = Seq("label" -> (label: Any))
    val expected = eng.searchJson(sf001, prompt, 10, filter = filt)
    // must differ from the unfiltered answer, or the assertion is vacuous
    assert(expected !== eng.searchJson(sf001, prompt, 10))
    // raw-prompt dialect: the server-level filter applies
    val in = new java.io.BufferedReader(new java.io.StringReader(
      prompt + "\n" +
        s"""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"$prompt"}}}""" + "\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf001, k = 10,
      in, new java.io.PrintStream(buf, true, "UTF-8"), index = true,
      baseFilter = filt)
    assert(served === 2)
    val lines = buf.toString("UTF-8").trim.split("\n")
    assert(lines(0) === expected,
      "raw-prompt requests must honor the server-level --filter")
    // MCP dialect with NO per-request filter: still constrained
    val call = parse(lines(1))
    val JString(text) = (call \ "result" \ "content")(0) \ "text": @unchecked
    assert(text === expected,
      "MCP requests without their own filter must honor the server-level --filter")
  }

  test("an out-of-range k is an argument error on BOTH routes, never a degraded scan") {
    val eng = new graft.search.SearchEngine(spark)
    val before = eng.indexFallbackCount.get
    intercept[IllegalArgumentException] {
      eng.searchJsonIndexed(sf001, "anything", k = graft.search.SearchEngine.MaxServedK + 1)
    }
    intercept[IllegalArgumentException] {
      eng.searchJsonIndexed(sf001, "anything", k = 0)
    }
    assert(eng.indexFallbackCount.get === before,
      "a hostile k must not be absorbed as an index-route fallback")
  }

  test("index-route failure falls back to the exact path, never errors the tool call") {
    // a 32-d embedder cannot probe the 64-d artifact (the quantizer
    // rejects the dim) — searchJsonIndexed must degrade to the exact
    // scan, whose hasDim(32) corpus is empty → the declared
    // empty-result intent, not an exception
    val eng32 = new graft.search.SearchEngine(spark, new graft.search.HashingEmbedder(32))
    assert(eng32.searchJsonIndexed(sf001, "anything at all", 5) === "No results found.")
    // the degradation must be visible to the operator, not absorbed
    assert(eng32.indexFallbackCount.get === 1,
      "an index-route failure must be counted, not silently swallowed")
  }

  test("MCP error envelopes: parse error, unknown method, unknown tool, bad args") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    def err(line: String): (JValue, JValue) = {
      val r = parse(Mcp.handle(line, (_, _) => "unused").get)
      (r \ "error" \ "code", r \ "id")
    }
    assert(err("{not json")._1 === JInt(-32700))
    assert(err("""{"jsonrpc":"2.0","id":9,"method":"nope"}""") ===
      ((JInt(-32601), JInt(9))))
    assert(err("""{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"wrong","arguments":{"prompt":"x"}}}""")._1 === JInt(-32602))
    assert(err("""{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{"name":"vector_search","arguments":{}}}""")._1 === JInt(-32602))
    // unknown NOTIFICATION (no id) must be silently consumed, not answered
    assert(Mcp.handle("""{"jsonrpc":"2.0","method":"notifications/cancelled"}""", (_, _) => "x").isEmpty)
    // a tools-only server answers the other list surfaces with empty
    // lists (clients enumerate all three on connect), never -32601
    val pl = parse(Mcp.handle("""{"jsonrpc":"2.0","id":7,"method":"prompts/list"}""", (_, _) => "x").get)
    assert(pl \ "result" \ "prompts" === JArray(Nil))
    val rl = parse(Mcp.handle("""{"jsonrpc":"2.0","id":8,"method":"resources/list"}""", (_, _) => "x").get)
    assert(rl \ "result" \ "resources" === JArray(Nil))
    // a tool-execution failure is an in-band result, not a protocol error
    val r = parse(Mcp.handle(
      s"""{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"boom"}}}""",
      (_, _) => throw new RuntimeException("engine down")).get)
    assert(r \ "result" \ "isError" === JBool(true))
    val JString(msg) = (r \ "result" \ "content")(0) \ "text": @unchecked
    assert(msg.contains("engine down"))
  }

  test("JSON-RPC batches: per-request responses, notifications silent, empty batch invalid") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val batch = """[
      {"jsonrpc":"2.0","id":1,"method":"ping"},
      {"jsonrpc":"2.0","method":"notifications/initialized"},
      {"jsonrpc":"2.0","id":2,"method":"tools/list"}]""".replaceAll("\n\\s*", "")
    val JArray(rs) = parse(Mcp.handle(batch, (_, _) => "x").get): @unchecked
    // two responses (the notification contributes none), order kept
    assert(rs.map(_ \ "id") === List(JInt(1), JInt(2)))
    // all-notification batch: no response line at all
    assert(Mcp.handle("""[{"jsonrpc":"2.0","method":"notifications/initialized"}]""", (_, _) => "x").isEmpty)
    // empty batch: Invalid Request
    val e = parse(Mcp.handle("[]", (_, _) => "x").get)
    assert(e \ "error" \ "code" === JInt(-32600))
    // non-object batch elements each draw a -32600 with null id
    val JArray(bad) = parse(Mcp.handle("""[1,{"jsonrpc":"2.0","id":3,"method":"ping"}]""", (_, _) => "x").get): @unchecked
    assert(bad.head \ "error" \ "code" === JInt(-32600) && bad.head \ "id" === JNull)
    assert(bad(1) \ "id" === JInt(3))
    // "id": null is a PRESENT id — a request, answered; only a missing
    // id makes a notification
    val nullId = parse(Mcp.handle("""{"jsonrpc":"2.0","id":null,"method":"ping"}""", (_, _) => "x").get)
    assert(nullId \ "id" === JNull && (nullId \ "result") != JNothing)
  }

  test("serve treats JSON-looking lines that do not parse as raw prompts") {
    val eng = new graft.search.SearchEngine(spark)
    val in = new java.io.BufferedReader(new java.io.StringReader(
      "[RFC] shuffle tuning\n{fast hash join}\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf001, k = 2,
      in, new java.io.PrintStream(buf, true, "UTF-8"))
    assert(served === 2)
    val lines = buf.toString("UTF-8").trim.split("\n").toSeq
    // both answered with search hits, neither with a JSON-RPC error
    lines.foreach { l =>
      assert(l.contains("\"doc_id\"") && !l.contains("jsonrpc"), l)
    }
  }

  test("serve treats bare JSON scalars as raw prompts, not protocol traffic") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    // '42', 'true', '"quoted"' all PARSE as JSON but are not JSON-RPC
    // shapes (object/array) — a prompt that happens to be a number must
    // get search results, not an Invalid Request envelope
    Seq("42", "true", "\"hash join\"").foreach { line =>
      assert(Mcp.tryHandle(line, (_, _) => "x").isEmpty, line)
    }
    // the strict protocol path still rejects them (a real MCP client
    // never sends a scalar): Invalid Request, not silence
    val r = parse(Mcp.handle("42", (_, _) => "x").get)
    assert((r \ "error" \ "code") === JInt(-32600))
    // and objects/batches remain protocol traffic on both paths
    assert(Mcp.tryHandle("""{"jsonrpc":"2.0","id":1,"method":"ping"}""", (_, _) => "x")
      .exists(_.isDefined))
  }

  test("notifications/cancelled is consumed silently; initialize echoes the protocol version") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    // any method WITHOUT an id is a notification — never answered
    assert(Mcp.handle(
      """{"jsonrpc":"2.0","method":"notifications/cancelled","params":{"requestId":1}}""",
      (_, _) => "x").isEmpty)
    // MCP version negotiation: a supported requested revision is ECHOED
    // (the client then talks that revision) ...
    val init = parse(Mcp.handle(
      """{"jsonrpc":"2.0","id":7,"method":"initialize","params":{"protocolVersion":"2024-11-05"}}""",
      (_, _) => "x").get)
    assert((init \ "result" \ "protocolVersion") === JString("2024-11-05"))
    // ... an unknown revision is answered with the latest this server
    // speaks, and the client decides whether to proceed
    val unknown = parse(Mcp.handle(
      """{"jsonrpc":"2.0","id":8,"method":"initialize","params":{"protocolVersion":"1999-01-01"}}""",
      (_, _) => "x").get)
    assert((unknown \ "result" \ "protocolVersion") === JString(Mcp.ProtocolVersion))
    // ... and a missing protocolVersion also draws the latest
    val bare = parse(Mcp.handle(
      """{"jsonrpc":"2.0","id":9,"method":"initialize"}""", (_, _) => "x").get)
    assert((bare \ "result" \ "protocolVersion") === JString(Mcp.ProtocolVersion))
  }

  test("--serve false consumes the literal token as the flag value") {
    // the legacy explicit-off spelling: 'false' must bind to the flag,
    // not leak into the prompt as a positional word
    val c = Search.parseConfig(Seq("--serve", "false", "--sf-dir", "/x", "find", "it"), Map.empty)
    assert(!c.serve && c.prompt === "find it")
    val c2 = Search.parseConfig(Seq("--serve", "true", "--sf-dir", "/x"), Map.empty)
    assert(c2.serve && c2.prompt.isEmpty)
    // a non-boolean next token still stays a positional (prompt word)
    val c3 = Search.parseConfig(Seq("--serve", "falsehoods", "--sf-dir", "/x"), Map.empty)
    assert(c3.serve && c3.prompt === "falsehoods")
  }

  test("the main's search body returns the reference's tool-call JSON shape") {
    // same engine call main() makes, against the live test session —
    // the reference's one tool end-to-end (server.py:71-102)
    val eng = new graft.search.SearchEngine(spark)
    val json = eng.searchJson(sf001, "fast hash join on a big table", k = 3)
    assert(json.startsWith("[") && json.endsWith("]"))
    assert(json.contains("\"doc_id\"") && json.contains("\"score\""))
  }
  test("--root: a LIVE server survives folds and a refit — pointer-resolved serving, no restart, no resurrection") {
    import spark.implicits._
    import graft.search.{AnnIndex, HashingEmbedder}
    import graft.search.AnnIndex.ServingRoot
    import graft.queries.AnnQueries
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val mainDir = AnnQueries.ivfPqIndexDir(spark, sf0001)
    val root = java.nio.file.Files
      .createTempDirectory("graft_rootserve_spec").toString + "/r"
    ServingRoot.init(spark, mainDir, root)
    // the server: one long-lived serve loop on a pipe — requests and
    // epoch swaps interleave against the SAME process, the scenario
    // the pointer machinery exists for
    val outBuf = new java.io.ByteArrayOutputStream()
    val toServer = new java.io.PipedOutputStream()
    val fromTest = new java.io.PrintStream(toServer, true, "UTF-8")
    val serverIn = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.io.PipedInputStream(toServer, 1 << 16), "UTF-8"))
    @volatile var servedTotal = -1
    val server = new Thread(() => {
      servedTotal = Search.serve(eng, sf0001, k = 10, serverIn,
        new java.io.PrintStream(outBuf, true, "UTF-8"),
        root = Some(root), maintainEvery = 1)
    }, "graft-root-serve")
    server.start()
    // count only COMPLETE (newline-terminated) lines: the PrintStream
    // flushes large responses in chunks, and a partial chunk must not
    // be read as an answer
    def lines(): Seq[String] = {
      val all = outBuf.toString("UTF-8")
      all.substring(0, all.lastIndexOf('\n') + 1)
        .split("\n").filter(_.nonEmpty).toSeq
    }
    def request(line: String): String = {
      val before = lines().size
      fromTest.println(line)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (lines().size <= before) {
        assert(System.nanoTime() < deadline, s"serve timed out on: $line")
        Thread.sleep(25)
      }
      lines().last
    }
    def hitIds(json: String): Seq[Long] = {
      val JArray(hits) = parse(json): @unchecked
      hits.map(h => (h \ "doc_id").asInstanceOf[JInt].num.longValue)
    }
    val prompt = AnnQueries.ServedPrompt
    // epoch 0: baseline answer
    val r0 = request(prompt)
    val top = hitIds(r0)
    assert(top.nonEmpty)
    val victim = top.head
    // DELETE the top hit via the epoch delta the server is serving
    val (_, delta0) = ServingRoot.resolve(spark, root)
    AnnIndex.appendTombstones(spark, delta0,
      Seq(victim).toDF("vec_id"), 0L, compactEvery = 0)
    val r1 = request(prompt)
    assert(!hitIds(r1).contains(victim),
      "a tombstoned doc must stop serving immediately (no restart)")
    // INGEST a sentinel with on-point text for the prompt
    val sentinelId = 930000001L
    val sentinelText = prompt + " sentinel served from the delta"
    AnnIndex.appendDeltaBatch(spark, ServingRoot.resolve(spark, root)._1, delta0,
      Seq((sentinelId, new HashingEmbedder(64).embed(sentinelText).toSeq,
        sentinelText)).toDF("vec_id", "embedding", "text"),
      1L, compactEvery = 0)
    val r2 = request(prompt)
    assert(hitIds(r2).contains(sentinelId) && !hitIds(r2).contains(victim))
    // FOLD 1 and FOLD 2 — concurrent with the live server; the next
    // request must serve the folded epoch: same answer, no
    // resurrection of the victim, sentinel payload now riding the
    // ARTIFACT (its text column), not the delta
    assert(AnnIndex.majorFoldPublish(spark, root) === 1L)
    val r3 = request(prompt)
    assert(r3 === r2, s"fold 1 must be invisible to the served answer: $r3 vs $r2")
    assert(AnnIndex.majorFoldPublish(spark, root) === 2L)
    val r4 = request(prompt)
    assert(r4 === r2, "fold 2 must be invisible to the served answer")
    // REFIT (swap 3): force-actuated on a fresh post-fold ingest; the
    // server's next request serves the refitted epoch
    val (idx2, delta2) = ServingRoot.resolve(spark, root)
    val sentinel2 = 930000002L
    val text2 = prompt + " second sentinel rides the refit"
    AnnIndex.appendDeltaBatch(spark, idx2, delta2,
      Seq((sentinel2, new HashingEmbedder(64).embed(text2).toSeq,
        text2)).toDF("vec_id", "embedding", "text"),
      0L, compactEvery = 0)
    val (_, refitEpoch) = AnnIndex.refitIfDrifted(spark, root,
      AnnQueries.IvfCells, AnnQueries.IvfPqSubDim, AnnQueries.IvfPqK,
      AnnQueries.IvfPqIters, driftMax = 0.0)
    assert(refitEpoch === Some(3L), "the forced refit must publish epoch 3")
    val r5 = request(prompt)
    val ids5 = hitIds(r5)
    assert(ids5.contains(sentinelId) && ids5.contains(sentinel2) &&
      !ids5.contains(victim),
      s"the refitted epoch must serve both sentinels and keep the delete: $r5")
    // both sentinels' payloads round-trip (artifact text for the
    // folded one, delta text for the fresh one)
    assert(r5.contains("sentinel served from the delta") &&
      r5.contains("second sentinel rides the refit"))
    // MCP dialect against the same live server, post-swap
    val mcp = parse(request(
      s"""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"$prompt"}}}"""))
    val JString(text) = (mcp \ "result" \ "content")(0) \ "text": @unchecked
    assert(text === r5, "the MCP face must serve the same epoch answer")
    fromTest.close()
    server.join(60000)
    assert(servedTotal === 7, s"server must have answered every request: $servedTotal")
  }

  test("the batch tool answers == per-prompt answers through the MCP surface") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val prompts = Seq(
      graft.queries.AnnQueries.ServedPrompt,
      "fast hash join on a big table",
      "sorted merge of event batches")
    def mcpText(resp: String): String = {
      val JString(t) = (parse(resp) \ "result" \ "content")(0) \ "text": @unchecked
      t
    }
    val singleCalls = prompts.zipWithIndex.map { case (p, i) =>
      s"""{"jsonrpc":"2.0","id":$i,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"$p"}}}"""
    }
    val batchCall =
      s"""{"jsonrpc":"2.0","id":9,"method":"tools/call","params":{"name":"${Mcp.BatchToolName}","arguments":{"prompts":[${prompts.map("\"" + _ + "\"").mkString(",")}]}}}"""
    val in = new java.io.BufferedReader(new java.io.StringReader(
      (singleCalls :+ batchCall).mkString("\n") + "\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf0001, k = 5,
      in, new java.io.PrintStream(buf, true, "UTF-8"), index = true)
    assert(served === 4)
    val out = buf.toString("UTF-8").trim.split("\n").toSeq
    val singles = out.take(3).map(mcpText)
    val JArray(batch) = parse(mcpText(out(3))): @unchecked
    assert(batch.size === 3)
    batch.zip(singles).zipWithIndex.foreach { case ((b, s1), i) =>
      assert(org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(b)) ===
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(parse(s1))),
        s"batch element $i must equal the single-tool answer")
    }
    // the batch tool rides tools/list with its prompts-array schema
    val tl = parse(Mcp.handle(
      """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""",
      (_, _) => "x").get)
    val tools = (tl \ "result" \ "tools").asInstanceOf[JArray].arr
    assert(tools.map(t => t \ "name").contains(JString(Mcp.BatchToolName)))
    // bad batch arguments are protocol errors, not broadened searches
    val bad = parse(Mcp.handle(
      s"""{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"${Mcp.BatchToolName}","arguments":{"prompts":[]}}}""",
      (_, _) => "x").get)
    assert((bad \ "error" \ "code") === JInt(-32602))
    val bad2 = parse(Mcp.handle(
      s"""{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{"name":"${Mcp.BatchToolName}","arguments":{"prompts":[1,2]}}}""",
      (_, _) => "x").get)
    assert((bad2 \ "error" \ "code") === JInt(-32602))
    // an OVERSIZED batch is a protocol-level bad argument too — the
    // cap is enforced at the parse layer, so even the per-prompt
    // fallback closure can never be driven to unbounded work
    val over = (1 to graft.search.SearchEngine.MaxBatchPrompts + 1)
      .map(i => s""""p$i"""").mkString(",")
    val bad3 = parse(Mcp.handle(
      s"""{"jsonrpc":"2.0","id":5,"method":"tools/call","params":{"name":"${Mcp.BatchToolName}","arguments":{"prompts":[$over]}}}""",
      (_, _) => "x").get)
    assert((bad3 \ "error" \ "code") === JInt(-32602))
  }

  test("maintenance runs on the background sequencer: responses flow DURING a fold, one check in flight") {
    val eng = new graft.search.SearchEngine(spark)
    val foldStarted = new java.util.concurrent.CountDownLatch(1)
    val foldRelease = new java.util.concurrent.CountDownLatch(1)
    val actionRuns = new java.util.concurrent.atomic.AtomicInteger
    val outBuf = new java.io.ByteArrayOutputStream()
    val toServer = new java.io.PipedOutputStream()
    val fromTest = new java.io.PrintStream(toServer, true, "UTF-8")
    val serverIn = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.io.PipedInputStream(toServer, 1 << 16), "UTF-8"))
    @volatile var servedTotal = -1
    val server = new Thread(() => {
      servedTotal = Search.serve(eng, sf0001, k = 3, serverIn,
        new java.io.PrintStream(outBuf, true, "UTF-8"),
        maintainEvery = 2,
        // delay-injected maintenance: the FIRST run blocks until the
        // test releases it — the window in which serving must
        // continue; later runs return immediately (the latch stays
        // open)
        maintainAction = Some(() => {
          actionRuns.incrementAndGet()
          foldStarted.countDown()
          foldRelease.await()
        }))
    }, "graft-bg-maint-serve")
    server.start()
    def lines(): Seq[String] = {
      val all = outBuf.toString("UTF-8")
      all.substring(0, all.lastIndexOf('\n') + 1)
        .split("\n").filter(_.nonEmpty).toSeq
    }
    def request(line: String): String = {
      val before = lines().size
      fromTest.println(line)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (lines().size <= before) {
        assert(System.nanoTime() < deadline, s"serve timed out on: $line")
        Thread.sleep(25)
      }
      lines().last
    }
    // requests 1+2 answer; the second's cadence crossing (2 tool
    // calls / maintainEvery 2) enqueues the fold
    val r1 = request("fast hash join on a big table")
    assert(r1.contains("\"doc_id\""))
    val r2 = request("sorted merge of event batches")
    assert(r2.contains("\"doc_id\""))
    assert(foldStarted.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "the maintenance action must start on the background thread")
    // THE claim: requests issued while the fold is mid-flight are
    // answered — the fold never stalls the request thread — and the
    // crossing at call 4 is SKIPPED (consumed, not queued)
    val r3 = request("columnar scan with predicate pushdown")
    assert(r3.contains("\"doc_id\""),
      "a request during a mid-flight fold must be answered")
    val r4 = request("broadcast the small dimension side")
    assert(r4.contains("\"doc_id\""))
    assert(actionRuns.get === 1,
      "a cadence crossing during a mid-flight check is skipped, not queued")
    foldRelease.countDown()
    // the skipped crossing was CONSUMED: the first request after the
    // check completes sits inside the same cadence window (5/2 = 2,
    // already recorded) and must NOT retry the skipped check — only
    // the NEXT crossing (call 6) re-checks
    val r5 = request("window frame over recent sessions")
    assert(r5.contains("\"doc_id\""))
    assert(actionRuns.get === 1,
      "a skipped crossing must wait for the next crossing, not the next request")
    val r6 = request("filter events by recent timestamp")
    assert(r6.contains("\"doc_id\""))
    fromTest.close()
    server.join(60000)
    assert(servedTotal === 6)
    assert(actionRuns.get === 2,
      "the next cadence crossing after a skip must re-check")
  }

  test("protocol chatter does not drive maintenance; tool calls do — and EOF drains the sequencer") {
    val eng = new graft.search.SearchEngine(spark)
    val actionRuns = new java.util.concurrent.atomic.AtomicInteger
    val in = new java.io.BufferedReader(new java.io.StringReader(
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""" + "\n" +
      """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""" + "\n" +
      """{"jsonrpc":"2.0","id":3,"method":"ping"}""" + "\n" +
      "fast hash join\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf0001, k = 2,
      in, new java.io.PrintStream(buf, true, "UTF-8"),
      maintainEvery = 1,
      maintainAction = Some(() => { actionRuns.incrementAndGet(); () }))
    // all four lines answered, but only the PROMPT was a tool
    // invocation — three protocol responses drove zero checks; serve
    // returning proves the drain (the action completed before exit)
    assert(served === 4)
    assert(actionRuns.get === 1,
      s"exactly the one tool call must drive maintenance, got ${actionRuns.get}")
  }

  test("--index false: the batch tool is a loud isError, the single tool honors the exact route") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods.parse
    val eng = new graft.search.SearchEngine(spark)
    val batchCall =
      s"""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"${Mcp.BatchToolName}","arguments":{"prompts":["fast hash join"]}}}"""
    val singleCall =
      s"""{"jsonrpc":"2.0","id":2,"method":"tools/call","params":{"name":"${Mcp.ToolName}","arguments":{"prompt":"fast hash join"}}}"""
    val in = new java.io.BufferedReader(new java.io.StringReader(
      batchCall + "\n" + singleCall + "\n"))
    val buf = new java.io.ByteArrayOutputStream()
    val served = Search.serve(eng, sf0001, k = 3,
      in, new java.io.PrintStream(buf, true, "UTF-8"), index = false)
    assert(served === 2)
    val out = buf.toString("UTF-8").trim.split("\n").toSeq
    // the batch tool cannot honor --index false (it EXISTS for the
    // one-plan probe): a loud tool-execution error, the one-shot
    // CLI's contradiction policy — never a silent index read
    val batch = parse(out(0))
    assert((batch \ "result" \ "isError") === JBool(true))
    val JString(msg) = (batch \ "result" \ "content")(0) \ "text": @unchecked
    assert(msg.contains("--index false"), msg)
    // the single tool serves the exact scan as configured
    val single = parse(out(1))
    assert((single \ "result" \ "isError") === JBool(false))
    val JString(hits) = (single \ "result" \ "content")(0) \ "text": @unchecked
    assert(hits.contains("\"doc_id\""))
  }
}

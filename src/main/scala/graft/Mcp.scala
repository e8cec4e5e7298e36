package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Model Context Protocol framing for the serve loop — the piece the
  * reference delegates to FastMCP (reference server.py:67 creates the
  * server, server.py:104 registers the one tool, server.py:127 runs the
  * stdio JSON-RPC transport). The protocol is public (JSON-RPC 2.0 with
  * MCP's `initialize` / `tools/list` / `tools/call` methods over
  * line-delimited stdio); this implements exactly the slice the
  * reference's single-tool server exercises, hand-rolled over the
  * json4s that ships with Spark — no new dependencies.
  *
  * One request line in → one response line out; notifications (no `id`)
  * get no response, per JSON-RPC 2.0. The tool surface mirrors the
  * reference's `vector_search_neo4j(prompt)` (server.py:71-75): one
  * tool, one required string argument, result as a single text content
  * block carrying the engine's JSON hits.
  */
object Mcp {

  /** Protocol revision implemented; the newest this server speaks. */
  val ProtocolVersion = "2025-03-26"

  /** Revisions the server can answer `initialize` with. The MCP
    * handshake: if the client's requested `protocolVersion` is one the
    * server supports, ECHO it (the client then talks that revision);
    * otherwise respond with the latest supported and let the client
    * decide whether to proceed or disconnect. The tools-only slice this
    * server implements is identical across these two revisions
    * (2025-03-26 added JSON-RPC batching, which older clients simply
    * never send), so both are honestly supportable. */
  val SupportedProtocolVersions: Set[String] = Set("2024-11-05", ProtocolVersion)

  val ServerName = "graft-vector-search"
  val ServerVersion = "0.1.0"

  /** The one tool, named for what it does (the reference names its tool
    * for its backend, `vector_search_neo4j`; the engine's backend is
    * Spark, so the transport-visible name drops the suffix). */
  val ToolName = "vector_search"
  val ToolDescription =
    "Semantic top-k vector search over the document corpus: " +
      "natural-language prompt in, JSON array of (doc_id, text, score) out. " +
      "Optional `filter`: an object of scalar equality constraints over " +
      "stored metadata columns (e.g. {\"label\": 2}) — hits must match all."

  /** The tool closure's shape: (prompt, metadata filter) → result
    * JSON. The filter is the parsed `filter` argument — conjunctive
    * scalar equalities ([[graft.search.SearchEngine.searchIndexed]]'s
    * semantics); the raw-prompt dialect always passes Nil. */
  type Search = (String, Seq[(String, Any)]) => String

  /** The BATCH tool, multi-tenant face of [[ToolName]]: many prompts
    * in one call, answered by ONE batched probe plan
    * ([[graft.search.SearchEngine.searchIndexedBatch]]) instead of N
    * sequential tool calls — same per-prompt semantics, spec-pinned. */
  val BatchToolName = "vector_search_batch"
  val BatchToolDescription =
    "Batched semantic top-k vector search: an array of prompts in, a " +
      "JSON array (one hits array per prompt, in order) out — served " +
      "by one batched index probe. Optional `filter` as in " +
      "vector_search, applied to every prompt."

  /** The batch tool closure: (prompts, shared metadata filter) →
    * result JSON (one hits array per prompt, in order). */
  type SearchBatch = (Seq[String], Seq[(String, Any)]) => String

  /** Per-prompt fallback batch closure for callers that wire only the
    * single tool: each prompt through `search`, results joined as one
    * JSON array — a hits array rides through structurally, the
    * empty-hit sentence is carried as a JSON string. The serve loop
    * wires the REAL one-plan closure; this keeps the two-argument
    * entry points total. */
  def perPromptBatch(search: Search): SearchBatch = (prompts, filter) =>
    prompts.map { p =>
      val r = search(p, filter)
      if (r.startsWith("[")) r else quote(r)
    }.mkString("[", ", ", "]")

  /** Full JSON string quoting (control characters included) — a
    * partial escaper here would emit unparseable protocol lines the
    * moment a message carries a newline. */
  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Handle one inbound stdio line. Returns the response line to write,
    * or None when the protocol mandates silence (a notification, or a
    * batch of only notifications).
    *
    * @param search the engine closure: (prompt, filter) => result JSON
    *               (the same body the raw serve loop calls with an
    *               empty filter). */
  def handle(line: String, search: Search): Option[String] =
    handle(line, search, perPromptBatch(search))

  /** [[handle]] with the batch tool wired to a real one-plan closure. */
  def handle(line: String, search: Search,
             searchBatch: SearchBatch): Option[String] =
    parseJson(line) match {
      // unparseable: JSON-RPC 2.0 mandates a -32700 response with null id
      case None => Some(render(error(JNull, -32700, "Parse error")))
      case Some(v) => dispatch(v, search, searchBatch)
    }

  /** Like [[handle]] but distinguishes "not protocol traffic":
    * Some(response line or protocol-mandated silence) when the line
    * parses as a JSON OBJECT or ARRAY — the only shapes a JSON-RPC
    * message can take — None otherwise, and the serve loop's raw-prompt
    * dialect takes over. That covers both broken JSON (a human typing
    * `[RFC] shuffle tuning` wants search results, not a Parse error;
    * a real MCP client never emits broken JSON) and bare JSON scalars
    * (`42`, `true`, a quoted string): a prompt that happens to parse as
    * a scalar is still a prompt, not an Invalid Request. Batches
    * (JSON-RPC 2.0, in the 2025-03-26 MCP revision this server
    * declares) answer with a batch of the individual responses,
    * notifications contributing none; an all-notification batch gets no
    * response at all, and an empty batch is an Invalid Request. */
  def tryHandle(line: String, search: Search): Option[Option[String]] =
    tryHandle(line, search, perPromptBatch(search))

  /** [[tryHandle]] with the batch tool wired to a real one-plan closure. */
  def tryHandle(line: String, search: Search,
                searchBatch: SearchBatch): Option[Option[String]] =
    parseJson(line) match {
      case Some(v @ (_: JObject | _: JArray)) =>
        Some(dispatch(v, search, searchBatch))
      case _ => None
    }

  private def parseJson(line: String): Option[JValue] =
    try Some(JsonMethods.parse(line)) catch { case _: Exception => None }

  /** Route one parsed JSON-RPC payload; None = protocol-mandated
    * silence. (A bare scalar only reaches here via the strict [[handle]]
    * path, where it is an Invalid Request answered by handleValue.) */
  private def dispatch(v: JValue, search: Search,
                       searchBatch: SearchBatch): Option[String] =
    v match {
      case JArray(Nil) =>
        Some(render(error(JNull, -32600, "Invalid Request: empty batch")))
      case JArray(msgs) =>
        val responses = msgs.flatMap(m => handleValue(m, search, searchBatch))
        if (responses.isEmpty) None else Some(render(JArray(responses)))
      case msg => handleValue(msg, search, searchBatch).map(render)
    }

  /** Dispatch one request/notification object; None = no response.
    * Per JSON-RPC 2.0: a message WITHOUT an `id` member is a
    * notification (never answered); `"id": null` is a present — if
    * discouraged — id, so such a message is a request and gets a
    * response. A non-object batch element is an Invalid Request
    * answered with a null id. */
  private def handleValue(msg: JValue, search: Search,
                          searchBatch: SearchBatch): Option[JValue] = {
    if (!msg.isInstanceOf[JObject])
      return Some(error(JNull, -32600, "Invalid Request: not an object"))
    val id = msg \ "id"
    val method = msg \ "method" match {
      case JString(m) => m
      case _ => ""
    }
    val isNotification = id == JNothing
    val response = method match {
      case "initialize" => Some(result(id, initializeResult(msg \ "params")))
      case "ping" => Some(result(id, JObject()))
      case "tools/list" => Some(result(id, toolsListResult()))
      case "tools/call" =>
        Some(toolsCall(id, msg \ "params", search, searchBatch))
      // a tools-only server still answers these (as FastMCP does
      // for the reference): empty lists, not method-not-found —
      // real clients enumerate all three surfaces on connect
      case "prompts/list" =>
        Some(result(id, JObject("prompts" -> JArray(Nil))))
      case "resources/list" =>
        Some(result(id, JObject("resources" -> JArray(Nil))))
      // notifications/initialized, notifications/cancelled, and any
      // other notification: no response, per JSON-RPC 2.0. Cancellation
      // in particular is a no-op by design — this server answers each
      // request synchronously before reading the next line, so by the
      // time a cancelled notification arrives the request it names has
      // already completed (the race the MCP spec tells receivers to
      // tolerate by ignoring unknown/late cancellations).
      case _ if isNotification => None
      case "" => Some(error(id, -32600, "Invalid Request: no method"))
      case m => Some(error(id, -32601, s"Method not found: $m"))
    }
    if (isNotification) None else response
  }

  private def render(v: JValue): String =
    JsonMethods.compact(JsonMethods.render(v))

  private def initializeResult(params: JValue): JObject = {
    val negotiated = params \ "protocolVersion" match {
      case JString(v) if SupportedProtocolVersions(v) => v
      case _ => ProtocolVersion
    }
    JObject(
    "protocolVersion" -> JString(negotiated),
    "capabilities" -> JObject("tools" -> JObject()),
    "serverInfo" -> JObject(
      "name" -> JString(ServerName),
      "version" -> JString(ServerVersion)))
  }

  private def filterSchema: JObject = JObject(
    "type" -> JString("object"),
    "description" -> JString(
      "Scalar equality constraints over stored metadata " +
        "columns; a hit must match all of them"),
    "additionalProperties" -> JObject(
      "type" -> JArray(List(JString("string"), JString("number"),
        JString("boolean")))))

  private def toolsListResult(): JObject = JObject(
    "tools" -> JArray(List(
      JObject(
        "name" -> JString(ToolName),
        "description" -> JString(ToolDescription),
        "inputSchema" -> JObject(
          "type" -> JString("object"),
          "properties" -> JObject(
            "prompt" -> JObject(
              "type" -> JString("string"),
              "description" -> JString("Natural-language search prompt")),
            "filter" -> filterSchema),
          "required" -> JArray(List(JString("prompt"))))),
      JObject(
        "name" -> JString(BatchToolName),
        "description" -> JString(BatchToolDescription),
        "inputSchema" -> JObject(
          "type" -> JString("object"),
          "properties" -> JObject(
            "prompts" -> JObject(
              "type" -> JString("array"),
              "description" -> JString(
                "Natural-language search prompts, answered in order"),
              "items" -> JObject("type" -> JString("string"))),
            "filter" -> filterSchema),
          "required" -> JArray(List(JString("prompts"))))))))

  /** Parse the optional `filter` argument: absent → Right(Nil); an
    * object of scalar values → Right(pairs); anything else (non-object
    * filter, or a nested/null value) → Left(reason) answered as
    * -32602 Invalid params — a silently dropped constraint would turn
    * a narrowed search into a broad one, the worst possible default. */
  private[graft] def parseFilter(v: JValue): Either[String, Seq[(String, Any)]] =
    v match {
      case JNothing => Right(Nil)
      case JObject(fields) =>
        fields.foldLeft[Either[String, Seq[(String, Any)]]](Right(Nil)) {
          case (Left(e), _) => Left(e)
          case (Right(acc), (name, value)) => value match {
            case JInt(i) => Right(acc :+ (name -> i.longValue))
            case JLong(l) => Right(acc :+ (name -> l))
            case JDouble(d) => Right(acc :+ (name -> d))
            case JDecimal(d) => Right(acc :+ (name -> d.doubleValue))
            case JString(s) => Right(acc :+ (name -> s))
            case JBool(b) => Right(acc :+ (name -> b))
            case other => Left(
              s"filter.$name must be a scalar, got ${other.getClass.getSimpleName}")
          }
        }
      case other =>
        Left(s"filter must be an object, got ${other.getClass.getSimpleName}")
    }

  /** Parse the batch tool's `prompts` argument: a non-empty array of
    * non-blank strings within the engine's batch cap, or the reason
    * it isn't. The cap is enforced HERE so an oversized batch is a
    * -32602 Invalid-argument envelope (a protocol-level bad argument,
    * like every other malformed argument) — and so the per-prompt
    * fallback closure can never be driven to unbounded work by a
    * giant array. */
  private[graft] def parsePrompts(v: JValue): Either[String, Seq[String]] =
    v match {
      case JNothing => Left("Missing required argument: prompts")
      case JArray(Nil) => Left("prompts must be a non-empty array")
      case JArray(els)
          if els.size > graft.search.SearchEngine.MaxBatchPrompts =>
        Left(s"prompts must carry at most " +
          s"${graft.search.SearchEngine.MaxBatchPrompts} entries, got ${els.size}")
      case JArray(els) =>
        els.foldLeft[Either[String, Seq[String]]](Right(Nil)) {
          case (Left(e), _) => Left(e)
          case (Right(acc), JString(p)) if p.trim.nonEmpty =>
            Right(acc :+ p.trim)
          case (Right(_), JString(_)) => Left("prompts must not contain blanks")
          case (Right(_), other) => Left(
            s"prompts elements must be strings, got ${other.getClass.getSimpleName}")
        }
      case other =>
        Left(s"prompts must be an array, got ${other.getClass.getSimpleName}")
    }

  private def toolsCall(id: JValue, params: JValue, search: Search,
      searchBatch: SearchBatch): JValue = {
    val name = params \ "name" match {
      case JString(n) => n
      case _ => ""
    }
    // tool-execution failures are NOT protocol errors: MCP reports
    // them inside the result with isError=true so the model can see
    // and react to them — only unknown tools / bad arguments get
    // JSON-RPC error envelopes
    def run(body: => String): JValue = {
      val (text, isError) =
        try (body, false)
        catch { case e: Exception => (s"search failed: ${e.getMessage}", true) }
      result(id, JObject(
        "content" -> JArray(List(JObject(
          "type" -> JString("text"),
          "text" -> JString(text)))),
        "isError" -> JBool(isError)))
    }
    val filterArg = parseFilter(params \ "arguments" \ "filter")
    (name, filterArg) match {
      case (n, _) if n != ToolName && n != BatchToolName =>
        error(id, -32602, s"Unknown tool: $n")
      case (_, Left(reason)) => error(id, -32602, s"Invalid argument: $reason")
      case (ToolName, Right(filter)) =>
        params \ "arguments" \ "prompt" match {
          case JString(p) if p.trim.nonEmpty => run(search(p.trim, filter))
          case _ => error(id, -32602, "Missing required argument: prompt")
        }
      case (_, Right(filter)) =>
        parsePrompts(params \ "arguments" \ "prompts") match {
          case Left(reason) => error(id, -32602, s"Invalid argument: $reason")
          case Right(prompts) => run(searchBatch(prompts, filter))
        }
    }
  }

  private def result(id: JValue, res: JObject): JValue = JObject(
    "jsonrpc" -> JString("2.0"), "id" -> id, "result" -> res)

  private def error(id: JValue, code: Int, message: String): JValue = JObject(
    "jsonrpc" -> JString("2.0"), "id" -> id,
    "error" -> JObject(
      "code" -> JInt(code), "message" -> JString(message)))
}

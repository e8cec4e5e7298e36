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
    // serve mode is the one config where an empty prompt is legal
    val c = Search.parseConfig(Seq("--serve", "true", "--sf-dir", "/x"), Map.empty)
    assert(c.serve && c.prompt.isEmpty)
  }

  test("the main's search body returns the reference's tool-call JSON shape") {
    // same engine call main() makes, against the live test session —
    // the reference's one tool end-to-end (server.py:71-102)
    val eng = new graft.search.SearchEngine(spark)
    val json = eng.searchJson(sf001, "fast hash join on a big table", k = 3)
    assert(json.startsWith("[") && json.endsWith("]"))
    assert(json.contains("\"doc_id\"") && json.contains("\"score\""))
  }
}

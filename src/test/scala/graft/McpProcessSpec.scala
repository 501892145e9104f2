package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.TimeUnit

import org.json4s._
import org.json4s.jackson.JsonMethods.parse

/** Drives the MCP server as a REAL forked process — the reference's
  * actual deployment shape (`mcp-server/main.go:88-109`: a spawned
  * stdin/stdout JSON-RPC child), where McpServerSpec exercises the
  * same dispatch in-JVM. This is the harness test round-10's verdict
  * asked for: fork `graft.Cli <store> mcp`, speak initialize /
  * tools/list / tools/call over the child's pipes against a populated
  * store, and assert the wire protocol plus the markdown payloads.
  */
class McpProcessSpec extends SparkSpec {

  private def jstr(v: JValue): String =
    v match { case JString(s) => s; case other => other.toString }

  test("forked `graft.Cli <store> mcp` serves initialize, tools/list, " +
      "tools/call, and method-not-found over real pipes") {
    val store = FixtureGraph.store(spark)

    val javaBin = System.getProperty("java.home") + "/bin/java"
    // same JDK-17 module opens the build's forked JVMs use (Spark 4
    // needs them when launched outside spark-submit)
    val cmd = Seq(javaBin) ++ ScaleCorpus.jdk17AddOpens ++ Seq("-Xmx4g",
      "-cp", System.getProperty("java.class.path"),
      "graft.Cli", store.basePath, "mcp")
    val pb = new ProcessBuilder(cmd: _*)
    // stderr carries Spark logs; drain it to a file so the protocol
    // stream (stdout) stays clean and the child never blocks on a
    // full stderr pipe
    val errFile = java.nio.file.Files
      .createTempFile("graft-mcp-err", ".log").toFile
    pb.redirectError(errFile)
    val p = pb.start()
    try {
      val requests = Seq(
        """{"jsonrpc":"2.0","id":1,"method":"initialize"}""",
        """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""",
        """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":""" +
          """{"name":"codegraph_search","arguments":{"query":"Main"}}}""",
        """{"jsonrpc":"2.0","id":4,"method":"nonexistent/method"}""")
      val stdin = p.getOutputStream
      stdin.write((requests.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
      stdin.flush()
      stdin.close() // EOF ends the session loop (main.go:88-109)

      // drain stdout on a helper thread so a wedged child (e.g. a
      // Spark startup hang) fails the bounded waitFor below instead
      // of freezing the whole suite on a blocking readAllBytes
      val outBuf = new java.io.ByteArrayOutputStream()
      val drainer = new Thread(() => {
        try p.getInputStream.transferTo(outBuf)
        catch { case _: java.io.IOException => () }
      }, "mcp-stdout-drain")
      drainer.setDaemon(true)
      drainer.start()
      assert(p.waitFor(180, TimeUnit.SECONDS),
        "mcp child did not exit after stdin EOF")
      drainer.join(10000L)
      val out = new String(outBuf.toByteArray, StandardCharsets.UTF_8)
      assert(p.exitValue() === 0, s"mcp child exit ${p.exitValue()}; " +
        s"stderr tail: ${scala.io.Source.fromFile(errFile).mkString
          .takeRight(500)}")

      val lines = out.split('\n').map(_.trim).filter(_.nonEmpty)
      assert(lines.length === 4,
        s"expected 4 response lines, got ${lines.length}:\n$out")
      val Seq(r1, r2, r3, r4) = lines.toSeq.map(parse(_))

      // initialize
      assert(jstr(r1 \ "result" \ "protocolVersion") === "2024-11-05")
      assert(jstr(r1 \ "result" \ "serverInfo" \ "name") ===
        "graft-mcp-server")
      assert((r1 \ "id") === JInt(1))

      // tools/list: the reference's four codegraph_* tools
      val names = (r2 \ "result" \ "tools") match {
        case JArray(ts) => ts.map(t => jstr(t \ "name"))
        case other => fail(s"tools not an array: $other")
      }
      assert(names === List("codegraph_search", "codegraph_get_source",
        "codegraph_find_references", "codegraph_analyze_function"))

      // tools/call: markdown search payload against the populated store
      val text = (r3 \ "result" \ "content") match {
        case JArray(c :: _) => jstr(c \ "text")
        case other => fail(s"content not an array: $other")
      }
      assert(text.contains("Main"),
        s"search payload missing the fixture entity:\n$text")
      assert((r3 \ "result" \ "isError") === JNothing,
        s"search unexpectedly errored:\n$text")

      // unknown method → JSON-RPC -32601
      assert((r4 \ "error" \ "code") === JInt(-32601))
    } finally {
      p.destroyForcibly()
      errFile.delete()
    }
  }
}

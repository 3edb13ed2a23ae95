package graft.rag

import graft.{DiaryFixture, SparkSpec}
import graft.store.Collection
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** E2E over the wire: the reference's `POST /query` contract
  * (`app.py:113-138`) served from a real Collection, probed with the
  * reference's own test question (`tests/test_app_v2.py:98`).
  */
class RagServerSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  override def afterAll(): Unit = server.stop()

  private lazy val server = {
    val root = java.nio.file.Files.createTempDirectory("rag-server").toString
    val c = Collection.create(spark, root, "diary", DiaryFixture.Dim, overwrite = true)
    c.insert(DiaryFixture.windowedCollection(spark))
    // k=20: the property of the hashed-BoW stand-in embedder, not the
    // engine (see EndToEndSpec's §7.4 probe note)
    new RagServer(c, k = 20, dim = DiaryFixture.Dim)
  }
  private lazy val port = server.start(0)
  private lazy val http = HttpClient.newHttpClient()

  private def post(body: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /query answers the reference's currency question with the Crown context") {
    val r = post("""{"question": "What is the currency of Veridia called?"}""")
    assert(r.statusCode() === 200, r.body())
    assert(r.body().contains("\"success\":true"))
    assert(r.body().toLowerCase.contains("veridian crown"),
      s"context missed the answer: ${r.body().take(400)}")
    assert(r.body().contains("\"source_ids\":[\"")) // stringified ids (app.py:77)
  }

  test("POST /query maps a fallback answer to 404 + detail (app.py:131-136)") {
    val r = post("""{"question": "zzzz qqqq xyzzy plugh?"}""")
    assert(r.statusCode() === 404, r.body())
    assert(r.body().contains("\"detail\""))
  }

  test("POST /query without a question field is a 422") {
    val r = post("""{"nope": 1}""")
    assert(r.statusCode() === 422)
  }

  test("escaped JSON in the question round-trips") {
    val r = post("""{"question": "What is the \"currency\" of Veridia called?"}""")
    assert(r.statusCode() === 200, r.body())
  }

  test("signed unicode escapes are rejected as malformed, not wrapped to garbage chars (r11)") {
    // Integer.parseInt(_, 16) accepts a leading sign, so backslash-u-061
    // used to parse to a wrapped char instead of the 422 a real JSON
    // parser gives. (Inputs are concatenated because the Scala 2 lexer
    // itself processes unicode escapes inside string literals.)
    val bsU = "\\" + "u"
    def body(esc: String) = s"""{"question": "x ${bsU}$esc x"}"""
    assert(RagServer.parseQuestion(body("-061")).isEmpty)
    assert(RagServer.parseQuestion(body("+123")).isEmpty)
    assert(RagServer.parseQuestion(body("0041")).contains("x A x"))
  }

  test("concurrent queries are served correctly (Spark driver actions are thread-safe)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val questions = Seq(
      "What is the currency of Veridia called?",
      "zzzz qqqq xyzzy plugh?",
      "What is the currency of Veridia called?",
      "zzzz qqqq xyzzy plugh?")
    val codes = Await.result(
      Future.sequence(questions.map(q => Future {
        post(s"""{"question": ${RagServer.jstr(q)}}""").statusCode()
      })), 2.minutes)
    assert(codes === Seq(200, 404, 200, 404))
  }

  /** Raw-socket SSE read: speaks HTTP/1.1 by hand and decodes the chunked
    * framing itself, so the test observes EXACTLY what crosses the wire —
    * status line, Transfer-Encoding header, and each chunk frame the
    * server's per-event flush produced. Returns (status line, headers,
    * chunk frames). */
  private def rawStream(body: String, onPort: Int = -1): (String, Map[String, String], Vector[String]) = {
    val sock = new java.net.Socket("127.0.0.1", if (onPort > 0) onPort else port)
    try {
      val bytes = body.getBytes("UTF-8")
      val req = s"POST /query/stream HTTP/1.1\r\nHost: 127.0.0.1:$port\r\n" +
        s"Content-Type: application/json\r\nContent-Length: ${bytes.length}\r\n" +
        "Connection: close\r\n\r\n"
      sock.getOutputStream.write(req.getBytes("UTF-8"))
      sock.getOutputStream.write(bytes)
      sock.getOutputStream.flush()
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      def line(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb += c.toChar; c = in.read() }
        sb.toString
      }
      val status = line()
      val headers = Iterator.continually(line()).takeWhile(_.nonEmpty)
        .map { h => val i = h.indexOf(':'); h.take(i).toLowerCase -> h.drop(i + 1).trim }
        .toMap
      val frames = Vector.newBuilder[String]
      if (headers.get("transfer-encoding").exists(_.contains("chunked"))) {
        var size = Integer.parseInt(line().trim.split(";")(0), 16)
        while (size > 0) {
          val buf = new Array[Byte](size)
          in.readFully(buf)
          line() // chunk-data trailing CRLF
          frames += new String(buf, "UTF-8")
          size = Integer.parseInt(line().trim.split(";")(0), 16)
        }
      } else frames += new String(in.readAllBytes(), "UTF-8")
      (status, headers, frames.result())
    } finally sock.close()
  }

  /** Parse `data:` SSE events and extract each delta's content string
    * (the notebook's `_handle_stream_response` + `delta.get('content')`). */
  private def sseContents(frames: Seq[String]): (Vector[String], Boolean) = {
    val events = frames.mkString.split("\n\n").toVector
      .map(_.trim).filter(_.startsWith("data: ")).map(_.drop(6))
    val done = events.lastOption.contains("[DONE]")
    val Content = """\{"choices":\[\{"delta":\{"content":"((?:[^"\\]|\\.)*)"\}\}\]\}""".r
    val contents = events.takeWhile(_ != "[DONE]").map {
      case Content(c) => c.replace("\\\"", "\"").replace("\\n", "\n").replace("\\\\", "\\")
      case other => fail(s"malformed SSE event: $other")
    }
    (contents, done)
  }

  test("POST /query/stream delivers the CoT answer as incremental SSE chunks " +
    "(notebook cell 5 streaming contract)") {
    val (status, headers, frames) =
      rawStream("""{"question": "What is the currency of Veridia called?"}""")
    assert(status.startsWith("HTTP/1.1 200"), status)
    assert(headers.get("transfer-encoding").exists(_.contains("chunked")),
      s"must stream over chunked transfer: $headers")
    assert(headers.get("content-type").exists(_.startsWith("text/event-stream")), headers.toString)
    // per-event flush ⇒ each delta is its own chunk frame: delivery was
    // incremental on the wire, not one buffered write
    assert(frames.size > 2, s"expected one chunk frame per delta, got ${frames.size}")
    val (contents, done) = sseContents(frames)
    assert(done, "stream must terminate with data: [DONE]")
    assert(contents.size > 1, s"expected multiple deltas, got $contents")
    val answer = contents.mkString
    assert(answer.nonEmpty && answer != ExtractiveLlm.Fallback, answer)
  }

  test("POST /query/stream streams a fallback answer instead of 404ing " +
    "(the notebook's streaming path has no error mapping)") {
    val (status, _, frames) = rawStream("""{"question": "zzzz qqqq xyzzy plugh?"}""")
    assert(status.startsWith("HTTP/1.1 200"), status)
    val (contents, done) = sseContents(frames)
    assert(done)
    assert(contents.mkString === ExtractiveLlm.Fallback)
  }

  test("an LLM failure mid-stream surfaces as an SSE error event, not a clean empty 200 (r11)") {
    // the 200 + chunked headers are already on the wire when answerStream
    // runs, so the only honest signal is an in-stream error payload — the
    // producer used to swallow the exception and emit a well-formed
    // zero-delta stream ending in [DONE]
    val root = java.nio.file.Files.createTempDirectory("rag-err").toString
    val c = Collection.create(spark, root, "d2", DiaryFixture.Dim, overwrite = true)
    c.insert(DiaryFixture.windowedCollection(spark))
    val boom = new LlmClient {
      override def answerOrNull(q: String, ctx: Seq[String]): String = "unused"
      override def answerStream(q: String, ctx: Seq[String]): Iterator[String] =
        throw new RuntimeException("upstream 503")
      override def judge(q: String, e: String, pr: String): Double = 0.0
    }
    val srv = new RagServer(c, llm = boom, k = 20, dim = DiaryFixture.Dim)
    val p2 = srv.start(0)
    try {
      val (status, _, frames) =
        rawStream("""{"question": "What is the currency of Veridia called?"}""", p2)
      val all = frames.mkString
      assert(status.startsWith("HTTP/1.1 200"), status)
      assert(all.contains("\"error\"") && all.contains("upstream 503"), all)
      assert(all.contains("[DONE]"), all)
    } finally srv.stop()
  }

  test("POST /query/stream without a question field is a 422, not a stream") {
    val r = http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query/stream"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString("""{"nope": 1}""")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() === 422)
  }

  test("streamed and non-streamed answers agree (deltas reassemble answer())") {
    val q = "What is the currency of Veridia called?"
    val (_, _, frames) = rawStream(s"""{"question": ${RagServer.jstr(q)}}""")
    val (contents, _) = sseContents(frames)
    val whole = post(s"""{"question": ${RagServer.jstr(q)}}""")
    assert(whole.statusCode() === 200)
    // the fixture is fully deterministic: the streamed deltas must
    // reassemble to exactly the response /query returns for the same
    // question (the CoT-widened retrieval lands the same window set here)
    val Resp = """.*"response":"((?:[^"\\]|\\.)*)".*""".r
    val wholeAnswer = whole.body() match {
      case Resp(r) => r.replace("\\\"", "\"").replace("\\n", "\n").replace("\\\\", "\\")
      case b => fail(s"no response field in ${b.take(200)}")
    }
    assert(contents.mkString === wholeAnswer)
  }

  test("GET /health reports healthy") {
    val r = http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() === 200)
    assert(r.body().contains("\"status\":\"healthy\""))
  }

  test("double start() is refused; stop() releases the port for a fresh start()") {
    val p = port // ensure the shared server is up
    val e = intercept[IllegalArgumentException](server.start(0))
    assert(e.getMessage.contains("already running"))
    server.stop()
    // the listener and its pool are gone — the same instance can rebind
    val p2 = server.start(0)
    assert(p2 > 0, s"rebind after stop failed (first port $p)")
    val r = http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p2/health")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() === 200)
  }
}

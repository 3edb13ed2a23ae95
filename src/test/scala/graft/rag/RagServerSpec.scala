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

package graft.store

import graft.SparkSpec
import graft.functions.TextEmbed
import graft.rag.RagServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._

/** The whole store lifecycle in one flow — each operator is spec'd alone
  * elsewhere; this proves they COMPOSE: batched inserts accrete small
  * files, compact folds them, upsert replaces by key, clusterBy lays out
  * ranges, buildIvf trains + repartitions by learned cell, searchIvf
  * probes the trained index, and RagServer serves the same collection
  * over HTTP — with the upserted content visible at every later stage.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("insert batches → compact → upsert → clusterBy → buildIvf → searchIvf → serve") {
    val root = java.nio.file.Files.createTempDirectory("graft-life").toString
    val c = Collection.create(spark, root, "life", TextEmbed.DefaultDim, overwrite = true)

    // three append batches → small-file accretion
    val topics = Seq(
      "spark window aggregation engine", "quick brown fox jumps high",
      "vector cosine search index", "streaming watermark session state",
      "parquet columnar scan pushdown", "broadcast join dimension table")
    topics.zipWithIndex.grouped(2).foreach { g =>
      c.insert(TextEmbed.withEmbed(
        g.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "text", "vector").select("id", "vector", "text"))
    }
    assert(c.df.count() === 6)

    val (before, after) = c.compact()
    assert(after <= before && c.df.count() === 6)

    // replace doc 2 and add doc 10 — the replacement text is the marker
    // every later stage must see
    val marker = "vector cosine search engine rebuilt with minhash dedup"
    val (replaced, inserted) = c.upsert(TextEmbed.withEmbed(
      Seq((2L, marker), (10L, "a completely new late arrival")).toDF("id", "text"),
      "text", "vector").select("id", "vector", "text"))
    assert((replaced, inserted) === ((1L, 1L)))
    assert(c.df.count() === 7)

    assert(c.clusterBy(2, "id") === 2)
    assert(c.df.filter(col("id") === 2L).select("text").head().getString(0) === marker)

    val model = c.buildIvf(nlist = 2, rounds = 2)
    assert(model.cells.length === 2)
    val qv = TextEmbed.embedScala("vector cosine search")
    val hit = c.searchIvf(qv, k = 1, nprobe = 2).select("id", "text").head()
    assert(hit.getLong(0) === 2L, "IVF search must find the upserted doc")
    assert(hit.getString(1) === marker)

    // and the HTTP surface serves the same (rewritten, indexed) collection
    val server = new RagServer(c, k = 3)
    val port = server.start(0)
    try {
      val r = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"question": "vector cosine search"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 200, r.body())
      assert(r.body().contains("minhash dedup"), r.body().take(300))
    } finally server.stop()
  }
}

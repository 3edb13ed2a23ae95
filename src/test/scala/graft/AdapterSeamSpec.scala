package graft

import graft.rag.{ExtractiveLlm, RagPipeline, RecordedLlm}
import graft.store.Collection
import graft.tools.GenEmbedFixture
import graft.vector.{Embedder, ParquetEmbedder}
import org.apache.spark.sql.functions._

/** EndToEndSpec variant for the PRODUCTION adapter seam: proves the
  * Embedder and LlmClient traits accept EXTERNALLY produced artifacts —
  * a checked-in parquet dump of 384-d normalized vectors (the shape the
  * reference's sentence-transformer pipeline writes,
  * `scripts/prepare_data.py:21-22,50-54`) and a recorded chat
  * transcript — with no egress and no reliance on the engine's own
  * TextEmbed/ExtractiveLlm implementations.
  */
class AdapterSeamSpec extends SparkSpec {
  import spark.implicits._

  private val FixturePath =
    new java.io.File("src/test/resources/fixtures/external_embeddings.parquet")
      .getAbsolutePath
  private val Dim = GenEmbedFixture.Dim

  private lazy val fixture = spark.read.parquet(FixturePath).cache()

  test("fixture honors the reference embedding contract: dim 384, L2-normalized") {
    val rows = fixture.select(
      size(col("embedding")).as("d"),
      abs(aggregate(transform(col("embedding"), x => x * x),
        lit(0.0d), (acc, x) => acc + x) - 1.0d).as("normErr")).collect()
    assert(rows.length === GenEmbedFixture.Rows.length)
    rows.foreach { r =>
      assert(r.getAs[Int]("d") === Dim)
      assert(r.getAs[Double]("normErr") < 1e-9)
    }
  }

  test("ParquetEmbedder serves the external vectors verbatim through the Embedder trait") {
    val texts = fixture.select("id", "text")
    val embedded = Embedder.withEmbedding(
      texts, "text", "v", new ParquetEmbedder(FixturePath, Dim))
    val joined = embedded.join(fixture.select(col("id"), col("embedding")), "id")
    // the seam must pass external vectors through untouched — element-exact
    val mismatched = joined.filter(
      size(col("v")) =!= size(col("embedding")) ||
        exists(zip_with(col("v"), col("embedding"), (a, b) => a =!= b), x => x)).count()
    assert(mismatched === 0L)
  }

  test("retrieval over external vectors: every query's top hit shares its topic") {
    val root = java.nio.file.Files.createTempDirectory("seam").toString
    val c = Collection.create(spark, root, "external", Dim, overwrite = true)
    c.insert(fixture.filter(col("role") === "doc")
      .select(col("id"), col("embedding").as("vector"), col("text")))
    assert(c.describe().dim === Dim)
    val topicOf = fixture.filter(col("role") === "doc")
      .select("id", "topic").as[(Long, Int)].collect().toMap
    val queries = fixture.filter(col("role") === "query")
      .select("topic", "embedding").as[(Int, Seq[Double])].collect()
    assert(queries.length === 5)
    queries.foreach { case (topic, qv) =>
      val top = c.search(qv.toArray, k = 3).select("id").as[Long].collect()
      assert(top.nonEmpty)
      assert(topicOf(top.head) === topic,
        s"query topic $topic retrieved doc ${top.head} of topic ${topicOf(top.head)}")
    }
  }

  test("RecordedLlm replays an external transcript through the LlmClient seam") {
    val questions = Seq(
      (0L, "What happened at the power plant after the coolant failure?"),
      (1L, "How do I get a good crust when baking bread?"))
      .toDF("qid", "question")
    val recording = Map(
      "What happened at the power plant after the coolant failure?" ->
        "The reactor stabilized once the coolant pumps restarted and generation resumed.",
      "How do I get a good crust when baking bread?" ->
        "Bake at high heat with steam injected during the first minutes.")
    // collection embedded with the ENGINE's embedder (retrieval context);
    // the assertion is about the answer text, which must be the external
    // recording verbatim — not anything the engine extracted
    val docs = fixture.filter(col("role") === "doc").select(col("id"), col("text"))
    val coll = graft.functions.TextEmbed.withEmbed(docs, "text", "vector", 64)
      .select(col("id"), col("vector"), col("text"))
    val out = RagPipeline.answerBatch(questions, coll, k = 3, dim = 64,
      llm = new RecordedLlm(recording)).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[String]("answer") === recording(r.getAs[String]("question")))
      assert(r.getAs[Boolean]("success"))
    }
    // unrecorded question → the reference's exact fallback string
    val miss = new RecordedLlm(recording).answer("Unseen question?", Seq("ctx"))
    assert(miss === ExtractiveLlm.Fallback)
  }
}

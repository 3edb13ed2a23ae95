package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** One-shot generator for the checked-in external-embedding fixture
  * (`src/test/resources/fixtures/external_embeddings.parquet`) that
  * `AdapterSeamSpec` loads through `ParquetEmbedder`.
  *
  * The fixture simulates a sentence-transformer dump — the text+vector
  * table the reference's `scripts/prepare_data.py:21-22,50-54` produces
  * (dim 384, normalize_embeddings=True): vectors are NOT derived from the
  * engine's TextEmbed in any way. Geometry mimics a real model's: each
  * text's vector is its topic's seeded Gaussian base plus text-keyed
  * Gaussian noise, L2-normalized — so same-topic texts are mutually
  * nearer than cross-topic ones and retrieval over the fixture is
  * semantically assertable.
  *
  * Run once, commit the single-file output:
  *   sbt 'runMain graft.tools.GenEmbedFixture'
  */
object GenEmbedFixture {

  val Dim = 384
  /** (topic, role, text): 4 docs + 1 query per topic. */
  val Rows: Seq[(Int, String, String)] = Seq(
    (0, "doc", "The reactor core temperature stabilized after the coolant pumps restarted."),
    (0, "doc", "Engineers inspected the turbine hall for vibration damage."),
    (0, "doc", "The power plant returned to full generation capacity by Friday."),
    (0, "doc", "Grid operators rerouted electricity during the maintenance window."),
    (0, "query", "What happened at the power plant after the coolant failure?"),
    (1, "doc", "The sourdough starter doubled in volume overnight at room temperature."),
    (1, "doc", "Knead the dough until the gluten develops a smooth elastic sheen."),
    (1, "doc", "Bake the loaf at high heat with steam for a crisp crust."),
    (1, "doc", "Proofing baskets keep the shaped dough from spreading sideways."),
    (1, "query", "How do I get a good crust when baking bread?"),
    (2, "doc", "The striker curled the free kick over the wall into the top corner."),
    (2, "doc", "Midfield pressing forced three turnovers in the first half."),
    (2, "doc", "The goalkeeper saved two penalties in the shootout."),
    (2, "doc", "A late substitution changed the rhythm of the attack."),
    (2, "query", "Who scored from the free kick in the match?"),
    (3, "doc", "Glaciers carved the valley into its characteristic U-shape."),
    (3, "doc", "Moraine deposits mark the glacier's furthest historical advance."),
    (3, "doc", "Meltwater streams braid across the outwash plain each summer."),
    (3, "doc", "Ice cores preserve a layered record of ancient climate."),
    (3, "query", "How did the glacier shape the valley?"),
    (4, "doc", "The violin section carried the melody through the second movement."),
    (4, "doc", "The conductor slowed the tempo before the final crescendo."),
    (4, "doc", "Brass fanfares opened the symphony's triumphant finale."),
    (4, "doc", "The hall's acoustics favored the woodwinds in quiet passages."),
    (4, "query", "How did the orchestra handle the final crescendo?"))

  /** Topic base + text-keyed noise, L2-normalized. Deliberately NOT the
    * engine's hashing embedder — the point of the fixture is vectors the
    * engine did not produce. */
  def vector(topic: Int, text: String): Array[Double] = {
    val base = new scala.util.Random(7700 + topic)
    val b = Array.fill(Dim)(base.nextGaussian())
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val noise = new scala.util.Random(java.nio.ByteBuffer.wrap(md).getLong)
    val v = b.map(_ + 0.55 * noise.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("gen-embed-fixture").master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val rows = Rows.zipWithIndex.map { case ((topic, role, text), i) =>
      (i.toLong, topic, role, text, vector(topic, text).toSeq)
    }
    val tmp = java.nio.file.Files.createTempDirectory("embfix").toString
    rows.toDF("id", "topic", "role", "text", "embedding")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val out = java.nio.file.Paths.get(
      "src/test/resources/fixtures/external_embeddings.parquet")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.copy(part, out,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $out (${java.nio.file.Files.size(out)} bytes)")
    spark.stop()
  }
}

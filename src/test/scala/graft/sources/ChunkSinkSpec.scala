package graft.sources

import graft.SparkSpec
import graft.ingest.Chunkers
import org.apache.spark.sql.functions._

class ChunkSinkSpec extends SparkSpec {
  import spark.implicits._

  private val header1 = "1st Day of Frostfall 1855 - Arrival"
  private val header2 = "2nd Day of Frostfall 1855 - Market"

  private def chunks = {
    val text = s"$header1\nline a\nline b\n$header2\nline c"
    Chunkers.threeBreakChunks(Chunkers.lines(Seq((0L, text)).toDF("doc_id", "text")))
  }

  test("S10: diary JSON sink reproduces the reference's {metadata, chunks} shape") {
    val path = java.nio.file.Files.createTempDirectory("sink").toString + "/chunks.json"
    ChunkSink.writeDiaryJson(chunks, path)
    // F11 round-trip: read back with from_json-style parsing
    val back = spark.read.option("multiLine", true).json(path)
    val meta = back.select("metadata.total_days", "metadata.total_chunks",
      "metadata.avg_chunks_per_day").head()
    assert(meta.getLong(0) === 2)
    assert(meta.getLong(1) === 4) // 2 headers + 2 body chunks
    assert(meta.getDouble(2) === 2.0)
    val n = back.select(explode(col("chunks"))).count()
    assert(n === 4)
  }

  test("metadata block matches A1-A4 aggregation semantics") {
    val m = ChunkSink.metadata(chunks).head()
    val perDay = m.getAs[Map[String, Long]]("chunks_per_day")
    assert(perDay.values.sum === m.getAs[Long]("total_chunks"))
    assert(perDay.size === m.getAs[Long]("total_days"))
  }

  test("scalable JSONL path writes and reads back") {
    val dir = java.nio.file.Files.createTempDirectory("sinkl").toString + "/out"
    ChunkSink.writeJsonl(chunks, dir)
    assert(spark.read.json(dir).count() === 4)
  }
}

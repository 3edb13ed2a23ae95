package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-fixture replay against the reference's committed chunker outputs
  * (SURVEY.md §5.2). The diary PDF is a missing blob; the line fixture
  * `tests/diary_line_chunks.json` carries every extracted line and is the
  * source of truth. Our window-based chunkers must reproduce the
  * reference's imperative loop outputs exactly.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val ref = "/root/reference/tests"

  private lazy val lineDf = {
    val raw = spark.read.option("multiLine", true).json(s"$ref/diary_line_chunks.json")
    raw.select(explode(col("chunks")).as("c"))
      .select(
        lit(0L).as("doc_id"),
        col("c.line_number").cast("long").as("line_no"),
        col("c.line_text").as("line"),
        col("c.date").as("ref_date"),
        col("c.is_date_line").as("ref_is_header"))
  }

  test("W1 parity: header detection matches is_date_line on all 2,227 lines") {
    val df = lineDf.withColumn("got", Chunkers.isHeader(col("line")))
    assert(df.count() === 2227)
    val mismatches = df.filter(col("got") =!= col("ref_is_header")).count()
    assert(mismatches === 0)
  }

  test("W2 parity: date fill-down matches the fixture's date column") {
    val got = Chunkers.fillDownDate(lineDf)
    val mismatches = got.filter(col("date") =!= col("ref_date")).count()
    assert(mismatches === 0)
    assert(got.select(countDistinct(col("date"))).head().getLong(0) === 123)
  }

  test("W3/W9 parity: 3-break chunker reproduces diary_chunks_3breaks.json exactly") {
    val fixture = spark.read.option("multiLine", true).json(s"$ref/diary_chunks_3breaks.json")
      .select(explode(col("chunks")).as("c"))
      .select(
        col("c.chunk_number").cast("long").as("chunk_number"),
        col("c.chunk_text").as("ref_text"),
        col("c.date").as("ref_date"),
        col("c.day_metadata.title").as("ref_title"),
        col("c.line_count").cast("int").as("ref_line_count"),
        col("c.word_count").cast("int").as("ref_word_count"))
    val got = Chunkers.threeBreakChunks(lineDf)
    assert(got.count() === 872)
    val joined = got.join(fixture, Seq("chunk_number"), "full_outer")
    val badText = joined.filter(col("chunk_text") =!= col("ref_text") ||
      col("chunk_text").isNull || col("ref_text").isNull).count()
    assert(badText === 0, "chunk_text parity")
    val badDate = joined.filter(col("date") =!= col("ref_date")).count()
    assert(badDate === 0, "date parity")
    val badTitle = joined.filter(col("header.title") =!= col("ref_title")).count()
    assert(badTitle === 0, "title parity")
    val badCounts = joined.filter(
      col("line_count") =!= col("ref_line_count") ||
      col("word_count") =!= col("ref_word_count")).count()
    assert(badCounts === 0, "line/word count parity")
  }

  test("F2 parity: v3 chunker's palavras_maiusculas matches diary_chunks_3breaks_v2.json") {
    val fixture = spark.read.option("multiLine", true).json(s"$ref/diary_chunks_3breaks_v2.json")
      .select(explode(col("chunks")).as("c"))
      .select(
        col("c.chunk_number").cast("long").as("chunk_number"),
        col("c.day_metadata.palavras_maiusculas").as("ref_palavras"))
    val got = Chunkers.threeBreakChunksV3(lineDf)
      .select(col("chunk_number"), col("palavras_maiusculas"))
    val joined = got.join(fixture, Seq("chunk_number"))
    assert(joined.count() === 872)
    val bad = joined.filter(
      col("palavras_maiusculas") =!= col("ref_palavras")).count()
    assert(bad === 0, "palavras parity")
  }

  test("A3/A4 parity: chunks-per-day aggregation matches fixture metadata") {
    val got = Chunkers.threeBreakChunks(lineDf)
    val perDay = got.groupBy("date").count()
    assert(perDay.count() === 123)
    val avg = got.count().toDouble / perDay.count()
    assert(math.abs(avg - 7.0894308943089435) < 1e-9)
  }
}

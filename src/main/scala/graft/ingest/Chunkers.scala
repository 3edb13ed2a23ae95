package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diary chunking operators (SURVEY.md §2.6 W1-W9).
  *
  * The reference's chunkers are imperative line loops
  * (`src/chunking_strategy.py:60-136`, `src/archive/chunking_strategy.py:
  * 29-54`); here they are window functions over (doc_id, line_no) — the
  * fill-down + grouped-assembly shape that distributes: the only shuffle
  * is the window partition by doc_id, and inside a document ordering is
  * total via line_no. `collect_list` is never trusted for order — chunks
  * assemble via sort_array(collect_list(struct(line_no, ...))) (SURVEY.md
  * §7.5 order-sensitivity note).
  */
object Chunkers {

  /** W1/F1: diary date-header grammar
    * (`src/chunking_strategy.py:46-48`): e.g.
    * "7th Day of Emberglow 1855 - Visions of the Dawnspire".
    */
  val HeaderPattern = "^(\\d{1,2})(?:st|nd|rd|th)? Day of ([A-Za-z]+) (18\\d{2}) - (.+)$"

  def isHeader(line: Column): Column = line.rlike(HeaderPattern)

  /** Python str.strip() twin: removes ALL leading/trailing whitespace
    * (\r, \t, unicode spaces), where Spark's trim() strips only 0x20 —
    * the gap that made CRLF blank lines ("\r") count as body lines
    * (r11 review). */
  private def pstrip(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** Parse header into a struct (day INT, month STRING, year INT, title STRING). */
  def parseHeader(line: Column): Column = struct(
    regexp_extract(line, HeaderPattern, 1).cast("int").as("day"),
    regexp_extract(line, HeaderPattern, 2).as("month"),
    regexp_extract(line, HeaderPattern, 3).cast("int").as("year"),
    regexp_extract(line, HeaderPattern, 4).as("title"))

  /** Segment a (doc_id, text) DataFrame into (doc_id, line_no, line) rows. */
  def lines(docs: DataFrame, textCol: String = "text", docIdCol: String = "doc_id"): DataFrame =
    docs.select(col(docIdCol).as("doc_id"), posexplode(split(col(textCol), "\n")))
      .withColumnRenamed("pos", "line_no")
      .withColumnRenamed("col", "line")

  /** W2: fill-down the most recent date header onto every line
    * ("current_date carried through the loop",
    * `src/chunking_strategy.py:60-109`). Adds is_header, date, title.
    */
  def fillDownDate(lineDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("line_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineDf
      .withColumn("is_header", isHeader(col("line")))
      .withColumn("date", last(when(col("is_header"), pstrip(col("line"))), ignoreNulls = true).over(w))
      .withColumn("header", last(when(col("is_header"), parseHeader(col("line"))), ignoreNulls = true).over(w))
      // POSITIONAL day group: the reference's sequential loop cuts at
      // every header occurrence, so a header line that recurs verbatim
      // later must start a NEW group — keying groups on the date STRING
      // merged the two entries (r11 review). The running header count is
      // 1:1 with the date string on well-formed diaries (identical
      // output on the golden fixtures) and positional on adversarial ones.
      .withColumn("day_grp",
        sum(col("is_header").cast("int")).over(w))
  }

  /** W4 (the ACTIVE strategy, `src/archive/chunking_strategy.py:29-54`,
    * imported by the live pipeline `scripts/prepare_data.py:13,45-48`):
    * per day, join the day's lines (header first) and split on blank
    * lines into paragraph chunks; trim; drop empties.
    */
  def dayParagraphChunks(lineDf: DataFrame): DataFrame = {
    val withDate = fillDownDate(lineDf).filter(col("date").isNotNull)
    withDate
      .groupBy(col("doc_id"), col("day_grp"))
      .agg(
        first(col("date")).as("date"),
        first(col("header")).as("header"),
        array_join(transform(
          sort_array(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line")), "\n").as("day_text"),
        min(col("line_no")).as("day_start"))
      .select(col("doc_id"), col("date"), col("header"), col("day_start"),
        posexplode(split(col("day_text"), "\n\\s*\n")))
      .withColumnRenamed("pos", "para_idx")
      .withColumn("chunk_text", pstrip(col("col")))
      .filter(length(col("chunk_text")) > 0)
      // para_idx keeps the paragraph's position inside its day, so numbering
      // follows document order (day_start is unique per day within a doc)
      .withColumn("chunk_number",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("day_start"), col("para_idx"))) - 1)
      .select(col("doc_id"), col("chunk_number"), col("chunk_text"), col("date"),
        col("header"),
        size(split(col("chunk_text"), "\n")).as("line_count"),
        wordCount(col("chunk_text")).as("word_count"))
  }

  /** W3+W9 (3-break strategy, `src/chunking_strategy.py:60-136`): each
    * date header is emitted as its own chunk (is_date_chunk=true); body
    * lines are buffered and cut every `breakEvery` non-empty lines and at
    * each day boundary (remainder flushed).
    */
  def threeBreakChunks(lineDf: DataFrame, breakEvery: Int = 3): DataFrame = {
    val withDate = fillDownDate(lineDf).filter(col("date").isNotNull)
    // rlike(\S) = Python `line.strip()` truthiness: a line of only \r or
    // \t is BLANK (trim() strips only spaces, so CRLF blank lines used
    // to count as body lines; r11 review)
    val sig = withDate
      .filter(col("line").rlike("\\S"))
    // significant (non-empty, non-header) lines get a within-day ordinal
    val wDay = Window.partitionBy(col("doc_id"), col("day_grp")).orderBy(col("line_no"))
    val body = sig.filter(!col("is_header"))
      .withColumn("rn", row_number().over(wDay) - 1)
      .withColumn("grp", floor(col("rn") / breakEvery))
      .groupBy(col("doc_id"), col("day_grp"), col("grp"))
      .agg(
        first(col("date")).as("date"),
        first(col("header")).as("header"),
        array_join(transform(
          sort_array(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line")), "\n").as("chunk_text"),
        count(lit(1)).cast("int").as("line_count"),
        min(col("line_no")).as("ord"))
      .withColumn("is_date_chunk", lit(false))
    val headers = sig.filter(col("is_header"))
      .select(col("doc_id"), col("date"), lit(-1L).as("grp"), col("header"),
        pstrip(col("line")).as("chunk_text"), lit(1).as("line_count"),
        col("line_no").as("ord"))
      .withColumn("is_date_chunk", lit(true))
    headers.unionByName(body, allowMissingColumns = true)
      .withColumn("chunk_number",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("ord"), col("grp"))) - 1)
      .withColumn("word_count", wordCount(col("chunk_text")))
      .select(col("doc_id"), col("chunk_number"), col("chunk_text"), col("date"),
        col("header"), col("line_count"), col("word_count"), col("is_date_chunk"))
  }

  /** F2 (v3 chunker metadata, `src/archive/chunking_strategy_v3.py:60,94`):
    * capitalized words in appearance order. NOTE the reference's v2
    * fixture metadata claims 873 chunks but its chunk array holds 872 —
    * the chunk set is identical to v1; only this metadata column differs.
    */
  def palavrasMaiusculas(text: Column): Column =
    regexp_extract_all(text, lit("\\b[A-Z]\\w*\\b"), lit(0))

  /** v3 chunker: 3-break chunks + capitalized-word metadata. */
  def threeBreakChunksV3(lineDf: DataFrame, breakEvery: Int = 3): DataFrame =
    threeBreakChunks(lineDf, breakEvery)
      .withColumn("palavras_maiusculas", palavrasMaiusculas(col("chunk_text")))

  /** Python len(text.split()) twin: 0 for blank/whitespace-only text,
    * and leading/trailing whitespace never mints a phantom empty token
    * (size(split(" a b", "\\s+")) counts 3; Python counts 2 —
    * r11 review). */
  def wordCount(text: Column): Column =
    when(text.rlike("\\S"), size(split(pstrip(text), "\\s+"))).otherwise(0)

  /** W5 (`split_large_chunk`, `src/archive/chunking_strategy.py:4-16`):
    * chunks over maxSize are cut at the last '.' before the limit, else
    * the last space, else hard cut — repeatedly. Deterministic scalar →
    * a Scala UDF returning ARRAY<STRING>.
    */
  def splitLargeChunk(text: String, maxSize: Int = 800): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var rest = text
    while (rest.length > maxSize) {
      val window = rest.substring(0, maxSize)
      val cut = {
        val dot = window.lastIndexOf('.')
        if (dot > 0) dot + 1
        else {
          val sp = window.lastIndexOf(' ')
          if (sp > 0) sp else maxSize
        }
      }
      out += rest.substring(0, cut).trim
      rest = rest.substring(cut).trim
    }
    if (rest.nonEmpty) out += rest
    out.toSeq
  }

  val splitLargeChunkUdf = udf((text: String, maxSize: Int) => splitLargeChunk(text, maxSize))

  /** P8 + W5: route oversize chunks through the splitter, explode back. */
  def explodeOversize(chunks: DataFrame, maxSize: Int = 800): DataFrame =
    chunks
      .withColumn("pieces",
        when(length(col("chunk_text")) > maxSize,
          splitLargeChunkUdf(col("chunk_text"), lit(maxSize)))
          .otherwise(array(col("chunk_text"))))
      // posexplode: split pieces inherit the PARENT chunk_number, so
      // piece_idx is the only thing standing between a downstream
      // orderBy(chunk_number) and nondeterministic piece order (r11)
      .select(col("*"), posexplode(col("pieces")).as(Seq("piece_idx", "piece")))
      .drop("pieces", "chunk_text")
      .withColumnRenamed("piece", "chunk_text")

  /** W6: fixed-size character chunking (`text[i:i+size]` strides,
    * `src/groq_cot_batch_agents.ipynb` cell 1).
    */
  def fixedCharChunks(docs: DataFrame, size: Int = 800,
                      textCol: String = "text", docIdCol: String = "doc_id"): DataFrame =
    docs.select(col(docIdCol).as("doc_id"),
        // (?s): '.' must cross newlines or chunking silently stops at the
        // first window containing one — everything after came back as a
        // single unbounded chunk (r11 review; the reference is a plain
        // character slice)
        posexplode(split(col(textCol), s"(?s)(?<=\\G.{$size})")))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_text")
      .filter(length(col("chunk_text")) > 0)
}

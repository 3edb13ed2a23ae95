package graft.model

/** Typed data model (SURVEY.md §1) — the case-class surface for
  * Dataset[T] pipelines. Mirrors the reference's three schema layers:
  * the chunk processing record (`src/chunking_strategy.py:123-136`),
  * the entity row (`scripts/prepare_data.py:79-90` minimal /
  * `src/archive/new_milvus_schema.py:3-80` rich), and the API
  * request/response pair (`app.py:26-33`).
  */
/** The one JSON string-literal escaper (backslash, quote, and ALL control
  * chars < 0x20) — shared by Verify's oracle dump and RagServer's
  * responses so the table can't drift between writers.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

final case class DayMeta(
    full_date: String,
    title: String,
    palavras_maiusculas: Option[Seq[String]] = None)

final case class Chunk(
    chunk_number: Int,
    chunk_text: String,
    date: String,
    day_metadata: DayMeta,
    line_count: Int,
    word_count: Int,
    is_date_chunk: Boolean)

/** Minimal active entity (`scripts/prepare_data.py:79-90`). */
final case class Entity(
    id: Long,
    vector: Seq[Float],
    text: String)

/** Rich designed entity (`src/archive/new_milvus_schema.py:3-80`).
  * word_count/line_count widened to Int — the reference's INT16 is an
  * overflow risk it documents itself (SURVEY.md §1.1b).
  */
final case class RichEntity(
    entry_id: String,
    content_vector: Seq[Float],
    content_text: String,
    entry_date: String,
    entry_title: String,
    day_number: Short,
    month: String,
    year: Short,
    paragraph_number: Short,
    word_count: Int,
    line_count: Int,
    is_date_entry: Boolean)

final case class QaPair(qa_id: Long, question: String, expected_answer: String)

/** `QueryRequest`/`QueryResponse` (`app.py:26-33`); source_ids are
  * stringified ints per `app.py:77`. */
final case class QueryRequest(question: String)
final case class QueryResponse(
    response: String,
    context: Seq[String],
    source_ids: Seq[String],
    success: Boolean)

final case class EvalRecord(
    question: String,
    expected_answer: String,
    predicted_answer: String,
    grade: Double)

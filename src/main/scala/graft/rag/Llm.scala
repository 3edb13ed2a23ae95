package graft.rag

/** Pluggable LLM boundary (SURVEY.md §2.8 L1-L2).
  *
  * The reference calls Groq's chat-completions REST API
  * (`src/groq_proxy.py:44-75` answer, `:17-42` judge). This build is
  * zero-egress, so the trait ships with a deterministic extractive
  * implementation that preserves the reference's I/O contract — most
  * importantly the exact fallback string
  * (`src/groq_proxy.py:56`) and the "Grade (0-1)" judge output shape
  * (`scripts/eval.py:105-113`).
  */
trait LlmClient extends Serializable {
  def answer(question: String, context: Seq[String]): String
  /** Returns a grade in [0, 1]. */
  def judge(question: String, expected: String, predicted: String): Double
}

/** Deterministic, offline extractive stand-in.
  *
  * answer: the context window (120-token span) with maximal question-token
  * overlap; no overlap at all → the reference's verbatim fallback string.
  * judge: token-level F1 between expected and predicted, rounded to 2 dp
  * (a deterministic proxy for the LLM judge's 0-1 grade).
  */
object ExtractiveLlm extends LlmClient {
  val Fallback = "Could not find relevant data within the document"

  private def toks(s: String): Array[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  override def answer(question: String, context: Seq[String]): String = {
    val q = toks(question).toSet
    if (q.isEmpty || context.isEmpty) return Fallback
    // short overlapping windows: the densest 24-token span is the answer
    // (tight spans keep judge precision meaningful; a page-sized span
    // "contains" every answer and scores near zero)
    val spans = context.flatMap { c =>
      val t = toks(c)
      if (t.isEmpty) Nil
      else t.sliding(24, 12).map(_.toArray).toSeq
    }
    if (spans.isEmpty) return Fallback
    val best = spans.maxBy(span => (span.count(q.contains), -span.length))
    if (best.count(q.contains) == 0) Fallback else best.mkString(" ")
  }

  override def judge(question: String, expected: String, predicted: String): Double = {
    val e = toks(expected).toSet
    val p = toks(predicted).toSet
    if (e.isEmpty || p.isEmpty) return 0.0
    val inter = e.intersect(p).size.toDouble
    if (inter == 0) return 0.0
    val prec = inter / p.size
    val rec = inter / e.size
    math.rint(200.0 * prec * rec / (prec + rec)) / 100.0
  }
}

package graft

import java.nio.file.Files
import graft.rag.ExtractiveLlm

/** q154_rag_answer_audit — the oracle-checked companion that closes q41's
  * `no_oracle` gap (r18 verdict #4, the q148 method). The query's claim
  * is that answerBatch's SQL-expressible envelope — retrieval ids,
  * n_context, and the fallback flag — can be re-derived without the
  * extractive answer text, because ExtractiveLlm falls back IFF no
  * context token survives into the effective question-term set. This
  * spec proves that equivalence on a corpus engineered to stress it:
  * one question whose content terms exist in no document (fallback with
  * a FULL context window — retrieval always returns k docs), two whose
  * terms do, and docs sharing only STOPWORDS with the fallback question
  * (raw-token overlap without content overlap must still read
  * success=0). Every emitted flag re-derives from a driver-side
  * replication of the oracle's arithmetic, and the envelope agrees with
  * q41's actual answer-string-derived output row for row.
  */
class RagAnswerAuditSpec extends SparkSpec {

  // avoids every content term of q1 ("hash agg row scan slow fast
  // table") while carrying q0's and q2's; "the ... of ... in" are Stop
  // words shared with nothing (stopword-only overlap must not flip the
  // flag)
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("q154").toFile.getAbsolutePath
    val rows = (0L until 8L).map { i =>
      val body =
        if (i < 4) "spark batch window join customer value"
        else "stream filter merge sort order group"
      (i, s"$body the of in doc$i filler${i}a filler${i}b", s"src${i % 2}")
    }
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def toksOf(s: String): Set[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet

  test("q154: fallback flag re-derives from the oracle's overlap arithmetic; envelope matches q41") {
    val docText = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("q154_rag_answer_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L))
    // retrieval always fills the window — even the fallback question
    // carries k=3 context docs (cosine ranks the corpus regardless of
    // overlap), so success is NOT derivable from n_context alone
    out.foreach { case (qid, srcIds, nCtx, _) =>
      assert(nCtx === 3L, s"qid $qid: n_context $nCtx")
      assert(srcIds.split(",").length === 3, s"qid $qid: src_ids '$srcIds'")
    }

    // q1's content terms exist in no doc → fallback despite full context
    // and despite stopword-only raw overlap; q0/q2 terms exist → success
    val flags = out.map(t => t._1 -> t._4).toMap
    assert(flags === Map(0L -> 1L, 1L -> 0L, 2L -> 1L))

    // the oracle's arithmetic, replicated driver-side over the REAL
    // retrieved ids: success ⇔ some retrieved doc token is in the
    // effective question-term set (content terms after Stop, all terms
    // when filtering empties the set)
    val questions = Map(
      0L -> "spark batch window join customer value",
      1L -> "hash agg row scan slow fast table",
      2L -> "stream filter merge sort order group")
    out.foreach { case (qid, srcIds, nCtx, success) =>
      val all = toksOf(questions(qid))
      val content = all -- ExtractiveLlm.Stop
      val qset = if (content.nonEmpty) content else all
      val ctxToks = srcIds.split(",").filter(_.nonEmpty)
        .flatMap(id => toksOf(docText(id.toLong))).toSet
      val expected = if (nCtx > 0 && ctxToks.intersect(qset).nonEmpty) 1L else 0L
      assert(success === expected,
        s"qid $qid: flag $success != overlap re-derivation $expected")
    }

    // row-for-row agreement with q41's answer-string-derived envelope —
    // the two queries run the same answerBatch; this pins that q154's
    // projection didn't drift from what q41 actually reports
    val q41 = SparkEntry.queries("q41_rag_answer")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(3).toLong, if (r.getBoolean(4)) 1L else 0L)).toMap
    out.foreach { case (qid, _, nCtx, success) =>
      assert(q41(qid) === ((nCtx, success)), s"qid $qid: q41/q154 envelope drift")
    }
  }

  test("hostile corpus: a document equal to the fallback string is a SUCCESS, not a fallback (r19 advice sentinel)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // The hostile case the r19 advice named: ExtractiveLlm extracts the
    // best-overlap sentence; when that sentence IS the fallback literal,
    // text-compared success would read false while the oracle's overlap
    // arithmetic derives true — a spurious cross-engine mismatch. The
    // sentinel (answerOrNull) makes success report what the client DID.
    val d = Files.createTempDirectory("q154-hostile").toFile.getAbsolutePath
    (0L until 4L).map { i =>
      val text =
        if (i == 0L) ExtractiveLlm.Fallback // overlaps q "find relevant data document"
        else s"unrelated filler${i}a filler${i}b filler${i}c"
      (i, text, s"src${i % 2}")
    }.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val questions = Seq((0L, "find relevant data within the document"))
      .toDF("qid", "question")
    val collection = graft.functions.TextEmbed
      .withEmbed(spark.read.parquet(s"$d/documents.parquet"), "text", "vector")
      .select(col("doc_id").as("id"), col("text"), col("vector"))
    val row = graft.rag.RagPipeline.answerBatch(questions, collection, k = 3)
      .collect().head
    assert(row.getString(row.fieldIndex("answer")) === ExtractiveLlm.Fallback,
      "the extracted sentence IS the fallback text")
    assert(row.getBoolean(row.fieldIndex("success")),
      "success must read the sentinel (extraction happened), not answer-text equality")
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.rag.ExtractiveLlm

/** q148_rag_eval_audit — the oracle-checked companion that closes q42's
  * `no_oracle` gap (r17 verdict #6). The query must (a) run the REAL
  * hybrid-retrieval machinery (its ranks match an independent
  * expectation on a constructed corpus) and (b) grade through the REAL
  * ExtractiveLlm.judge — every emitted grade re-derives bit-exactly from
  * a direct driver-side judge() call on the same (question, expected,
  * retrieved-text) triple.
  */
class RagEvalAuditSpec extends SparkSpec {

  private def corpus(): String = {
    val dir = Files.createTempDirectory("q148").toFile.getAbsolutePath
    import spark.implicits._
    // 10 docs, distinctive vocabularies so self-retrieval is unambiguous;
    // doc 3's opening repeats inside its body so its grade is nonzero
    val rows = (0L until 10L).map { i =>
      val words = (0 until 30).map(j => s"tok${i}x${j % 17}")
      (i, s"alpha$i beta$i " + words.mkString(" ") + s" alpha$i beta$i closing$i", s"src${i % 2}")
    }
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q148: ranks are self-retrieving and every grade equals a direct ExtractiveLlm.judge call") {
    val dir = corpus()
    val out = SparkEntry.queries("q148_rag_eval_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // 8 qids (doc_id < 8), k = 3 ranks each
    assert(out.map(_._1).distinct.sorted.toSeq === (0L until 8L))
    assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L)))

    // the question is a verbatim snippet of its own doc — rank 1 must be
    // the source doc on this distinctive-vocabulary corpus
    out.filter(_._2 == 1L).foreach { case (qid, _, docId, _) =>
      assert(docId === qid, s"qid $qid: rank-1 doc was $docId, not the source doc")
    }

    // grade parity with the real judge, re-derived outside the query
    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qa = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 8)
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 3, 8)).as("question"),
        substring(col("text"), 1, 120).as("expected_answer"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    out.foreach { case (qid, rnk, docId, grade) =>
      val (question, expected) = qa(qid)
      val direct = ExtractiveLlm.judge(question, expected, docsDf(docId))
      assert(grade === direct,
        s"qid $qid rnk $rnk: query grade $grade != direct judge $direct")
    }

    // the grades are discriminative, not a constant: the self-retrieved
    // doc contains its own opening, so rank 1 grades strictly above 0
    out.filter(_._2 == 1L).foreach { case (qid, _, _, grade) =>
      assert(grade > 0.0, s"qid $qid: self-retrieved doc graded 0")
    }
  }
}

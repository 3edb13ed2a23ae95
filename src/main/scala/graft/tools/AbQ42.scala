package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextEmbed
import graft.rag.RagPipeline

/** Scratch A/B harness for q42_rag_eval's sf1 cost (verdict r11 #6).
  *
  * q40 proves the corpus embed pass alone is ~0.34 s at sf1, yet q42
  * measures ~4.5-5.4 s — this tool attributes the gap between the
  * retrieval legs (cosine, BM25, fused hybrid), the collection
  * join-back, and the two LLM mapPartitions passes.
  *
  * `sbt 'runMain graft.tools.AbQ42 /root/repo/testdata-sf1 3'`
  */
object AbQ42 {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("ab-q42").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[q42] $name: $dt%.2f s")
      dt
    }

    def docs: DataFrame = graft.Par(spark.read.parquet(s"$dir/documents.parquet"))
    def collection: DataFrame = TextEmbed.withEmbed(docs, "text", "vector")
      .select(col("doc_id").as("id"), col("text"), col("vector"))
    def qa: DataFrame = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(col("text"), " "), 3, 8)).as("question"),
        substring(col("text"), 1, 120).as("expected_answer"))
    def questions: DataFrame =
      TextEmbed.withEmbed(qa.select(col("qid"), col("question")), "question", "qv")

    // pair mode (r15 verdict #1): the kernel unification (82dea69) was
    // waived an interleaved A/B on a byte-identical-plan claim, and q42
    // then moved +22%/+27% in the committed two-scale artifacts. This
    // interleaves the PRE-82dea69 bm25All (verbatim below: inline
    // scoring, un-capped .as[(Long,String)].collect() term list) against
    // the registered kernel-backed bm25All on the same collection —
    // bm25All is the ONLY q42 subtree that commit touched, so a
    // warm-identical pair verifies the claim; a gap names the cause.
    if (args.drop(2).headOption.contains("pair")) {
      def oldBm25All(questions: DataFrame, collection: DataFrame, k: Int): DataFrame = {
        import spark.implicits._
        import org.apache.spark.sql.expressions.Window
        import graft.functions.TextOps
        val toks = collection.select(col("id"),
            coalesce(TextOps.tokens(col("text")), array().cast("array<string>")).as("toks"))
          .withColumn("dl", size(col("toks")).cast("double"))
        val st = toks.agg(count(lit(1)).cast("double").as("n"),
          (sum(col("dl")) / count(lit(1))).as("avgdl"))
        val qtermRows = questions
          .select(col("qid"), explode(TextOps.tokens(col("question"))).as("term"))
          .distinct().as[(Long, String)].collect()
        val termList = qtermRows.map(_._2).distinct.toSeq
        val qterms = broadcast(qtermRows.toSeq.toDF("qid", "term"))
        val tf = toks.select(col("id"), col("dl"),
            explode(filter(col("toks"), t => t.isin(termList: _*))).as("term"))
          .groupBy(col("id"), col("dl"), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
        val w = Window.partitionBy(col("qid")).orderBy(col("bm_score").desc, col("id").asc)
        tf.withColumn("df",
            count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
          .join(broadcast(qterms), Seq("term"))
          .crossJoin(broadcast(st))
          .withColumn("s",
            floor(round(
              log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
                (col("tf") * lit(2.2) /
                  (col("tf") + lit(1.2) *
                    (lit(1.0) - lit(0.75) + lit(0.75) * (col("dl") / col("avgdl"))))),
              6) * lit(1e6) + lit(0.5)).cast("long"))
          .groupBy(col("qid"), col("id")).agg(sum(col("s")).as("bm_score"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= k)
          .select(col("qid"), col("id"), col("rnk"))
      }
      val qs = qa.select(col("qid"), col("question"))
      // the main jobs proved byte-identical (modulo aliases) in `plan`
      // mode, so any pair gap must live in the qterm collect the tick
      // includes — time the two collect idioms alone, interleaved
      if (args.drop(3).headOption.contains("collects")) {
        import spark.implicits._
        import graft.functions.TextOps
        for (rep <- 1 to reps) {
          tick(s"rep$rep collect-OLD(.as.collect)") {
            qs.select(col("qid"), explode(TextOps.tokens(col("question"))).as("term"))
              .distinct().as[(Long, String)].collect()
            ()
          }
          tick(s"rep$rep collect-NEW(collectBounded)") {
            graft.Bounded.collectBounded(
              qs.select(col("qid").cast("long").as("qid"),
                explode(TextOps.tokens(col("question"))).as("term")).distinct(),
              4096, "probe", "")
            ()
          }
        }
        spark.stop(); return
      }
      if (args.drop(3).headOption.contains("plan")) {
        println("=== OLD plan ===")
        oldBm25All(qs, collection, 3).explain("formatted")
        println("=== NEW plan ===")
        RagPipeline.bm25All(qs, collection, 3).explain("formatted")
        spark.stop(); return
      }
      // `swap` reverses the within-rep order: with byte-identical main
      // plans, a consistent winner that FLIPS with the order is a
      // positional effect (JIT/page-cache from the first run subsidizing
      // the second), not a plan difference
      val swap = args.drop(3).headOption.contains("swap")
      val arms: Seq[(String, () => Unit)] = Seq(
        ("OLD(pre-82dea69 bm25All)", () =>
          oldBm25All(qs, collection, 3).write.format("noop").mode("overwrite").save()),
        ("NEW(kernel bm25All)", () =>
          RagPipeline.bm25All(qs, collection, 3)
            .write.format("noop").mode("overwrite").save()))
      for (rep <- 1 to reps) {
        (if (swap) arms.reverse else arms).foreach { case (name, run) =>
          tick(s"rep$rep $name")(run())
          spark.catalog.clearCache()
        }
        // the full q42 under the same window, as the in-context band
        tick(s"rep$rep q42(evalBatch full)")(
          RagPipeline.evalBatch(qa, collection, 3)
            .select(col("qid"), col("answer"), col("grade"), col("success"))
            .orderBy(col("qid"))
            .write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // persist mode: A/B the one-materialization collection (q113's
    // single-scan discipline applied to the hybrid retrieval)
    if (args.drop(2).headOption.contains("persist")) {
      for (rep <- 1 to reps) {
        val coll = collection.persist()
        tick(s"rep$rep persisted evalBatch")(
          RagPipeline.evalBatch(qa, coll, 3)
            .select(col("qid"), col("answer"), col("grade"), col("success"))
            .orderBy(col("qid"))
            .write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // probe mode: decompose bm25All itself
    if (args.drop(2).headOption.contains("probe")) {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextOps
      for (rep <- 1 to reps) {
        val toks = collection.select(col("id"),
            coalesce(TextOps.tokens(col("text")), array().cast("array<string>")).as("toks"))
          .withColumn("dl", size(col("toks")).cast("double"))
        tick(s"rep$rep p1:toks-count")(toks.select(col("dl")).write.format("noop").mode("overwrite").save())
        val st = toks.agg(count(lit(1)).cast("double").as("n"),
          (sum(col("dl")) / count(lit(1))).as("avgdl"))
        tick(s"rep$rep p2:stats")(st.write.format("noop").mode("overwrite").save())
        val qtermRows = questions
          .select(col("qid"), explode(TextOps.tokens(col("question"))).as("term"))
          .distinct().as[(Long, String)].collect()
        val termList = qtermRows.map(_._2).distinct.toSeq
        println(s"[q42] termList size = ${termList.size}")
        val tf = toks.select(col("id"), col("dl"),
            explode(filter(col("toks"), t => t.isin(termList: _*))).as("term"))
          .groupBy(col("id"), col("dl"), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
        tick(s"rep$rep p3:tf-agg")(tf.write.format("noop").mode("overwrite").save())
        val withDf = tf.withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
        tick(s"rep$rep p4:tf+dfwindow")(withDf.write.format("noop").mode("overwrite").save())
        tick(s"rep$rep p5:full-bm25")(
          RagPipeline.bm25All(qa.select(col("qid"), col("question")), collection, 3)
            .write.format("noop").mode("overwrite").save())
      }
      spark.stop(); return
    }

    for (rep <- 1 to reps) {
      tick(s"rep$rep 1:embed-corpus")(
        collection.select(col("id"), col("vector"))
          .write.format("noop").mode("overwrite").save())
      tick(s"rep$rep 2:cosine-leg")(
        RagPipeline.retrieveAll(questions, collection, 3)
          .select("qid", "id", "rnk")
          .write.format("noop").mode("overwrite").save())
      tick(s"rep$rep 3:bm25-leg")(
        RagPipeline.bm25All(qa.select(col("qid"), col("question")), collection, 3)
          .write.format("noop").mode("overwrite").save())
      tick(s"rep$rep 4:hybrid-fused")(
        RagPipeline.retrieveHybrid(questions, collection, 3)
          .select("qid", "id", "rnk")
          .write.format("noop").mode("overwrite").save())
      tick(s"rep$rep 5:answerBatch")(
        RagPipeline.answerBatch(qa.select(col("qid"), col("question")), collection, 3)
          .write.format("noop").mode("overwrite").save())
      tick(s"rep$rep 6:evalBatch-full")(
        RagPipeline.evalBatch(qa, collection, 3)
          .select(col("qid"), col("answer"), col("grade"), col("success"))
          .orderBy(col("qid"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

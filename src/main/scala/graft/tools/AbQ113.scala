package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextEmbed, TextOps}

/** Stage attribution for q113_hybrid_rrf — the one sf1-top query without
  * a SCALE.md adjudication (r14). The query is a two-leg composite over
  * ONE shared tokenized corpus frame: a cosine leg (embed + top-5 window
  * per query) and the q87 BM25 body, fused with RRF over a full_outer of
  * the two rank lists. This harness times each stage against the same
  * persisted frame the query uses, so the floor statement is about the
  * composite's parts, not standalone q87/q40 (whose costs overlap the
  * shared tokenize).
  *
  * `sbt 'runMain graft.tools.AbQ113 /root/repo/testdata-sf1 3'`
  */
object AbQ113 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("ab-q113").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q113] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (rep <- 1 to reps) {
      val toksF = graft.Par(spark.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")).cast("double"))
        .persist()
      tick(s"rep$rep p1:tokenize+persist")(
        toksF.select(col("dl")).write.format("noop").mode("overwrite").save())

      val d = TextEmbed.withEmbedFromTokens(toksF, "toks", "vector")
        .select(col("doc_id"), col("vector"))
      tick(s"rep$rep p2:embed-over-cached")(
        d.write.format("noop").mode("overwrite").save())

      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val qv = Seq((0L, "spark window join"), (1L, "vector hash group"),
        (2L, "customer order value"), (3L, "stream batch filter"),
        (4L, "scan slow table"))
        .map { case (qid, t) => (qid, TextEmbed.embedScala(t).toSeq) }
      val qdf = broadcast(qv.toDF("qid", "qv"))
      val wCos = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val cos = d.join(qdf, lit(true))
        .withColumn("score",
          round(graft.functions.VectorKernels.dotFast(col("qv"), col("vector")), 6))
        .withColumn("cos_rnk", row_number().over(wCos).cast("long"))
        .filter(col("cos_rnk") <= 5)
        .select(col("qid"), col("doc_id"), col("cos_rnk"))
      tick(s"rep$rep p3:cosine-leg(embed+rank)")(
        cos.write.format("noop").mode("overwrite").save())

      val bm = graft.TextQueries.bm25Leg(toksF)
        .select(col("qid"), col("doc_id"), col("rnk").as("bm_rnk"))
      tick(s"rep$rep p4:bm25-leg-over-cached")(
        bm.write.format("noop").mode("overwrite").save())

      val wR = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val fused = cos.join(bm, Seq("qid", "doc_id"), "full_outer")
        .withColumn("score",
          coalesce(lit(1.0) / (lit(60) + col("cos_rnk")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("bm_rnk")), lit(0.0)))
        .withColumn("rnk", row_number().over(wR).cast("long"))
        .filter(col("rnk") <= 5)
      tick(s"rep$rep p5:full-query(fusion, re-runs both legs)")(
        fused.write.format("noop").mode("overwrite").save())

      toksF.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

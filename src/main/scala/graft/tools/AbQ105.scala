package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Within-window A/B for q105_naive_bayes (r14 verdict #4): the r14
  * driver artifact read q105 ~+19% normalized vs r13 while the builder's
  * interleaved A/B measured −12% — almost certainly driver-box noise,
  * but q105 WAS touched that round, so re-measure the pair on a quiet
  * box. `old` reconstructs the r13 shape (per-lang model scalars as
  * in-plan aggregate subtrees behind broadcast — stats feeds THREE
  * consumers); `new` runs the registered query (model tables collected
  * once through Bounded.collectBounded, re-entered as local frames).
  * Interleaved old/new within the same minute — absolute bands are
  * meaningless across sessions on this box.
  *
  * `sbt 'runMain graft.tools.AbQ105 /root/testdata/sf0.1 3'`
  */
object AbQ105 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("ab-q105").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q105] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // r13 shape, verbatim from e89cd5e~1 (broadcast aggregate subtrees)
    def oldShape(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val d = graft.Par(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("lang"),
          graft.functions.TextOps.tokens(col("text")).as("toks"))
        .persist()
      val train = d.filter(col("doc_id") % 2 === 0)
      val test = d.filter(col("doc_id") % 2 === 1)
      val trainTok = train.select(col("lang"), explode(col("toks")).as("t")).persist()
      val stats = trainTok.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      val vocabV = trainTok.select(col("t")).distinct().count()
      val nTrainDocs = train.count()
      val priors = train.groupBy(col("lang")).agg(count(lit(1)).as("dl"))
        .withColumn("prior", floor(round(
          log(col("dl").cast("double") / lit(nTrainDocs.toDouble)), 6) *
          lit(1e6) + lit(0.5)).cast("long"))
        .select(col("lang"), col("prior"))
      val lik = trainTok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("clt"))
        .join(stats, Seq("lang"))
        .withColumn("ll", floor(round(
          log((col("clt") + lit(1)).cast("double") /
            (col("nl") + lit(vocabV)).cast("double")), 6) * lit(1e6) + lit(0.5))
          .cast("long"))
        .select(col("lang"), col("t"), col("ll"))
      val defaults = stats
        .withColumn("ll0", floor(round(
          log(lit(1.0) / (col("nl") + lit(vocabV)).cast("double")), 6) *
          lit(1e6) + lit(0.5)).cast("long"))
        .select(col("lang").as("cand"), col("ll0"))
      val testTok = test.select(col("doc_id"), col("lang").as("true_lang"),
          explode(col("toks")).as("t"))
        .groupBy(col("doc_id"), col("true_lang"), col("t"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cand").asc)
      testTok
        .crossJoin(broadcast(defaults))
        .join(broadcast(lik.withColumnRenamed("lang", "cand")), Seq("cand", "t"), "left")
        .withColumn("term", col("cnt") * coalesce(col("ll"), col("ll0")))
        .groupBy(col("doc_id"), col("true_lang"), col("cand"))
        .agg(sum(col("term")).as("tscore"))
        .join(broadcast(priors.withColumnRenamed("lang", "cand")), Seq("cand"))
        .withColumn("score", col("tscore") + col("prior"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("true_lang"), col("cand").as("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }

    val newFn = graft.PipelineQueries.defs.find(_.name == "q105_naive_bayes").get.fn
    for (rep <- 1 to reps) {
      tick(s"rep$rep old")(
        oldShape(spark).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      tick(s"rep$rep new")(
        newFn(spark, dir).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

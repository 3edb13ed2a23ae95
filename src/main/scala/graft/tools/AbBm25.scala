package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Within-window A/B for the r15 BM25 kernel unification's ONE plan
  * change on the q87 side: the r14 `bm25Leg` computed corpus stats via
  * a driver-blocking `.head()` and folded n/avgdl into the score
  * expression as LITERALS; the shared kernel (`functions.Bm25`) folds
  * them in as a 1-row broadcast frame (the bm25All shape — no separate
  * driver job). Everything else (InSet-inside-array filter, tf groupBy,
  * df window, integer lift, top-5 window) is identical. This pairs the
  * two stat shapes interleaved on the SAME unpersisted tokenized frame
  * the registered q87 uses.
  *
  * `sbt 'runMain graft.tools.AbBm25 /root/repo/testdata-sf1 3'`
  */
object AbBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .appName("ab-bm25").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[bm25] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def toksFrame(): DataFrame =
      graft.Par(spark.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")).cast("double"))

    // r14 shape: stats via head(), n/avgdl as literals (verbatim modulo
    // the kernel-shared downstream, which is identical either way)
    def oldLeg(toks: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val st = toks.agg(count(lit(1)).cast("double").as("n"),
        (sum(col("dl")) / count(lit(1))).as("avgdl")).head()
      val (n, avgdl) = (st.getDouble(0), st.getDouble(1))
      val qSeq = Seq(
        (0L, "spark window join"), (1L, "vector hash group"),
        (2L, "customer order value"), (3L, "stream batch filter"),
        (4L, "scan slow table"))
      val qterms = qSeq.toDF("qid", "qtext")
        .select(col("qid"), explode(TextOps.tokens(col("qtext"))).as("term"))
        .distinct()
      val termList = qSeq
        .flatMap(_._2.toLowerCase.split("[^a-z0-9]+"))
        .filter(_.nonEmpty).distinct
      val tf = toks
        .select(col("doc_id"), col("dl"),
          explode(filter(col("toks"), t => t.isin(termList.map(lit): _*))).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val scored = tf
        .withColumn("df", count(lit(1))
          .over(Window.partitionBy(col("term"))).cast("double"))
        .join(broadcast(qterms), Seq("term"))
        .withColumn("sterm", floor(round(
          log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(2.2) /
              (col("tf") + lit(1.2) *
                (lit(1.0) - lit(0.75) + lit(0.75) * (col("dl") / lit(avgdl))))),
          6) * lit(1e6) + lit(0.5)).cast("long"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("s_int").desc, col("doc_id").asc)
      scored.groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("sterm")).as("s_int"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .withColumn("score", round(col("s_int") / lit(1e6), 6))
        .select(col("qid"), col("rnk"), col("doc_id"), col("score"))
        .orderBy(col("qid"), col("rnk"))
    }

    for (rep <- 1 to reps) {
      tick(s"rep$rep old(head-literals)")(
        oldLeg(toksFrame()).write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      tick(s"rep$rep new(kernel)")(
        graft.TextQueries.bm25Leg(toksFrame())
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

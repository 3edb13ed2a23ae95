package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the q94 formulations (window vs native heap).
  * Not part of the driver contract; run via
  * `sbt 'runMain graft.tools.AbQ94 /root/testdata/sf0.1'`.
  */
object AbQ94 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("ab-q94").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def half(off: Int) =
      graft.functions.VectorKernels.signPack(col("embedding"), off)
    def coded = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("c_lo", half(0)).withColumn("c_hi", half(32))

    def score6(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(graft.functions.VectorKernels.dotFast(a, b), 6)

    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }

    time("coded-only") { coded.agg(sum(col("c_lo")), sum(col("c_hi"))).head(); 1L }

    def qset(c: DataFrame) = c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("c_lo").as("q_lo"), col("c_hi").as("q_hi"))

    time("A-window-singlepass") {
      val c = coded
      val q = qset(c)
      val wh = Window.partitionBy(col("qid")).orderBy(col("ham").asc, col("nid").asc)
      val wr = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
      c.select(col("vec_id").as("nid"), col("embedding").as("nv"),
          col("c_lo"), col("c_hi"))
        .join(broadcast(q), col("qid") =!= col("nid"))
        .withColumn("ham",
          (expr("bit_count(c_lo ^ q_lo)") + expr("bit_count(c_hi ^ q_hi)")).cast("long"))
        .withColumn("crnk", row_number().over(wh))
        .filter(col("crnk") <= 15)
        .withColumn("score", score6(col("qv"), col("nv")))
        .withColumn("rnk", row_number().over(wr).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("nid"), col("ham"), col("score"))
        .count()
    }

    time("B-heap-current") {
      val c = coded.persist()
      val q = qset(c)
      val cand = c.select(col("vec_id").as("nid"), col("c_lo"), col("c_hi"))
        .join(broadcast(q.select(col("qid"), col("q_lo"), col("q_hi"))),
          col("qid") =!= col("nid"))
        .withColumn("ham",
          (expr("bit_count(c_lo ^ q_lo)") + expr("bit_count(c_hi ^ q_hi)")).cast("long"))
        .select(col("qid"), col("nid"), (-col("ham").cast("double")).as("negham"))
        .groupBy(col("qid"))
        .agg(graft.operators.TopKAgg.topK(col("negham"), col("nid"), 15).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t.id").as("nid"),
          (-col("t.v")).cast("long").as("ham"))
      val reranked = broadcast(cand.join(broadcast(q.select(col("qid"), col("qv"))), Seq("qid")))
        .join(c.select(col("vec_id").as("nid"), col("embedding").as("nv")), Seq("nid"))
        .withColumn("score", score6(col("qv"), col("nv")))
      val n = reranked
        .select(col("qid"), (col("nid") * lit(128L) + col("ham")).as("packed"), col("score"))
        .groupBy(col("qid"))
        .agg(graft.operators.TopKAgg.topK(col("score"), col("packed"), 5).as("top"))
        .select(col("qid"), posexplode(col("top")))
        .count()
      c.unpersist()
      n
    }

    time("C-heapcut-only") {
      val c = coded
      val q = qset(c)
      c.select(col("vec_id").as("nid"), col("c_lo"), col("c_hi"))
        .join(broadcast(q.select(col("qid"), col("q_lo"), col("q_hi"))),
          col("qid") =!= col("nid"))
        .withColumn("ham",
          (expr("bit_count(c_lo ^ q_lo)") + expr("bit_count(c_hi ^ q_hi)")).cast("long"))
        .select(col("qid"), col("nid"), (-col("ham").cast("double")).as("negham"))
        .groupBy(col("qid"))
        .agg(graft.operators.TopKAgg.topK(col("negham"), col("nid"), 15).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .count()
    }

    time("D-windowcut-only") {
      val c = coded
      val q = qset(c)
      val wh = Window.partitionBy(col("qid")).orderBy(col("ham").asc, col("nid").asc)
      c.select(col("vec_id").as("nid"), col("c_lo"), col("c_hi"))
        .join(broadcast(q.select(col("qid"), col("q_lo"), col("q_hi"))),
          col("qid") =!= col("nid"))
        .withColumn("ham",
          (expr("bit_count(c_lo ^ q_lo)") + expr("bit_count(c_hi ^ q_hi)")).cast("long"))
        .withColumn("crnk", row_number().over(wh))
        .filter(col("crnk") <= 15)
        .count()
    }

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing harness for q97's superstep loop: times the q31 pair
  * build and each PageRank round separately.
  * `sbt 'runMain graft.tools.AbQ97 /root/testdata/sf0.1'`. */
object AbQ97 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("ab-q97").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def tick[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q97] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val mode = args.drop(1).headOption.getOrElse("default")
    if (mode == "registered") {
      // time the actual registered q97 end-to-end, like Bench does
      val fn = graft.PipelineQueries.defs.find(_.name == "q97_pagerank").get.fn
      for (rep <- 1 to 3) {
        tick(s"registered rep$rep")(
          fn(spark, dir).write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    if (mode == "classic") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
    }
    for (rep <- 1 to 2) {
      val pairs = tick(s"rep$rep pairs")(
        graft.TextQueries.defs.find(_.name == "q31_simhash_pairs").get
          .fn(spark, dir).select(col("id_a"), col("id_b")).persist())
      tick(s"rep$rep pairs count")(println("  n=" + pairs.count()))
      val nodes = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).persist()
      val n = nodes.count().toDouble
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      var pr = nodes.withColumn("pr", lit(math.floor(1e6 / n).toLong))
      for (i <- 1 to 3) {
        val prev = pr
        val dang = pr.join(deg, pr("doc_id") === deg("src"), "left_anti")
          .agg(coalesce(sum(col("pr")), lit(0L)).as("dang"))
        val aggIn = edges.join(deg, Seq("src"))
          .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
          .withColumn("c", floor(col("pr") * lit(1.0) / col("deg")).cast("long"))
          .groupBy(col("dst")).agg(sum(col("c")).as("agg_in"))
        pr = nodes.join(aggIn, nodes("doc_id") === aggIn("dst"), "left")
          .crossJoin(broadcast(dang))
          .withColumn("pr", floor(lit(150000.0) / lit(n) + lit(0.85) *
            (coalesce(col("agg_in"), lit(0L)) +
              floor(col("dang").cast("double") / lit(n))) + lit(0.5)).cast("long"))
          .select(col("doc_id"), col("pr"))
          .persist()
        tick(s"rep$rep round$i")(pr.count())
        prev.unpersist()
      }
      pairs.unpersist(); nodes.unpersist()
      if (mode == "classic") {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      tick(s"rep$rep final")(
        pr.withColumn("pagerank", round(col("pr") / lit(1e6), 6))
          .select(col("doc_id"), col("pagerank"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save())
      pr.unpersist()
      if (mode == "classic") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing harness for the batched BPE trainer (q129's sample
  * path). `sbt 'runMain graft.tools.AbBpe /root/testdata/sf0.1'`. */
object AbBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("ab-bpe").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    for (rep <- 1 to 2) {
      val steps = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val (merges, toks) = graft.CurationQueries.bpeTrain(spark, dir,
        sampleOnly = true, target = graft.CurationQueries.BpeSampleMerges,
        supersteps = Some(steps))
      toks.unpersist()
      val t1 = System.nanoTime()
      // ── q129's apply side, phase-split (verdict-r12 #2): the encode UDF
      // over the full corpus, then the same pass plus the rollup tail ──
      val ms = merges.map(m => (m._2, m._3))
      val encode = udf { (ts: Seq[String]) =>
        graft.CurationQueries.encodeWithMerges(ts, ms) }
      def base = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("lang"), split(col("text"), " ").as("w"))
      val spread = graft.Par(base)
      spread.withColumn("toks", encode(col("w")))
        .select(size(col("toks"))).write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      spread.withColumn("toks", encode(col("w")))
        .select(col("lang"), size(col("w")).cast("long").as("nw"),
          size(col("toks")).cast("long").as("nt"),
          size(filter(col("toks"), t => t.contains("_"))).cast("long").as("nm"))
        .groupBy(col("lang"))
        .agg(sum(col("nw")).as("n_words"), sum(col("nt")).as("n_tokens"),
          sum(col("nm")).as("n_merged"))
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      // split-only pass: what does tokenize+shuffle cost without encode?
      spread.select(size(col("w"))).write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      println(f"rep$rep: train ${(t1 - t0) / 1e9}%.2f s " +
        s"(${merges.length} merges, ${steps.get()} supersteps); " +
        f"encode-only ${(t2 - t1) / 1e9}%.2f s; " +
        f"encode+rollup ${(t3 - t2) / 1e9}%.2f s; " +
        f"split-only ${(t4 - t3) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

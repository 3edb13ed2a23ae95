package graft.tools

import org.apache.spark.sql.SparkSession

/** Evidence harness for the r13 adaptive Par (verdict-r12 #1): the bench
  * tables ship as ONE parquet file each, so the adaptive skip never fires
  * in the driver's own artifacts. This builds a multi-file twin of the
  * documents table (the 100 TB arrival shape: a scan wide enough to feed
  * every core without help) and runs Par'd document queries against both
  * layouts, printing the plan shape (round-robin exchange present?) and
  * wall time for each.
  *
  * `sbt 'runMain graft.tools.AbPar /root/testdata/sf0.1 [reps]'`
  */
object AbPar {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.applyExtraConf(SparkSession.builder()
      .appName("ab-par").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // multi-file twin: same rows, >= defaultParallelism splits
    val wide = java.nio.file.Files.createTempDirectory("graft-abpar").toString
    val n = spark.sparkContext.defaultParallelism
    // 3n files: Spark PACKS small files (openCostInBytes padding), so n+8
    // files collapse below the parallelism target after packing (measured:
    // 40 files -> 20 splits); 3n survives packing at >= n splits
    spark.read.parquet(s"$dir/documents.parquet").repartition(3 * n)
      .write.mode("overwrite").parquet(s"$wide/documents.parquet")

    val queries = Seq("q25_minhash", "q81_pii_redact", "q21_token_stats")
    for (q <- queries; (label, d) <- Seq("single-file" -> dir, "multi-file " -> wide)) {
      val fn = graft.SparkEntry.queries(q)
      val plan = fn(spark, d).queryExecution.executedPlan.toString
      val rrr = plan.contains("RoundRobinPartitioning")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"$q%-20s $label  rrr-exchange=$rrr%-5s  min=${times.min}%5.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}

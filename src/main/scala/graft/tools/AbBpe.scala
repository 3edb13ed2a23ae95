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
    for (rep <- 1 to 2) {
      val steps = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val (merges, toks) = graft.CurationQueries.bpeTrain(spark, dir,
        sampleOnly = true, target = graft.CurationQueries.BpeSampleMerges,
        supersteps = Some(steps))
      toks.unpersist()
      println(f"rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"${merges.length} merges in ${steps.get()} supersteps")
    }
    spark.stop()
  }
}

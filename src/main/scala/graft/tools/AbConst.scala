package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution harness for the constant-dominated queries (verdict-r12
  * #3): q130's cost barely moves from sf0.1 to sf1 (2.11 vs 2.14 s) and
  * q88's actually dips (3.26 vs 3.22 s), so the spend is training/setup
  * supersteps, not data. This splits each into its driver-synchronized
  * phases and times them separately, plus the registered query end to
  * end, with the bench's own session shape (local[n], 32 shuffle
  * partitions, 16m splits, noop sink).
  *
  * `sbt 'runMain graft.tools.AbConst /root/testdata/sf0.1 [reps]'`
  */
object AbConst {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.applyExtraConf(SparkSession.builder()
      .appName("ab-const").master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      println(s"── rep $rep ──")

      println("q130 phases:")
      val f = time("  features+persist+count") {
        val f = graft.CurationQueries.logregFeatures(spark, dir).persist()
        f.count(); f
      }
      val n = f.count()
      val w = time("  logregTrain (16 iters)") { graft.CurationQueries.logregTrain(f, n) }
      time("  score+bins tail") {
        sink(f.withColumn("z", graft.CurationQueries.zCol(w))
          .withColumn("sg", graft.CurationQueries.sigCol)
          .withColumn("bin", least(floor(col("sg") * 10).cast("long"), lit(9L)))
          .groupBy(col("bin")).agg(count(lit(1)).as("n_docs")))
      }
      f.unpersist()
      time("  q130 end-to-end") { sink(graft.SparkEntry.queries("q130_calibration")(spark, dir)) }
      spark.catalog.clearCache()

      println("q88 phases:")
      val (q, cents) = time("  coarse: ckpt+count+train") { graft.VectorQueries.trainedKMeans(spark, dir) }
      val (wide, dts) = time("  pq: 4 subspace trainings") { graft.VectorQueries.pqTrained(spark, q) }
      time("  codes+tables (materialize)") {
        // sink wide FULLY (r13 review: limit(1) short-circuited after one
        // row and measured none of the 4-way code-assignment work)
        sink(wide)
        dts.foreach(d => sink(d))
      }
      println(s"    (cents=${cents.length})")
      time("  q88 end-to-end") { sink(graft.SparkEntry.queries("q88_ivfpq")(spark, dir)) }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
